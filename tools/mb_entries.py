"""A/B: per-frame compute_tile_entries vs entries=None in the frame loop.

PERF.md's round-2 note says the entry frontier saves ~1 visit on tiles that
average ~70 — if the on-device entry computation costs measurable time per
frame, dropping it from the bench/production loop is a free win.
Run on TPU: python tools/mb_entries.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.cluster import build_sah2_clustered
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.ops.pallas.traverse import TILE, make_qnodes, trace_tiles_pallas
from raytracer_tpu.ops.pallas.entry import compute_tile_entries
from raytracer_tpu.utils import procgen

LEAF_K = 32
W, H = 1920, 1080
FRAMES = 8

scene = Scene().set_triangles(procgen.make_dragon_stand_in())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
cluster, height = build_sah2_clustered(tris, leaf_size=LEAF_K)
bvh4 = collapse_lbvh2_to_bvh4(cluster.bvh2, sweeps=height + 2)
wide = make_wide_bvh(bvh4)
qn = make_qnodes(wide, cluster.tris_sorted, tri_ids=cluster.tri_order,
                 leaf_size=LEAF_K)
jax.block_until_ready(qn)

cam_quat = np.array([0, 0, 0, 1], np.float32)


def loop(use_entries, pos0):
    @jax.jit
    def render_n(qn_, wide_, poss):
        def one(pos):
            entries = (compute_tile_entries(wide_, pos, cam_quat, W, H, tile=TILE)
                       if use_entries else None)
            out = trace_tiles_pallas(qn_, pos, cam_quat, W, H,
                                     entries=entries, leaf_k=LEAF_K)
            return jnp.sum(out[4] >= 0)
        return jax.lax.map(one, poss)

    poss = pos0[None, :] + np.stack(
        [np.linspace(0, 1e-3, FRAMES), np.zeros(FRAMES), np.zeros(FRAMES)], 1
    ).astype(np.float32)
    np.asarray(render_n(qn, wide, poss))  # warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(render_n(qn, wide, poss))
        reps.append((time.perf_counter() - t0) / FRAMES * 1e3)
    return float(np.median(reps))


for name, pos in (("sparse", np.array([0, 0, 2.5], np.float32)),
                  ("framed", np.array([0, 0, 1.15], np.float32))):
    with_e = loop(True, pos)
    without = loop(False, pos)
    with_e2 = loop(True, pos)   # re-measure to bracket drift
    print(f"[{name}] entries: {with_e:.2f} / {with_e2:.2f} ms  "
          f"no-entries: {without:.2f} ms", flush=True)
