"""BVH8 A/B on the framed headline: 4-wide vs 8-wide records, same K.

PERF.md roadmap #4 (round 4): the consume loop is scalar-issue-bound at
~330 ns/visit, so halving record visits by widening to 8 child slots wins
iff the added per-visit scalar work (8 slab metric reads + 19-CE sort
network vs 5) stays under the fixed per-visit cost it amortizes. Run
back-to-back in ONE process per the A/B discipline (PERF.md drift note).

Run on TPU: python tools/mb_bvh8.py [K ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.cluster import build_sah2_clustered
from raytracer_tpu.ops.collapse import (
    collapse_lbvh2_to_bvh4,
    collapse_lbvh2_to_bvh8,
)
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_tiles_pallas
from raytracer_tpu.utils import procgen

W, H, FRAMES = 1920, 1080, 8
KS = [int(a) for a in sys.argv[1:]] or [32, 16]

scene = Scene().set_triangles(procgen.make_dragon_stand_in())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
quat = np.array([0, 0, 0, 1], np.float32)


def measure(k, wide8, pos0):
    cs, hgt = build_sah2_clustered(tris, leaf_size=k)
    collapse = collapse_lbvh2_to_bvh8 if wide8 else collapse_lbvh2_to_bvh4
    wide = make_wide_bvh(collapse(cs.bvh2, sweeps=hgt + 2))
    qn = make_qnodes(wide, cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=k)
    jax.block_until_ready(qn)

    @jax.jit
    def render_n(qn_, poss):
        def one(p):
            out = trace_tiles_pallas(qn_, p, quat, W, H, leaf_k=k,
                                     stats=True)
            return jnp.sum(out[4] >= 0), jnp.sum(out[5][::32, ::32])
        return jax.lax.map(one, poss)

    poss = pos0[None, :] + np.stack(
        [np.linspace(0, 1e-3, FRAMES), np.zeros(FRAMES), np.zeros(FRAMES)], 1
    ).astype(np.float32)
    hits, visits = (np.asarray(a) for a in render_n(qn, poss))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(render_n(qn, poss))
        reps.append((time.perf_counter() - t0) / FRAMES * 1e3)
    return float(np.median(reps)), int(visits[0]), int(hits[0])


for k in KS:
    for label, pos in (("framed", np.array([0, 0, 1.15], np.float32)),
                       ("sparse", np.array([0, 0, 2.5], np.float32))):
        r4 = measure(k, False, pos)
        r8 = measure(k, True, pos)
        print(f"K={k} {label}: BVH4 {r4[0]:.2f} ms ({W*H/r4[0]/1e3:.1f} "
              f"Mrays/s, {r4[1]} visits) | BVH8 {r8[0]:.2f} ms "
              f"({W*H/r8[0]/1e3:.1f} Mrays/s, {r8[1]} visits) "
              f"hits {r4[2]}/{r8[2]}", flush=True)
