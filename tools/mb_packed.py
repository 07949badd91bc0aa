"""Microbench: packed-leaf (K tris/leaf) effect on dragon-class 1080p.

Usage: python tools/mb_packed.py [K ...]   (default: 1 2 4 8)
Prints ms/frame, Mrays/s, total visits, node count per K.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.cluster import build_lbvh2_clustered
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.ops.pallas.traverse import TILE, make_qnodes, trace_tiles_pallas
from raytracer_tpu.ops.pallas.entry import compute_tile_entries
from raytracer_tpu.utils import procgen

W, H = 1920, 1080
ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]

scene = Scene().set_triangles(procgen.make_dragon_stand_in())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
print(f"{tris.shape[0]} tris, {W}x{H}, TILE={TILE}", flush=True)

pos0 = np.array([0.0, 0.0, 2.5], np.float32)
quat = np.array([0.0, 0.0, 0.0, 1.0], np.float32)

for k in ks:
    if k == 1:
        wide = make_wide_bvh(collapse_lbvh2_to_bvh4(build_lbvh2(tris)))
        qn = make_qnodes(wide, tris)
    else:
        cs = build_lbvh2_clustered(tris, leaf_size=k)
        wide = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2))
        qn = make_qnodes(wide, cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=k)
    jax.block_until_ready(qn)
    m = qn.shape[0]

    entries = compute_tile_entries(wide, pos0, quat, W, H, tile=TILE)
    out = trace_tiles_pallas(qn, pos0, quat, W, H, entries=entries,
                             stats=True, leaf_k=k)
    vis = np.asarray(out[5])
    visits = int(vis[::TILE, ::TILE].astype(np.int64).sum())
    hits = int((np.asarray(out[4]) >= 0).sum())

    @jax.jit
    def render_n(qn_, wide_, poss, k=k):
        def one(p):
            e = compute_tile_entries(wide_, p, quat, W, H, tile=TILE)
            o = trace_tiles_pallas(qn_, p, quat, W, H, entries=e, leaf_k=k)
            return jnp.sum(o[4] >= 0)
        return jax.lax.map(one, poss)

    nf = 8
    poss = pos0[None] + np.stack(
        [np.linspace(0, 1e-3, nf), np.zeros(nf), np.zeros(nf)], 1
    ).astype(np.float32)
    np.asarray(render_n(qn, wide, poss))
    t0 = time.perf_counter()
    np.asarray(render_n(qn, wide, poss))
    ms = (time.perf_counter() - t0) / nf * 1e3
    print(f"K={k}: nodes={m} visits={visits} hits={hits} "
          f"{ms:.2f} ms/frame {W*H/ms/1e3:.1f} Mrays/s "
          f"({ms*1e6/max(visits,1):.0f} ns/visit)", flush=True)
