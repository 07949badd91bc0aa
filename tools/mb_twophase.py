"""Size the prize for per-tile two-phase tracing on the framed headline.

Mixed (silhouette) tiles pin the packet occlusion bound at INF — one miss
lane keeps ``maxb = max(best_t)`` infinite, so stack-pop culling never fires
on the tiles that straddle the model's edge (PERF.md r3 #12). The proposed
fix (VERDICT r3 next #2) is a two-phase trace: hit-predicted lanes first
(pure streams → maxb engages), miss lanes second. Prediction only affects
performance, never correctness: every lane is traced in exactly one phase.

This tool measures the UPPER BOUND of that idea with existing machinery —
the ray-buffer kernel + lane parking — using the TRUE hit mask as a perfect
predictor (what frame i-1 of a progressive batch would supply):

  A. tile kernel, framed camera (the current headline path)
  B. ray-buffer kernel, tile-ordered lanes, ONE pass (apples baseline)
  C. ray-buffer kernel, TWO passes: hit lanes (miss parked) + miss lanes
     (hit parked) — per-stream maxb is pure in each pass

If C is not clearly under B, in-kernel two-phase cannot pay and the idea
dies here. Run on TPU: python tools/mb_twophase.py [sub]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.camera import generate_rays
from raytracer_tpu.ops.cluster import build_sah2_clustered
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.pallas.traverse import (make_qnodes, trace_rays_pallas,
                                               trace_tiles_pallas)
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.render_pt import _park_irrelevant, _tile_order
from raytracer_tpu.utils import procgen

SUB = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = 32
W, H = 1920, 1080
R = W * H

tris_np = procgen.make_dragon_solid()
s = Scene().set_triangles(tris_np)
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
cs, hgt = build_sah2_clustered(tris, leaf_size=K)
qn = make_qnodes(make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2)),
                 cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)
print(f"tris {tris.shape[0]}  records {qn.shape}", flush=True)

pos = jnp.array([0.0, 0.0, 1.15], jnp.float32)   # bench.py framed camera
quat = jnp.array([0, 0, 0, 1], jnp.float32)

# truth: tile-kernel frame → hit mask (the perfect predictor)
t0_, _, _, _, tri0 = trace_tiles_pallas(qn, pos, quat, W, H, leaf_k=K)
hit_img = np.asarray(tri0 >= 0)
print(f"framed hit rate {hit_img.mean():.3f}", flush=True)

perm = jnp.asarray(_tile_order(W, H))
o_img, d_img = generate_rays(W, H, pos, quat, 70.0)
o = o_img.reshape(R, 3)[perm]
d = d_img.reshape(R, 3)[perm]
hit = jnp.asarray(hit_img.reshape(R))[perm]

NB = 8


def timeit(name, fn, *args):
    ref = np.asarray(fn(*args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        reps.append((time.perf_counter() - t0) * 1e3 / NB)
    ms = float(np.median(reps))
    print(f"{name:28s} {ms:7.2f} ms/frame  {R/ms/1e3:6.1f} Mrays/s  "
          f"sum={int(ref)}", flush=True)
    return ms


@jax.jit
def tile_frames(qn_, pos_):
    def one(carry, i):
        out = trace_tiles_pallas(qn_, pos_ + i * 1e-5, quat, W, H, leaf_k=K)
        return carry + jnp.sum(out[4] >= 0), 0
    c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(NB, dtype=jnp.float32))
    return c


@jax.jit
def raybuf_frames(qn_, o_, d_):
    def one(carry, i):
        t, nx, ny, nz, tri = trace_rays_pallas(qn_, o_ + i * 1e-7, d_,
                                               leaf_k=K, sub=SUB)
        return carry + jnp.sum(tri >= 0), 0
    c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(NB, dtype=jnp.float32))
    return c


oh, dh = _park_irrelevant(o, d, hit, sub=SUB)
om, dm = _park_irrelevant(o, d, ~hit, sub=SUB)


@jax.jit
def twophase_frames(qn_, oh_, dh_, om_, dm_):
    def one(carry, i):
        _, _, _, _, th = trace_rays_pallas(qn_, oh_ + i * 1e-7, dh_,
                                           leaf_k=K, sub=SUB)
        _, _, _, _, tm = trace_rays_pallas(qn_, om_ + i * 1e-7, dm_,
                                           leaf_k=K, sub=SUB)
        return carry + jnp.sum(th >= 0) + jnp.sum(tm >= 0), 0
    c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(NB, dtype=jnp.float32))
    return c


timeit("A tile kernel", tile_frames, qn, pos)
timeit("B raybuf 1-pass", raybuf_frames, qn, o, d)
timeit("C raybuf 2-phase (oracle)", twophase_frames, qn, oh, dh, om, dm)
# bracket drift
timeit("B raybuf 1-pass (again)", raybuf_frames, qn, o, d)
