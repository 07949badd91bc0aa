"""Config-2 (bunny 512² 4spp 1-bounce PT) cost decomposition.

Config 2 sits at ~56 Mrays/s vs the 75 target (verdict r3 #5); per sample
(262k primaries + 262k NEE rays) the frame spends ~9.3 ms. How much is the
two traces and how much is glue (ray regen, lane reshapes, parking,
radiance math)? Run on TPU: python tools/mb_pt2.py
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
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4, promote_lbvh2_to_bvh4_wide
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.pallas.traverse import (make_qnodes, trace_rays_pallas,
                                               trace_tiles_pallas)
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.render_pt import pt_sample_frame, _tile_order, _wave_sub
from raytracer_tpu.utils import procgen

K = 32
s = Scene().set_triangles(procgen.make_icosphere(6).astype(np.float32))
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
wide = make_wide_bvh(promote_lbvh2_to_bvh4_wide(build_lbvh2(tris)))
cs, hgt = build_sah2_clustered(tris, leaf_size=K)
qn = make_qnodes(make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2)),
                 cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)
w = h = 512
R = w * h
pos = jnp.array([0, 0, 2.8], jnp.float32)
quat = jnp.array([0, 0, 0, 1], jnp.float32)
NB = 8


def timeit(name, fn, *args):
    ref = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0]).ravel()[0]
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, fn(*args))
        reps.append((time.perf_counter() - t0) * 1e3 / NB)
    ms = float(np.median(reps))
    print(f"{name:32s} {ms:7.2f} ms/iter  (ref {ref:.4g})", flush=True)
    return ms


# a. full sample (what config 2 pays per spp)
@jax.jit
def full_samples(qn_, seeds):
    def one(carry, i):
        img = pt_sample_frame(wide, tris, pos, quat, jax.random.key(i),
                              w, h, bounces=1, qnodes=qn_, leaf_k=K,
                              tile_primary=True)
        return carry + jnp.sum(img), 0
    c, _ = jax.lax.scan(one, jnp.float32(0), seeds)
    return c


# b. primary tile trace only
@jax.jit
def primary_only(qn_, seeds):
    def one(carry, i):
        out = trace_tiles_pallas(qn_, pos, quat, w, h, jitter=True,
                                 jitter_seed=i.astype(jnp.int32), leaf_k=K)
        return carry + jnp.sum(out[4] >= 0), 0
    c, _ = jax.lax.scan(one, jnp.int32(0), seeds)
    return c


# c. NEE any-hit wave only (post-primary origins, tile-lane order)
perm = jnp.asarray(_tile_order(w, h))
o0, d0 = generate_rays(w, h, pos, quat, 70.0)
o0, d0 = o0.reshape(R, 3)[perm], d0.reshape(R, 3)[perm]
t0_, nx_, ny_, nz_, tri0 = trace_rays_pallas(qn, o0, d0, leaf_k=K)
n0 = jnp.stack([nx_, ny_, nz_], -1)
p0 = o0 + d0 * jnp.where(tri0 >= 0, t0_, 0.5)[:, None] + 1e-4 * n0
sun = jnp.broadcast_to(jnp.array([0.48507125, 0.7276069, 0.48507125],
                                 jnp.float32), p0.shape)


@jax.jit
def nee_only(qn_, o_, d_, seeds):
    def one(carry, i):
        t, nx, ny, nz, tri = trace_rays_pallas(
            qn_, o_ + i * 1e-7, d_, any_hit=True, leaf_k=K,
            sub=_wave_sub(R, any_hit=True))
        return carry + jnp.sum(tri >= 0), 0
    c, _ = jax.lax.scan(one, jnp.int32(0), seeds)
    return c


seeds_f = jnp.arange(NB, dtype=jnp.float32)
seeds_i = jnp.arange(NB, dtype=jnp.int32)
a = timeit("a. full sample", full_samples, qn, seeds_i)
b = timeit("b. primary tile trace", primary_only, qn, seeds_f)
c = timeit("c. NEE any-hit wave", nee_only, qn, p0, sun, seeds_f)
print(f"glue = a - b - c = {a - b - c:.2f} ms/sample "
      f"({100 * (a - b - c) / a:.0f}% of the sample)")
timeit("a. full sample (again)", full_samples, qn, seeds_i)
