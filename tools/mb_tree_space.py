"""A/B: tree_space hbm vs vmem on config-4-class divergent waves.

The per-visit HBM→SMEM DMA (~293 ns raw latency) is the suspected floor of
divergent waves — every stream has vector work each iteration, but if the
4-stream interleave can't fully hide the latency, a VMEM-resident tree
(records preloaded once, per-visit DMA VMEM→SMEM) pays. One process,
back-to-back (PERF.md drift protocol). Run on TPU:
  python tools/mb_tree_space.py [sub]
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
from raytracer_tpu.ops.camera import generate_rays
from raytracer_tpu.ops.cluster import build_sah2_clustered
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_rays_pallas
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.render_pt import _cosine_sample, _tile_order
from raytracer_tpu.utils import procgen

SUB = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = 32
parts = [procgen.make_cornell_box(4.0)]
for i in range(8):
    parts.append(procgen.make_cube(0.3) + np.array(
        [(-1.5 + 0.4 * i), -1.6, (-1.2 if i % 2 else 1.2)], np.float32))
parts.append(procgen.make_icosphere(4, radius=0.7))
s = Scene().set_triangles(np.concatenate(parts).astype(np.float32))
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
cs, hgt = build_sah2_clustered(tris, leaf_size=K)
qn = make_qnodes(make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2)),
                 cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)
print(f"tree: {qn.shape} = {qn.size * 4 / 1024:.0f} KB")

w = h = 512
R = w * h
perm = jnp.asarray(_tile_order(w, h))
o, d = generate_rays(w, h, (0, 0, 0.8), (0, 0, 0, 1), 70.0)
o, d = o.reshape(R, 3)[perm], d.reshape(R, 3)[perm]

t0_, nx_, ny_, nz_, tri0 = trace_rays_pallas(qn, o, d, leaf_k=K)
n = jnp.stack([nx_, ny_, nz_], -1)
tcl = jnp.where(tri0 >= 0, t0_, 0.5)
p = o + d * tcl[:, None] + 1e-4 * n
sun = jnp.broadcast_to(jnp.array([0.48507125, 0.7276069, 0.48507125],
                                 jnp.float32), p.shape)
u1 = jax.random.uniform(jax.random.key(5), (R,))
u2 = jax.random.uniform(jax.random.key(6), (R,))
nn = jnp.where(tri0[:, None] >= 0, n, jnp.array([0., 0., 1.]))
db = _cosine_sample(nn, u1, u2)
pr = jax.random.permutation(jax.random.key(7), R)

WAVES = {
    "nee": (p, sun, True),
    "bounce1": (p, db, False),
    "incoherent": (p[pr], db[pr], False),
}
NW = 8

for space in ("hbm", "vmem", "smem", "hbm"):   # hbm twice to bracket drift
    for name, (o_, d_, ah) in WAVES.items():
        @jax.jit
        def wave_batch(qn_, oo, dd, ah=ah, space=space):
            def one(carry, _):
                o2, d2 = carry
                t, nx, ny, nz, tri = trace_rays_pallas(
                    qn_, o2, d2, any_hit=ah, leaf_k=K, sub=SUB,
                    tree_space=space)
                return (o2 + 0.0 * t[:, None], d2), jnp.sum(tri)
            _, ts = jax.lax.scan(one, (oo, dd), None, length=NW)
            return jnp.sum(ts)

        ref = np.asarray(wave_batch(qn, o_, d_))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(wave_batch(qn, o_, d_))
            reps.append((time.perf_counter() - t0) * 1e3 / NW)
        ms = float(np.median(reps))
        print(f"space={space:4s} sub={SUB:2d} {name:10s} {ms:7.2f} ms/wave "
              f"{R/ms/1e3:6.1f} Mrays/s  sum={int(ref)}", flush=True)
