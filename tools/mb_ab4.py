"""Config-4 wave cost split: normal vs RT_ABLATE=nomt, one wave type.

Usage: RT_ABLATE=<none|nomt|noslab> python tools/mb_ab4.py [wave] [sub]
One process per ablation (RT_ABLATE is read at kernel-module import).
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
from raytracer_tpu.ops.trace import make_wide_bvh, trace_rays
from raytracer_tpu.render_pt import _cosine_sample, _tile_order
from raytracer_tpu.utils import procgen

K = int(os.environ.get("RT_K", "32"))
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
wide = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2))
qn = make_qnodes(wide, cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)

w = h = 512
R = w * h
perm = jnp.asarray(_tile_order(w, h))
o, d = generate_rays(w, h, (0, 0, 0.8), (0, 0, 0, 1), 70.0)
o, d = o.reshape(R, 3)[perm], d.reshape(R, 3)[perm]
t0_, tri0 = trace_rays(wide, cs.tris_sorted, o, d)
tcl = jnp.where(tri0 >= 0, t0_, 0.5)
nn = jnp.where(tri0[:, None] >= 0, -d, jnp.array([0., 0., 1.]))
p = o + d * tcl[:, None] + 1e-4 * nn
sun = jnp.broadcast_to(jnp.array([0.48507125, 0.7276069, 0.48507125],
                                 jnp.float32), p.shape)
db = _cosine_sample(nn, jax.random.uniform(jax.random.key(5), (R,)),
                    jax.random.uniform(jax.random.key(6), (R,)))
pr = jax.random.permutation(jax.random.key(7), R)


def compact(o_, d_):
    from raytracer_tpu.ops.morton import morton3d
    oct_ = ((d_[:, 0] < 0).astype(jnp.uint32) * 4
            + (d_[:, 1] < 0).astype(jnp.uint32) * 2
            + (d_[:, 2] < 0).astype(jnp.uint32))
    q = jnp.clip((o_ + 2.0) * (1023.0 / 4.0), 0.0, 1023.0).astype(jnp.uint32)
    m = morton3d(q[:, 0], q[:, 1], q[:, 2])
    key = (oct_ << jnp.uint32(28)) | (m >> jnp.uint32(2))
    pm = jnp.argsort(key)
    return o_[pm], d_[pm]


pc, dbc = compact(p, db)
WAVES = {
    "primary": (o, d, False),
    "nee": (p, sun, True),
    "bounce1_sorted": (pc, dbc, False),
    "incoherent": (p[pr], db[pr], False),
}
NW = 8
which = sys.argv[1] if len(sys.argv) > 1 else "all"
sub = int(sys.argv[2]) if len(sys.argv) > 2 else 16
abl = os.environ.get("RT_ABLATE", "")

for name, (o_, d_, ah) in WAVES.items():
    if which != "all" and name != which:
        continue

    @jax.jit
    def wave_batch(qn_, oo, dd, ah=ah):
        def one(carry, _):
            o2, d2 = carry
            t, nx, ny, nz, tri = trace_rays_pallas(
                qn_, o2, d2, any_hit=ah, leaf_k=K, sub=sub)
            return (o2 + 0.0 * t[:, None], d2), jnp.sum(tri)
        _, ts = jax.lax.scan(one, (oo, dd), None, length=NW)
        return jnp.sum(ts)

    np.asarray(wave_batch(qn, o_, d_))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(wave_batch(qn, o_, d_))
        reps.append((time.perf_counter() - t0) * 1e3 / NW)
    ms = float(np.median(reps))
    print(f"ablate={abl or 'none':7s} K={K} sub={sub:2d} {name:15s} "
          f"{ms:7.2f} ms/wave {R/ms/1e3:6.1f} Mrays/s", flush=True)
