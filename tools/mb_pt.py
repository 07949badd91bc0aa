"""Config-4 (interior NEE 4-bounce PT) cost decomposition.

Questions (round 3, verdict #2 — configs 2/4 must reach ~40 Mrays/s):
  a. What do the full-frame variants cost?  (compact × tile_primary)
  b. What does the between-wave compaction (argsort + 6 gathers) cost
     in isolation?
  c. What does one raybuf wave cost at 512² = 262k rays — closest-hit
     coherent (primary-like), closest-hit incoherent (bounce-like),
     any-hit (NEE)?

Run on TPU: python tools/mb_pt.py
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
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_rays_pallas
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.render_pt import pt_sample_frame
from raytracer_tpu.utils import procgen

LEAF_K = int(os.environ.get("RT_SUITE_LEAF", "32"))

# --- config-4 scene (bench_suite.py::config4) ------------------------------
parts = [procgen.make_cornell_box(4.0)]
for i in range(8):
    c = procgen.make_cube(0.3) + np.array(
        [(-1.5 + 0.4 * i), -1.6, (-1.2 if i % 2 else 1.2)], np.float32
    )
    parts.append(c)
parts.append(procgen.make_icosphere(4, radius=0.7))
s = Scene().set_triangles(np.concatenate(parts).astype(np.float32))
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
wide = make_wide_bvh(collapse_lbvh2_to_bvh4(build_lbvh2(tris)))
cs, hgt = build_sah2_clustered(tris, leaf_size=LEAF_K)
wide_c = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2))
qn = make_qnodes(wide_c, cs.tris_sorted, tri_ids=cs.tri_order,
                 leaf_size=LEAF_K)
w = h = 512
R = w * h
pos = np.array([0, 0, 0.8], np.float32)
quat = np.array([0, 0, 0, 1], np.float32)
print(f"scene: {tris.shape[0]} tris  K={LEAF_K}", flush=True)


def timeit(name, fn, *args, reps=3):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        out.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(out))
    print(f"{name:42s} {ms:9.2f} ms", flush=True)
    return ms


# --- a. full-frame variants -------------------------------------------------
NB = 4
for compact in (True, False):
    for tp in (True, False):
        @jax.jit
        def frame_batch(wide_, tris_, qn_, c=compact, t=tp):
            def one(seed):
                return jnp.sum(pt_sample_frame(
                    wide_, tris_, pos, quat, jax.random.key(seed), w, h,
                    bounces=4, qnodes=qn_, compact=c, leaf_k=LEAF_K,
                    tile_primary=t))
            return jax.lax.map(one, jnp.arange(NB))

        ms = timeit(f"frame compact={compact} tile_primary={tp} (x{NB})",
                    frame_batch, wide, tris, qn)
        print(f"    -> {ms/NB:8.2f} ms/frame  "
              f"{R*4*2/(ms/NB)/1e3:6.1f} lane-Mrays/s", flush=True)

# --- b. compaction in isolation --------------------------------------------
key0 = jax.random.key(0)
o0 = jax.random.uniform(key0, (R, 3), minval=-1, maxval=1)
d0 = jax.random.normal(jax.random.key(1), (R, 3))
d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
aux = jax.random.uniform(jax.random.key(2), (R, 7))
NC = 20


@jax.jit
def compaction_batch(o, d, aux_):
    from raytracer_tpu.ops.morton import morton3d

    def one(carry, _):
        o_, d_, a_ = carry
        q = jnp.clip((o_ + 2.0) * (1023.0 / 4.0), 0.0, 1023.0).astype(jnp.uint32)
        m = morton3d(q[:, 0], q[:, 1], q[:, 2])
        octant = ((d_[:, 0] < 0).astype(jnp.uint32) * 4
                  + (d_[:, 1] < 0).astype(jnp.uint32) * 2
                  + (d_[:, 2] < 0).astype(jnp.uint32))
        kkey = (octant << jnp.uint32(28)) | (m >> jnp.uint32(2))
        perm = jnp.argsort(kkey)
        return (o_[perm], d_[perm], a_[perm]), jnp.float32(0)

    (o_, d_, a_), _ = jax.lax.scan(one, (o, d, aux_), None, length=NC)
    return jnp.sum(o_) + jnp.sum(a_)


ms = timeit(f"compaction argsort+gathers (x{NC})", compaction_batch, o0, d0, aux)
print(f"    -> {ms/NC:8.2f} ms/wave", flush=True)

# --- c. isolated raybuf waves ----------------------------------------------
oc, dc = generate_rays(w, h, pos, quat, 70.0)
oc, dc = oc.reshape(R, 3), dc.reshape(R, 3)
perm = jax.random.permutation(jax.random.key(3), R)
oi, di = oc[perm], dc[perm]
NW = 8


def wave_batch(any_hit):
    @jax.jit
    def f(qn_, o, d):
        def one(carry, _):
            o_, d_ = carry
            t, nx, ny, nz, tri = trace_rays_pallas(
                qn_, o_, d_, any_hit=any_hit, leaf_k=LEAF_K)
            # data-dependent chain: nudge origins by a hit-dependent epsilon
            o2 = o_ + 1e-7 * t[:, None].astype(jnp.float32) * 0
            return (o2, d_), jnp.sum(tri)
        _, ts = jax.lax.scan(one, (o, d), None, length=NW)
        return jnp.sum(ts)
    return f


for name, o_, d_ in (("coherent primary", oc, dc), ("incoherent", oi, di)):
    ms = timeit(f"closest-hit wave {name} (x{NW})", wave_batch(False), qn, o_, d_)
    print(f"    -> {ms/NW:8.2f} ms/wave  {R/(ms/NW)/1e3:6.1f} Mrays/s", flush=True)

# NEE-like: origins at first-hit surface, common sun direction
t0_, nx_, ny_, nz_, tri0 = trace_rays_pallas(qn, oc, dc, leaf_k=LEAF_K)
hitm = (tri0 >= 0)
tcl = jnp.where(hitm, t0_, 0.5)
p_surface = oc + dc * tcl[:, None] + 1e-4 * jnp.stack([nx_, ny_, nz_], -1)
sun = jnp.broadcast_to(jnp.array([0.5, 0.78, 0.37], jnp.float32),
                       p_surface.shape)
ms = timeit(f"any-hit NEE wave (x{NW})", wave_batch(True), qn, p_surface, sun)
print(f"    -> {ms/NW:8.2f} ms/wave  {R/(ms/NW)/1e3:6.1f} Mrays/s", flush=True)
ms = timeit(f"closest-hit wave surface->sun (x{NW})", wave_batch(False), qn,
            p_surface, sun)
print(f"    -> {ms/NW:8.2f} ms/wave  {R/(ms/NW)/1e3:6.1f} Mrays/s", flush=True)
