"""Where does the 9.5 ms/wave floor of the interior (config-4) scene go?

Spawns one child per (ray set × ablation): the RT_ABLATE flag is baked into
the kernel at import. Ray sets model the frame's waves:
  primary  — camera rays in tile-block order (what pt_sample_frame feeds)
  nee      — surface hit points → sun, tile-block order, any_hit
  bounce   — cosine-scattered directions at surface points (incoherent
             dirs, coherent origins) — the post-compaction reality

Usage (TPU): python tools/mb_wave4.py
"""
import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.camera import generate_rays
from raytracer_tpu.ops.cluster import build_sah2_clustered
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_rays_pallas
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.render_pt import _tile_order, _cosine_sample
from raytracer_tpu.utils import procgen

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

w = h = 512
R = w * h
perm = jnp.asarray(_tile_order(w, h))
o, d = generate_rays(w, h, (0, 0, 0.8), (0, 0, 0, 1), 70.0)
o, d = o.reshape(R, 3)[perm], d.reshape(R, 3)[perm]

which = sys.argv[1]
any_hit = False
if which != "primary":
    t0_, nx_, ny_, nz_, tri0 = trace_rays_pallas(qn, o, d, leaf_k=K)
    n = jnp.stack([nx_, ny_, nz_], -1)
    tcl = jnp.where(tri0 >= 0, t0_, 0.5)
    p = o + d * tcl[:, None] + 1e-4 * n
    if which == "nee":
        o = p
        d = jnp.broadcast_to(
            jnp.array([0.48507125, 0.7276069, 0.48507125], jnp.float32), p.shape)
        any_hit = True
    else:  # bounce
        u1 = jax.random.uniform(jax.random.key(5), (R,))
        u2 = jax.random.uniform(jax.random.key(6), (R,))
        nn = jnp.where(tri0[:, None] >= 0, n, jnp.array([0., 0., 1.]))
        o = p
        d = _cosine_sample(nn, u1, u2)

NW = 8

@jax.jit
def wave_batch(qn_, o_, d_):
    def one(carry, _):
        oo, dd = carry
        t, nx, ny, nz, tri = trace_rays_pallas(qn_, oo, dd,
                                               any_hit=any_hit, leaf_k=K)
        return (oo + 0.0 * t[:, None], dd), jnp.sum(tri)
    _, ts = jax.lax.scan(one, (o_, d_), None, length=NW)
    return jnp.sum(ts)

np.asarray(wave_batch(qn, o, d))
reps = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(wave_batch(qn, o, d))
    reps.append((time.perf_counter() - t0) * 1e3 / NW)
ab = os.environ.get("RT_ABLATE", "-")
print(f"{which:8s} ablate={ab:9s} {float(np.median(reps)):7.2f} ms/wave "
      f"{R/float(np.median(reps))/1e3:6.1f} Mrays/s", flush=True)
"""

env0 = dict(os.environ)
env0.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
for which in ("primary", "nee", "bounce"):
    for ablate in ("", "nomt", "noslab,nomt"):
        env = dict(env0)
        if ablate:
            env["RT_ABLATE"] = ablate
        else:
            env.pop("RT_ABLATE", None)
        r = subprocess.run([sys.executable, "-c", CHILD, which], env=env,
                           capture_output=True, text=True, timeout=900)
        out = [l for l in r.stdout.splitlines() if "ms/wave" in l]
        err = [l for l in r.stderr.splitlines()
               if "Error" in l or "error" in l][-2:]
        print(out[0] if out else f"{which} ablate={ablate}: FAILED {err}",
              flush=True)
