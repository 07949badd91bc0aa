"""Config-1 per-call overhead attribution (verdict r4 next #6).

The 256² Cornell config renders F frames per exported call off one shared
tile queue; the timed number is (relay per-call boundary C + F·device rate
r)/F. Sweeping F and solving the linear model separates residual per-frame
glue (r) from non-TPU call overhead (C). Run on TPU:
  python tools/mb_c1_batch.py [F ...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.collapse import bvh2_as_bvh4
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.pallas.aot import cached_export
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_tiles_batch_pallas
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.utils import procgen

s = Scene().set_triangles(procgen.make_cornell_box())
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
wide = make_wide_bvh(bvh2_as_bvh4(build_lbvh2(tris)))
qn = make_qnodes(wide, tris)
w = h = 256
quat = np.array([0, 0, 0, 1], np.float32)

batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
pts = []
for F in batches:
    def make_render_n(F=F):
        def render_n(qn_, poss_):
            quats = jnp.broadcast_to(jnp.asarray(quat), (F, 4))
            out = trace_tiles_batch_pallas(qn_, poss_, quats, w, h, raw=True)
            return jnp.sum(out[:, :, 4] >= 0, axis=(1, 2, 3))
        return render_n

    call = cached_export(
        f"suite1_{w}x{h}_f{F}", make_render_n,
        (jax.ShapeDtypeStruct(qn.shape, qn.dtype),
         jax.ShapeDtypeStruct((F, 3), jnp.float32)),
    )
    poss = np.array([[1e-3 * i, 0, 2.2] for i in range(F)], np.float32)
    np.asarray(call(qn, jnp.asarray(poss)))     # warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(call(qn, jnp.asarray(poss)))
        reps.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(reps))
    pts.append((F, med))
    print(f"F={F:4d}: call {med:7.2f} ms  {med / F:6.3f} ms/frame  "
          f"{w * h / (med / F) / 1e3:6.1f} Mrays/s  "
          f"(reps {[f'{r:.1f}' for r in reps]})")

if len(pts) >= 2:
    (f0, t0), (f1, t1) = pts[0], pts[-1]
    r = (t1 - t0) / (f1 - f0)
    C = t0 - f0 * r
    print(f"linear model: device rate r = {r:.3f} ms/frame, "
          f"per-call overhead C = {C:.1f} ms "
          f"-> device-only {w * h / r / 1e3:.1f} Mrays/s")
