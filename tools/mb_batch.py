"""Locate the per-call fixed cost: frame batch size N vs ms/frame.

Hypothesis (round 3): one jitted render_n call pays ~25 ms of relay
round-trip regardless of N, so ms/frame = device_ms + RTT/N. If true,
config 1 (256², ~1 ms device) is relay-dominated at N=8 and the fix is a
bigger on-device batch, not a faster kernel.

Run on TPU: python tools/mb_batch.py
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
from raytracer_tpu.ops.collapse import bvh2_as_bvh4
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_tiles_pallas
from raytracer_tpu.utils import procgen

s = Scene().set_triangles(procgen.make_cornell_box())
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
wide = make_wide_bvh(bvh2_as_bvh4(build_lbvh2(tris)))
qn = make_qnodes(wide, tris)
w = h = 256
quat = np.array([0, 0, 0, 1], np.float32)

for n in (4, 8, 16, 64, 128):
    @jax.jit
    def render_n(qn_, poss):
        def one(p):
            return jnp.sum(trace_tiles_pallas(qn_, p, quat, w, h)[4] >= 0)
        return jax.lax.map(one, poss)

    poss = np.array([[1e-3 * i, 0, 2.2] for i in range(n)], np.float32)
    np.asarray(render_n(qn, poss))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(render_n(qn, poss))
        reps.append((time.perf_counter() - t0) * 1e3)
    total = float(np.median(reps))
    print(f"N={n:4d}: {total:8.2f} ms total  {total/n:6.3f} ms/frame  "
          f"{w*h*n/total/1e3:6.1f} Mrays/s", flush=True)
