"""Framed-camera sweep on the solid dragon stand-in: hit rate vs ms/frame.

Run on TPU: python tools/mb_framed_cam.py
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
from raytracer_tpu.ops.cluster import build_sah2_clustered, records_pipeline
from raytracer_tpu.ops.pallas.aot import cached_export
from raytracer_tpu.ops.pallas.traverse import trace_tiles_pallas
from raytracer_tpu.utils import procgen

K = 32
W, H = 1920, 1080
scene = Scene().set_triangles(procgen.make_dragon_stand_in())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
cs, hgt = build_sah2_clustered(tris, leaf_size=K)
qn = records_pipeline(cs, height=hgt)
quat = np.array([0, 0, 0, 1], np.float32)
NF = 8


def make_render_n():
    def render_n(qn_, poss):
        def one(pos):
            return jnp.sum(
                trace_tiles_pallas(qn_, pos, quat, W, H, leaf_k=K)[4] >= 0)
        return jax.lax.map(one, poss)
    return render_n


call = cached_export(
    f"mb_render_n_{W}x{H}_k{K}_f{NF}", make_render_n,
    (jax.ShapeDtypeStruct(qn.shape, qn.dtype),
     jax.ShapeDtypeStruct((NF, 3), jnp.float32)),
)

for z in (1.15, 1.0, 0.9, 0.8, 0.72):
    poss = np.array([[1e-3 * i, 0, z] for i in range(NF)], np.float32)
    hits = np.asarray(call(qn, jnp.asarray(poss)))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        hits = np.asarray(call(qn, jnp.asarray(poss)))
        reps.append((time.perf_counter() - t0) / NF * 1e3)
    ms = float(np.median(reps))
    hr = float(np.ravel(hits)[0]) / (W * H)
    print(f"z={z:5.2f}  hit {hr:5.3f}  {ms:6.2f} ms  "
          f"{W*H/ms/1e3:6.1f} Mrays/s", flush=True)
