"""Cold-start breakdown: where do the ~35 s of a fresh process go?

Run TWICE on TPU (first populates caches): python tools/mb_cold.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

T0 = time.perf_counter()


def mark(name):
    print(f"{name:36s} {time.perf_counter() - T0:7.2f}s", flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
mark("imports")

_ = jax.devices()
mark("jax.devices (relay init)")

from raytracer_tpu.models.scene import Scene  # noqa: E402
from raytracer_tpu.utils import procgen  # noqa: E402

tris_np = procgen.make_dragon_stand_in()
mark("procgen 871k")

scene = Scene().set_triangles(tris_np)
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
mark("normalize")

tris = jnp.asarray(scene.triangles)
jax.block_until_ready(tris)
mark("upload 31 MB")

from raytracer_tpu.ops.cluster import build_sah2_clustered, records_pipeline  # noqa: E402

cs, hgt = build_sah2_clustered(tris, leaf_size=32)
jax.block_until_ready(cs.tris_sorted)
mark("native SAH + sorted gather")

qn = records_pipeline(cs, height=hgt)
jax.block_until_ready(qn)
mark("records_pipeline (export)")

from raytracer_tpu.ops.pallas.aot import cached_export  # noqa: E402
from raytracer_tpu.ops.pallas.traverse import trace_tiles_pallas  # noqa: E402

W, H, NF = 1920, 1080, 8
quat = np.array([0, 0, 0, 1], np.float32)


def make_render_n():
    def render_n(qn_, poss):
        def one(pos):
            return jnp.sum(
                trace_tiles_pallas(qn_, pos, quat, W, H, leaf_k=32)[4] >= 0)
        return jax.lax.map(one, poss)
    return render_n


call = cached_export(
    f"mb_render_n_{W}x{H}_k32_f{NF}", make_render_n,
    (jax.ShapeDtypeStruct(qn.shape, qn.dtype),
     jax.ShapeDtypeStruct((NF, 3), jnp.float32)),
)
mark("render export load")

poss = np.array([[1e-3 * i, 0, 2.5] for i in range(NF)], np.float32)
np.asarray(call(qn, jnp.asarray(poss)))
mark("first frame batch")
