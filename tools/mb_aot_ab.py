"""Same program fresh-jit vs AOT-export-loaded, one process: does the
export path cost throughput? (bench.py saw 23.5 ms where the fresh-jit
K-sweep saw 17.7 ms for the same config.)

Run on TPU: python tools/mb_aot_ab.py
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
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_tiles_pallas
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.utils import procgen

K = 32
W, H, NF = 1920, 1080, 8
scene = Scene().set_triangles(procgen.make_dragon_stand_in())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)

cs, hgt = build_sah2_clustered(tris, leaf_size=K)
# qnodes both ways: fused export vs direct — also check they're identical
qn_exp = records_pipeline(cs, height=hgt)
wide_c = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2))
qn_jit = make_qnodes(wide_c, cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)
print("qnodes identical:", bool(jnp.array_equal(qn_exp, qn_jit)), flush=True)

quat = np.array([0, 0, 0, 1], np.float32)


def make_render_n():
    def render_n(qn_, poss):
        def one(pos):
            return jnp.sum(
                trace_tiles_pallas(qn_, pos, quat, W, H, leaf_k=K)[4] >= 0)
        return jax.lax.map(one, poss)
    return render_n


call_exp = cached_export(
    f"mb_render_n_{W}x{H}_k{K}_f{NF}", make_render_n,
    (jax.ShapeDtypeStruct(qn_exp.shape, qn_exp.dtype),
     jax.ShapeDtypeStruct((NF, 3), jnp.float32)),
)
call_jit = jax.jit(make_render_n())


def bench(label, fn, qn):
    for z, tag in ((2.5, "sparse"), (1.15, "framed")):
        poss = jnp.asarray(
            np.array([[1e-3 * i, 0, z] for i in range(NF)], np.float32))
        np.asarray(fn(qn, poss))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(qn, poss))
            reps.append((time.perf_counter() - t0) / NF * 1e3)
        ms = float(np.median(reps))
        print(f"{label:22s} {tag:6s} {ms:6.2f} ms  {W*H/ms/1e3:6.1f} Mrays/s",
              flush=True)


# interleave to cancel drift
bench("fresh-jit", lambda q, p: call_jit(q, p), qn_jit)
bench("aot-export", lambda q, p: call_exp(q, p), qn_exp)
bench("fresh-jit (again)", lambda q, p: call_jit(q, p), qn_jit)
bench("aot-export (again)", lambda q, p: call_exp(q, p), qn_exp)
bench("aot-export qn_jit", lambda q, p: call_exp(q, p), qn_jit)
