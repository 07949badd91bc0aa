"""Config-4 (interior NEE 4-bounce) marginal-cost decomposition.

Config 4 sits at ~21 Mrays/s vs the 40 target (verdict r3 #1); the modeled
wave costs (mb_sub) + compaction only add to ~65 of the measured ~96 ms.
This times pt_sample_frame at bounces=1..4 and compact on/off IN ONE
PROCESS so the marginal cost of each bounce (trace + NEE + compact + glue)
is pinned, and the unexplained glue becomes visible.

Run on TPU: python tools/mb_pt4.py
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
from raytracer_tpu.ops.cluster import build_sah2_clustered
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.pallas.traverse import make_qnodes
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.render_pt import pt_sample_frame
from raytracer_tpu.utils import procgen

K = 32
W = H = 512
NB = 8

# config 4's interior hall, verbatim (bench_suite.py::config4)
parts = [procgen.make_cornell_box(4.0)]
for i in range(8):
    c = procgen.make_cube(0.3) + np.array(
        [(-1.5 + 0.4 * i), -1.6, (-1.2 if i % 2 else 1.2)], np.float32)
    parts.append(c)
parts.append(procgen.make_icosphere(4, radius=0.7))
s = Scene().set_triangles(np.concatenate(parts).astype(np.float32))
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
wide = make_wide_bvh(collapse_lbvh2_to_bvh4(build_lbvh2(tris)))
cs, hgt = build_sah2_clustered(tris, leaf_size=K)
qn = make_qnodes(make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2)),
                 cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)
jax.block_until_ready(qn)
pos = jnp.array([0, 0, 0.8], jnp.float32)
quat = jnp.array([0, 0, 0, 1], jnp.float32)


def timed(name, bounces, compact):
    @jax.jit
    def run(qn_, seeds):
        def one(carry, i):
            img = pt_sample_frame(wide, tris, pos, quat, jax.random.key(i),
                                  W, H, bounces=bounces, qnodes=qn_,
                                  compact=compact, leaf_k=K, tile_primary=True)
            return carry + jnp.sum(img), 0
        c, _ = jax.lax.scan(one, jnp.float32(0), seeds)
        return c

    seeds = jnp.arange(NB, dtype=jnp.int32)
    ref = float(np.asarray(run(qn, seeds)))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(qn, seeds))
        reps.append((time.perf_counter() - t0) * 1e3 / NB)
    ms = float(np.median(reps))
    print(f"{name:28s} {ms:7.2f} ms/frame  (ref {ref:.5g})", flush=True)
    return ms


prev = 0.0
for b in (1, 2, 3, 4):
    ms = timed(f"bounces={b} compact", b, True)
    if b > 1:
        print(f"    marginal bounce {b}: {ms - prev:.2f} ms", flush=True)
    prev = ms
timed("bounces=4 NO compact", 4, False)
timed("bounces=4 compact (again)", 4, True)
