"""A/B: lax.map of per-frame tile-kernel calls vs ONE batch-queue call.

The headline bench batches F frames per exported call with lax.map over
trace_tiles_pallas — each iteration still launches the Pallas kernel (its
own prologue + 4-stream tail drain over a 2040-tile queue).
trace_tiles_batch_pallas renders all F frames from one F·2040-tile queue:
streams flow across frame boundaries, paying ONE prologue/drain. Sizes the
per-launch overhead at 1080p. Run on TPU:
  python tools/mb_batchframes.py [frames]
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
from raytracer_tpu.ops.pallas.traverse import (make_qnodes, trace_tiles_pallas,
                                               trace_tiles_batch_pallas)
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.utils import procgen

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = 32
W, H = 1920, 1080
R = W * H

s = Scene().set_triangles(procgen.make_dragon_solid())
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
cs, hgt = build_sah2_clustered(tris, leaf_size=K)
qn = make_qnodes(make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2)),
                 cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)
quat = jnp.array([0, 0, 0, 1], jnp.float32)


def timeit(name, fn, *args):
    ref = np.asarray(fn(*args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        reps.append((time.perf_counter() - t0) * 1e3 / NB)
    ms = float(np.median(reps))
    print(f"{name:24s} {ms:7.2f} ms/frame  {R/ms/1e3:6.1f} Mrays/s  "
          f"sum={int(ref)}", flush=True)


for tag, z in (("sparse", 2.5), ("framed", 1.15)):
    poss = (jnp.array([0.0, 0.0, z], jnp.float32)[None, :]
            + jnp.linspace(0, 1e-3, NB)[:, None]
            * jnp.array([1.0, 0, 0], jnp.float32))
    quats = jnp.broadcast_to(quat, (NB, 4))

    @jax.jit
    def map_frames(qn_, poss_):
        return jnp.sum(jax.lax.map(
            lambda p: jnp.sum(trace_tiles_pallas(qn_, p, quat, W, H,
                                                 leaf_k=K)[4] >= 0), poss_))

    @jax.jit
    def batch_frames(qn_, poss_, quats_):
        # 1080p is not TILE-aligned, so no raw layout — the plane transpose
        # is paid by BOTH variants (trace_tiles_pallas transposes per frame)
        out = trace_tiles_batch_pallas(qn_, poss_, quats_, W, H, leaf_k=K)
        return jnp.sum(out[4] >= 0)

    timeit(f"{tag} lax.map x{NB}", map_frames, qn, poss)
    timeit(f"{tag} batch-queue x{NB}", batch_frames, qn, poss, quats)
    timeit(f"{tag} lax.map again", map_frames, qn, poss)
