"""Config-1 knob sweep: per-frame cost at 256² cornell under TILE/NS.

Config 1 sits at ~0.86 ms/frame (76 Mrays/s, 1.02×) with ~64 tiles/frame
on 4 streams; visits are cheap (tiny tree) so the residual is per-tile
fixed cost (raygen, finish_tile staging, queue pop) and per-call glue.
TILE and RT_STREAMS are import-time constants, so each setting runs in a
fresh process:

  for t in 32 16; do for s in 4 8; do RT_TILE=$t RT_STREAMS=$s \
      python tools/mb_cfg1.py; done; done
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
from raytracer_tpu.ops.collapse import bvh2_as_bvh4
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.pallas.traverse import (
    NS,
    TILE,
    make_qnodes,
    trace_tiles_batch_pallas,
)
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.utils import procgen

W = H = 256
NB = 64

scene = Scene().set_triangles(procgen.make_cornell_box())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
wide = make_wide_bvh(bvh2_as_bvh4(build_lbvh2(tris)))
qn = make_qnodes(wide, tris)
quat = np.array([0, 0, 0, 1], np.float32)
poss = jnp.asarray(
    np.array([[1e-3 * i, 0, 2.2] for i in range(NB)], np.float32))
quats = jnp.broadcast_to(jnp.asarray(quat), (NB, 4))


@jax.jit
def render_n(qn_, poss_):
    out = trace_tiles_batch_pallas(qn_, poss_, quats, W, H, raw=True)
    return jnp.sum(out[:, :, 4] >= 0, axis=(1, 2, 3))


@jax.jit
def render_stats(qn_, poss_):
    out = trace_tiles_batch_pallas(qn_, poss_, quats, W, H, raw=True)
    # visits plane: one value per tile (plane 5, any lane)
    return jnp.sum(out[:, :, 5, 0, 0], axis=1)


hits = np.asarray(render_n(qn, poss))
visits = np.asarray(render_stats(qn, poss))
reps = []
for _ in range(5):
    t0 = time.perf_counter()
    np.asarray(render_n(qn, poss))
    reps.append((time.perf_counter() - t0) / NB * 1e3)
ms = float(np.median(reps))
print(f"TILE={TILE} NS={NS}: {ms:.3f} ms/frame ({W*H/ms/1e3:.1f} Mrays/s)  "
      f"visits/frame {visits[0]:.0f} (tiles {(W//TILE)*(H//TILE)}), "
      f"hit_rate {hits[0]/(W*H):.3f}", flush=True)
