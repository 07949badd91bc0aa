"""Headline per-visit cost decomposition via RT_ABLATE, one variant per run.

The tile kernel's consume loop is scalar-issue-bound; this sizes what each
component of the ~330 ns/visit actually costs ON THE HEADLINE workload
(dragon-class 871k, 1080p, framed + sparse cameras) by ablating it:

  (none)    full kernel — the baseline
  nosort    keep ordering key + cull, skip the 4-way sorting network
  noreduce  skip the slot-hit lane reductions (MT/push ungated by slab)
  nomt      skip leaf MT entirely (image wrong; times the tree skeleton)
  noslab    skip the slab test (image wrong; visits explode — sanity only)

Timing-only for nomt/noslab (they change visits/hits); nosort is exact.
Run on TPU, one process per variant:
  for a in "" nosort noreduce nomt; do RT_ABLATE=$a python tools/mb_ablate_headline.py; done
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
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_tiles_pallas
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.utils import procgen

W, H, FRAMES, K = 1920, 1080, 16, 32
ABL = os.environ.get("RT_ABLATE", "(none)") or "(none)"

scene = Scene().set_triangles(procgen.make_dragon_stand_in())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
quat = np.array([0, 0, 0, 1], np.float32)

cs, hgt = build_sah2_clustered(tris, leaf_size=K)
wide = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2))
qn = make_qnodes(wide, cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)
jax.block_until_ready(qn)


@jax.jit
def render_n(qn_, poss):
    def one(p):
        out = trace_tiles_pallas(qn_, p, quat, W, H, leaf_k=K, stats=True)
        return jnp.sum(out[4] >= 0), jnp.sum(out[5][::32, ::32])
    return jax.lax.map(one, poss)


def measure(pos0):
    poss = pos0[None, :] + np.stack(
        [np.linspace(0, 1e-3, FRAMES), np.zeros(FRAMES), np.zeros(FRAMES)], 1
    ).astype(np.float32)
    hits, visits = render_n(qn, poss)
    hits = int(np.asarray(hits)[0])
    visits = int(np.asarray(visits)[0])
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(render_n(qn, poss)[0])
        reps.append((time.perf_counter() - t0) / FRAMES * 1e3)
    ms = float(np.median(reps))
    return ms, hits / (W * H), visits


for name, pos in (("framed", [0, 0, 1.15]), ("sparse", [0, 0, 2.5])):
    ms, hr, vis = measure(np.array(pos, np.float32))
    print(f"ablate={ABL:9s} {name}: {ms:6.2f} ms  {W*H/ms/1e3:6.1f} Mrays/s  "
          f"hit {hr:.3f}  visits/frame {vis}", flush=True)
