"""K sweep on the FRAMED (hit-rate-matched) headline framing.

Round 2 tuned leaf_k on the sparse framing (hit rate 0.09) and found K=32.
The round-3 headline is the framed camera (hit rate 0.44) where MT work is
~2x the share — smaller clusters (tighter leaf boxes, fewer MT pairs) may
win there. Back-to-back in ONE process per the A/B discipline.

Run on TPU: python tools/mb_kframed.py [K ...]
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
from raytracer_tpu.ops.cluster import build_sah2_clustered
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.ops.pallas.traverse import make_qnodes, trace_tiles_pallas
from raytracer_tpu.utils import procgen

W, H, FRAMES = 1920, 1080, 8
KS = [int(a) for a in sys.argv[1:]] or [16, 24, 32]

scene = Scene().set_triangles(procgen.make_dragon_stand_in())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
quat = np.array([0, 0, 0, 1], np.float32)


def measure(k, pos0):
    cs, hgt = build_sah2_clustered(tris, leaf_size=k)
    wide = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2))
    qn = make_qnodes(wide, cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=k)
    jax.block_until_ready(qn)

    @jax.jit
    def render_n(qn_, poss):
        def one(p):
            return jnp.sum(
                trace_tiles_pallas(qn_, p, quat, W, H, leaf_k=k)[4] >= 0)
        return jax.lax.map(one, poss)

    poss = pos0[None, :] + np.stack(
        [np.linspace(0, 1e-3, FRAMES), np.zeros(FRAMES), np.zeros(FRAMES)], 1
    ).astype(np.float32)
    np.asarray(render_n(qn, poss))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(render_n(qn, poss))
        reps.append((time.perf_counter() - t0) / FRAMES * 1e3)
    return float(np.median(reps))


for k in KS:
    framed = measure(k, np.array([0, 0, 1.15], np.float32))
    sparse = measure(k, np.array([0, 0, 2.5], np.float32))
    print(f"K={k}: framed {framed:.2f} ms ({W*H/framed/1e3:.1f} Mrays/s)  "
          f"sparse {sparse:.2f} ms ({W*H/sparse/1e3:.1f} Mrays/s)", flush=True)
