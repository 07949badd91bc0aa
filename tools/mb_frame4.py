"""Config-4 frame decomposition: where do the 112 ms go?

Times pt_sample_frame variants back-to-back in one process:
bounces 1-4, compact on/off, tile_primary on/off.
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
from raytracer_tpu.ops.pallas.traverse import make_qnodes
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.render_pt import pt_sample_frame
from raytracer_tpu.utils import procgen

K = 32
parts = [procgen.make_cornell_box(4.0)]
for i in range(8):
    parts.append(procgen.make_cube(0.3) + np.array(
        [(-1.5 + 0.4 * i), -1.6, (-1.2 if i % 2 else 1.2)], np.float32))
parts.append(procgen.make_icosphere(4, radius=0.7))
s = Scene().set_triangles(np.concatenate(parts).astype(np.float32))
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tris = jnp.asarray(s.triangles)
cs, hgt = build_sah2_clustered(tris, leaf_size=K)
wide = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2))
qn = make_qnodes(wide, cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K)

w = h = 512
pos = np.array([0, 0, 0.8], np.float32)
quat = np.array([0, 0, 0, 1], np.float32)
NW = 4

variants = []
for b in (1, 2, 3, 4):
    variants.append((f"b={b} compact tile", dict(bounces=b, compact=True, tile_primary=True)))
variants.append(("b=4 NOcompact tile", dict(bounces=4, compact=False, tile_primary=True)))
variants.append(("b=4 compact raybuf", dict(bounces=4, compact=True, tile_primary=False)))

for name, kw in variants:
    @jax.jit
    def frame_batch(qn_, tris_, wide_, kw=tuple(sorted(kw.items()))):
        kwd = dict(kw)
        def one(carry, i):
            img = pt_sample_frame(wide_, tris_, pos, quat,
                                  jax.random.key(i), w, h,
                                  qnodes=qn_, leaf_k=K, **kwd)
            return carry + jnp.sum(img), 0
        acc, _ = jax.lax.scan(one, jnp.float32(0), jnp.arange(NW))
        return acc

    np.asarray(frame_batch(qn, tris, wide))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(frame_batch(qn, tris, wide))
        reps.append((time.perf_counter() - t0) * 1e3 / NW)
    ms = float(np.median(reps))
    b = kw["bounces"]
    print(f"{name:22s} {ms:7.2f} ms/frame  "
          f"{w*h*b*2/ms/1e3:6.1f} Mrays/s", flush=True)
