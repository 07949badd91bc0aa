"""Interactive-viewer frame rate: PathTracer.render() at 960×540 with a
per-frame host pull (the viewer streams every frame, so the pull is part
of the honest cost), camera moving every frame.

Run on TPU: python tools/mb_viewer_fps.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

from raytracer_tpu import PathTracer, Scene
from raytracer_tpu.pathtracer import fast_build_options
from raytracer_tpu.utils import procgen

builder, leaf = fast_build_options()
pt = PathTracer(width=960, height=540, builder=builder, leaf_size=leaf)
s = Scene().set_triangles(procgen.make_dragon_stand_in())
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
t0 = time.perf_counter()
pt.set_scene(s)
print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

pt.camera_position = [0.0, 0.0, 1.6]
_ = np.asarray(pt.render())  # warm
N = 60
t0 = time.perf_counter()
for i in range(N):
    pt.camera_position = [1e-3 * i, 0.0, 1.6]
    img = np.asarray(pt.render())
dt = (time.perf_counter() - t0) / N
print(f"viewer 960x540: {dt*1e3:.2f} ms/frame  {1/dt:.1f} FPS "
      f"(per-frame host pull included)", flush=True)
