"""Live-viewer throughput: end-to-end render-loop FPS at 960×540 (verdict
r3 #10 — done = ≥15 FPS despite the ~130 ms full-frame tunnel pull).

Drives ViewerState.step directly (camera update → TPU render → device pull
→ PNG encode — everything the browser loop pays except the HTTP hop, which
overlaps via the polling <img>). Synthetic mouse input keeps the loop in
ACTIVE mode so frames stream at the adaptive scale; the idle full-res
publish is timed separately. Run on TPU:
  python tools/mb_viewer_fps.py [stream_scale]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 2

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer_tpu.models.camera import FPSCamera
from raytracer_tpu.models.scene import Scene
from raytracer_tpu.pathtracer import PathTracer, fast_build_options
from raytracer_tpu.server.viewer import ViewerState
from raytracer_tpu.utils import procgen

W, H = 960, 540
builder, leaf = fast_build_options()
tracer = PathTracer(width=W, height=H, builder=builder, leaf_size=leaf)
s = Scene().set_triangles(procgen.make_dragon_solid())
s._normalize_enabled, s._normalize_mode = True, "cube"
s.normalize_mesh()
tracer.set_scene(s)
state = ViewerState(tracer, FPSCamera(position=[0.0, 0.0, 1.3]),
                    stream_scale=SCALE)

# warm both paths (kernel compile / AOT load + downscale jit)
state.apply_input({"dx": 1.0})
state.step(1 / 30)
state._last_input = 0.0
state.step(1 / 30)           # idle → full-res publish

N = 60
t0 = time.perf_counter()
for i in range(N):
    state.apply_input({"dx": 2.0, "dy": 1.0})   # keep ACTIVE
    state.step(1 / 30)
active_ms = (time.perf_counter() - t0) * 1e3 / N
print(f"active (scale {SCALE}): {active_ms:6.1f} ms/frame  "
      f"{1e3/active_ms:5.1f} FPS  png={len(state.frame_png)/1024:.0f} KB")

# idle: one full-res frame then parked
state._last_input = 0.0
state._idle_published = False
t0 = time.perf_counter()
state.step(1 / 30)
full_ms = (time.perf_counter() - t0) * 1e3
print(f"idle full-res publish: {full_ms:6.1f} ms  "
      f"png={len(state.frame_png)/1024:.0f} KB")
assert state.step(1 / 30) is False, "idle loop should park"
print("parked after idle publish: OK")
