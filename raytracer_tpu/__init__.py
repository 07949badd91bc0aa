"""raytracer_tpu — a TPU-native (JAX/XLA/Pallas) path-tracing framework.

From-scratch reimplementation of the capabilities of the WebGPU reference
``31415Hacker/RayTracer-public`` (see SURVEY.md for the blueprint), designed
TPU-first: the whole build+render pipeline is jitted device code, the hot
traversal is a Pallas supernode kernel, and multi-chip scaling rides
``jax.sharding`` over image tiles.

Public surface:
  PathTracer      — orchestrator (initialize / set_scene / render / camera)
  Scene           — GLB ingest + normalization
  FPSCamera       — WASD/mouse camera controller
"""

from .models.camera import FPSCamera
from .models.scene import Scene
from .pathtracer import PathTracer

__version__ = "0.1.0"

__all__ = ["PathTracer", "Scene", "FPSCamera", "__version__"]
