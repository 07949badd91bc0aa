"""Live interactive viewer app — fly the scene from a browser against the
TPU renderer (the reference's src/main.js interactive loop, completed for
the headless framework; SURVEY.md §3.3 / round-1 verdict missing #2).

    python apps/viewer.py [--scene PATH.glb | --procgen dragon|sphere]
                          [--width W] [--height H] [--port 3000]

Then open http://localhost:3000/, click the image for pointer lock, and use
WASD/QE (+Shift sprint, F fly-toggle) exactly like the reference.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None, help="GLB/GLTF path")
    ap.add_argument("--procgen", default="sphere",
                    choices=["sphere", "dragon", "cornell"])
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--port", type=int, default=3000)
    ap.add_argument("--builder", default="auto",
                    choices=["auto", "lbvh", "ploc", "sah"],
                    help="auto = fastest available (SAH K=32 clusters on TPU)")
    ap.add_argument("--leaf", type=int, default=None,
                    help="triangles per BVH leaf (default: auto per backend)")
    ap.add_argument("--stream-scale", type=int, default=2,
                    help="downscale factor for frames streamed while the "
                         "camera is moving (1 = always full resolution); "
                         "idle frames are always full-res")
    args = ap.parse_args(argv)

    from raytracer_tpu.models.camera import FPSCamera
    from raytracer_tpu.models.scene import Scene
    from raytracer_tpu.pathtracer import PathTracer, fast_build_options
    from raytracer_tpu.server.viewer import run_viewer
    from raytracer_tpu.utils import procgen

    builder, leaf = fast_build_options()
    if args.builder != "auto":
        builder, leaf = args.builder, 1
    if args.leaf is not None:
        leaf = args.leaf
    tracer = PathTracer(width=args.width, height=args.height,
                        builder=builder, leaf_size=leaf)
    if args.scene:
        scene = Scene().load_glb(args.scene, normalize=True, mode="cube")
    else:
        tris = {
            "sphere": lambda: procgen.make_icosphere(4),
            "dragon": procgen.make_dragon_stand_in,
            "cornell": lambda: procgen.make_cornell_box(4.0),
        }[args.procgen]()
        scene = Scene().set_triangles(np.asarray(tris, np.float32))
        scene._normalize_enabled, scene._normalize_mode = True, "cube"
        scene.normalize_mesh()
    tracer.set_scene(scene)

    camera = FPSCamera(position=[0.0, 0.0, 2.5])
    run_viewer(tracer, camera, port=args.port,
               stream_scale=args.stream_scale)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
