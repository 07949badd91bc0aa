"""Ablation sweep: where does the per-visit time go on dragon 1080p?

Runs the SAME config repeatedly with RT_ABLATE variants by re-importing the
kernel module per setting (the ablation flag is baked at import). Each child
process prints one line; the parent collects them.

Usage: python tools/mb_ablate.py [K]
"""
import os
import subprocess
import sys

K = sys.argv[1] if len(sys.argv) > 1 else "4"

CHILD = r"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.cluster import build_lbvh2_clustered
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.ops.pallas.traverse import TILE, make_qnodes, trace_tiles_pallas
from raytracer_tpu.utils import procgen

W, H = 1920, 1080
k = int(sys.argv[1])
scene = Scene().set_triangles(procgen.make_dragon_stand_in())
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
if k == 1:
    wide = make_wide_bvh(collapse_lbvh2_to_bvh4(build_lbvh2(tris)))
    qn = make_qnodes(wide, tris)
else:
    cs = build_lbvh2_clustered(tris, leaf_size=k)
    wide = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2))
    qn = make_qnodes(wide, cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=k)
jax.block_until_ready(qn)
pos0 = np.array([0.0, 0.0, 2.5], np.float32)
quat = np.array([0.0, 0.0, 0.0, 1.0], np.float32)

out = trace_tiles_pallas(qn, pos0, quat, W, H, stats=True, leaf_k=k)
vis = np.asarray(out[5])
visits = int(vis[::TILE, ::TILE].astype(np.int64).sum())

@jax.jit
def render_n(qn_, poss):
    def one(p):
        o = trace_tiles_pallas(qn_, p, quat, W, H, leaf_k=k)
        return jnp.sum(o[4] >= 0)
    return jax.lax.map(one, poss)

nf = 8
poss = pos0[None] + np.stack([np.linspace(0, 1e-3, nf), np.zeros(nf), np.zeros(nf)], 1).astype(np.float32)
np.asarray(render_n(qn, poss))
t0 = time.perf_counter()
np.asarray(render_n(qn, poss))
ms = (time.perf_counter() - t0) / nf * 1e3
print(f"ABLATE={os.environ.get('RT_ABLATE','')!r} K={k} visits={visits} "
      f"{ms:.2f} ms/frame ({ms*1e6/max(visits,1):.0f} ns/visit)", flush=True)
"""

for ablate in ["", "nomt", "nosort", "noreduce", "nomt,nosort,noreduce,noslab"]:
    env = dict(os.environ, RT_ABLATE=ablate)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, K], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABLATE"):
            print(line, flush=True)
    if r.returncode != 0:
        print(f"ABLATE={ablate!r} FAILED:\n{r.stderr[-2000:]}", flush=True)
