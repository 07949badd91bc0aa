"""Profile the tiles kernel on the dragon-class scene: visits accounting + timing."""
import time, os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import argparse
ap = argparse.ArgumentParser(); ap.add_argument("--builder", default="lbvh"); A = ap.parse_args()
from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.ops.pallas.traverse import TILE, GROUP, make_qnodes, trace_tiles_pallas
from raytracer_tpu.utils import procgen

tris_np = procgen.make_dragon_stand_in()
scene = Scene().set_triangles(tris_np)
scene._normalize_enabled, scene._normalize_mode = True, "cube"
scene.normalize_mesh()
tris = jnp.asarray(scene.triangles)
import time as _t
_tb = _t.perf_counter()
if A.builder == "sah":
    from raytracer_tpu.ops.lbvh import build_sah2
    bvh2, hh = build_sah2(np.asarray(scene.triangles))
    print(f"sah build: {_t.perf_counter()-_tb:.2f}s height {hh}", file=sys.stderr)
    wide = make_wide_bvh(collapse_lbvh2_to_bvh4(bvh2, sweeps=hh+2))
else:
    bvh2 = build_lbvh2(tris)
    wide = make_wide_bvh(collapse_lbvh2_to_bvh4(bvh2))
qn = make_qnodes(wide, tris)
jax.block_until_ready(qn)

W, H = 1920, 1080
pos = np.array([0.0, 0.0, 2.5], np.float32)
quat = np.array([0.0, 0.0, 0.0, 1.0], np.float32)

# --- visits accounting (stats run over the padded grid) ---
blk = TILE * GROUP
PW = -(-W // blk) * blk
PH = -(-H // blk) * blk
nty, ntx = PH // TILE, PW // TILE
outs = trace_tiles_pallas(qn, pos, quat, PW, PH, stats=True)
vis = np.asarray(outs[5])
vtile = vis[::TILE, ::TILE].astype(np.int64)
tot = vtile.sum()
# per-program (2x2 tile block) max
vb = vtile.reshape(nty//GROUP, GROUP, ntx//GROUP, GROUP).transpose(0,2,1,3).reshape(-1, GROUP*GROUP)
pmax = vb.max(axis=1)
print(f"total visits {tot}  mean/tile {vtile.mean():.1f}  max {vtile.max()}")
print(f"sum of per-program max {pmax.sum()}  (= min possible iterations)")
print(f"implied slots = 4*sum(max) = {4*pmax.sum()}")

# --- honest timing of K frames inside one jit ---
K = 8
positions = pos[None, :] + np.stack([np.linspace(0, 1e-3, K), np.zeros(K), np.zeros(K)], 1).astype(np.float32)

@jax.jit
def render_n(qn_, poss):
    def one(p):
        out = trace_tiles_pallas(qn_, p, quat, W, H)
        return jnp.sum(out[4] >= 0)
    return jax.lax.map(one, poss)

np.asarray(render_n(qn, positions))
t0 = time.perf_counter(); np.asarray(render_n(qn, positions)); dt = time.perf_counter() - t0
ms = dt / K * 1e3
print(f"{ms:.2f} ms/frame -> {ms*1e6/tot:.0f} ns/visit  | {1920*1080/ms/1e3:.1f} Mrays/s")
