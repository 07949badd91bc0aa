"""Packet-visit census for config-4 waves (host-side simulation).

Simulates the ray-buffer kernel's per-stream packet traversal in NumPy:
a stream visits a node iff ANY of its lanes passes the slab test (the
block-shared-stack bet), INCLUDING the per-lane best-t cull
(`tmin < best` with best shrinking as leaf MTs accept — traverse.py:313)
and the near-first child ordering, applied to both the tree walk and the
flat sweep so the comparison is unbiased (ADVICE r3). Semantics are close
to the kernel's but not bit-exact (scalar cull metric approximated by
mean-direction ordering). Reports, per wave type and stream width:

  * tree visits/stream (what the kernel pays today)
  * leaf slots MT'd under the tree vs under a flat leaf-only sweep
  * the sweep's record count (all leaves packed 4/record, no internals)

This decides whether a stackless leaf-sweep kernel (no push/sort/pop,
perfectly pipelined sequential DMA) can beat tree traversal for divergent
interior waves (PERF.md round-3 roadmap #1).
"""
import sys

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.camera import generate_rays
from raytracer_tpu.ops.cluster import build_sah2_clustered
from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
from raytracer_tpu.ops.pallas.traverse import make_qnodes, rec_layout
from raytracer_tpu.ops.trace import make_wide_bvh
from raytracer_tpu.render_pt import _cosine_sample, _tile_order
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
qn = np.asarray(make_qnodes(
    make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2)),
    cs.tris_sorted, tri_ids=cs.tri_order, leaf_size=K))
M = qn.shape[0]
qn = qn.reshape(M, -1)
vbase, ibase, recw = rec_layout(K)

boxes = qn[:, :24].reshape(M, 4, 6)          # per-slot AABB
refs = qn[:, 24:28]                           # child encodings
EMPTY = -float(1 << 28)
is_leaf = (refs < 0) & (refs > EMPTY)
is_int = refs >= 0
n_leaf_slots = int(is_leaf.sum())
print(f"tree: M={M} records, {n_leaf_slots} leaf slots, "
      f"{int(is_int.sum())} internal slots, recw={recw} "
      f"({M*recw*4/1024:.0f} KB)")

# rays: reproduce mb_sub.py's wave set
w = h = 512
R = w * h
perm = jnp.asarray(_tile_order(w, h))
o, d = generate_rays(w, h, (0, 0, 0.8), (0, 0, 0, 1), 70.0)
o, d = o.reshape(R, 3)[perm], d.reshape(R, 3)[perm]

from raytracer_tpu.ops.trace import trace_rays
wide = make_wide_bvh(collapse_lbvh2_to_bvh4(cs.bvh2, sweeps=hgt + 2))
t0_, tri0 = trace_rays(wide, cs.tris_sorted, o, d)
o_np, d_np = np.asarray(o), np.asarray(d)
t_np = np.where(np.asarray(tri0) >= 0, np.asarray(t0_), 0.5)
# surface points + cosine bounce dirs (approx normals: radial for sphere ok —
# only packet GEOMETRY matters here, not shading correctness)
p = o_np + d_np * t_np[:, None]
nn = np.asarray(jnp.where(jnp.asarray(tri0)[:, None] >= 0,
                          -jnp.asarray(d_np), jnp.array([0., 0., 1.])))
db = np.asarray(_cosine_sample(jnp.asarray(nn / np.linalg.norm(nn, axis=-1, keepdims=True)),
                               jax.random.uniform(jax.random.key(5), (R,)),
                               jax.random.uniform(jax.random.key(6), (R,))))
sun = np.broadcast_to(np.array([0.48507125, 0.7276069, 0.48507125], np.float32),
                      p.shape)
pr = np.asarray(jax.random.permutation(jax.random.key(7), R))

# octant+morton compaction (what render_pt does between waves)
def compact(o_, d_):
    oct_ = (d_[:, 0] < 0) * 4 + (d_[:, 1] < 0) * 2 + (d_[:, 2] < 0)
    q = np.clip((o_ + 2.0) * (1023.0 / 4.0), 0, 1023).astype(np.uint64)
    m = np.zeros(len(o_), np.uint64)
    for b in range(10):
        for a in range(3):
            m |= ((q[:, a] >> b) & 1) << np.uint64(3 * b + (2 - a))
    key = (oct_.astype(np.uint64) << np.uint64(30)) | m
    pm = np.argsort(key, kind="stable")
    return o_[pm], d_[pm]

pc, dbc = compact(p, db)

WAVES = {
    "primary": (o_np, d_np),
    "nee": (p, sun),
    "bounce1_sorted": (pc, dbc),
    "incoherent": (p[pr], db[pr]),
}


def slab_mask(box, o_, inv, best):
    """Per-lane slab pass with the kernel's best-t cull:
    (tmax >= max(tmin,0)) & (tmin < best) — traverse.py:313 semantics."""
    t1 = (box[:3] - o_) * inv
    t2 = (box[3:] - o_) * inv
    tmin = np.minimum(t1, t2).max(axis=-1)
    tmax = np.maximum(t1, t2).min(axis=-1)
    return (tmax >= np.maximum(tmin, 0.0)) & (tmin < best)


def mt_best(nd, k, o_, d_, best):
    """Möller–Trumbore the K triangles of leaf slot (nd,k) on all lanes and
    return the shrunken per-lane best-t — the kernel's hit-state update that
    makes later slab tests cull (the census previously omitted this, which
    overstated visits asymmetrically in favor of the flat sweep — ADVICE r3)."""
    recs = qn[nd, vbase + k * K * 12: vbase + (k + 1) * K * 12].reshape(K, 12)
    cnt = int(qn[nd, 28 + k])
    for j in range(cnt):
        v0, e1, e2 = recs[j, 0:3], recs[j, 3:6], recs[j, 6:9]
        pvec = np.cross(d_, e2)
        det = pvec @ e1
        ok = np.abs(det) >= 1e-7
        inv_det = 1.0 / np.where(ok, det, 1.0)
        s_ = o_ - v0
        u = inv_det * np.sum(s_ * pvec, -1)
        qvec = np.cross(s_, e1)
        v = inv_det * np.sum(d_ * qvec, -1)
        t = inv_det * (qvec @ e2)
        upd = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-7) & (t < best)
        best = np.where(upd, t, best)
    return best


for sub in (16,):
    lanes = sub * 128
    for name, (o_, d_) in WAVES.items():
        nstream = R // lanes
        tv = lv = sweep_mt = 0
        # sample every 8th stream for speed
        step = 8
        cnt = 0
        for si in range(0, nstream, step):
            so, sd = o_[si * lanes:(si + 1) * lanes], d_[si * lanes:(si + 1) * lanes]
            inv = np.where(np.abs(sd) > 1e-8, 1.0 / sd, 1e30)
            # tree walk — near-first child order + per-lane best-t tracking
            # (the kernel's actual cull; a flat far-first order would
            # understate the depth-first traversal's best-t benefit)
            best = np.full(lanes, 1e30, np.float32)
            stack = [0]
            visits = 0
            leaf_mt = 0
            while stack:
                nd = stack.pop()
                visits += 1
                kids = []
                for k in range(4):
                    if not bool(np.any(slab_mask(boxes[nd, k], so, inv, best))):
                        continue
                    if is_int[nd, k]:
                        proj = (boxes[nd, k, :3] + boxes[nd, k, 3:]) * 0.5 - so.mean(0)
                        kids.append((float(proj @ sd.mean(0)), int(refs[nd, k])))
                    elif is_leaf[nd, k]:
                        leaf_mt += 1
                        best = mt_best(nd, k, so, sd, best)
                # push far→near so nearest pops first (kernel's sort)
                for _, child in sorted(kids, key=lambda x: -x[0]):
                    stack.append(child)
            tv += visits
            lv += leaf_mt
            # flat sweep: every leaf slot slab-tested, with the SAME best-t
            # shrink applied in sweep order (sequential record order)
            bsw = np.full(lanes, 1e30, np.float32)
            for nd in range(M):
                for k in range(4):
                    if is_leaf[nd, k] and bool(np.any(
                            slab_mask(boxes[nd, k], so, inv, bsw))):
                        sweep_mt += 1
                        bsw = mt_best(nd, k, so, sd, bsw)
            cnt += 1
        print(f"sub={sub} {name:15s} tree visits/stream={tv/cnt:6.1f}  "
              f"leafMT/stream tree={lv/cnt:6.1f} sweep={sweep_mt/cnt:6.1f} "
              f"(sweep recs={-(-n_leaf_slots // 4)})")
