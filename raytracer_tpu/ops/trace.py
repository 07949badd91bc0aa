"""BVH traversal + intersection — vectorized XLA formulation.

The reference's megakernel (renderer.wgsl:210-346) walks a BVH4 with a
64-deep stack per 2×2 SIMT ray packet, re-testing the popped node's box and
then its 4 children's boxes (6 gathers/step). On a TPU the vector lanes *are*
the ray batch, so the redesign changes the memory layout instead:

* **Wide nodes**: each traversal step gathers ONE record per ray — the 4
  child AABBs + child refs inlined into the parent (built once from the BVH4
  by :func:`make_wide_bvh`). Leaf children are intersected immediately at the
  parent (4 Möller–Trumbore lanes at once); only internal children are ever
  pushed. This converts the WGSL's 5 box gathers + 1 tri gather per step into
  1 node-record gather + 1 (4-wide) tri gather.
* **Stacks** are (rays, depth) arrays in registers/VMEM; pops/pushes are
  masked vector ops. Entries carry the child's slab-entry distance; a popped
  entry whose distance ≥ current best-t is discarded (equivalent to the
  WGSL's pop-time box re-test, renderer.wgsl:251-263, but cheaper).
* **Near-first ordering**: children are fully sorted by entry distance and
  pushed far→near (the WGSL sorts only the nearest into slot 0,
  renderer.wgsl:314-342 — full sorting is free here and strictly better).
* Rays are processed in statically-shaped chunks (2D image tiles → coherent
  chunks) via ``lax.map``; each chunk runs its own ``while_loop`` until all
  its lanes' stacks drain.

Intersection math is bit-compatible with the reference: slab test with
safeInvDir clamping (renderer.wgsl:121-169), Möller–Trumbore with eps=1e-7
and strict t>eps, t<best (renderer.wgsl:171-208).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import fp16_jax as f16
from .camera import INF, safe_inv_dir
from .collapse import BVH4

__all__ = ["WideBVH", "make_wide_bvh", "trace_rays", "trace_rays_brute", "STACK_MAX"]

LEAF_FLAG = 0x80000000
INVALID = 0xFFFFFFFF
STACK_MAX = 64          # renderer.wgsl:8
MT_EPS = 1e-7           # renderer.wgsl:178

# cref encoding (int32): -1 = empty slot; bit 30 set = leaf → low bits are the
# triangle index; otherwise an internal node index.
_CREF_LEAF_BIT = jnp.int32(1 << 30)


class WideBVH(NamedTuple):
    """Traversal-ready BVH: per node, the 4 children's boxes and refs inline."""

    cmn: jax.Array   # (M, 4, 3) f32 — child box minima (+inf for empty)
    cmx: jax.Array   # (M, 4, 3) f32 — child box maxima (−inf for empty)
    cref: jax.Array  # (M, 4) int32 — encoded child refs
    root_mn: jax.Array  # (3,) f32 root box
    root_mx: jax.Array  # (3,) f32


def make_wide_bvh(bvh: BVH4) -> WideBVH:
    """Fold each node's children's bounds/kind into the parent record.

    Validity rules mirror the WGSL reader (renderer.wgsl:286-291): child slots
    that are INVALID, out of range, or carry a degenerate (min>max) box are
    disabled. Works for BVH2 trees too — feed children=(left,right,INV,INV).
    """
    m = bvh.bounds_u32.shape[0]
    num_nodes = bvh.num_nodes.astype(jnp.uint32)
    mn, mx = f16.unpack_bounds(bvh.bounds_u32)

    ch = bvh.children
    valid = (ch != jnp.uint32(INVALID)) & (ch < num_nodes)
    ci = jnp.clip(ch.astype(jnp.int32), 0, m - 1)

    cmn = mn[ci]                     # (M, 4, 3)
    cmx = mx[ci]
    cmeta = bvh.meta[ci]
    degenerate = jnp.any(cmn > cmx, axis=-1)
    valid = valid & ~degenerate

    child_leaf = (cmeta & jnp.uint32(LEAF_FLAG)) != 0
    tri_idx = (cmeta & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    cref = jnp.where(child_leaf, tri_idx | _CREF_LEAF_BIT, ci)
    cref = jnp.where(valid, cref, jnp.int32(-1))

    inf = jnp.float32(jnp.inf)
    cmn = jnp.where(valid[..., None], cmn, inf)
    cmx = jnp.where(valid[..., None], cmx, -inf)
    return WideBVH(cmn=cmn, cmx=cmx, cref=cref, root_mn=mn[0], root_mx=mx[0])


def _moller_trumbore(o, d, v0, v1, v2):
    """Batched Möller–Trumbore, reference semantics (renderer.wgsl:171-208).
    Shapes broadcast; returns (t, valid)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv_det = jnp.float32(1.0) / jnp.where(det == 0, jnp.float32(1.0), det)
    s = o - v0
    u = inv_det * jnp.sum(s * p, axis=-1)
    q = jnp.cross(s, e1)
    v = inv_det * jnp.sum(d * q, axis=-1)
    t = inv_det * jnp.sum(e2 * q, axis=-1)
    ok = (
        (jnp.abs(det) >= jnp.float32(MT_EPS))
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > jnp.float32(MT_EPS))
    )
    return t, ok


def _slab4(cmn, cmx, o, inv, best_t):
    """Slab test of 4 child boxes per ray. cmn/cmx (C,4,3); o/inv (C,3).
    Returns (hit (C,4), tmin (C,4)). renderer.wgsl:141-168 semantics."""
    t1 = (cmn - o[:, None, :]) * inv[:, None, :]
    t2 = (cmx - o[:, None, :]) * inv[:, None, :]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best_t[:, None])
    return hit, tmin


class _TraceState(NamedTuple):
    sp: jax.Array          # (C,) int32 — stack pointer, -1 empty
    stack_node: jax.Array  # (C, S) int32
    stack_dist: jax.Array  # (C, S) f32
    best_t: jax.Array      # (C,) f32
    best_tri: jax.Array    # (C,) int32, -1 = miss


def _trace_chunk(wide: WideBVH, tris: jax.Array, o: jax.Array, d: jax.Array):
    """Traverse one chunk of rays to completion. o/d: (C,3)."""
    c = o.shape[0]
    m = wide.cref.shape[0]
    n_tris = tris.shape[0]
    inv = safe_inv_dir(d)
    rows = jnp.arange(c, dtype=jnp.int32)

    # root box test seeds the stack (renderer.wgsl pops+tests the root)
    t1 = (wide.root_mn[None, :] - o) * inv
    t2 = (wide.root_mx[None, :] - o) * inv
    rmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    rmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    root_hit = (rmax >= jnp.maximum(rmin, 0.0)) & ~jnp.any(wide.root_mn > wide.root_mx)

    state = _TraceState(
        sp=jnp.where(root_hit, 0, -1).astype(jnp.int32),
        stack_node=jnp.zeros((c, STACK_MAX), jnp.int32),
        stack_dist=jnp.full((c, STACK_MAX), -INF),
        best_t=jnp.full((c,), INF),
        best_tri=jnp.full((c,), -1, jnp.int32),
    )

    def cond(st: _TraceState):
        return jnp.any(st.sp >= 0)

    def body(st: _TraceState) -> _TraceState:
        active = st.sp >= 0
        spc = jnp.maximum(st.sp, 0)
        node = st.stack_node[rows, spc]
        dist = st.stack_dist[rows, spc]
        sp = jnp.where(active, st.sp - 1, st.sp)
        proceed = active & (dist < st.best_t)

        nodec = jnp.clip(node, 0, m - 1)
        cmn = wide.cmn[nodec]          # (C,4,3)
        cmx = wide.cmx[nodec]
        cref = wide.cref[nodec]        # (C,4)

        chit, ctmin = _slab4(cmn, cmx, o, inv, st.best_t)
        chit = chit & (cref >= 0) & proceed[:, None]

        child_leaf = (cref & _CREF_LEAF_BIT) != 0
        tri_idx = cref & (_CREF_LEAF_BIT - 1)

        # --- leaf children: intersect all 4 lanes at once ---
        do_tri = chit & child_leaf & (tri_idx < n_tris)
        tric = jnp.clip(tri_idx, 0, n_tris - 1)
        v = tris[tric]                 # (C,4,3,3)
        t_hit, mt_ok = _moller_trumbore(
            o[:, None, :], d[:, None, :], v[..., 0, :], v[..., 1, :], v[..., 2, :]
        )
        cand_t = jnp.where(do_tri & mt_ok, t_hit, INF)
        # nearest of the ≤4 leaf candidates, tie → lowest slot (matches
        # sequential first-wins of the scalar loop)
        slot = jnp.argmin(cand_t, axis=-1)
        new_t = cand_t[rows, slot]
        upd = new_t < st.best_t
        best_t = jnp.where(upd, new_t, st.best_t)
        best_tri = jnp.where(upd, tri_idx[rows, slot], st.best_tri)

        # --- internal children: sort near-first, push far→near ---
        push_cand = chit & ~child_leaf
        pdist = jnp.where(push_cand, ctmin, INF)
        order = jnp.argsort(pdist, axis=-1)            # ascending
        s_ref = jnp.take_along_axis(cref, order, axis=-1)
        s_dist = jnp.take_along_axis(pdist, order, axis=-1)
        s_push = jnp.take_along_axis(push_cand, order, axis=-1)

        stack_node, stack_dist = st.stack_node, st.stack_dist
        for k in (3, 2, 1, 0):  # far → near, so nearest is popped first
            pk = s_push[:, k] & (sp < STACK_MAX - 1)
            sp = jnp.where(pk, sp + 1, sp)
            pos = jnp.where(pk, sp, STACK_MAX)          # OOB col → dropped
            stack_node = stack_node.at[rows, pos].set(s_ref[:, k], mode="drop")
            stack_dist = stack_dist.at[rows, pos].set(s_dist[:, k], mode="drop")

        return _TraceState(sp, stack_node, stack_dist, best_t, best_tri)

    final = jax.lax.while_loop(cond, body, state)
    return final.best_t, final.best_tri


@partial(jax.jit, static_argnames=("chunk",))
def trace_rays(
    wide: WideBVH,
    tris: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    chunk: int = 8192,
):
    """Closest-hit trace for a flat ray batch (R,3)+(R,3) → (t (R,), tri (R,)).

    tri = -1 on miss. Rays are split into ``chunk``-sized groups, each run to
    stack-drain independently (keep chunks spatially coherent for speed).
    """
    r = origins.shape[0]
    pad = (-r) % chunk
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d_ = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    o = o.reshape(-1, chunk, 3)
    d_ = d_.reshape(-1, chunk, 3)

    t, tri = jax.lax.map(lambda od: _trace_chunk(wide, tris, od[0], od[1]), (o, d_))
    return t.reshape(-1)[:r], tri.reshape(-1)[:r]


@jax.jit
def trace_rays_brute(tris: jax.Array, origins: jax.Array, dirs: jax.Array):
    """Ground-truth closest hit: test every ray against every triangle.

    O(R·T) — the correctness oracle for the BVH path and the natural fast
    path for tiny scenes. Tie-break: lowest triangle index (argmin)."""
    t, ok = _moller_trumbore(
        origins[:, None, :],
        dirs[:, None, :],
        tris[None, :, 0, :],
        tris[None, :, 1, :],
        tris[None, :, 2, :],
    )
    t = jnp.where(ok, t, INF)
    idx = jnp.argmin(t, axis=-1)
    best = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    return best, jnp.where(best < INF, idx.astype(jnp.int32), -1)
