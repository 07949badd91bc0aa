"""Pallas TPU traversal kernel — persistent multi-stream block-shared-stack tracing.

The TPU-native replacement for the WGSL megakernel's SIMT traversal
(renderer.wgsl:210-346). The mapping of concepts:

* WGSL workgroup of 16×16 threads × 2×2 ray packets → NS persistent traversal
  streams in ONE Pallas program. Each stream owns a 32×32-pixel tile at a
  time; the tile's 1024 rays live in the vector lanes of an (8,128) VPU tile.
  The reference's per-thread packet masking becomes per-lane masking, which
  the VPU does for free.
* Per-thread stack in registers → one scalar stack per stream in SMEM, shared
  by all 1024 rays of its tile. A node is visited iff *any* ray in the tile
  wants it — the packet-coherence bet of the reference (renderer.wgsl:4-6)
  taken to 1024-wide.
* Divergent memory access (the SIMT gathers of node + triangle records) →
  ONE scalar-indexed async DMA per visit: a "supernode" record (4 child
  AABBs, child refs, and the full triangle data of leaf children inlined)
  lands in SMEM and all its fields are *scalars* broadcast against the lane
  tile. No per-lane gathers exist anywhere in the kernel.
* **NS independent streams round-robined per loop iteration** (the round-2
  redesign): BVH traversal is a dependent pointer chase — a single stack
  exposes the full ~300 ns HBM→SMEM DMA latency on every visit (round 1
  measured ~380 ns/visit). Four tile-stacks round-robined in one iteration
  give each stream's DMA the other three streams' consumption to land:
  measured ~129 ns/visit, within 13% of the no-DMA consumption floor
  (tools/mb_results_r2.md). DMA start/wait pairs are unconditional per
  iteration (drained streams fetch node 0 as a harmless dummy) — Mosaic
  mishandles conditionally-skipped DMAs across while_loop iterations.
* **Persistent tile queue** (round 2.5, made dynamic in round 3): the
  grid-per-tile formulation left ~40% of stream slots idle because the NS
  tiles of a program finish at different times and the program spins until
  the slowest drains. Instead the kernel runs as ONE program whose streams
  pop tiles from a SHARED next-tile counter in SMEM (race-free: the streams
  are round-robined in one instruction stream). When a stream's stack
  drains it writes its finished tile to HBM with an async copy
  (double-buffered through a VMEM staging slot), generates the rays of its
  next queued tile in-kernel, and keeps popping — streams only idle in the
  global tail of ≤ NS−1 tiles. (Round 2's static s, s+NS, … interleave
  re-created the imbalance at queue granularity: a stream that drew an
  expensive run of tiles finished its queue late while the others spun.)
* Ray generation (renderer.wgsl:364-396) is fused into the kernel (pixel
  coords from the tile id + iota), and hit state lives in VMEM scratch, so
  per-ray HBM traffic is exactly the 6 packed output planes.

Supernode record (lane-aligned f32 row; built by make_qnodes; width depends
on K = triangles per leaf — 128 words for K ≤ 2, 256 for K ≤ 6, …):
  [0:24]   4 × child AABB (mnx,mny,mnz,mxx,mxy,mxz), +inf/−inf when empty
  [24:28]  child refs encoded as exact integer-valued floats:
             idx ≥ 0    → internal child node index
             −(first+1) → leaf whose K triangles start at row ``first``
             −2^28      → empty slot
  [28:32]  per-slot scalar: bounding-sphere radius (internal) or triangle
           count ≤ K (leaf)
  [32 + (kK+j)·12 : +12] leaf record of slot k's j-th triangle:
                         v0, e1=v1−v0, e2=v2−v0, g=e1×e2 (precomputed with
                         the kernel's exact f32 op sequence — bit-identical
                         MT, fewer per-visit instructions)
  [32+48K + kK+j]        original triangle id of slot k's j-th triangle
Packed-leaf trees (ops/cluster.py) store K Morton-adjacent triangles per
leaf: K× fewer records/visits at the cost of K Möller–Trumbores per leaf
slot — vector work that hides under the other streams' DMAs.

Traversal: internal children are slab-tested on all lanes and pushed
far→near by projected-center distance along the tile ray (packet analog of
the WGSL's near-first ordering, renderer.wgsl:314-342); leaf children skip
the box test entirely — Möller–Trumbore runs directly on all lanes from the
inlined vertices (the child box is a conservative hull of the triangle, so
the box test could only pass a superset of the MT-accepted lanes).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import subpixel_hash01
from ..trace import WideBVH

__all__ = ["make_qnodes", "trace_tiles_pallas", "trace_tiles_batch_pallas",
           "trace_rays_pallas", "TILE", "REC", "rec_layout"]

TILE = int(os.environ.get("RT_TILE", "32"))  # pixels per tile side; TILE² rays per stream
_ABLATE = os.environ.get("RT_ABLATE", "")  # perf ablations: "nomt", "noslab"
SUB = TILE * TILE // 128  # sublane count of the ray lane-tile (TILE²=SUB×128)
STACK_MAX = int(os.environ.get("RT_STACK", "64"))  # renderer.wgsl:8
GROUP = 2                 # raybuf kernel: GROUP² streams per program (legacy name)
NS = int(os.environ.get("RT_STREAMS", str(GROUP * GROUP)))
REC = 128                 # record width (f32 words) — lane-tile aligned
EMPTY_REF = -float(1 << 28)
INF = 1e30
MT_EPS = 1e-7
_SYNC_OUT = os.environ.get("RT_SYNC_OUT", "0") == "1"  # debug: wait out-DMAs eagerly

_MAX_NODES = 1 << 24      # refs are exact integer-valued f32 (ADVICE.md r1)

# istate_scr rows (SMEM int32 (8, NS))
_SP, _PEND, _VISITS, _CURTILE, _BUF, _DMA0, _DMA1, _NEXT = range(8)
# row _NEXT column 0 holds the SHARED next-tile counter of the persistent
# kernel's dynamic work queue (all NS streams pop from it; safe because the
# streams are round-robined in one instruction stream — no concurrency)


# ---------------------------------------------------------------------------
# Device-side data preparation (jitted once per scene)
# ---------------------------------------------------------------------------

def rec_layout(leaf_size: int, width: int = 4) -> tuple[int, int, int]:
    """(verts_base, ids_base, record_width) for K = leaf_size tris/leaf
    and ``width`` child slots per record (4 = reference-parity BVH4
    collapse; 8 = the BVH8 greedy collapse, ops/collapse.py).

    Header: [0 : 6·width] child AABBs, [6·width : 7·width] encoded refs,
    [7·width : 8·width] per-slot scalars (count / sphere radius).
    Leaf triangle j of slot k occupies 12 words at vbase + (k·K+j)·12:
    [v0(3), e1(3), e2(3), g(3)] with e1 = v1−v0, e2 = v2−v0 and
    g = e1×e2 (unnormalized geometric normal) precomputed by make_qnodes
    with the exact f32 op sequence the kernel used to run per visit —
    bit-identical results, ~18 fewer scalar instructions per MT on the
    issue-bound core."""
    vbase = 8 * width
    ibase = vbase + width * 12 * leaf_size
    return vbase, ibase, -(-(ibase + width * leaf_size) // 128) * 128


def infer_rec_width(leaf_k: int, recw: int) -> int:
    """Recover the record's child-slot count from its total word width.

    qnodes carry their geometry in their shape — (M, recw//128, 128) —
    and (leaf_k, width) → recw is injective over the supported widths
    (the 8-wide header+payload is strictly larger than the 4-wide one
    for every K), so wrappers can stay width-agnostic in their API."""
    for width in (4, 8):
        if rec_layout(leaf_k, width)[2] == recw:
            return width
    raise ValueError(
        f"record width {recw} matches no supported child count for "
        f"leaf_k={leaf_k} (expected {rec_layout(leaf_k, 4)[2]} for 4-wide "
        f"or {rec_layout(leaf_k, 8)[2]} for 8-wide) — pass the leaf_size "
        "the records were built with"
    )


@partial(jax.jit, static_argnames=("leaf_size",))
def make_qnodes(
    wide: WideBVH,
    tris: jax.Array,
    tri_ids: jax.Array | None = None,
    leaf_size: int = 1,
) -> jax.Array:
    """WideBVH + (T,3,3) triangles → supernode records (M, recw) f32.

    ``leaf_size=1`` (default): leaf refs in ``wide.cref`` are triangle
    indices into ``tris`` — the reference-parity single-triangle tree.
    ``leaf_size=K>1``: leaf refs are CLUSTER indices (ops/cluster.py); pass
    the cluster-ordered triangles as ``tris`` and the original-id permutation
    as ``tri_ids`` so hit reporting still uses reference indices.
    """
    m, wd = wide.cref.shape
    n_tris = tris.shape[0]
    k_sz = leaf_size
    if m >= _MAX_NODES or n_tris >= _MAX_NODES:
        raise ValueError(
            f"scene too large for the f32 ref encoding: {m} nodes / {n_tris} "
            f"triangles (max {_MAX_NODES - 1}) — indices above 2^24 lose "
            "precision as f32"
        )
    vbase, ibase, recw = rec_layout(k_sz, wd)
    rec = jnp.zeros((m, recw), jnp.float32)

    boxes = jnp.concatenate([wide.cmn, wide.cmx], axis=-1).reshape(m, 6 * wd)
    rec = rec.at[:, 0 : 6 * wd].set(boxes)

    cref = wide.cref  # (M,w) int32: -1 empty, bit30 → leaf|ref, else node idx
    leaf_bit = jnp.int32(1 << 30)
    is_leaf = (cref & leaf_bit) != 0
    first = (cref & (leaf_bit - 1)) * k_sz     # first triangle row of the leaf
    # The kernel's K=1 leaf path derives the reported triangle id as
    # -(enc)-1 and never uses the row for lookups (vertices are inlined in
    # the same record), so when a permutation is in play the ORIGINAL id is
    # baked into the encoding here — otherwise make_qnodes(..., tri_ids=perm,
    # leaf_size=1) would silently report permuted rows (ADVICE r2).
    if k_sz == 1 and tri_ids is not None:
        leaf_row = tri_ids[jnp.clip(first, 0, n_tris - 1)].astype(jnp.float32)
    else:
        leaf_row = first.astype(jnp.float32)
    enc = jnp.where(
        cref < 0,
        jnp.float32(EMPTY_REF),
        jnp.where(
            is_leaf,
            -(leaf_row + 1.0),
            cref.astype(jnp.float32),
        ),
    )
    rec = rec.at[:, 6 * wd : 7 * wd].set(enc)

    # [7w:8w]: triangle count for leaf slots; bounding-sphere radius for
    # internal slots (the cull metric ``max(proj − radius, 0)`` needs it —
    # one scalar read replaces the 17-op gap-distance computation per child)
    count = jnp.clip(n_tris - first, 0, k_sz).astype(jnp.float32)
    radius = 0.5 * jnp.linalg.norm(wide.cmx - wide.cmn, axis=-1)     # (M,w)
    radius = jnp.where(jnp.isfinite(radius), radius, 0.0)
    rec = rec.at[:, 7 * wd : 8 * wd].set(jnp.where(is_leaf, count, radius))

    # inline leaf triangle data per slot: [v0, e1, e2, g] — the same f32
    # subtraction/cross sequence the kernel's MT used to execute, hoisted
    # to build time (see rec_layout)
    flat_tris = tris.reshape(n_tris, 9)
    v0f, v1f, v2f = flat_tris[:, 0:3], flat_tris[:, 3:6], flat_tris[:, 6:9]
    e1f = v1f - v0f
    e2f = v2f - v0f
    gf = jnp.stack(
        [
            e1f[:, 1] * e2f[:, 2] - e1f[:, 2] * e2f[:, 1],
            e1f[:, 2] * e2f[:, 0] - e1f[:, 0] * e2f[:, 2],
            e1f[:, 0] * e2f[:, 1] - e1f[:, 1] * e2f[:, 0],
        ],
        axis=-1,
    )
    tri_rec = jnp.concatenate([v0f, e1f, e2f, gf], axis=-1)  # (T, 12)
    for k in range(wd):
        idx = first[:, k, None] + jnp.arange(k_sz, dtype=first.dtype)  # (M,K)
        valid = is_leaf[:, k, None] & (idx < n_tris)
        safe = jnp.clip(idx, 0, n_tris - 1).astype(jnp.int32)
        v = jnp.where(valid[..., None], tri_rec[safe], 0.0)            # (M,K,12)
        vb = vbase + k * k_sz * 12
        rec = rec.at[:, vb : vb + k_sz * 12].set(v.reshape(m, k_sz * 12))
        ids = tri_ids[safe].astype(jnp.float32) if tri_ids is not None \
            else idx.astype(jnp.float32)
        rec = rec.at[:, ibase + k * k_sz : ibase + (k + 1) * k_sz].set(
            jnp.where(valid, ids, -1.0)
        )
    # (M, R128, 128): Mosaic can only dynamically slice the leading dim of a
    # lane-tiled HBM array, so records wider than one lane tile are exposed
    # as stacked 128-wide rows
    return rec.reshape(m, recw // 128, 128)


# ---------------------------------------------------------------------------
# Kernel core
# ---------------------------------------------------------------------------

class _Stream:
    """Per-stream traversal state: ray vectors, scalar metrics, output refs.

    Everything here is a traced value or a ref accessor captured at trace
    time — the class only exists to keep the NS-stream core readable.
    ``dirs``/``invs``/``order_*`` may be thunks (for the persistent kernel,
    which reloads them from scratch each visit) or plain values."""

    def __init__(self, *, dirs, invs, origin, order_slack, order_d,
                 order_o, entry, write, read, any_hit=False):
        self._dirs = dirs
        self._invs = invs
        self._origin = origin                    # triple (scalars/(SUB,128)) or thunk
        self.order_slack = order_slack           # origin-AABB radius (0 = point)
        self._order_d = order_d                  # scalar UNIT ordering ray dir
        self._order_o = order_o                  # triple or thunk
        self.entry = entry                       # scalar entry node index
        self.write = write                       # write(field, value)
        self.read = read                         # read(field) -> tile
        self.any_hit = any_hit                   # static: occlusion-only mode

    def dirs(self):
        return self._dirs() if callable(self._dirs) else self._dirs

    def invs(self):
        return self._invs() if callable(self._invs) else self._invs

    def order_d(self):
        return self._order_d() if callable(self._order_d) else self._order_d

    def origin(self):
        return self._origin() if callable(self._origin) else self._origin

    def order_o(self):
        return self._order_o() if callable(self._order_o) else self._order_o

    def read_t(self):
        return self.read("t")


_SORT_NET = {
    # compare-exchange networks, applied with the descending CE below so the
    # NEAREST child is pushed last (pops first). 4: the standard 5-CE
    # network; 8: Batcher/Knuth's optimal 19-CE network.
    4: [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)],
    8: [(0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (3, 7),
        (1, 5), (2, 6), (1, 4), (3, 6),
        (2, 4), (3, 5), (3, 4)],
}


def _consume(s, st: _Stream, node_scr, stack_n, stack_d, maxb_scr, istate_scr,
             leaf_k: int = 1, rd=None, ordered: bool = True, width: int = 4):
    """Consume stream ``s``'s fetched record: MT its leaf children, slab-
    test its internal children, push survivors near-first. Runs under
    pl.when(pending) — the record DMA has already been waited on.

    ``rd`` overrides the record-word reader: the SMEM-resident-tree path
    reads record words straight out of the tree array (no per-visit DMA).

    ``ordered=False`` drops the near-first ordering entirely: no projected-
    center key (9 scalar flops + 1 radius read per child), no push cull, no
    4-way sorting network (~50 scalar ops) — children push in slot order
    with key 0. The consume loop is scalar-issue-bound (~330 ns/visit,
    tools/mb_results_r2.md), so this trades visits for per-visit cost; it
    pays on DIVERGENT waves where the stream-mean ordering axis is weak
    (bounce/NEE waves walk ~the whole tree regardless — PERF.md r3 #9).
    Pop-time culling still works (stack_d holds 0, and closest-hit maxb
    stays positive; any-hit full-occlusion drives maxb to 0, which both
    flushes the stack and culls key-0 entries)."""
    f32 = jnp.float32
    vbase, ibase, _ = rec_layout(leaf_k, width)
    n_acc = width // 2
    sp = istate_scr[_SP, s]

    if rd is None:
        def rd(w):
            """Scalar read of record word ``w`` (static) from stream s's SMEM."""
            return node_scr[s, w // 128, w % 128]

    best0 = st.read_t()
    maxb2 = maxb_scr[s, 1]

    push_ref = [jnp.int32(0)] * width
    push_dist = [f32(0.0)] * width
    push_internal = [jnp.bool_(False)] * width

    dx, dy, dz = st.dirs()
    # lane-tile shape comes from the stream (the ray-buffer kernel supports
    # wider-than-SUB streams for divergent waves)
    accs = [jnp.zeros(dx.shape, jnp.int32) for _ in range(n_acc)]
    ix, iy, iz = st.invs()
    ox, oy, oz = st.origin()
    (odx, ody, odz), (oox, ooy, ooz) = st.order_d(), st.order_o()

    refcs = [rd(6 * width + k) for k in range(width)]
    leaf_flags = [(refcs[k] < 0.0) & (refcs[k] > f32(EMPTY_REF))
                  for k in range(width)]
    for k in range(width):
        refc = refcs[k]
        is_internal = refc >= 0.0

        # --- internal child: slab test (vector) + scalar metrics ---
        mnx, mny, mnz = rd(6 * k), rd(6 * k + 1), rd(6 * k + 2)
        mxx, mxy, mxz = rd(6 * k + 3), rd(6 * k + 4), rd(6 * k + 5)
        if "noslab" in _ABLATE:
            hit = (mnx + mny + mnz) * 0.0 + best0 > 0.0
        else:
            t1x, t2x = (mnx - ox) * ix, (mxx - ox) * ix
            t1y, t2y = (mny - oy) * iy, (mxy - oy) * iy
            t1z, t2z = (mnz - oz) * iz, (mxz - oz) * iz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best0)
        # pack per-slot hit counts into 16-bit fields (≤1024 per field;
        # 2 slots per int32 accumulator → width/2 lane reductions total)
        shift = 16 * (k // n_acc)
        accs[k % n_acc] = accs[k % n_acc] + jnp.where(
            hit, jnp.int32(1) << shift, 0)

        if ordered:
            # near-first ordering: box center projected on the stream ray.
            # The push/sort/cull key is the UNCLAMPED conservative bound
            # proj − r − slack (any hit t ≥ max(key, 0)): since the cull
            # threshold maxb is > 0 whenever entries matter (closest-hit maxb
            # is INF or a positive best-t; any-hit maxb = 0 flushes the whole
            # stack at pop time), ``key < maxb ⟺ max(key,0) < maxb`` — the
            # clamp and the separate sort field it forced are dead weight
            # (~15 scalar ops/visit).
            proj = (
                ((mnx + mxx) * 0.5 - oox) * odx
                + ((mny + mxy) * 0.5 - ooy) * ody
                + ((mnz + mxz) * 0.5 - ooz) * odz
            )
            r = rd(7 * width + k)
            key = proj - r - st.order_slack
            push_dist[k] = key
            push_internal[k] = is_internal & (key < maxb2)
        else:
            push_internal[k] = is_internal

        push_ref[k] = refc.astype(jnp.int32)

    # the width/2 lane reductions of this visit (slot-hit counts)
    if "noreduce" in _ABLATE:
        push_ok = push_internal
        slot_hit = [jnp.bool_(True)] * width
    else:
        reds = [jnp.sum(a) for a in accs]
        slot_hit = [
            ((reds[k % n_acc] >> (16 * (k // n_acc))) & 0xFFFF) != 0
            for k in range(width)
        ]
        push_ok = [push_internal[k] & slot_hit[k] for k in range(width)]

    # --- leaf children: MT straight from the inlined vertices, gated by the
    # slab test (a leaf slot that fails the slab — or is occluded beyond
    # best-t — skips MT entirely: the box is the triangles' hull, so the
    # slab can only pass a superset of the MT-accepted lanes). Best-hit
    # state is chained through registers, one read/write per plane.
    # K=1 runs all four slots under ONE branch (cheapest when a slot is a
    # single triangle); K>1 branches per slot so a miss slot skips its
    # 37·K scalar vertex reads. ---
    do_mt = [leaf_flags[k] & slot_hit[k] for k in range(width)]

    def mt_one(b_ofs, gate, tid, cur, vnx, vny, vnz, vtri):
        """One Möller–Trumbore from the 12-word precomputed record
        [v0, e1, e2, g] at ``b_ofs`` against all lanes; returns the updated
        best-hit registers. Identical accept set / t values to the
        from-vertices formulation — the subtractions and cross products were
        hoisted verbatim into make_qnodes."""
        v0x, v0y, v0z = rd(b_ofs), rd(b_ofs + 1), rd(b_ofs + 2)
        e1x, e1y, e1z = rd(b_ofs + 3), rd(b_ofs + 4), rd(b_ofs + 5)
        e2x, e2y, e2z = rd(b_ofs + 6), rd(b_ofs + 7), rd(b_ofs + 8)
        gnx, gny, gnz = rd(b_ofs + 9), rd(b_ofs + 10), rd(b_ofs + 11)

        px_ = dy * e2z - dz * e2y
        py_ = dz * e2x - dx * e2z
        pz_ = dx * e2y - dy * e2x
        det = e1x * px_ + e1y * py_ + e1z * pz_
        inv_det = 1.0 / jnp.where(det == 0.0, f32(1.0), det)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        uu = inv_det * (sx * px_ + sy * py_ + sz * pz_)
        qcx = sy * e1z - sz * e1y
        qcy = sz * e1x - sx * e1z
        qcz = sx * e1y - sy * e1x
        vv = inv_det * (dx * qcx + dy * qcy + dz * qcz)
        tt = inv_det * (e2x * qcx + e2y * qcy + e2z * qcz)
        upd = (
            gate                           # scalar → lane broadcast
            & (jnp.abs(det) >= MT_EPS)
            & (uu >= 0.0) & (uu <= 1.0)
            & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > MT_EPS) & (tt < cur)
        )
        g_inv = jax.lax.rsqrt(gnx * gnx + gny * gny + gnz * gnz)
        if vtri.dtype == jnp.int32:
            tid = tid.astype(jnp.int32)
        if st.any_hit:
            # occlusion query: a hit lane's best-t drops to 0, which
            # fails every later slab test (tmin ≥ 0) and MT accept
            # (tt > eps) for that lane, and drives maxb to 0 once all
            # lanes hit — the stack then drains through the pop cull.
            # t is a hit FLAG (0 = occluded), not a distance.
            cur = jnp.where(upd, f32(0.0), cur)
        else:
            cur = jnp.where(upd, tt, cur)
        return (
            cur,
            jnp.where(upd, gnx * g_inv, vnx),
            jnp.where(upd, gny * g_inv, vny),
            jnp.where(upd, gnz * g_inv, vnz),
            jnp.where(upd, tid, vtri),
        )

    def read_hit():
        return (st.read_t(), st.read("nx"), st.read("ny"), st.read("nz"),
                st.read("tri"))

    def write_hit(cur, vnx, vny, vnz, vtri):
        st.write("t", cur)
        st.write("nx", vnx)
        st.write("ny", vny)
        st.write("nz", vnz)
        st.write("tri", vtri)
        # shrink the cull bound — only leaf hits can improve it
        mb = jnp.max(cur)
        maxb_scr[s, 0] = mb
        maxb_scr[s, 1] = mb

    if "nomt" not in _ABLATE:
        if leaf_k == 1:
            any_mt = do_mt[0]
            for k in range(1, width):
                any_mt = any_mt | do_mt[k]

            @pl.when(any_mt)
            def _():
                hit_regs = read_hit()
                for k in range(width):
                    hit_regs = mt_one(
                        vbase + 12 * k, do_mt[k], -refcs[k] - 1.0, *hit_regs
                    )
                write_hit(*hit_regs)
        else:
            for k in range(width):
                @pl.when(do_mt[k])
                def _(k=k):
                    hit_regs = read_hit()
                    cnt = rd(7 * width + k)
                    for j in range(leaf_k):
                        hit_regs = mt_one(
                            vbase + (k * leaf_k + j) * 12,
                            f32(j) < cnt,
                            rd(ibase + k * leaf_k + j),
                            *hit_regs,
                        )
                    write_hit(*hit_regs)

    # sorting network: children fully sorted, nearest pushed last so it
    # pops first (a WGSL-style nearest-only partial sort was measured
    # slower end-to-end: +12% visits for the ~20 ns/visit it saves).
    # Sorted directly on the push/cull key — rejected slots sink via -INF
    # masking (and land on the dump row regardless).
    refs, dists, oks = push_ref, push_dist, push_ok
    f32 = jnp.float32

    def swap_if(a, b):
        da = jnp.where(oks[a], dists[a], f32(-INF))
        db = jnp.where(oks[b], dists[b], f32(-INF))
        pred = da < db
        refs[a], refs[b] = (
            jnp.where(pred, refs[b], refs[a]),
            jnp.where(pred, refs[a], refs[b]),
        )
        dists[a], dists[b] = jnp.where(pred, db, da), jnp.where(pred, da, db)
        oks[a], oks[b] = (
            jnp.where(pred, oks[b], oks[a]),
            jnp.where(pred, oks[a], oks[b]),
        )

    if ordered and "nosort" not in _ABLATE:
        for a, b in _SORT_NET[width]:
            swap_if(a, b)

    # branchless pushes: rejected slots write to the dump row STACK_MAX
    for k in range(width):
        can = oks[k] & (sp < STACK_MAX - 1)
        sp = jnp.where(can, sp + 1, sp)
        pos = jnp.where(can, sp, STACK_MAX)
        stack_n[s, pos] = refs[k]
        stack_d[s, pos] = dists[k]

    istate_scr[_SP, s] = sp
    istate_scr[_VISITS, s] = istate_scr[_VISITS, s] + 1


def _traverse_streams(qnodes_ref, streams, node_scr, stack_n, stack_d,
                      maxb_scr, istate_scr, sems, leaf_k=1,
                      direct: bool = False, ordered: bool = True,
                      width: int = 4):
    """Round-robin multi-stream traversal loop for a FIXED set of streams
    (the ray-buffer kernel). Per-stream mutable state lives in SMEM so the
    whole consume step can sit behind ``pl.when`` — a drained or cull-skipped
    stream costs only a scalar branch per iteration, not the full vector
    consume.

    ``direct=True`` (SMEM-resident tree): ``qnodes_ref`` IS scalar-
    addressable, so record words are read straight out of it per visit —
    no per-visit DMA exists at all. The popped node index is carried in
    ``istate_scr[_CURTILE]`` (unused by this kernel otherwise)."""
    f32 = jnp.float32
    ns = len(streams)

    for s, st in enumerate(streams):
        shp = st.dirs()[0].shape
        st.write("t", jnp.full(shp, INF, f32))
        st.write("nx", jnp.zeros(shp, f32))
        st.write("ny", jnp.zeros(shp, f32))
        st.write("nz", jnp.zeros(shp, f32))
        st.write("tri", jnp.full(shp, -1, jnp.int32))
        stack_n[s, 0] = st.entry
        stack_d[s, 0] = f32(0.0)
        maxb_scr[s, 0] = f32(INF)
        maxb_scr[s, 1] = f32(INF)
        istate_scr[_SP, s] = jnp.int32(0)   # sp: entry sits at slot 0
        istate_scr[_PEND, s] = jnp.int32(0)
        istate_scr[_VISITS, s] = jnp.int32(0)
        istate_scr[_CURTILE, s] = jnp.int32(0)

    def fetch(s, node):
        return pltpu.make_async_copy(qnodes_ref.at[node], node_scr.at[s], sems.at[s])

    # prologue: dummy fetch per stream so the loop's wait is always paired
    if not direct:
        for s in range(ns):
            fetch(s, 0).start()

    def body(_):
        cont = jnp.bool_(False)
        for s in range(ns):
            if direct:
                node_cur = istate_scr[_CURTILE, s]

                def rd(w, s=s, node_cur=node_cur):
                    return qnodes_ref[node_cur, w // 128, w % 128]
            else:
                fetch(s, 0).wait()
                rd = None

            @pl.when(istate_scr[_PEND, s] != 0)
            def _(s=s, rd=rd):
                _consume(s, streams[s], node_scr, stack_n, stack_d,
                         maxb_scr, istate_scr, leaf_k, rd=rd, ordered=ordered,
                         width=width)

            # branchless double-pop: a culled top entry costs only scalar
            # work here instead of a whole idle iteration slot (~330 ns) —
            # the second-chance pop takes the next entry when the top is
            # culled. Any-hit streams whose lanes are ALL occluded drive
            # maxb to 0, which culls every remaining entry (dist ≥ 0):
            # flush the stack outright instead of draining it pop by pop.
            sp = istate_scr[_SP, s]
            mb = maxb_scr[s, 1]
            sp = jnp.where(mb <= 0.0, jnp.int32(-1), sp)
            live = sp >= 0
            spc = jnp.maximum(sp, 0)
            valid = live & (stack_d[s, spc] < mb)
            sp2 = sp - 1
            live2 = sp2 >= 0
            spc2 = jnp.maximum(sp2, 0)
            take2 = jnp.logical_not(valid) & live2
            valid2 = take2 & (stack_d[s, spc2] < mb)
            node = jnp.where(valid, stack_n[s, spc],
                             jnp.where(valid2, stack_n[s, spc2], 0))
            if direct:
                istate_scr[_CURTILE, s] = node
            else:
                fetch(s, node).start()
            sp_next = jnp.where(live, jnp.where(take2, sp - 2, sp - 1), sp)
            istate_scr[_SP, s] = sp_next
            istate_scr[_PEND, s] = (valid | valid2).astype(jnp.int32)
            cont = cont | valid | valid2 | (sp_next >= 0)
        return cont

    jax.lax.while_loop(lambda c: c, body, jnp.bool_(True))

    # epilogue: every stream has one outstanding (dummy) fetch
    if not direct:
        for s in range(ns):
            fetch(s, 0).wait()


def _rotate_quat(qx, qy, qz, qw, dx, dy, dz):
    """Rotate (dx,dy,dz) by quaternion — renderer.wgsl:66-72 semantics.
    Works for scalars and (SUB,128) tiles alike."""
    uvx = qy * dz - qz * dy
    uvy = qz * dx - qx * dz
    uvz = qx * dy - qy * dx
    uuvx = qy * uvz - qz * uvy
    uuvy = qz * uvx - qx * uvz
    uuvz = qx * uvy - qy * uvx
    return (
        2.0 * (qw * uvx + uuvx) + dx,
        2.0 * (qw * uvy + uuvy) + dy,
        2.0 * (qw * uvz + uuvz) + dz,
    )


def _persistent_kernel(
    use_jitter,         # static python bool — gates PRNG tracing
    num_tiles,          # static python int — total queue length = F · tiles/frame
    ntx,                # static python int — tiles per row
    leaf_k,             # static python int — triangles per leaf record slot
    rec_width,          # static python int — child slots per record (4 or 8)
    tiles_per_frame,    # static python int — tiles in one frame (nty·ntx)
    cam_ref,            # SMEM (F, 16) f32 per frame: ox,oy,oz, qx,qy,qz,qw, focal, aspect, W, H, seed, roff, coff
    entry_ref,          # SMEM (nty, ntx) i32 — per-tile traversal entry nodes (shared across frames)
    tbound_ref,         # SMEM (nty, ntx) f32 — per-tile initial far bound (INF = none)
    qnodes_ref,         # HBM (M, 128) f32
    out_ref,            # HBM (F·T, 6, SUB, 128) f32 — planes t,nx,ny,nz,tri,visits
    ray_scr,            # VMEM (NS, 6, SUB, 128) f32 — dx,dy,dz,ix,iy,iz
    hit_scr,            # VMEM (NS, 6, SUB, 128) f32 — live hit state
    stage_scr,          # VMEM (NS, 2, 6, SUB, 128) f32 — out staging (dbl-buf)
    node_scr, stack_n, stack_d, maxb_scr, istate_scr, fstate_scr,
    sems,               # DMA (NS,) record-fetch
    osems,              # DMA (NS, 2) out-copy per staging buffer
):
    """Primary-ray kernel: ONE program, NS persistent streams popping tiles
    from a shared dynamic work queue (SMEM next-tile counter).

    The queue spans a whole FRAME BATCH: tile id t belongs to frame
    t // tiles_per_frame and in-frame tile t % tiles_per_frame, with per-
    frame camera rows in ``cam_ref``. One kernel call renders all F frames —
    at small resolutions the per-call dispatch/prologue cost (~0.3-0.5 ms)
    otherwise dominates (config 1 was relay-dispatch bound, PERF.md #10) —
    and streams flow straight across frame boundaries with zero idling."""
    f32 = jnp.float32

    def raygen(s, tile):
        """Fused ray generation (renderer.wgsl:364-396) for tile ``tile``
        into stream ``s``'s scratch; seeds the stack with the tile entry."""
        fidx = tile // tiles_per_frame
        rem = tile - fidx * tiles_per_frame
        ox, oy, oz = cam_ref[fidx, 0], cam_ref[fidx, 1], cam_ref[fidx, 2]
        qx, qy, qz, qw = (cam_ref[fidx, 3], cam_ref[fidx, 4],
                          cam_ref[fidx, 5], cam_ref[fidx, 6])
        focal, aspect = cam_ref[fidx, 7], cam_ref[fidx, 8]
        width, height = cam_ref[fidx, 9], cam_ref[fidx, 10]
        seed = cam_ref[fidx, 11].astype(jnp.int32)
        row_off = cam_ref[fidx, 12].astype(jnp.int32)
        col_off = cam_ref[fidx, 13].astype(jnp.int32)
        ti = rem // ntx
        tj = rem - ti * ntx
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
        lane = r_ids * 128 + c_ids
        px = tj * TILE + lane % TILE + col_off
        py = ti * TILE + lane // TILE + row_off
        if use_jitter:
            jx = subpixel_hash01(px, py, seed * 2 + 0)
            jy = subpixel_hash01(px, py, seed * 2 + 1)
        else:
            jx = jy = f32(0.5)
        u = (px.astype(f32) + jx) / width * 2.0 - 1.0
        v = (py.astype(f32) + jy) / height * 2.0 - 1.0
        dx = u * aspect
        dy = v
        dz = jnp.full((SUB, 128), -focal, f32)
        inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len
        dx, dy, dz = _rotate_quat(qx, qy, qz, qw, dx, dy, dz)

        def safe_inv(d):
            return jnp.where(jnp.abs(d) > 1e-8, 1.0 / d, f32(INF))

        ray_scr[s, 0], ray_scr[s, 1], ray_scr[s, 2] = dx, dy, dz
        ray_scr[s, 3], ray_scr[s, 4], ray_scr[s, 5] = (
            safe_inv(dx), safe_inv(dy), safe_inv(dz)
        )

        # tile-center ray direction (scalars) — the ordering axis
        ucx = ((tj * TILE + TILE * 0.5).astype(f32) + col_off.astype(f32)) / width * 2.0 - 1.0
        ucx = ucx * aspect
        vcy = ((ti * TILE + TILE * 0.5).astype(f32) + row_off.astype(f32)) / height * 2.0 - 1.0
        c_inv = jax.lax.rsqrt(ucx * ucx + vcy * vcy + focal * focal)
        dcx, dcy, dcz = _rotate_quat(
            qx, qy, qz, qw, ucx * c_inv, vcy * c_inv, -focal * c_inv
        )
        fstate_scr[0, s] = dcx
        fstate_scr[1, s] = dcy
        fstate_scr[2, s] = dcz
        # per-stream camera origin (frames in one batch have different
        # cameras, so the origin can no longer be a kernel-level constant)
        fstate_scr[3, s] = ox
        fstate_scr[4, s] = oy
        fstate_scr[5, s] = oz

        # reset hit state + stack. A finite per-tile depth bound (from a
        # coarse prepass — see render.py::render_ldr_bounded) seeds best-t
        # and the pop-cull bound: geometry behind the bound is pruned by the
        # ordinary slab/cull tests. Lanes that end with tri<0 under a finite
        # bound are re-traced unbounded by the host (the repair pass), so
        # the final image is exact.
        tb = tbound_ref[ti, tj]
        hit_scr[s, 0] = jnp.full((SUB, 128), tb, f32)
        hit_scr[s, 1] = jnp.zeros((SUB, 128), f32)
        hit_scr[s, 2] = jnp.zeros((SUB, 128), f32)
        hit_scr[s, 3] = jnp.zeros((SUB, 128), f32)
        hit_scr[s, 4] = jnp.full((SUB, 128), -1.0, f32)
        stack_n[s, 0] = entry_ref[ti, tj]
        stack_d[s, 0] = f32(0.0)
        maxb_scr[s, 0] = tb
        maxb_scr[s, 1] = tb
        istate_scr[_SP, s] = jnp.int32(0)
        istate_scr[_VISITS, s] = jnp.int32(0)

    _fields = {"t": 0, "nx": 1, "ny": 2, "nz": 3, "tri": 4}

    streams = []
    for s in range(NS):
        def make_rw(s=s):
            def write(field, val):
                hit_scr[s, _fields[field]] = val

            def read(field):
                return hit_scr[s, _fields[field]]
            return write, read

        def make_loaders(s=s):
            def dirs():
                return ray_scr[s, 0], ray_scr[s, 1], ray_scr[s, 2]

            def invs():
                return ray_scr[s, 3], ray_scr[s, 4], ray_scr[s, 5]

            def order_d():
                return fstate_scr[0, s], fstate_scr[1, s], fstate_scr[2, s]

            def origin():
                return fstate_scr[3, s], fstate_scr[4, s], fstate_scr[5, s]
            return dirs, invs, order_d, origin

        dirs_fn, invs_fn, order_fn, origin_fn = make_loaders()
        w, r = make_rw()
        streams.append(_Stream(
            dirs=dirs_fn, invs=invs_fn, origin=origin_fn,
            order_slack=jnp.float32(0.0), order_d=order_fn,
            order_o=origin_fn, entry=jnp.int32(0), write=w, read=r,
        ))

    def fetch(s, node):
        return pltpu.make_async_copy(qnodes_ref.at[node], node_scr.at[s], sems.at[s])

    def out_copy(s, b, tile):
        return pltpu.make_async_copy(
            stage_scr.at[s, b], out_ref.at[tile], osems.at[s, b]
        )

    # prologue: first tile per stream (static python guard for tiny frames)
    istate_scr[_NEXT, 0] = jnp.int32(min(NS, num_tiles))
    for s in range(NS):
        istate_scr[_PEND, s] = jnp.int32(0)
        istate_scr[_BUF, s] = jnp.int32(0)
        istate_scr[_DMA0, s] = jnp.int32(0)
        istate_scr[_DMA1, s] = jnp.int32(0)
        if s < num_tiles:
            istate_scr[_CURTILE, s] = jnp.int32(s)
            raygen(s, jnp.int32(s))
        else:
            istate_scr[_CURTILE, s] = jnp.int32(num_tiles)
            istate_scr[_SP, s] = jnp.int32(-1)
        fetch(s, 0).start()

    def finish_tile(s):
        """Stream s's stack drained: flush the finished tile and advance."""
        tile = istate_scr[_CURTILE, s]
        hit_scr[s, 5] = jnp.full((SUB, 128), istate_scr[_VISITS, s], jnp.int32
                                 ).astype(jnp.float32)
        b = istate_scr[_BUF, s]
        for bb, flag_row in ((0, _DMA0), (1, _DMA1)):
            @pl.when(b == bb)
            def _(s=s, bb=bb, flag_row=flag_row):
                # the copy started from this buffer 2 tiles ago must be done
                @pl.when(istate_scr[flag_row, s] != 0)
                def _(s=s, bb=bb):
                    out_copy(s, bb, 0).wait()
                stage_scr[s, bb] = hit_scr[s]
                cp = out_copy(s, bb, tile)
                cp.start()
                if _SYNC_OUT:
                    cp.wait()
                    istate_scr[flag_row, s] = jnp.int32(0)
                else:
                    istate_scr[flag_row, s] = jnp.int32(1)
        istate_scr[_BUF, s] = 1 - b

        # dynamic work queue: pop the shared next-tile counter (round-2's
        # static s, s+NS, … interleave left ~40% of stream slots idle once a
        # stream drew an expensive run of tiles; the shared counter bounds
        # idling to the global tail of ≤ NS−1 tiles)
        nxt = istate_scr[_NEXT, 0]
        istate_scr[_NEXT, 0] = nxt + 1
        istate_scr[_CURTILE, s] = nxt

        @pl.when(nxt < num_tiles)
        def _(s=s):
            raygen(s, nxt)

    def body(_):
        cont = jnp.bool_(False)
        for s in range(NS):
            fetch(s, 0).wait()

            @pl.when(istate_scr[_PEND, s] != 0)
            def _(s=s):
                _consume(s, streams[s], node_scr, stack_n, stack_d,
                         maxb_scr, istate_scr, leaf_k, width=rec_width)

            # drained → flush tile, advance to the next queued tile
            @pl.when((istate_scr[_SP, s] < 0)
                     & (istate_scr[_CURTILE, s] < num_tiles))
            def _(s=s):
                finish_tile(s)

            # branchless double-pop (same as the fixed-stream loop): a
            # culled top entry costs scalar work, not an idle ~330 ns slot
            sp = istate_scr[_SP, s]
            mb = maxb_scr[s, 1]
            live = sp >= 0
            spc = jnp.maximum(sp, 0)
            valid = live & (stack_d[s, spc] < mb)
            sp2 = sp - 1
            live2 = sp2 >= 0
            spc2 = jnp.maximum(sp2, 0)
            take2 = jnp.logical_not(valid) & live2
            valid2 = take2 & (stack_d[s, spc2] < mb)
            node = jnp.where(valid, stack_n[s, spc],
                             jnp.where(valid2, stack_n[s, spc2], 0))
            fetch(s, node).start()
            istate_scr[_SP, s] = jnp.where(
                live, jnp.where(take2, sp - 2, sp - 1), sp)
            istate_scr[_PEND, s] = (valid | valid2).astype(jnp.int32)
            cont = cont | (istate_scr[_CURTILE, s] < num_tiles)
        return cont

    jax.lax.while_loop(lambda c: c, body, jnp.bool_(True))

    # epilogue: balance the outstanding record fetch + out copies
    for s in range(NS):
        fetch(s, 0).wait()
        for bb, flag_row in ((0, _DMA0), (1, _DMA1)):
            @pl.when(istate_scr[flag_row, s] != 0)
            def _(s=s, bb=bb):
                out_copy(s, bb, 0).wait()


def _raybuf_kernel(
    any_hit,                                           # static python bool
    leaf_k,                                            # static python int
    rec_width,                                         # static python int — child slots per record
    direct,                                            # static python bool — SMEM-resident tree
    ordered,                                           # static python bool — near-first ordering
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # VMEM (NS,SUB,128)
    qnodes_ref,                                        # HBM/VMEM/SMEM (M, R, 128)
    t_out, nx_out, ny_out, nz_out, tri_out,           # VMEM (NS,SUB,128)
    node_scr, stack_n, stack_d, maxb_scr, istate_scr, sems,
):
    """Arbitrary-ray-buffer kernel: bounce waves, shadow rays, custom rays.

    Per-stream statistics (origin AABB, mean direction) replace the shared
    camera origin for the scalar cull/ordering metrics — conservative for
    arbitrary per-lane origins.
    """
    f32 = jnp.float32
    outs = {"t": t_out, "nx": nx_out, "ny": ny_out, "nz": nz_out, "tri": tri_out}

    streams = []
    for s in range(NS):
        ox, oy, oz = ox_ref[s], oy_ref[s], oz_ref[s]
        dx, dy, dz = dx_ref[s], dy_ref[s], dz_ref[s]

        def safe_inv(d):
            return jnp.where(jnp.abs(d) > 1e-8, 1.0 / d, f32(INF))

        clox, cloy, cloz = jnp.min(ox), jnp.min(oy), jnp.min(oz)
        chix, chiy, chiz = jnp.max(ox), jnp.max(oy), jnp.max(oz)
        odx, ody, odz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)  # mean dir
        od_inv = jax.lax.rsqrt(odx * odx + ody * ody + odz * odz + f32(1e-30))
        odx, ody, odz = odx * od_inv, ody * od_inv, odz * od_inv
        oox = (clox + chix) * 0.5
        ooy = (cloy + chiy) * 0.5
        ooz = (cloz + chiz) * 0.5
        hx, hy, hz = (chix - clox) * 0.5, (chiy - cloy) * 0.5, (chiz - cloz) * 0.5
        slack = jnp.sqrt(hx * hx + hy * hy + hz * hz)
        # guard against inf pad-origins poisoning the metrics
        slack = jnp.where(jnp.isfinite(slack), slack, f32(INF))

        def make_rw(s=s):
            def write(field, val):
                outs[field][s] = val

            def read(field):
                return outs[field][s]
            return write, read

        w, r = make_rw()
        streams.append(_Stream(
            dirs=(dx, dy, dz),
            invs=(safe_inv(dx), safe_inv(dy), safe_inv(dz)),
            origin=(ox, oy, oz),
            order_slack=slack,
            order_d=(odx, ody, odz),
            order_o=(oox, ooy, ooz),
            entry=jnp.int32(0),
            write=w,
            read=r,
            any_hit=any_hit,
        ))

    _traverse_streams(qnodes_ref, streams, node_scr, stack_n, stack_d,
                      maxb_scr, istate_scr, sems, leaf_k, direct=direct,
                      ordered=ordered, width=rec_width)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def _scratch_shapes(recw=REC):
    return [
        pltpu.SMEM((NS, recw // 128, 128), jnp.float32),
        pltpu.SMEM((NS, STACK_MAX + 1), jnp.int32),
        pltpu.SMEM((NS, STACK_MAX + 1), jnp.float32),
        pltpu.SMEM((NS, 2), jnp.float32),
        pltpu.SMEM((8, NS), jnp.int32),
        pltpu.SemaphoreType.DMA((NS,)),
    ]


def _persistent_scratch_shapes(recw=REC):
    return [
        pltpu.VMEM((NS, 6, SUB, 128), jnp.float32),   # ray_scr
        pltpu.VMEM((NS, 6, SUB, 128), jnp.float32),   # hit_scr
        pltpu.VMEM((NS, 2, 6, SUB, 128), jnp.float32),  # stage_scr
        pltpu.SMEM((NS, recw // 128, 128), jnp.float32),
        pltpu.SMEM((NS, STACK_MAX + 1), jnp.int32),
        pltpu.SMEM((NS, STACK_MAX + 1), jnp.float32),
        pltpu.SMEM((NS, 2), jnp.float32),
        pltpu.SMEM((8, NS), jnp.int32),
        pltpu.SMEM((8, NS), jnp.float32),   # fstate: order dir (0-2) + origin (3-5)
        pltpu.SemaphoreType.DMA((NS,)),
        pltpu.SemaphoreType.DMA((NS, 2)),
    ]


@partial(jax.jit, static_argnames=("width", "height", "fov_degrees", "interpret", "stats", "jitter", "raygen_size", "leaf_k"))
def trace_tiles_pallas(
    qnodes: jax.Array,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    width: int,
    height: int,
    fov_degrees: float = 70.0,
    interpret: bool = False,
    stats: bool = False,
    entries: jax.Array | None = None,
    jitter: bool = False,
    jitter_seed=0,
    raygen_size: tuple[int, int] | None = None,
    row_offset=0,
    col_offset=0,
    leaf_k: int = 1,
    tbounds: jax.Array | None = None,
):
    """Trace all primary rays → (t, nx, ny, nz, tri[, visits]) images of
    (height,width); ``stats=True`` appends a per-tile visit-count plane.

    Any width/height works — the kernel pads internally to the TILE-pixel
    granularity and crops the result.

    ``raygen_size``/``row_offset``/``col_offset`` render a band of a larger
    virtual frame: ray generation uses the full (W, H) while the tile queue
    covers only this call's width×height window at the given pixel offset —
    the multi-chip tile sharding renders one band per chip this way.
    """
    pw = -(-width // TILE) * TILE
    ph = -(-height // TILE) * TILE
    nty, ntx = ph // TILE, pw // TILE
    num_tiles = nty * ntx

    rg_w, rg_h = raygen_size if raygen_size is not None else (width, height)
    focal = 1.0 / math.tan(0.5 * math.radians(fov_degrees))
    cam = jnp.concatenate(
        [
            jnp.asarray(cam_pos, jnp.float32).reshape(3),
            jnp.asarray(cam_quat, jnp.float32).reshape(4),
            jnp.array([focal, rg_w / rg_h, rg_w, rg_h], jnp.float32),
            jnp.asarray(jitter_seed, jnp.float32).reshape(1),
            jnp.asarray(row_offset, jnp.float32).reshape(1),
            jnp.asarray(col_offset, jnp.float32).reshape(1),
            jnp.zeros((2,), jnp.float32),
        ]
    )[None, :]

    out = _tiles_call(qnodes, cam, width, height, jitter, leaf_k,
                      entries, tbounds, interpret)

    # (1·T, 6, SUB, 128) → 6 × (H, W); tri/visits planes carry exact ints
    img = out.reshape(nty, ntx, 6, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(6, ph, pw)[:, :height, :width]
    planes = (
        img[0], img[1], img[2], img[3],
        img[4].astype(jnp.int32),
        img[5].astype(jnp.int32),
    )
    return planes if stats else planes[:5]


def _tiles_call(qnodes, cam_rows, width, height, jitter, leaf_k,
                entries, tbounds, interpret):
    """Shared pallas_call for the persistent tile kernel: ``cam_rows`` is
    (F, 16) — F frames rendered from ONE tile queue of F·nty·ntx tiles.
    Returns raw (F·T, 6, SUB, 128) tile planes."""
    pw = -(-width // TILE) * TILE
    ph = -(-height // TILE) * TILE
    nty, ntx = ph // TILE, pw // TILE
    tiles_per_frame = nty * ntx
    num_frames = cam_rows.shape[0]
    num_tiles = num_frames * tiles_per_frame

    if entries is None:
        entries = jnp.zeros((nty, ntx), jnp.int32)
    else:
        ey, ex = entries.shape
        entries = jnp.pad(entries, ((0, nty - ey), (0, ntx - ex)))

    if tbounds is None:
        tbounds = jnp.full((nty, ntx), INF, jnp.float32)
    else:
        by, bx = tbounds.shape
        tbounds = jnp.pad(tbounds, ((0, nty - by), (0, ntx - bx)),
                          constant_values=INF)

    recw = qnodes.shape[1] * qnodes.shape[2]
    rec_width = infer_rec_width(leaf_k, recw)
    return pl.pallas_call(
        partial(_persistent_kernel, jitter, num_tiles, ntx, leaf_k, rec_width,
                tiles_per_frame),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam rows (F, 16)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # entries (full, tiny)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tbounds (full, tiny)
            pl.BlockSpec(memory_space=pltpu.HBM),   # qnodes
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 6, SUB, 128), jnp.float32),
        scratch_shapes=_persistent_scratch_shapes(recw),
        interpret=interpret,
    )(cam_rows, entries, tbounds, qnodes)


@partial(jax.jit, static_argnames=("width", "height", "fov_degrees",
                                   "interpret", "stats", "jitter", "leaf_k",
                                   "raw"))
def trace_tiles_batch_pallas(
    qnodes: jax.Array,
    cam_pos: jax.Array,        # (F, 3)
    cam_quat: jax.Array,       # (F, 4)
    width: int,
    height: int,
    fov_degrees: float = 70.0,
    interpret: bool = False,
    stats: bool = False,
    jitter: bool = False,
    jitter_seeds=None,         # (F,) per-frame subpixel seeds
    leaf_k: int = 1,
    raw: bool = False,
):
    """Frame-BATCH primary trace: F cameras rendered by ONE kernel call
    (one shared tile queue spanning all frames). Same per-pixel results as
    F separate trace_tiles_pallas calls (parity-tested in interpret mode);
    use for camera batches / frame batches where per-call dispatch overhead
    would dominate (256²-class frames: ~0.3-0.5 ms/call — PERF.md r3 #10).

    Returns (t, nx, ny, nz, tri[, visits]) with leading frame dim (F, H, W).

    ``raw=True`` skips the tile→image transpose and returns the kernel's
    native (F, tiles, 6, SUB, 128) layout — reductions (hit counts, sums)
    are layout-independent, and the transpose materializes F·6 full frames
    of traffic that count-only consumers (benchmarks, multi-cam hit tests)
    would throw away. Requires width/height multiples of TILE.
    """
    f = cam_pos.shape[0]
    pw = -(-width // TILE) * TILE
    ph = -(-height // TILE) * TILE
    nty, ntx = ph // TILE, pw // TILE
    focal = 1.0 / math.tan(0.5 * math.radians(fov_degrees))
    if jitter_seeds is None:
        jitter_seeds = jnp.zeros((f,), jnp.float32)
    consts = jnp.broadcast_to(
        jnp.array([focal, width / height, width, height], jnp.float32),
        (f, 4))
    cam_rows = jnp.concatenate(
        [
            jnp.asarray(cam_pos, jnp.float32).reshape(f, 3),
            jnp.asarray(cam_quat, jnp.float32).reshape(f, 4),
            consts,
            jnp.asarray(jitter_seeds, jnp.float32).reshape(f, 1),
            jnp.zeros((f, 4), jnp.float32),   # row_off, col_off, pad
        ],
        axis=1,
    )
    out = _tiles_call(qnodes, cam_rows, width, height, jitter, leaf_k,
                      None, None, interpret)
    if raw:
        if width % TILE or height % TILE:
            raise ValueError("raw=True needs TILE-aligned width/height")
        return out.reshape(f, nty * ntx, 6, SUB, 128)
    img = out.reshape(f, nty, ntx, 6, TILE, TILE)
    img = img.transpose(3, 0, 1, 4, 2, 5).reshape(6, f, ph, pw)[:, :, :height, :width]
    planes = (
        img[0], img[1], img[2], img[3],
        img[4].astype(jnp.int32),
        img[5].astype(jnp.int32),
    )
    return planes if stats else planes[:5]


@partial(jax.jit, static_argnames=("interpret", "any_hit", "leaf_k", "sub",
                                   "tree_space", "ordered"))
def trace_rays_pallas(
    qnodes: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    interpret: bool = False,
    any_hit: bool = False,
    leaf_k: int = 1,
    sub: int = SUB,
    tree_space: str = "hbm",
    ordered: bool = True,
):
    """Closest-hit trace of an arbitrary ray buffer through the supernode
    kernel → (t, nx, ny, nz, tri), each shape (R,).

    Rays are processed in NS independent ``sub``×128-lane streams per
    program; keep them spatially coherent (tile-block order for bounce
    waves) — the block-shared stacks bet on it. Pad rays are given far-away
    origins so their streams drain after a single root visit.

    ``sub`` (default SUB=8 → 1024-lane streams, the tile kernel's packet
    size) sets the stream width. DIVERGENT waves (bounce directions) make
    every stream walk ~the whole tree regardless of width, so wider streams
    amortize the per-visit scalar+DMA cost over more rays — measured wins
    for sub=16/32 on interior bounce waves (PERF.md round 3). Keep the
    default for coherent primaries, where a wider packet inflates the
    frustum union instead.

    ``any_hit=True`` turns the trace into an occlusion query (NEE shadow
    rays): lanes stop at their first accepted intersection and whole
    streams terminate early once every lane is occluded. ``tri >= 0`` (or
    ``t == 0``) means occluded; ``t`` is NOT a distance in this mode.

    ``tree_space`` picks where the supernode records live during traversal
    (PERF.md roadmap #1 — the per-visit fetch is the divergent-wave floor):
      * "hbm"  — per-visit HBM→SMEM DMA (default; only option for big scenes)
      * "vmem" — records preloaded into VMEM; per-visit DMA is VMEM→SMEM
                 (far lower latency than HBM when 4-way streaming can't
                 hide it). Tree must fit VMEM (≤ ~12 MB).
      * "smem" — records ARE scalar memory; record words are read directly
                 per visit with NO DMA at all. Tree must fit SMEM — the
                 v5e has 1 MB total (measured compile error, PERF.md r4
                 #2), so this only fits toy trees (a K=32 record is 7 KB).
    All three produce bit-identical results (parity-tested). Measured on
    config-4-class divergent waves: vmem ≈ hbm (the 4-stream interleave
    already hides the fetch — PERF.md r4 #2); the options stay for
    future hardware generations / small-tree workloads.

    ``ordered=False`` drops the near-first push ordering (projected-center
    key + 4-way sorting network, ~100 scalar ops/visit on the scalar-issue-
    bound consume loop) and the push-time cull. Same hits/normals/ids —
    only the traversal ORDER changes, so closest-hit results are identical
    and any-hit results pick a possibly-different (still valid) occluder
    flag. Meant for divergent waves where the stream-mean ordering axis is
    too weak to prune (A/B per config — PERF.md round 4).
    """
    r = origins.shape[0]
    rec_width = infer_rec_width(leaf_k, qnodes.shape[1] * qnodes.shape[2])
    grp = NS * sub * 128
    pad = (-r) % grp
    o = jnp.pad(origins, ((0, pad), (0, 0)), constant_values=INF)
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    nt = o.shape[0] // grp

    def plane(a, c):
        return a[:, c].reshape(nt, NS, sub, 128)

    in_planes = [plane(o, 0), plane(o, 1), plane(o, 2),
                 plane(d, 0), plane(d, 1), plane(d, 2)]

    spec = pl.BlockSpec((1, NS, sub, 128), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((nt, NS, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, NS, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, NS, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, NS, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, NS, sub, 128), jnp.int32),
    ]

    if tree_space not in ("hbm", "vmem", "smem"):
        raise ValueError(f"tree_space must be hbm|vmem|smem, got {tree_space!r}")
    direct = tree_space == "smem"
    tree_mem = {"hbm": pltpu.HBM, "vmem": pltpu.VMEM, "smem": pltpu.SMEM}[
        tree_space]

    def kern(*args):
        # strip the leading block axis of size 1 from every ref
        ins = args[:6]
        qn = args[6]
        outs_ = args[7:12]
        scr = args[12:]

        class _Sq:
            def __init__(self, ref):
                self.ref = ref

            def __getitem__(self, idx):
                return self.ref[(0, *((idx,) if not isinstance(idx, tuple) else idx))]

            def __setitem__(self, idx, val):
                self.ref[(0, *((idx,) if not isinstance(idx, tuple) else idx))] = val

        _raybuf_kernel(any_hit, leaf_k, rec_width, direct, ordered,
                       *[_Sq(x) for x in ins], qn,
                       *[_Sq(x) for x in outs_], *scr)

    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=tree_mem)],
        out_specs=[spec] * 5,
        out_shape=out_shape,
        scratch_shapes=_scratch_shapes(rec_layout(leaf_k, rec_width)[2]),
        interpret=interpret,
    )(*in_planes, qnodes)

    return tuple(a.reshape(-1)[:r] for a in outs)
