"""Pallas TPU traversal kernel — multi-stream block-shared-stack tracing.

The TPU-native replacement for the WGSL megakernel's SIMT traversal
(renderer.wgsl:210-346). The mapping of concepts:

* WGSL workgroup of 16×16 threads × 2×2 ray packets → ONE Pallas program per
  2×2 block of 32×32-pixel tiles. Each tile's 1024 rays live in the vector
  lanes of an (8,128) VPU tile; the reference's per-thread packet masking
  becomes per-lane masking, which the VPU does for free.
* Per-thread stack in registers → one scalar stack per tile in SMEM, shared
  by all 1024 rays of that tile. A node is visited iff *any* ray in the tile
  wants it — the packet-coherence bet of the reference (renderer.wgsl:4-6)
  taken to 1024-wide.
* Divergent memory access (the SIMT gathers of node + triangle records) →
  ONE scalar-indexed async DMA per visit: a 512-byte "supernode" record
  (4 child AABBs, child refs, and the full triangle data of leaf children
  inlined) lands in SMEM and all its fields are *scalars* broadcast against
  the lane tile. No per-lane gathers exist anywhere in the kernel.
* **Four independent streams per program** (the round-2 redesign): BVH
  traversal is a dependent pointer chase — a single stack exposes the full
  ~300 ns HBM→SMEM DMA latency on every visit (round 1 measured
  ~380 ns/visit). Four tile-stacks round-robined in one loop iteration give
  each stream's DMA the other three streams' consumption (~340 ns) to land:
  measured ~129 ns/visit, within 13% of the no-DMA consumption floor
  (tools/mb_results_r2.md). DMA start/wait pairs are unconditional per
  iteration (drained streams fetch node 0 as a harmless dummy) — Mosaic
  mishandles conditionally-skipped DMAs across while_loop iterations.
* Ray generation (renderer.wgsl:364-396) is fused into the kernel (pixel
  coords from program_id + iota), and hit normals are tracked in vector
  registers, so per-ray HBM traffic is exactly the 5 output planes.

Supernode record (128 × f32, Mosaic lane-aligned; built by make_qnodes):
  [0:24]   4 × child AABB (mnx,mny,mnz,mxx,mxy,mxz), +inf/−inf when empty
  [24:28]  child refs encoded as exact integer-valued floats:
             idx ≥ 0  → internal child node index
             −(tri+1) → leaf holding triangle ``tri``
             −2^28    → empty slot
  [32+12k : 41+12k]  leaf triangle vertices for slot k (v0,v1,v2), else 0

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

__all__ = ["make_qnodes", "trace_tiles_pallas", "trace_rays_pallas", "TILE", "REC"]

TILE = int(os.environ.get("RT_TILE", "32"))  # pixels per tile side; TILE² rays per stream
_ABLATE = os.environ.get("RT_ABLATE", "")  # perf ablations: "nomt", "noslab"
SUB = TILE * TILE // 128  # sublane count of the ray lane-tile (TILE²=SUB×128)
STACK_MAX = int(os.environ.get("RT_STACK", "64"))  # renderer.wgsl:8
GROUP = 2                 # program owns a GROUP×GROUP block of tiles
NS = GROUP * GROUP        # independent traversal streams per program
REC = 128                 # record width (f32 words) — lane-tile aligned
EMPTY_REF = -float(1 << 28)
INF = 1e30
MT_EPS = 1e-7

_MAX_NODES = 1 << 24      # refs are exact integer-valued f32 (ADVICE.md r1)


# ---------------------------------------------------------------------------
# Device-side data preparation (jitted once per scene)
# ---------------------------------------------------------------------------

@jax.jit
def make_qnodes(wide: WideBVH, tris: jax.Array) -> jax.Array:
    """WideBVH + (T,3,3) triangles → supernode records (M, 128) f32."""
    m = wide.cref.shape[0]
    n_tris = tris.shape[0]
    if m >= _MAX_NODES or n_tris >= _MAX_NODES:
        raise ValueError(
            f"scene too large for the f32 ref encoding: {m} nodes / {n_tris} "
            f"triangles (max {_MAX_NODES - 1}) — indices above 2^24 lose "
            "precision as f32"
        )
    rec = jnp.zeros((m, REC), jnp.float32)

    boxes = jnp.concatenate([wide.cmn, wide.cmx], axis=-1).reshape(m, 24)
    rec = rec.at[:, 0:24].set(boxes)

    cref = wide.cref  # (M,4) int32: -1 empty, bit30 → leaf|tri, else node idx
    leaf_bit = jnp.int32(1 << 30)
    is_leaf = (cref & leaf_bit) != 0
    tri_idx = cref & (leaf_bit - 1)
    enc = jnp.where(
        cref < 0,
        jnp.float32(EMPTY_REF),
        jnp.where(
            is_leaf,
            -(tri_idx.astype(jnp.float32) + 1.0),
            cref.astype(jnp.float32),
        ),
    )
    rec = rec.at[:, 24:28].set(enc)

    # inline leaf triangle vertices per slot; for internal children the same
    # region holds the child's bounding-sphere radius (the cull metric
    # ``max(proj − radius, 0)`` needs it — one scalar read replaces the
    # 17-op gap-distance computation per child)
    flat_tris = tris.reshape(n_tris, 9)
    safe_tri = jnp.clip(tri_idx, 0, n_tris - 1)
    verts = jnp.where(is_leaf[..., None], flat_tris[safe_tri], 0.0)  # (M,4,9)
    radius = 0.5 * jnp.linalg.norm(wide.cmx - wide.cmn, axis=-1)     # (M,4)
    radius = jnp.where(jnp.isfinite(radius), radius, 0.0)
    for k in range(4):
        rec = rec.at[:, 32 + 12 * k : 41 + 12 * k].set(verts[:, k, :])
        rec = rec.at[:, 32 + 12 * k].set(
            jnp.where(is_leaf[:, k], verts[:, k, 0], radius[:, k])
        )
    return rec


# ---------------------------------------------------------------------------
# Kernel core
# ---------------------------------------------------------------------------

class _Stream:
    """Per-stream traversal state: ray vectors, scalar metrics, output refs.

    Everything here is a traced value or a ref accessor captured at trace
    time — the class only exists to keep the NS-stream core readable.
    """

    def __init__(self, *, dirs, invs, origin, order_slack, order_d,
                 order_o, entry, write, read, any_hit=False):
        self.dx, self.dy, self.dz = dirs
        self.ix, self.iy, self.iz = invs
        self.ox, self.oy, self.oz = origin       # scalars or (SUB,128)
        self.order_slack = order_slack           # origin-AABB radius (0 = point)
        self.order_d = order_d                   # scalar UNIT ordering ray dir
        self.order_o = order_o
        self.entry = entry                       # scalar entry node index
        self.write = write                       # write(field, value)
        self.read = read                         # read(field) -> tile
        self.any_hit = any_hit                   # static: occlusion-only mode

    def read_t(self):
        return self.read("t")


def _traverse_streams(qnodes_ref, streams, node_scr, stack_n, stack_d,
                      maxb_scr, state_scr, sems, visits_out=None):
    """Round-robin multi-stream traversal loop (see module docstring).

    Per-stream mutable state lives in SMEM (``state_scr``: rows 0=stack
    pointer, 1=pending flag, 2=visit count) so the whole consume step can sit
    behind ``pl.when`` — a drained or cull-skipped stream costs only a scalar
    branch per iteration, not the full vector consume."""
    f32 = jnp.float32
    ns = len(streams)

    for s, st in enumerate(streams):
        st.write("t", jnp.full((SUB, 128), INF, f32))
        st.write("nx", jnp.zeros((SUB, 128), f32))
        st.write("ny", jnp.zeros((SUB, 128), f32))
        st.write("nz", jnp.zeros((SUB, 128), f32))
        st.write("tri", jnp.full((SUB, 128), -1, jnp.int32))
        stack_n[s, 0] = st.entry
        stack_d[s, 0] = f32(0.0)
        maxb_scr[s, 0] = f32(INF)
        maxb_scr[s, 1] = f32(INF)
        state_scr[0, s] = jnp.int32(0)   # sp: entry sits at slot 0
        state_scr[1, s] = jnp.int32(0)   # pending
        state_scr[2, s] = jnp.int32(0)   # visits

    def fetch(s, node):
        return pltpu.make_async_copy(qnodes_ref.at[node], node_scr.at[s], sems.at[s])

    def process(s):
        """Consume stream ``s``'s fetched record: MT its leaf children, slab-
        test its internal children, push survivors near-first. Runs under
        pl.when(pending) — the record DMA has already been waited on."""
        st = streams[s]
        sp = state_scr[0, s]

        best0 = st.read_t()
        maxb2 = maxb_scr[s, 1]

        push_ref = [jnp.int32(0)] * 4
        push_dist = [f32(0.0)] * 4
        push_internal = [jnp.bool_(False)] * 4
        push_order = [f32(0.0)] * 4
        accs = [jnp.zeros((SUB, 128), jnp.int32), jnp.zeros((SUB, 128), jnp.int32)]

        dx, dy, dz = st.dx, st.dy, st.dz
        ix, iy, iz = st.ix, st.iy, st.iz
        ox, oy, oz = st.ox, st.oy, st.oz
        (odx, ody, odz), (oox, ooy, ooz) = st.order_d, st.order_o

        refcs = [node_scr[s, 24 + k] for k in range(4)]
        leaf_flags = [(refcs[k] < 0.0) & (refcs[k] > f32(EMPTY_REF)) for k in range(4)]
        for k in range(4):
            refc = refcs[k]
            is_internal = refc >= 0.0

            # --- internal child: slab test (vector) + scalar metrics ---
            mnx, mny, mnz = node_scr[s, 6 * k], node_scr[s, 6 * k + 1], node_scr[s, 6 * k + 2]
            mxx, mxy, mxz = node_scr[s, 6 * k + 3], node_scr[s, 6 * k + 4], node_scr[s, 6 * k + 5]
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
            # pack per-slot hit counts into 16-bit fields (≤1024 per field)
            shift = 16 * (k // 2)
            accs[k % 2] = accs[k % 2] + jnp.where(hit, jnp.int32(1) << shift, 0)

            # near-first ordering: box center projected on the stream ray
            proj = (
                ((mnx + mxx) * 0.5 - oox) * odx
                + ((mny + mxy) * 0.5 - ooy) * ody
                + ((mnz + mxz) * 0.5 - ooz) * odz
            )
            # conservative cull bound: any hit t ≥ |box center − origin|
            # − box radius − origin-AABB radius ≥ proj − r − slack
            r = node_scr[s, 32 + 12 * k]
            dist_lb = jnp.maximum(proj - r - st.order_slack, f32(0.0))

            push_ref[k] = refc.astype(jnp.int32)
            push_dist[k] = dist_lb
            push_order[k] = proj
            push_internal[k] = is_internal & (dist_lb < maxb2)

        # the two lane reductions of this visit (slot-hit counts)
        if "noreduce" in _ABLATE:
            push_ok = push_internal
        else:
            red0 = jnp.sum(accs[0])
            red1 = jnp.sum(accs[1])
            slot_hit = [
                (red0 & 0xFFFF) != 0,
                (red1 & 0xFFFF) != 0,
                (red0 >> 16) != 0,
                (red1 >> 16) != 0,
            ]
            push_ok = [push_internal[k] & slot_hit[k] for k in range(4)]

        # --- leaf children: MT straight from the inlined vertices, under ONE
        # scalar branch gated by the slab test (a visit whose leaf slots all
        # fail the slab — or are occluded beyond best-t — skips MT entirely:
        # the box is the triangle's hull, so the slab can only pass a
        # superset of the MT-accepted lanes). Best-hit state is chained
        # through registers, one read/write per plane. ---
        do_mt = [leaf_flags[k] & slot_hit[k] for k in range(4)]
        any_mt = (do_mt[0] | do_mt[1] | do_mt[2] | do_mt[3]) & ("nomt" not in _ABLATE)

        @pl.when(any_mt)
        def _(s=s):
            cur = st.read_t()
            vnx, vny, vnz = st.read("nx"), st.read("ny"), st.read("nz")
            vtri = st.read("tri")
            for k in range(4):
                refc = refcs[k]
                b = 32 + 12 * k
                v0x, v0y, v0z = node_scr[s, b], node_scr[s, b + 1], node_scr[s, b + 2]
                v1x, v1y, v1z = node_scr[s, b + 3], node_scr[s, b + 4], node_scr[s, b + 5]
                v2x, v2y, v2z = node_scr[s, b + 6], node_scr[s, b + 7], node_scr[s, b + 8]
                e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

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
                    do_mt[k]                       # scalar → lane broadcast
                    & (jnp.abs(det) >= MT_EPS)
                    & (uu >= 0.0) & (uu <= 1.0)
                    & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > MT_EPS) & (tt < cur)
                )
                gnx = e1y * e2z - e1z * e2y
                gny = e1z * e2x - e1x * e2z
                gnz = e1x * e2y - e1y * e2x
                g_inv = jax.lax.rsqrt(gnx * gnx + gny * gny + gnz * gnz)
                tri_id = (-refc - 1.0).astype(jnp.int32)
                if st.any_hit:
                    # occlusion query: a hit lane's best-t drops to 0, which
                    # fails every later slab test (tmin ≥ 0) and MT accept
                    # (tt > eps) for that lane, and drives maxb to 0 once all
                    # lanes hit — the stack then drains through the pop cull.
                    # t is a hit FLAG (0 = occluded), not a distance.
                    cur = jnp.where(upd, f32(0.0), cur)
                else:
                    cur = jnp.where(upd, tt, cur)
                vnx = jnp.where(upd, gnx * g_inv, vnx)
                vny = jnp.where(upd, gny * g_inv, vny)
                vnz = jnp.where(upd, gnz * g_inv, vnz)
                vtri = jnp.where(upd, tri_id, vtri)
            st.write("t", cur)
            st.write("nx", vnx)
            st.write("ny", vny)
            st.write("nz", vnz)
            st.write("tri", vtri)
            # shrink the cull bound — only leaf hits can improve it
            mb = jnp.max(cur)
            maxb_scr[s, 0] = mb
            maxb_scr[s, 1] = mb

        # sorting network: children fully sorted, nearest pushed last so it
        # pops first (a WGSL-style nearest-only partial sort was measured
        # slower end-to-end: +12% visits for the ~20 ns/visit it saves)
        refs, dists, orders, oks = push_ref, push_dist, push_order, push_ok

        def swap_if(a, b, full=True):
            da = jnp.where(oks[a], orders[a], f32(-INF))
            db = jnp.where(oks[b], orders[b], f32(-INF))
            pred = da < db
            refs[a], refs[b] = (
                jnp.where(pred, refs[b], refs[a]),
                jnp.where(pred, refs[a], refs[b]),
            )
            dists[a], dists[b] = (
                jnp.where(pred, dists[b], dists[a]),
                jnp.where(pred, dists[a], dists[b]),
            )
            orders[a], orders[b] = jnp.where(pred, db, da), jnp.where(pred, da, db)
            oks[a], oks[b] = (
                jnp.where(pred, oks[b], oks[a]),
                jnp.where(pred, oks[a], oks[b]),
            )

        if "nosort" not in _ABLATE:
            swap_if(0, 1)
            swap_if(2, 3)
            swap_if(0, 2)
            swap_if(1, 3)
            swap_if(1, 2)

        # branchless pushes: rejected slots write to the dump row STACK_MAX
        for k in range(4):
            can = oks[k] & (sp < STACK_MAX - 1)
            sp = jnp.where(can, sp + 1, sp)
            pos = jnp.where(can, sp, STACK_MAX)
            stack_n[s, pos] = refs[k]
            stack_d[s, pos] = dists[k]

        state_scr[0, s] = sp
        state_scr[2, s] = state_scr[2, s] + 1

    # prologue: dummy fetch per stream so the loop's wait is always paired
    for s in range(ns):
        fetch(s, 0).start()

    def body(_):
        cont = jnp.bool_(False)
        for s in range(ns):
            fetch(s, 0).wait()

            @pl.when(state_scr[1, s] != 0)
            def _(s=s):
                process(s)

            # branchless pop: culled entries are discarded (one iteration
            # slot, scalar cost only — culled pops are rare: the packet
            # cull bound stays at INF while any lane in the tile misses)
            sp = state_scr[0, s]
            live = sp >= 0
            spc = jnp.maximum(sp, 0)
            valid = live & (stack_d[s, spc] < maxb_scr[s, 1])
            node = jnp.where(valid, stack_n[s, spc], 0)
            fetch(s, node).start()
            sp_next = jnp.where(live, sp - 1, sp)
            state_scr[0, s] = sp_next
            state_scr[1, s] = valid.astype(jnp.int32)
            cont = cont | valid | (sp_next >= 0)
        return cont

    jax.lax.while_loop(lambda c: c, body, jnp.bool_(True))

    # epilogue: every stream has one outstanding (dummy) fetch
    for s in range(ns):
        fetch(s, 0).wait()

    if visits_out is not None:
        for s, st in enumerate(streams):
            st.write("visits", jnp.full((SUB, 128), state_scr[2, s], jnp.int32))


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


def _kernel(
    use_jitter,         # static python bool — gates PRNG tracing
    cam_ref,            # SMEM (16,) f32: ox,oy,oz, qx,qy,qz,qw, focal, aspect, W, H, seed
    entry_ref,          # SMEM (nty, ntx) i32 — per-tile traversal entry nodes
    qnodes_ref,         # HBM (M, 128) f32
    t_out, nx_out, ny_out, nz_out, tri_out,   # VMEM (GROUP,GROUP,SUB,128)
    *rest,              # [visits_out,] node_scr, stack_n, stack_d, maxb_scr, state_scr, sems
):
    """Primary-ray kernel: fused in-kernel ray generation, NS streams."""
    if len(rest) == 7:
        visits_out, node_scr, stack_n, stack_d, maxb_scr, state_scr, sems = rest
    else:
        visits_out = None
        node_scr, stack_n, stack_d, maxb_scr, state_scr, sems = rest
    f32 = jnp.float32

    ox, oy, oz = cam_ref[0], cam_ref[1], cam_ref[2]
    qx, qy, qz, qw = cam_ref[3], cam_ref[4], cam_ref[5], cam_ref[6]
    focal, aspect = cam_ref[7], cam_ref[8]
    width, height = cam_ref[9], cam_ref[10]

    bi = pl.program_id(0)
    bj = pl.program_id(1)

    seed = cam_ref[11].astype(jnp.int32)
    row_off = cam_ref[12].astype(jnp.int32)
    col_off = cam_ref[13].astype(jnp.int32)

    r_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    lane = r_ids * 128 + c_ids

    outs = {"t": t_out, "nx": nx_out, "ny": ny_out, "nz": nz_out, "tri": tri_out,
            "visits": visits_out}

    streams = []
    for si in range(GROUP):
        for sj in range(GROUP):
            ti = bi * GROUP + si
            tj = bj * GROUP + sj
            # ---- fused ray generation (renderer.wgsl:364-396) ----
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

            # tile-center ray direction (scalars) — the ordering axis
            ucx = ((tj * TILE + TILE * 0.5 + col_off) / width * 2.0 - 1.0) * aspect
            vcy = (ti * TILE + TILE * 0.5 + row_off) / height * 2.0 - 1.0
            c_inv = jax.lax.rsqrt(ucx * ucx + vcy * vcy + focal * focal)
            dcx, dcy, dcz = _rotate_quat(
                qx, qy, qz, qw, ucx * c_inv, vcy * c_inv, -focal * c_inv
            )

            def make_rw(si=si, sj=sj):
                def write(field, val):
                    outs[field][si, sj] = val

                def read(field):
                    return outs[field][si, sj]
                return write, read

            streams.append(_Stream(
                dirs=(dx, dy, dz),
                invs=(safe_inv(dx), safe_inv(dy), safe_inv(dz)),
                origin=(ox, oy, oz),
                order_slack=jnp.float32(0.0),   # origin is a point
                order_d=(dcx, dcy, dcz),
                order_o=(ox, oy, oz),
                entry=entry_ref[ti, tj],
                write=make_rw()[0],
                read=make_rw()[1],
            ))

    _traverse_streams(qnodes_ref, streams, node_scr, stack_n, stack_d,
                      maxb_scr, state_scr, sems, visits_out)


def _raybuf_kernel(
    any_hit,                                           # static python bool
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # VMEM (NS,SUB,128)
    qnodes_ref,                                        # HBM (M, 128)
    t_out, nx_out, ny_out, nz_out, tri_out,           # VMEM (NS,SUB,128)
    node_scr, stack_n, stack_d, maxb_scr, state_scr, sems,
):
    """Arbitrary-ray-buffer kernel: bounce waves, shadow rays, custom rays.

    Per-stream statistics (origin AABB, mean direction) replace the shared
    camera origin for the scalar cull/ordering metrics — conservative for
    arbitrary per-lane origins.
    """
    f32 = jnp.float32
    outs = {"t": t_out, "nx": nx_out, "ny": ny_out, "nz": nz_out, "tri": tri_out,
            "visits": None}

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

        streams.append(_Stream(
            dirs=(dx, dy, dz),
            invs=(safe_inv(dx), safe_inv(dy), safe_inv(dz)),
            origin=(ox, oy, oz),
            order_slack=slack,
            order_d=(odx, ody, odz),
            order_o=(oox, ooy, ooz),
            entry=jnp.int32(0),
            write=make_rw()[0],
            read=make_rw()[1],
            any_hit=any_hit,
        ))

    _traverse_streams(qnodes_ref, streams, node_scr, stack_n, stack_d,
                      maxb_scr, state_scr, sems)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def _scratch_shapes():
    return [
        pltpu.SMEM((NS, REC), jnp.float32),
        pltpu.SMEM((NS, STACK_MAX + 1), jnp.int32),
        pltpu.SMEM((NS, STACK_MAX + 1), jnp.float32),
        pltpu.SMEM((NS, 2), jnp.float32),
        pltpu.SMEM((3, NS), jnp.int32),
        pltpu.SemaphoreType.DMA((NS,)),
    ]


@partial(jax.jit, static_argnames=("width", "height", "fov_degrees", "interpret", "stats", "jitter", "raygen_size"))
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
):
    """Trace all primary rays → (t, nx, ny, nz, tri[, visits]) images of
    (height,width); ``stats=True`` appends a per-tile visit-count plane.

    Any width/height works — the kernel pads internally to the
    GROUP·TILE-pixel program granularity and crops the result.

    ``raygen_size``/``row_offset``/``col_offset`` render a band of a larger
    virtual frame: ray generation uses the full (W, H) while the grid covers
    only this call's width×height window at the given pixel offset — the
    multi-chip tile sharding renders one band per chip this way.
    """
    blk = GROUP * TILE
    pw = -(-width // blk) * blk
    ph = -(-height // blk) * blk
    nty, ntx = ph // TILE, pw // TILE
    nby, nbx = nty // GROUP, ntx // GROUP

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
    )

    if entries is None:
        entries = jnp.zeros((nty, ntx), jnp.int32)
    else:
        ey, ex = entries.shape
        entries = jnp.pad(entries, ((0, nty - ey), (0, ntx - ex)))

    nout = 6 if stats else 5
    out_shape = [
        jax.ShapeDtypeStruct((nty, ntx, SUB, 128), jnp.float32),  # t
        jax.ShapeDtypeStruct((nty, ntx, SUB, 128), jnp.float32),  # nx
        jax.ShapeDtypeStruct((nty, ntx, SUB, 128), jnp.float32),  # ny
        jax.ShapeDtypeStruct((nty, ntx, SUB, 128), jnp.float32),  # nz
        jax.ShapeDtypeStruct((nty, ntx, SUB, 128), jnp.int32),    # tri
        jax.ShapeDtypeStruct((nty, ntx, SUB, 128), jnp.int32),    # visits
    ][:nout]
    out_spec = pl.BlockSpec(
        (GROUP, GROUP, SUB, 128), lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        partial(_kernel, jitter),
        grid=(nby, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),  # entries (full, tiny)
            pl.BlockSpec(memory_space=pltpu.HBM),   # qnodes
        ],
        out_specs=[out_spec] * nout,
        out_shape=out_shape,
        scratch_shapes=_scratch_shapes(),
        interpret=interpret,
    )(cam, entries, qnodes)

    def untile(a):
        img = a.reshape(nty, ntx, TILE, TILE).transpose(0, 2, 1, 3)
        return img.reshape(ph, pw)[:height, :width]

    return tuple(untile(a) for a in outs)


@partial(jax.jit, static_argnames=("interpret", "any_hit"))
def trace_rays_pallas(
    qnodes: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    interpret: bool = False,
    any_hit: bool = False,
):
    """Closest-hit trace of an arbitrary ray buffer through the supernode
    kernel → (t, nx, ny, nz, tri), each shape (R,).

    Rays are processed in NS independent 1024-lane streams per program; keep
    them spatially coherent (pixel order for bounce waves) — the
    block-shared stacks bet on it. Pad rays are given far-away origins so
    their streams drain after a single root visit.

    ``any_hit=True`` turns the trace into an occlusion query (NEE shadow
    rays): lanes stop at their first accepted intersection and whole
    streams terminate early once every lane is occluded. ``tri >= 0`` (or
    ``t == 0``) means occluded; ``t`` is NOT a distance in this mode.
    """
    r = origins.shape[0]
    grp = NS * SUB * 128
    pad = (-r) % grp
    o = jnp.pad(origins, ((0, pad), (0, 0)), constant_values=INF)
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    nt = o.shape[0] // grp

    def plane(a, c):
        return a[:, c].reshape(nt, NS, SUB, 128)

    in_planes = [plane(o, 0), plane(o, 1), plane(o, 2),
                 plane(d, 0), plane(d, 1), plane(d, 2)]

    spec = pl.BlockSpec((1, NS, SUB, 128), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((nt, NS, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, NS, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, NS, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, NS, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, NS, SUB, 128), jnp.int32),
    ]

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

        _raybuf_kernel(any_hit, *[_Sq(x) for x in ins], qn, *[_Sq(x) for x in outs_], *scr)

    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[spec] * 5,
        out_shape=out_shape,
        scratch_shapes=_scratch_shapes(),
        interpret=interpret,
    )(*in_planes, qnodes)

    return tuple(a.reshape(-1)[:r] for a in outs)
