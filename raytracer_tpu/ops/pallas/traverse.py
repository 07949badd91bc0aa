"""Pallas TPU traversal kernel — block-shared-stack packet tracing.

The TPU-native replacement for the WGSL megakernel's SIMT traversal
(renderer.wgsl:210-346). The mapping of concepts:

* WGSL workgroup of 16×16 threads × 2×2 ray packets → ONE Pallas program per
  32×32 pixel tile whose 1024 rays live in the vector lanes of an (8,128)
  VPU tile. The reference's per-thread packet masking becomes per-lane
  masking, which the VPU does for free.
* Per-thread stack in registers → ONE scalar stack per tile in SMEM, shared
  by all 1024 rays. A node is visited iff *any* ray in the tile wants it —
  the packet-coherence bet of the reference (renderer.wgsl:4-6) taken to
  1024-wide. Box tests against a visited node run on all lanes at once.
* Divergent memory access (the SIMT gathers of node + triangle records) →
  ONE scalar-indexed async DMA per visit: a 512-byte "supernode" record
  (4 child AABBs, child refs, and the full triangle data of leaf children
  inlined) lands in SMEM and all its fields are *scalars* broadcast against
  the lane tile. No per-lane gathers exist anywhere in the kernel.
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
far→near by *block-min* entry distance (packet analog of the WGSL's
near-first ordering, renderer.wgsl:314-342); leaf children skip the box test
entirely — Möller–Trumbore runs directly on all lanes from the inlined
vertices (the child box is a conservative hull of the triangle, so the box
test could only pass a superset of the MT-accepted lanes).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..trace import WideBVH

__all__ = ["make_qnodes", "trace_tiles_pallas", "TILE", "REC"]

TILE = 32                 # pixels per program side; TILE² rays per program (best measured: 32)
_ABLATE = os.environ.get("RT_ABLATE", "")  # perf ablations: "nomt", "noslab"
SUB = TILE * TILE // 128  # sublane count of the ray lane-tile (TILE²=SUB×128)
STACK_MAX = 64            # renderer.wgsl:8
FRONTIER = 1              # stack entries popped/fetched per loop iteration
REC = 128                 # record width (f32 words) — lane-tile aligned
EMPTY_REF = -float(1 << 28)
INF = 1e30
MT_EPS = 1e-7


# ---------------------------------------------------------------------------
# Device-side data preparation (jitted once per scene)
# ---------------------------------------------------------------------------

@jax.jit
def make_qnodes(wide: WideBVH, tris: jax.Array) -> jax.Array:
    """WideBVH + (T,3,3) triangles → supernode records (M, 128) f32."""
    m = wide.cref.shape[0]
    n_tris = tris.shape[0]
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

    # inline leaf triangle vertices per slot
    flat_tris = tris.reshape(n_tris, 9)
    safe_tri = jnp.clip(tri_idx, 0, n_tris - 1)
    verts = jnp.where(is_leaf[..., None], flat_tris[safe_tri], 0.0)  # (M,4,9)
    for k in range(4):
        rec = rec.at[:, 32 + 12 * k : 41 + 12 * k].set(verts[:, k, :])
    return rec


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _traverse_core(
    qnodes_ref,
    t_out, nx_out, ny_out, nz_out, tri_out, visits_out,
    node_scr, stack_n, stack_d, maxb_scr, sems,
    dx, dy, dz, ix, iy, iz,          # (SUB,128) ray vectors
    ox, oy, oz,                       # origins: scalars (primary) or vectors
    clox, cloy, cloz, chix, chiy, chiz,   # scalar origin-AABB (cull metric)
    odx, ody, odz, oox, ooy, ooz,     # scalar ordering ray (dir + origin)
    entry,                            # scalar entry node
):
    """Shared block-traversal loop (see module docstring).

    Vector→scalar syncs are the dominant per-visit cost on TPU, so each visit
    does exactly two lane reductions (packed slot-hit counts). Ordering and
    occlusion culling run entirely on the scalar core: the cull metric is the
    gap distance between the child box and the tile's origin AABB (primary
    rays: a point) — a conservative lower bound on any lane's hit distance —
    and the ordering metric projects child box centers onto a representative
    tile ray.
    """
    f32 = jnp.float32

    t_out[0, 0] = jnp.full((SUB, 128), INF, f32)
    nx_out[0, 0] = jnp.zeros((SUB, 128), f32)
    ny_out[0, 0] = jnp.zeros((SUB, 128), f32)
    nz_out[0, 0] = jnp.zeros((SUB, 128), f32)
    tri_out[0, 0] = jnp.full((SUB, 128), -1, jnp.int32)

    stack_n[0] = entry
    stack_d[0] = f32(0.0)
    maxb_scr[0] = f32(INF)
    maxb_scr[1] = f32(INF)

    def fetch(i, node):
        return pltpu.make_async_copy(qnodes_ref.at[node], node_scr.at[i], sems.at[i])

    def process(i, valid, node, sp):
        @pl.when(valid)
        def _():
            fetch(i, node).wait()

        best0 = t_out[0, 0]
        maxb2 = maxb_scr[1]

        push_ref = [jnp.int32(0)] * 4
        push_dist = [f32(0.0)] * 4
        push_internal = [jnp.bool_(False)] * 4
        push_order = [f32(0.0)] * 4
        accs = [jnp.zeros((SUB, 128), jnp.int32), jnp.zeros((SUB, 128), jnp.int32)]

        for k in range(4):
            refc = node_scr[i, 24 + k]
            is_empty = refc <= f32(EMPTY_REF)
            is_leaf = (refc < 0.0) & ~is_empty
            is_internal = refc >= 0.0

            # --- leaf child: MT straight from the inlined vertices ---
            @pl.when(valid & is_leaf & ("nomt" not in _ABLATE))
            def _(i=i, k=k, refc=refc):
                b = 32 + 12 * k
                v0x, v0y, v0z = node_scr[i, b], node_scr[i, b + 1], node_scr[i, b + 2]
                v1x, v1y, v1z = node_scr[i, b + 3], node_scr[i, b + 4], node_scr[i, b + 5]
                v2x, v2y, v2z = node_scr[i, b + 6], node_scr[i, b + 7], node_scr[i, b + 8]
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
                cur = t_out[0, 0]
                upd = (
                    (jnp.abs(det) >= MT_EPS)
                    & (uu >= 0.0) & (uu <= 1.0)
                    & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > MT_EPS) & (tt < cur)
                )
                gnx = e1y * e2z - e1z * e2y
                gny = e1z * e2x - e1x * e2z
                gnz = e1x * e2y - e1y * e2x
                g_inv = jax.lax.rsqrt(gnx * gnx + gny * gny + gnz * gnz)
                tri_id = (-refc - 1.0).astype(jnp.int32)
                t_out[0, 0] = jnp.where(upd, tt, cur)
                nx_out[0, 0] = jnp.where(upd, gnx * g_inv, nx_out[0, 0])
                ny_out[0, 0] = jnp.where(upd, gny * g_inv, ny_out[0, 0])
                nz_out[0, 0] = jnp.where(upd, gnz * g_inv, nz_out[0, 0])
                tri_out[0, 0] = jnp.where(upd, tri_id, tri_out[0, 0])

            # --- internal child: slab test (vector) + scalar metrics ---
            mnx, mny, mnz = node_scr[i, 6 * k], node_scr[i, 6 * k + 1], node_scr[i, 6 * k + 2]
            mxx, mxy, mxz = node_scr[i, 6 * k + 3], node_scr[i, 6 * k + 4], node_scr[i, 6 * k + 5]
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

            # conservative cull: gap distance² between the child box and the
            # tile's origin AABB
            ddx = jnp.maximum(jnp.maximum(mnx - chix, clox - mxx), f32(0.0))
            ddy = jnp.maximum(jnp.maximum(mny - chiy, cloy - mxy), f32(0.0))
            ddz = jnp.maximum(jnp.maximum(mnz - chiz, cloz - mxz), f32(0.0))
            d2 = ddx * ddx + ddy * ddy + ddz * ddz

            # near-first ordering: box center projected on the tile ray
            proj = (
                ((mnx + mxx) * 0.5 - oox) * odx
                + ((mny + mxy) * 0.5 - ooy) * ody
                + ((mnz + mxz) * 0.5 - ooz) * odz
            )

            push_ref[k] = refc.astype(jnp.int32)
            push_dist[k] = d2
            push_order[k] = proj
            push_internal[k] = is_internal & valid & (d2 < maxb2)

        # the two lane reductions of this visit (slot-hit counts)
        red0 = jnp.sum(accs[0])
        red1 = jnp.sum(accs[1])
        slot_hit = [
            (red0 & 0xFFFF) != 0,
            (red1 & 0xFFFF) != 0,
            (red0 >> 16) != 0,
            (red1 >> 16) != 0,
        ]
        push_ok = [push_internal[k] & slot_hit[k] for k in range(4)]

        # sorting network: nearest child pushed last so it pops first
        refs, dists, orders, oks = push_ref, push_dist, push_order, push_ok

        def swap_if(a, b):
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

        swap_if(0, 1)
        swap_if(2, 3)
        swap_if(0, 2)
        swap_if(1, 3)
        swap_if(1, 2)

        for k in range(4):
            can = oks[k] & (sp < STACK_MAX - 1)
            sp = jnp.where(can, sp + 1, sp)

            @pl.when(can)
            def _(k=k, sp=sp):
                stack_n[sp] = refs[k]
                stack_d[sp] = dists[k]

        return sp

    def body(carry):
        sp, visits = carry
        nodes, valids = [], []
        for i in range(FRONTIER):
            sp = jax.lax.while_loop(
                lambda s: (s >= 0) & (stack_d[jnp.maximum(s, 0)] >= maxb_scr[1]),
                lambda s: s - 1,
                sp,
            )
            valid = sp >= 0
            node = stack_n[jnp.maximum(sp, 0)]

            @pl.when(valid)
            def _(i=i, node=node):
                fetch(i, node).start()

            sp = jnp.where(valid, sp - 1, sp)
            nodes.append(node)
            valids.append(valid)
            visits = visits + jnp.where(valid, 1, 0)

        for i in range(FRONTIER):
            sp = process(i, valids[i], nodes[i], sp)

        mb = jnp.max(t_out[0, 0])
        maxb_scr[0] = mb
        maxb_scr[1] = jnp.where(mb >= jnp.float32(INF), jnp.float32(INF), mb * mb)
        return sp, visits

    _, total_visits = jax.lax.while_loop(
        lambda c: c[0] >= 0, body, (jnp.int32(0), jnp.int32(0))
    )
    if visits_out is not None:
        visits_out[0, 0] = jnp.full((SUB, 128), total_visits, jnp.int32)


def _kernel(
    use_jitter,         # static python bool — gates PRNG tracing
    cam_ref,            # SMEM (16,) f32: ox,oy,oz, qx,qy,qz,qw, focal, aspect, W, H, seed
    entry_ref,          # SMEM (nty, ntx) i32 — per-tile traversal entry nodes
    qnodes_ref,         # HBM (M, 128) f32
    t_out, nx_out, ny_out, nz_out, tri_out,   # VMEM (1,1,SUB,128)
    *rest,              # [visits_out,] node_scr, stack_n, stack_d, maxb_scr, sems
):
    """Primary-ray kernel: fused in-kernel ray generation."""
    if len(rest) == 6:
        visits_out, node_scr, stack_n, stack_d, maxb_scr, sems = rest
    else:
        visits_out = None
        node_scr, stack_n, stack_d, maxb_scr, sems = rest
    f32 = jnp.float32

    ox, oy, oz = cam_ref[0], cam_ref[1], cam_ref[2]
    qx, qy, qz, qw = cam_ref[3], cam_ref[4], cam_ref[5], cam_ref[6]
    focal, aspect = cam_ref[7], cam_ref[8]
    width, height = cam_ref[9], cam_ref[10]

    ti = pl.program_id(0)
    tj = pl.program_id(1)

    # ---- fused ray generation (renderer.wgsl:364-396) ----
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    lane = r_ids * 128 + c_ids
    px = tj * TILE + lane % TILE
    py = ti * TILE + lane // TILE

    # subpixel offsets: fixed centers (reference parity) or per-pixel PRNG
    # jitter (the 1-spp progressive-accumulation mode)
    if use_jitter:
        seed = cam_ref[11]
        pltpu.prng_seed(seed.astype(jnp.int32) * 9781 + ti * 7919 + tj * 104729)

        def rand01():
            bits = pltpu.prng_random_bits((SUB, 128))
            return (bits >> jnp.uint32(8)).astype(f32) * f32(2.0 ** -24)

        jx, jy = rand01(), rand01()
    else:
        jx = jy = f32(0.5)
    u = (px.astype(f32) + jx) / width * 2.0 - 1.0
    v = (py.astype(f32) + jy) / height * 2.0 - 1.0
    dx = u * aspect
    dy = v
    dz = jnp.full((SUB, 128), -focal, f32)
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len

    # rotate by quaternion (renderer.wgsl:66-72)
    uvx = qy * dz - qz * dy
    uvy = qz * dx - qx * dz
    uvz = qx * dy - qy * dx
    uuvx = qy * uvz - qz * uvy
    uuvy = qz * uvx - qx * uvz
    uuvz = qx * uvy - qy * uvx
    dx = 2.0 * (qw * uvx + uuvx) + dx
    dy = 2.0 * (qw * uvy + uuvy) + dy
    dz = 2.0 * (qw * uvz + uuvz) + dz

    def safe_inv(d):
        return jnp.where(jnp.abs(d) > 1e-8, 1.0 / d, f32(INF))

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    # tile-center ray direction (scalars) — the near-first ordering axis
    ucx = ((tj * TILE + TILE * 0.5) / width * 2.0 - 1.0) * aspect
    vcy = (ti * TILE + TILE * 0.5) / height * 2.0 - 1.0
    c_uvx = qy * (-focal) - qz * vcy
    c_uvy = qz * ucx - qx * (-focal)
    c_uvz = qx * vcy - qy * ucx
    c_uuvx = qy * c_uvz - qz * c_uvy
    c_uuvy = qz * c_uvx - qx * c_uvz
    c_uuvz = qx * c_uvy - qy * c_uvx
    dcx = 2.0 * (qw * c_uvx + c_uuvx) + ucx
    dcy = 2.0 * (qw * c_uvy + c_uuvy) + vcy
    dcz = 2.0 * (qw * c_uvz + c_uuvz) + (-focal)

    _traverse_core(
        qnodes_ref,
        t_out, nx_out, ny_out, nz_out, tri_out, visits_out,
        node_scr, stack_n, stack_d, maxb_scr, sems,
        dx, dy, dz, ix, iy, iz,
        ox, oy, oz,
        ox, oy, oz, ox, oy, oz,        # origin AABB degenerates to a point
        dcx, dcy, dcz, ox, oy, oz,
        entry_ref[ti, tj],
    )


def _raybuf_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # VMEM (1,SUB,128)
    qnodes_ref,                                        # HBM (M, 128)
    t_out, nx_out, ny_out, nz_out, tri_out,           # VMEM (1,SUB,128)
    node_scr, stack_n, stack_d, maxb_scr, sems,
):
    """Arbitrary-ray-buffer kernel: bounce waves, shadow rays, custom rays.

    Per-tile statistics (origin AABB, mean direction) replace the shared
    camera origin for the scalar cull/ordering metrics — conservative for
    arbitrary per-lane origins.
    """
    f32 = jnp.float32
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    def safe_inv(d):
        return jnp.where(jnp.abs(d) > 1e-8, 1.0 / d, f32(INF))

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    clox, cloy, cloz = jnp.min(ox), jnp.min(oy), jnp.min(oz)
    chix, chiy, chiz = jnp.max(ox), jnp.max(oy), jnp.max(oz)
    odx, ody, odz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)  # mean dir (scaled)
    oox = (clox + chix) * 0.5
    ooy = (cloy + chiy) * 0.5
    ooz = (cloz + chiz) * 0.5

    class _Wrap:
        """Adapt (1,SUB,128) out blocks to the core's [0, 0] indexing."""

        def __init__(self, ref):
            self.ref = ref

        def __getitem__(self, _):
            return self.ref[0]

        def __setitem__(self, _, val):
            self.ref[0] = val

    _traverse_core(
        qnodes_ref,
        _Wrap(t_out), _Wrap(nx_out), _Wrap(ny_out), _Wrap(nz_out), _Wrap(tri_out),
        None,
        node_scr, stack_n, stack_d, maxb_scr, sems,
        dx, dy, dz, ix, iy, iz,
        ox, oy, oz,
        clox, cloy, cloz, chix, chiy, chiz,
        odx, ody, odz, oox, ooy, ooz,
        jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("width", "height", "fov_degrees", "interpret", "stats", "jitter"))
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
):
    """Trace all primary rays → (t, nx, ny, nz, tri[, visits]) images of
    (height,width); ``stats=True`` appends a per-tile visit-count plane.

    width/height must be multiples of TILE (the render pipeline pads).
    """
    assert width % TILE == 0 and height % TILE == 0
    nty, ntx = height // TILE, width // TILE

    focal = 1.0 / math.tan(0.5 * math.radians(fov_degrees))
    cam = jnp.concatenate(
        [
            jnp.asarray(cam_pos, jnp.float32).reshape(3),
            jnp.asarray(cam_quat, jnp.float32).reshape(4),
            jnp.array([focal, width / height, width, height], jnp.float32),
            jnp.asarray(jitter_seed, jnp.float32).reshape(1),
            jnp.zeros((4,), jnp.float32),
        ]
    )

    if entries is None:
        entries = jnp.zeros((nty, ntx), jnp.int32)

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
        (1, 1, SUB, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        partial(_kernel, jitter),
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),  # entries (full, tiny)
            pl.BlockSpec(memory_space=pltpu.HBM),   # qnodes
        ],
        out_specs=[out_spec] * nout,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((FRONTIER, REC), jnp.float32),
            pltpu.SMEM((STACK_MAX,), jnp.int32),
            pltpu.SMEM((STACK_MAX,), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
            pltpu.SemaphoreType.DMA((FRONTIER,)),
        ],
        interpret=interpret,
    )(cam, entries, qnodes)

    def untile(a):
        img = a.reshape(nty, ntx, TILE, TILE).transpose(0, 2, 1, 3)
        return img.reshape(height, width)

    return tuple(untile(a) for a in outs)


@partial(jax.jit, static_argnames=("interpret",))
def trace_rays_pallas(
    qnodes: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    interpret: bool = False,
):
    """Closest-hit trace of an arbitrary ray buffer through the supernode
    kernel → (t, nx, ny, nz, tri), each shape (R,).

    Rays are processed in 1024-lane groups; keep them spatially coherent
    (pixel order for bounce waves) — the block-shared stack bets on it.
    """
    r = origins.shape[0]
    pad = (-r) % (SUB * 128)
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    nt = o.shape[0] // (SUB * 128)

    def plane(a, c):
        return a[:, c].reshape(nt, SUB, 128)

    in_planes = [plane(o, 0), plane(o, 1), plane(o, 2),
                 plane(d, 0), plane(d, 1), plane(d, 2)]

    spec = pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((nt, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt, SUB, 128), jnp.int32),
    ]

    outs = pl.pallas_call(
        _raybuf_kernel,
        grid=(nt,),
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((FRONTIER, REC), jnp.float32),
            pltpu.SMEM((STACK_MAX,), jnp.int32),
            pltpu.SMEM((STACK_MAX,), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
            pltpu.SemaphoreType.DMA((FRONTIER,)),
        ],
        interpret=interpret,
    )(*in_planes, qnodes)

    return tuple(a.reshape(-1)[:r] for a in outs)
