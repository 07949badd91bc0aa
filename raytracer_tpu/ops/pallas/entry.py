"""Per-tile traversal entry points — conservative frustum descent.

Every 32×32-pixel tile's rays share the camera origin and span a narrow
direction cone, so the top of the BVH is identical work for every ray in the
tile. This XLA pre-pass descends each tile's cone from the root: while
exactly ONE child of the current node can possibly be hit by the cone,
descend into it. The Pallas kernel then seeds its stack with the tile's
entry node instead of the root, skipping the shared top-of-tree visits
(PERF.md roadmap item 2).

Conservativeness: unnormalized ray directions are affine in pixel
coordinates, so their per-axis extremes over a tile occur at the tile's
corner rays; interval arithmetic over [d_min, d_max] (with sign-spanning
intervals widened to (−∞, ∞)) gives a slab test that can only over-report
hits. Descending only while a single child is possibly hit therefore never
skips a node any ray could enter. Runs for the whole tile grid at once.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..trace import WideBVH

__all__ = ["compute_tile_entries"]

_INF = jnp.float32(3.4e38)


def _corner_dirs(width, height, nty, ntx, tile, cam_quat, fov_degrees):
    """Unnormalized, rotated corner-ray directions per tile:
    returns (nty, ntx, 4, 3)."""
    focal = 1.0 / math.tan(0.5 * math.radians(fov_degrees))
    aspect = width / height

    tx = jnp.arange(ntx, dtype=jnp.float32)
    ty = jnp.arange(nty, dtype=jnp.float32)
    # pixel-center extremes of each tile: first and last pixel centers
    x0 = (tx * tile + 0.5) / width * 2.0 - 1.0
    x1 = (tx * tile + tile - 0.5) / width * 2.0 - 1.0
    y0 = (ty * tile + 0.5) / height * 2.0 - 1.0
    y1 = (ty * tile + tile - 0.5) / height * 2.0 - 1.0

    xs = jnp.stack([x0, x1], axis=-1) * aspect          # (ntx, 2)
    ys = jnp.stack([y0, y1], axis=-1)                    # (nty, 2)

    cx = jnp.broadcast_to(xs[None, :, None, :], (nty, ntx, 2, 2))
    cy = jnp.broadcast_to(ys[:, None, :, None], (nty, ntx, 2, 2))
    d = jnp.stack(
        [cx, cy, jnp.full_like(cx, -focal)], axis=-1
    ).reshape(nty, ntx, 4, 3)

    # rotate by camera quaternion (unnormalized is fine for slab tests)
    q = jnp.asarray(cam_quat, jnp.float32)
    u, s = q[:3], q[3]
    uv = jnp.cross(u[None, None, None], d)
    uuv = jnp.cross(u[None, None, None], uv)
    return d + 2.0 * (s * uv + uuv)


def _interval_inv(dmin, dmax):
    """Reciprocal of a direction interval; sign-spanning → (−inf, inf)."""
    spans_zero = (dmin <= 0.0) & (dmax >= 0.0)
    a = 1.0 / jnp.where(spans_zero, 1.0, dmin)
    b = 1.0 / jnp.where(spans_zero, 1.0, dmax)
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    return jnp.where(spans_zero, -_INF, lo), jnp.where(spans_zero, _INF, hi)


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "fov_degrees", "max_depth"),
)
def compute_tile_entries(
    wide: WideBVH,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    width: int,
    height: int,
    tile: int = 32,
    fov_degrees: float = 70.0,
    max_depth: int = 16,
) -> jax.Array:
    """Entry node index per tile, shape (nty, ntx) int32 (0 = root)."""
    nty, ntx = height // tile, width // tile
    m = wide.cref.shape[0]

    d = _corner_dirs(width, height, nty, ntx, tile, cam_quat, fov_degrees)
    dmin = jnp.min(d, axis=2)   # (nty, ntx, 3)
    dmax = jnp.max(d, axis=2)
    inv_lo, inv_hi = _interval_inv(dmin, dmax)
    o = jnp.asarray(cam_pos, jnp.float32)

    def possible_hit(cmn, cmx):
        """Interval slab test: (..., 4, 3) child boxes vs per-tile cone."""
        rel_lo = cmn - o
        rel_hi = cmx - o
        # t = rel * inv over intervals: take min/max of the 4 corner products
        cands = jnp.stack(
            [
                rel_lo * inv_lo[..., None, :],
                rel_lo * inv_hi[..., None, :],
                rel_hi * inv_lo[..., None, :],
                rel_hi * inv_hi[..., None, :],
            ],
            axis=0,
        )
        t_lo = jnp.min(cands, axis=0)   # (..., 4, 3)
        t_hi = jnp.max(cands, axis=0)
        tmin_lo = jnp.max(t_lo, axis=-1)
        tmax_hi = jnp.min(t_hi, axis=-1)
        ok = tmax_hi >= jnp.maximum(tmin_lo, 0.0)
        # empty slots carry inverted boxes (+inf/−inf) → rel products give
        # tmin_lo=+inf → miss; keep NaN-safe by explicit validity
        return ok & jnp.all(cmn <= cmx, axis=-1)

    leaf_bit = jnp.int32(1 << 30)

    def body(_, node):
        ci = jnp.clip(node, 0, m - 1)
        cref = wide.cref[ci]                    # (nty, ntx, 4)
        cmn = wide.cmn[ci]
        cmx = wide.cmx[ci]
        hit = possible_hit(cmn, cmx) & (cref >= 0)
        nhit = jnp.sum(hit, axis=-1)
        only = jnp.argmax(hit, axis=-1)
        only_ref = jnp.take_along_axis(cref, only[..., None], axis=-1)[..., 0]
        is_internal = (only_ref & leaf_bit) == 0
        descend = (nhit == 1) & is_internal
        return jnp.where(descend, only_ref, node)

    entries = jax.lax.fori_loop(
        0, max_depth, body, jnp.zeros((nty, ntx), jnp.int32)
    )
    return entries
