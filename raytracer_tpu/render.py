"""Frame rendering pipeline — jitted end-to-end on device.

The analog of the reference's per-frame compute dispatch
(PathTracer.js:756-822 + renderer.wgsl main): generate primary rays, traverse
the wide BVH, shade hits, quantize into the rgba8 framebuffer. The whole
frame is ONE jitted program — no host round-trips (the reference uploads a
UBO and dispatches per frame; here camera state is just a traced argument).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ops.camera import generate_rays
from .ops.shade import quantize_rgba8, shade_lambert, triangle_normals
from .ops.trace import WideBVH, trace_rays, trace_rays_brute

__all__ = ["render_ldr", "render_ldr_brute", "render_frame_u8",
           "trace_tiles_bounded", "trace_tiles_temporal"]

# chunk = one 64×128 pixel tile (spatially coherent, VPU-friendly shape)
_TILE_H = 64
_TILE_W = 128


def _tile_rays(o: jax.Array, d: jax.Array, width: int, height: int):
    """Reorder (H,W,3) rays into coherent tile-major chunks (R,3)."""
    pad_h = (-height) % _TILE_H
    pad_w = (-width) % _TILE_W
    o = jnp.pad(o, ((0, pad_h), (0, pad_w), (0, 0)))
    d = jnp.pad(d, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=1.0)
    ph, pw = height + pad_h, width + pad_w

    def to_tiles(a):
        a = a.reshape(ph // _TILE_H, _TILE_H, pw // _TILE_W, _TILE_W, 3)
        return a.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

    return to_tiles(o), to_tiles(d), (ph, pw)


def _untile(flat: jax.Array, ph: int, pw: int, width: int, height: int):
    """Inverse of _tile_rays for per-ray results (R, ...)."""
    tail = flat.shape[1:]
    a = flat.reshape(ph // _TILE_H, pw // _TILE_W, _TILE_H, _TILE_W, *tail)
    a = a.transpose(0, 2, 1, 3, *range(4, 4 + len(tail)))
    a = a.reshape(ph, pw, *tail)
    return a[:height, :width]


@partial(jax.jit, static_argnames=("width", "height", "fov_degrees"))
def render_ldr(
    wide: WideBVH,
    tris: jax.Array,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    width: int,
    height: int,
    fov_degrees: float = 70.0,
):
    """Full primary-ray frame via BVH traversal → (rgb f32 (H,W,3), t, tri)."""
    o, d = generate_rays(width, height, cam_pos, cam_quat, fov_degrees)
    of, df, (ph, pw) = _tile_rays(o, d, width, height)
    t, tri = trace_rays(wide, tris, of, df, chunk=_TILE_H * _TILE_W)
    t = _untile(t, ph, pw, width, height)
    tri = _untile(tri, ph, pw, width, height)

    hit = tri >= 0
    normals = triangle_normals(tris, tri)
    rgb = shade_lambert(normals, hit)
    return rgb, t, tri


@partial(jax.jit, static_argnames=("width", "height", "fov_degrees"))
def render_ldr_brute(
    tris: jax.Array,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    width: int,
    height: int,
    fov_degrees: float = 70.0,
):
    """Same frame via brute-force all-triangles intersection (ground truth /
    tiny-scene fast path)."""
    o, d = generate_rays(width, height, cam_pos, cam_quat, fov_degrees)
    t, tri = trace_rays_brute(tris, o.reshape(-1, 3), d.reshape(-1, 3))
    t = t.reshape(height, width)
    tri = tri.reshape(height, width)
    hit = tri >= 0
    rgb = shade_lambert(triangle_normals(tris, tri), hit)
    return rgb, t, tri


def _repair_unbounded(qnodes, o_flat, d_flat, planes, need, repair_cap,
                      leaf_k, interpret):
    """Re-trace every lane in ``need`` unbounded, ``repair_cap`` lanes per
    batch, looping until all are examined — exact regardless of the cap
    (a single truncated batch would leave silent hole pixels, ADVICE r2).

    ``planes`` is the (t,nx,ny,nz,tri) tuple of (H,W) images; returns the
    patched tuple plus the total repair count."""
    from .ops.pallas.traverse import trace_rays_pallas

    if repair_cap <= 0:
        raise ValueError(
            "repair_cap must be >= 1 — a zero cap would make the repair "
            "loop spin forever (no lane is ever examined)")
    t, nx, ny, nz, tri = planes
    shape = t.shape
    need0 = need.ravel()
    state = (t.ravel(), nx.ravel(), ny.ravel(), nz.ravel(), tri.ravel(),
             jnp.zeros(t.size, jnp.bool_))

    def cond(st):
        return jnp.any(need0 & ~st[5])

    def body(st):
        tf, nxf, nyf, nzf, trif, ex = st
        (idx,) = jnp.nonzero(need0 & ~ex, size=repair_cap, fill_value=-1)
        valid = idx >= 0
        safe = jnp.maximum(idx, 0)
        rt, rnx, rny, rnz, rtri = trace_rays_pallas(
            qnodes, o_flat[safe], d_flat[safe], leaf_k=leaf_k,
            interpret=interpret,
        )

        def patch(f, rep):
            return f.at[safe].set(jnp.where(valid, rep, f[safe]))

        ex = ex.at[safe].set(valid | ex[safe])
        return (patch(tf, rt), patch(nxf, rnx), patch(nyf, rny),
                patch(nzf, rnz), patch(trif, rtri), ex)

    tf, nxf, nyf, nzf, trif, _ = jax.lax.while_loop(cond, body, state)
    out = tuple(a.reshape(shape) for a in (tf, nxf, nyf, nzf, trif))
    return out, jnp.sum(need0)


@partial(jax.jit, static_argnames=("width", "height", "fov_degrees", "leaf_k",
                                   "coarse_stride", "repair_cap", "interpret",
                                   "_bound_scale", "_bound_pad"))
def trace_tiles_bounded(
    qnodes: jax.Array,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    width: int,
    height: int,
    fov_degrees: float = 70.0,
    leaf_k: int = 1,
    entries: jax.Array | None = None,
    coarse_stride: int = 8,
    repair_cap: int = 16384,
    interpret: bool = False,
    _bound_scale: float = 1.05,   # test knob: <1 forces bound underestimates
    _bound_pad: float = 0.02,     # ... which the repair pass must then fix
):
    """Primary-ray trace with coarse depth-bound acceleration — exact output.

    Three passes over the Pallas supernode kernel:

    1. **Coarse**: the same frustum at 1/``coarse_stride`` resolution. Each
       full-res 32-px tile is covered by a block of coarse samples whose
       max hit-t (dilated one tile in every direction, +5%+0.02 slack)
       becomes the tile's conservative far bound; any coarse MISS in the
       neighborhood forces the bound to +inf (silhouette/sky tiles run
       unbounded).
    2. **Main**: the full-res kernel seeded with the per-tile bound as the
       initial best-t and pop-cull limit — geometry behind the visible
       surface is pruned by the ordinary slab/cull tests (2-4x fewer visits
       and leaf tests on interior tiles).
    3. **Repair**: a lane that reports no hit under a *finite* bound might
       truly hit beyond it (a bound underestimate — e.g. a full-res ray
       threading a gap the coarse grid missed). Those rays are re-traced
       unbounded through the ray-buffer kernel in batches of ``repair_cap``
       until none remain (the total count is returned for auditing), then
       scattered back.

    A found hit under bound ``B`` is always the true nearest (traversal
    visits every node with tmin below the running best-t), so only
    no-hit-under-finite-bound lanes can be wrong — exactly the repaired
    set. Returns ``(t, nx, ny, nz, tri, n_repair)`` with t=INF on misses.
    """
    from .ops.pallas.traverse import (
        INF as _PINF,
        TILE,
        trace_tiles_pallas,
    )

    pw, ph = -(-width // TILE) * TILE, -(-height // TILE) * TILE
    nty, ntx = ph // TILE, pw // TILE
    per = TILE // coarse_stride  # coarse samples per tile side
    cw, ch = width // coarse_stride, height // coarse_stride

    # -- pass 1: coarse depth probe (same frustum => exact aspect) --
    ct, _, _, _, ctri = trace_tiles_pallas(
        qnodes, cam_pos, cam_quat, cw, ch, fov_degrees,
        leaf_k=leaf_k, interpret=interpret,
    )[:5]
    ct = jnp.where(ctri >= 0, ct, _PINF)
    ct = jnp.pad(ct, ((0, nty * per - ch), (0, ntx * per - cw)),
                 constant_values=_PINF)
    pooled = ct.reshape(nty, per, ntx, per).max(axis=(1, 3))
    # dilate one tile in every direction (surface slope / misalignment slack)
    dil = jnp.pad(pooled, 1, constant_values=_PINF)
    bounds = pooled
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            bounds = jnp.maximum(
                bounds, dil[1 + dy : 1 + dy + nty, 1 + dx : 1 + dx + ntx]
            )
    bounds = jnp.where(bounds >= _PINF, _PINF,
                       bounds * jnp.float32(_bound_scale) + jnp.float32(_bound_pad))

    # -- pass 2: bounded full-res trace --
    t, nx, ny, nz, tri = trace_tiles_pallas(
        qnodes, cam_pos, cam_quat, width, height, fov_degrees,
        entries=entries, leaf_k=leaf_k, tbounds=bounds, interpret=interpret,
    )[:5]

    # -- pass 3: repair no-hit lanes of bounded tiles (looped: exact even
    # when more than repair_cap lanes need it) --
    bpix = jnp.repeat(jnp.repeat(bounds, TILE, 0), TILE, 1)[:height, :width]
    need = (tri < 0) & (bpix < _PINF)
    o, d = generate_rays(width, height, cam_pos, cam_quat, fov_degrees)
    (t, nx, ny, nz, tri), n_repair = _repair_unbounded(
        qnodes, o.reshape(-1, 3), d.reshape(-1, 3), (t, nx, ny, nz, tri),
        need, repair_cap, leaf_k, interpret,
    )
    t = jnp.where(tri >= 0, t, _PINF)
    return t, nx, ny, nz, tri, n_repair


@partial(jax.jit, static_argnames=("width", "height", "fov_degrees", "leaf_k",
                                   "repair_cap", "interpret"))
def trace_tiles_temporal(
    qnodes: jax.Array,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    width: int,
    height: int,
    prev_t: jax.Array,
    prev_tri: jax.Array,
    jitter_seed,
    fov_degrees: float = 70.0,
    leaf_k: int = 1,
    repair_cap: int = 16384,
    interpret: bool = False,
):
    """Jittered primary trace bounded by the PREVIOUS same-camera frame's
    depth — the progressive-accumulation accelerator (exact output).

    In progressive mode successive samples share the camera; only the
    subpixel jitter moves. The previous sample's per-tile max depth (tiles
    with any miss lane stay unbounded) seeds the kernel's best-t/pop-cull
    bound, pruning everything behind the visible surface, with the same
    repair guarantee as trace_tiles_bounded: a no-hit lane under a finite
    bound is re-traced unbounded through the ray-buffer kernel using
    bit-identical jittered rays (ops.camera.generate_rays_jittered ==
    the kernel's in-kernel PRNG). Zero probe cost — the bound source is
    the frame you already rendered. Returns (t,nx,ny,nz,tri,n_repair).
    """
    from .ops.camera import generate_rays_jittered
    from .ops.pallas.traverse import (
        INF as _PINF,
        TILE,
        trace_tiles_pallas,
    )

    pw, ph = -(-width // TILE) * TILE, -(-height // TILE) * TILE
    nty, ntx = ph // TILE, pw // TILE

    tv = jnp.where(prev_tri >= 0, prev_t, _PINF)
    tv = jnp.pad(tv, ((0, ph - height), (0, pw - width)))
    pooled = tv.reshape(nty, TILE, ntx, TILE).max(axis=(1, 3))
    bounds = jnp.where(pooled >= _PINF, _PINF,
                       pooled * jnp.float32(1.05) + jnp.float32(0.02))

    t, nx, ny, nz, tri = trace_tiles_pallas(
        qnodes, cam_pos, cam_quat, width, height, fov_degrees,
        jitter=True, jitter_seed=jitter_seed, leaf_k=leaf_k,
        tbounds=bounds, interpret=interpret,
    )[:5]

    bpix = jnp.repeat(jnp.repeat(bounds, TILE, 0), TILE, 1)[:height, :width]
    need = (tri < 0) & (bpix < _PINF)
    o, d = generate_rays_jittered(width, height, cam_pos, cam_quat,
                                  jitter_seed, fov_degrees)
    (t, nx, ny, nz, tri), n_repair = _repair_unbounded(
        qnodes, o.reshape(-1, 3), d.reshape(-1, 3), (t, nx, ny, nz, tri),
        need, repair_cap, leaf_k, interpret,
    )
    t = jnp.where(tri >= 0, t, _PINF)
    return t, nx, ny, nz, tri, n_repair


def render_frame_u8(wide, tris, cam_pos, cam_quat, width, height, fov_degrees=70.0):
    """rgba8 framebuffer (H,W,4) — the storage-texture image the reference's
    compute pass produces."""
    rgb, _, _ = render_ldr(wide, tris, cam_pos, cam_quat, width, height, fov_degrees)
    return quantize_rgba8(rgb)
