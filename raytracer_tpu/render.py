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

__all__ = ["render_ldr", "render_ldr_brute", "render_frame_u8"]

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


def render_frame_u8(wide, tris, cam_pos, cam_quat, width, height, fov_degrees=70.0):
    """rgba8 framebuffer (H,W,4) — the storage-texture image the reference's
    compute pass produces."""
    rgb, _, _ = render_ldr(wide, tris, cam_pos, cam_quat, width, height, fov_degrees)
    return quantize_rgba8(rgb)
