"""Multi-chip scaling — jax.sharding over image tiles / samples / cameras.

The reference is strictly single-GPU; its only "distributed" pattern is
artifact hand-off through files (SURVEY.md §3.4). The TPU-native design
(SURVEY.md §5.8): rendering is embarrassingly parallel over pixels, so we
shard the *image row-tile* axis across a 1-D device mesh with the BVH +
triangles replicated (tens–hundreds of MB — fits HBM trivially), and XLA
inserts the (nearly nil) collectives. Three shardings are provided:

* :func:`render_tiles_sharded` — data-parallel pixels: each chip renders its
  horizontal band via shard_map; the framebuffer comes back tile-sharded.
* :func:`render_spp_sharded` — samples-per-pixel parallel: each chip renders
  the full frame with a different sample seed; a ``psum``/mean over the mesh
  axis accumulates radiance over ICI (the progressive-accumulation axis).
* :func:`render_cameras_sharded` — batch of cameras sharded across chips
  (BASELINE config 5's multi-camera batch).

All three work on a CPU host with ``xla_force_host_platform_device_count``
(the fake-backend testing capability the reference lacks, SURVEY.md §4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.camera import generate_rays
from ..ops.shade import shade_lambert, triangle_normals
from ..ops.trace import WideBVH, trace_rays

__all__ = [
    "make_mesh",
    "render_tiles_sharded",
    "render_spp_sharded",
    "render_cameras_sharded",
]


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    """1-D device mesh over the first n (default: all) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _shade_rows(wide: WideBVH, tris, o_rows, d_rows, chunk):
    """Trace+shade a band of rays (rows, W, 3) → (rgb, t, tri)."""
    h, w = o_rows.shape[:2]
    t, tri = trace_rays(wide, tris, o_rows.reshape(-1, 3), d_rows.reshape(-1, 3), chunk=chunk)
    t = t.reshape(h, w)
    tri = tri.reshape(h, w)
    rgb = shade_lambert(triangle_normals(tris, tri), tri >= 0)
    return rgb, t, tri


@partial(
    jax.jit,
    static_argnames=("width", "height", "fov_degrees", "mesh", "chunk"),
)
def render_tiles_sharded(
    wide: WideBVH,
    tris: jax.Array,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    width: int,
    height: int,
    mesh: Mesh,
    fov_degrees: float = 70.0,
    chunk: int = 2048,
):
    """Full frame with pixel rows sharded across the mesh's first axis.

    height must divide evenly by the mesh size (callers pad). Scene arrays
    are replicated; each chip generates and traces only its band's rays.
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    assert height % n == 0, "pad height to a multiple of the mesh size"

    o, d = generate_rays(width, height, cam_pos, cam_quat, fov_degrees)

    def shard_render(wide_l, tris_l, o_l, d_l):
        return _shade_rows(wide_l, tris_l, o_l, d_l, chunk)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_render,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None, None), P(axis, None, None)),
        out_specs=(P(axis, None, None), P(axis, None), P(axis, None)),
        check_rep=False,
    )
    return fn(wide, tris, o, d)


@partial(
    jax.jit,
    static_argnames=("width", "height", "fov_degrees", "mesh", "chunk"),
)
def render_spp_sharded(
    wide: WideBVH,
    tris: jax.Array,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    seeds: jax.Array,          # (n_devices,) uint32 — one sample stream per chip
    width: int,
    height: int,
    mesh: Mesh,
    fov_degrees: float = 70.0,
    chunk: int = 2048,
):
    """Samples-per-pixel across chips: each chip jitters its primary rays by
    its seed, traces the full frame, and the mesh-mean radiance comes back
    via psum over ICI — the multi-chip progressive-accumulation step."""
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]

    o, d = generate_rays(width, height, cam_pos, cam_quat, fov_degrees)

    def shard_render(wide_l, tris_l, o_l, d_l, seed_l):
        key = jax.random.key(seed_l[0])
        jitter = jax.random.normal(key, d_l.shape, jnp.float32) * (0.5 / height)
        d_j = d_l + jitter
        d_j = d_j / jnp.linalg.norm(d_j, axis=-1, keepdims=True)
        rgb, _, _ = _shade_rows(wide_l, tris_l, o_l, d_j, chunk)
        return jax.lax.psum(rgb, axis) / n

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_render,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis)),
        out_specs=P(),
        check_rep=False,
    )
    return fn(wide, tris, o, d, seeds)


@partial(
    jax.jit,
    static_argnames=("width", "height", "fov_degrees", "mesh", "chunk"),
)
def render_cameras_sharded(
    wide: WideBVH,
    tris: jax.Array,
    cam_pos_batch: jax.Array,   # (C, 3)
    cam_quat_batch: jax.Array,  # (C, 4)
    width: int,
    height: int,
    mesh: Mesh,
    fov_degrees: float = 70.0,
    chunk: int = 2048,
):
    """Multi-camera batch sharded across chips (BASELINE config 5)."""
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    assert cam_pos_batch.shape[0] % n == 0

    def shard_render(wide_l, tris_l, pos_l, quat_l):
        def one(pq):
            o, d = generate_rays(width, height, pq[0], pq[1], fov_degrees)
            rgb, _, _ = _shade_rows(wide_l, tris_l, o, d, chunk)
            return rgb
        return jax.lax.map(one, (pos_l, quat_l))

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_render,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis, None)),
        out_specs=P(axis, None, None, None),
        check_rep=False,
    )
    return fn(wide, tris, cam_pos_batch, cam_quat_batch)
