"""Progressive path tracing — the north-star extension the reference stubs.

The shipped reference traces primary rays only, but plumbs ``frameCount``
into the UBO for never-wired progressive accumulation
(PathTracer.js:76,:783,:832-834; renderer.wgsl:18 — SURVEY.md scope note).
This module completes that design TPU-natively:

* **Light model** — chosen so 1-bounce direct lighting reproduces the
  shipped Lambert shade exactly in expectation: Lambert BRDF ρ/π with
  ρ = (0.9, 0.7, 0.3); directional sun along normalize(1, 1.5, 1) with
  irradiance scaled so direct = ρ·max(n·l, 0); constant ambient sky of
  radiance 0.15 (the reference's ambient term) for non-primary rays; primary
  rays that miss still show the 0.01 background (renderer.wgsl:410).
* **Sampling** — subpixel-jittered camera rays, cosine-hemisphere BSDF
  sampling, next-event estimation to the sun (shadow rays), Russian-roulette-
  free fixed bounce budget (static unroll — XLA-friendly).
* **Waves** — each bounce is one batched trace over all rays with masked
  (dead-lane) state; capacity is fixed so everything stays jit-compatible
  (SURVEY.md §5.7: rays are the "sequence"; masking controls divergence).
* **Accumulation** — running mean keyed on frame_count, reset on camera
  move (handled by the PathTracer orchestrator).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .ops.camera import INF, rotate_by_quat
from .ops.shade import MISS_COLOR
from .ops.trace import WideBVH, trace_rays, trace_rays_brute

__all__ = ["pt_sample_frame", "accumulate"]

_BASE = (0.9, 0.7, 0.3)
_SUN_DIR = (1.0, 1.5, 1.0)
_SKY = 0.15
_EPS_OFFSET = 1e-4
# wave-compaction permutation: "argsort" (XLA sort — default) or "partition"
# (MXU bucket ranks, ops/partition.py). Measured on TPU (tools/mb_partition.py,
# 262k lanes): argsort+gather 3.95 ms/iter ≈ gather-only 4.01 — the permute is
# GATHER-bound and the sort is free, so the MXU partition (5.48) loses; it
# stays available for wider key spaces where argsort's bitonic depth bites.
_COMPACT_IMPL = os.environ.get("RT_COMPACT", "argsort")


def _sun() -> jax.Array:
    l = jnp.asarray(_SUN_DIR, jnp.float32)
    return l / jnp.linalg.norm(l)


def _onb(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Orthonormal basis around normal n (Frisvad-style, branchless)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def _cosine_sample(n: jax.Array, u1: jax.Array, u2: jax.Array) -> jax.Array:
    """Cosine-weighted hemisphere direction around n."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    t, bt = _onb(n)
    return t * x[..., None] + bt * y[..., None] + n * z[..., None]


def _normals_for(tris: jax.Array, tri_idx: jax.Array, d: jax.Array) -> jax.Array:
    """Geometric normal flipped to face the incoming ray."""
    nt = tris.shape[0]
    v = tris[jnp.clip(tri_idx, 0, nt - 1)]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = jnp.cross(e1, e2)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    flip = jnp.sign(-jnp.sum(n * d, axis=-1, keepdims=True))
    return n * jnp.where(flip == 0.0, 1.0, flip)


def _tile_order(width: int, height: int):
    """Lane → pixel permutation that groups lanes by TILE×TILE pixel block.

    The ray-buffer kernel's streams are consecutive 1024-lane chunks; in
    row-major pixel order a stream is a 1024-pixel ROW STRIP whose packet
    frustum is ~TILE× wider than a square tile's — measured 9.6 ms vs the
    tile kernel's ~6 ms for the same coherent wave (tools/mb_pt.py). Keeping
    every PT wave in tile-block order gives each stream a square 32×32
    footprint for free; the final ``.at[pix].set`` scatter restores pixel
    positions. Partial edge tiles simply pack fewer lanes per block.
    """
    import numpy as np

    from .ops.pallas.traverse import TILE

    idx = np.arange(height * width, dtype=np.int32).reshape(height, width)
    blocks = [idx[y:y + TILE, x:x + TILE].ravel()
              for y in range(0, height, TILE)
              for x in range(0, width, TILE)]
    return np.concatenate(blocks)


def _img_to_lanes(img, width: int, height: int):
    """(H, W[, C]) image → flat lane order per ``_tile_order``."""
    from .ops.pallas.traverse import TILE

    ch = img.shape[2:]
    if width % TILE == 0 and height % TILE == 0:
        a = img.reshape(height // TILE, TILE, width // TILE, TILE, *ch)
        return a.transpose(0, 2, 1, 3, *range(4, 4 + len(ch))).reshape(
            height * width, *ch)
    flat = img.reshape(height * width, *ch)
    return flat[jnp.asarray(_tile_order(width, height))]


def _lanes_to_img(lanes, width: int, height: int):
    """Inverse of :func:`_img_to_lanes` for TILE-aligned frames — a pure
    reshape/transpose, replacing the (H·W)-scatter the non-compacted PT
    epilogue used to pay (gathers/scatters are the PT glue — PERF.md)."""
    from .ops.pallas.traverse import TILE

    ch = lanes.shape[1:]
    a = lanes.reshape(height // TILE, width // TILE, TILE, TILE, *ch)
    return a.transpose(0, 2, 1, 3, *range(4, 4 + len(ch))).reshape(
        height, width, *ch)


def _park_irrelevant(o, d, relevant, sub=None):
    """Park lanes whose trace result will be masked out on a live lane of
    the same kernel stream (``sub``×128-lane chunk), so they add ZERO cost.

    In a packet kernel the node visits of a stream are the union over its
    lanes — a duplicated ray adds no visits and rides vector ops that happen
    anyway. Without parking, dead lanes carry garbage origins (miss lanes'
    ``p = o + d*INF = ±inf``), which blow up the stream's origin-AABB slack
    (disabling the scalar cull ordering) and block any-hit early stream
    termination (a never-occludable lane pins the stream). Streams with NO
    relevant lane are parked at +inf origins: the root slab test fails and
    the stream drains after one visit (the raybuf kernel's designed pad-ray
    behavior, traverse.py::trace_rays_pallas).
    """
    r = o.shape[0]
    # chunk size MUST match the stream width the wave will trace with —
    # an inf-parked sub-chunk inside a wider live stream would blow up the
    # stream's origin AABB and disable the scalar cull ordering
    ch = (_wave_sub(r) if sub is None else sub) * 128
    nch = r // ch
    if nch == 0:
        return o, d
    oc = o[: nch * ch].reshape(nch, ch, 3)
    dc = d[: nch * ch].reshape(nch, ch, 3)
    rc = relevant[: nch * ch].reshape(nch, ch)
    any_rel = jnp.any(rc, axis=1)
    first = jnp.argmax(rc, axis=1)      # index of a live lane (0 if none)
    o_live = jnp.take_along_axis(oc, first[:, None, None], axis=1)
    d_live = jnp.take_along_axis(dc, first[:, None, None], axis=1)
    o_park = jnp.where(any_rel[:, None, None], o_live, jnp.float32(INF))
    d_park = jnp.where(any_rel[:, None, None], d_live, jnp.float32(1.0))
    oc = jnp.where(rc[:, :, None], oc, o_park)
    dc = jnp.where(rc[:, :, None], dc, d_park)
    o = jnp.concatenate([oc.reshape(-1, 3), o[nch * ch:]], axis=0)
    d = jnp.concatenate([dc.reshape(-1, 3), d[nch * ch:]], axis=0)
    return o, d


def _wave_sub(r: int, any_hit: bool = False) -> int:
    """Stream width for PT waves: wider streams amortize the per-visit
    scalar cost on divergent waves that walk ~the whole tree per stream
    (tools/mb_sub.py, interior scene, ms/wave at sub=8/16/32/64:
    closest-hit incoherent 22.3/18.5/16.9/34.4 — best at 32; NEE any-hit
    5.3/4.9/5.3/11.9 — best at 16, early stream termination shrinks with
    width). Defaults: closest-hit 32, any-hit 16; override with
    RT_WAVE_SUB_CH / RT_WAVE_SUB_AH. Small (test-size) waves keep the
    tile-kernel default."""
    from .ops.pallas.traverse import NS, SUB

    sub = int(os.environ.get("RT_WAVE_SUB_AH" if any_hit else
                             "RT_WAVE_SUB_CH", "16" if any_hit else "32"))
    return sub if r >= NS * sub * 128 else SUB


def _wave_ordered(any_hit: bool = False) -> bool:
    """Near-first ordering for PT waves (trace_rays_pallas ``ordered``).

    The consume loop is scalar-issue-bound, and the ordering key + sorting
    network are ~100 scalar ops of its ~330 ns/visit; on divergent waves
    the stream-mean ordering axis prunes little, so dropping ordering can
    win (A/B'd per config — PERF.md round 4). Defaults measured on the
    interior scene; override with RT_WAVE_ORDERED_CH / RT_WAVE_ORDERED_AH
    (1 = ordered)."""
    return os.environ.get("RT_WAVE_ORDERED_AH" if any_hit else
                          "RT_WAVE_ORDERED_CH", "1") == "1"


def _occluded(wide, qnodes, tris, o, d, brute: bool, leaf_k: int = 1,
              interpret: bool = False):
    """NEE shadow query: True where the ray hits anything. Uses the Pallas
    any-hit mode (first accepted hit terminates the lane; streams drain
    early once fully occluded — verdict r1 #5) when records are supplied."""
    if qnodes is not None and not brute:
        from .ops.pallas.traverse import trace_rays_pallas

        _, _, _, _, tri = trace_rays_pallas(qnodes, o, d, any_hit=True,
                                            leaf_k=leaf_k, interpret=interpret,
                                            sub=_wave_sub(o.shape[0],
                                                          any_hit=True),
                                            ordered=_wave_ordered(any_hit=True))
        return tri >= 0
    if brute:
        _, tri = trace_rays_brute(tris, o, d)
    else:
        _, tri = trace_rays(wide, tris, o, d)
    return tri >= 0


def _trace(wide, qnodes, tris, o, d, brute: bool, leaf_k: int = 1,
           interpret: bool = False, ordered: bool = True):
    """One wave: closest hit + ray-facing normals.

    Uses the Pallas ray-buffer kernel when supernode records are supplied
    (TPU fast path — normals come straight out of the kernel), else the XLA
    traversal or the brute-force path."""
    if qnodes is not None and not brute:
        from .ops.pallas.traverse import trace_rays_pallas

        t, nx, ny, nz, tri = trace_rays_pallas(qnodes, o, d, leaf_k=leaf_k,
                                               interpret=interpret,
                                               sub=_wave_sub(o.shape[0]),
                                               ordered=ordered)
        n = jnp.stack([nx, ny, nz], axis=-1)
        flip = jnp.sign(-jnp.sum(n * d, axis=-1, keepdims=True))
        n = n * jnp.where(flip == 0.0, 1.0, flip)
        return t, tri, n
    if brute:
        t, tri = trace_rays_brute(tris, o, d)
    else:
        t, tri = trace_rays(wide, tris, o, d)
    return t, tri, _normals_for(tris, tri, d)


@partial(
    jax.jit,
    static_argnames=("width", "height", "bounces", "fov_degrees", "brute",
                     "compact", "leaf_k", "interpret", "stats",
                     "tile_primary"),
)
def pt_sample_frame(
    wide: WideBVH,
    tris: jax.Array,
    cam_pos: jax.Array,
    cam_quat: jax.Array,
    key: jax.Array,
    width: int,
    height: int,
    bounces: int = 3,
    fov_degrees: float = 70.0,
    brute: bool = False,
    qnodes: jax.Array | None = None,
    compact: bool = False,
    leaf_k: int = 1,
    interpret: bool = False,
    stats: bool = False,
    tile_primary: bool = False,
):
    """One progressive sample: jittered primary rays + path-traced bounces.

    ``compact=True`` re-sorts surviving rays between bounce waves by
    (alive, direction octant, origin Morton code) so the traversal kernel's
    1024-lane streams stay spatially coherent after the first bounce
    scrambles them (SURVEY.md §5.7's wavefront compaction). Costs one
    argsort + gathers per wave — a win when the scene makes incoherent
    waves expensive; measured per-config in PERF.md.

    ``tile_primary=True`` (kernel path only) traces the b=0 camera wave
    through the persistent TILE kernel (fused in-kernel ray generation,
    per-tile stacks) instead of the generic ray-buffer kernel — the camera
    wave is exactly the workload that kernel is built for. Subpixel jitter
    comes from the shared counter-based hash (ops/camera.py::subpixel_hash01)
    seeded from ``key``, so the sample stream stays backend-reproducible.

    Returns linear radiance (H, W, 3) float32.
    """
    import math

    r = width * height
    keys = jax.random.split(key, 2 + 2 * bounces)

    use_kernel = qnodes is not None and not brute
    tile_primary = tile_primary and use_kernel
    if tile_primary:
        # camera wave through the TILE kernel: rays are generated in-kernel
        # with the shared subpixel hash; the host reproduces the directions
        # for the bounce continuation (bit-matching modulo rsqrt ulps)
        from .ops.camera import generate_rays_jittered

        pseed = jax.random.randint(keys[0], (), 0, 1 << 22)
        o2, d2 = generate_rays_jittered(width, height, cam_pos, cam_quat,
                                        pseed, fov_degrees)
        o = _img_to_lanes(o2, width, height)
        d = _img_to_lanes(d2, width, height)
    else:
        # jittered primary rays (uv jitter replaces the fixed +0.5 pixel center)
        focal = jnp.float32(1.0 / math.tan(0.5 * math.radians(fov_degrees)))
        aspect = jnp.float32(width / height)
        jx = jax.random.uniform(keys[0], (height, width))
        jy = jax.random.uniform(keys[1], (height, width))
        px = (jnp.arange(width, dtype=jnp.float32)[None, :] + jx) / width * 2.0 - 1.0
        py = (jnp.arange(height, dtype=jnp.float32)[:, None] + jy) / height * 2.0 - 1.0
        d = jnp.stack(
            [px * aspect, jnp.broadcast_to(py, (height, width)),
             jnp.full((height, width), -focal)],
            axis=-1,
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = rotate_by_quat(d, jnp.asarray(cam_quat, jnp.float32)[None, None, :])
        d = _img_to_lanes(d, width, height)
        o = jnp.broadcast_to(jnp.asarray(cam_pos, jnp.float32), (r, 3))

    sun = _sun()
    base = jnp.asarray(_BASE, jnp.float32)

    radiance = jnp.zeros((r, 3), jnp.float32)
    throughput = jnp.ones((r, 3), jnp.float32)
    alive = jnp.ones((r,), bool)
    # ray → pixel: lanes start in tile-block order (see _tile_order) and are
    # further permuted by compaction; the final scatter restores pixels
    pix = jnp.asarray(_tile_order(width, height))
    alive_rays = jnp.int32(0)   # honest ray accounting: lanes that MATTER
    lane_rays = jnp.int32(0)    # lanes actually traced (incl. dead/masked)

    for b in range(bounces):
        # path wave traces every lane; NEE wave likewise — alive accounting
        # counts only the lanes whose result is used (alive paths, and
        # shadow rays for lanes that hit)
        lane_rays = lane_rays + jnp.int32(2 * r)
        alive_rays = alive_rays + jnp.sum(alive, dtype=jnp.int32)
        if b == 0 and tile_primary:
            from .ops.pallas.traverse import trace_tiles_pallas

            t, nx, ny, nz, tri = trace_tiles_pallas(
                qnodes, cam_pos, cam_quat, width, height, fov_degrees,
                jitter=True, jitter_seed=pseed, leaf_k=leaf_k,
                interpret=interpret,
            )[:5]
            t, tri = (_img_to_lanes(t, width, height),
                      _img_to_lanes(tri, width, height))
            n = jnp.stack([_img_to_lanes(nx, width, height),
                           _img_to_lanes(ny, width, height),
                           _img_to_lanes(nz, width, height)], axis=-1)
            flip = jnp.sign(-jnp.sum(n * d, axis=-1, keepdims=True))
            n = n * jnp.where(flip == 0.0, 1.0, flip)
        else:
            ot, dt = (o, d)
            if use_kernel and b > 0:
                ot, dt = _park_irrelevant(o, d, alive,
                                          sub=_wave_sub(o.shape[0]))
            t, tri, n = _trace(wide, qnodes, tris, ot, dt, brute, leaf_k,
                               interpret,
                               ordered=_wave_ordered() if b > 0 else True)
        hit = (tri >= 0) & alive
        miss = ~(tri >= 0) & alive

        # miss → environment: dark background for camera rays, ambient sky after
        env = jnp.float32(MISS_COLOR) if b == 0 else jnp.float32(_SKY)
        radiance = radiance + jnp.where(
            miss[:, None], throughput * env, 0.0
        )

        p = o + d * t[:, None] + n * _EPS_OFFSET

        # next-event estimation: any-hit shadow ray toward the sun.
        # Lanes whose surface faces AWAY from the sun contribute exactly 0
        # (direct ∝ max(n·l, 0)) — park them too, so the occlusion wave only
        # carries lanes that can matter (≈50% on convex scenes; parked lanes
        # duplicate a live lane and add zero visits). Bit-identical image.
        ndotl = jnp.maximum(jnp.sum(n * sun, axis=-1), 0.0)
        nee_rel = hit & (ndotl > 0.0)
        alive_rays = alive_rays + jnp.sum(nee_rel, dtype=jnp.int32)
        os_, ds_ = p, jnp.broadcast_to(sun, p.shape)
        if use_kernel:
            # miss lanes' p is ±inf (o + d*INF) — parked so they can't
            # poison the stream stats or block any-hit early termination
            os_, ds_ = _park_irrelevant(os_, ds_, nee_rel,
                                        sub=_wave_sub(r, any_hit=True))
        occ = _occluded(wide, qnodes, tris, os_, ds_, brute, leaf_k, interpret)
        lit = ~occ
        direct = base[None, :] * (ndotl * lit)[:, None]
        radiance = radiance + jnp.where(hit[:, None], throughput * direct, 0.0)

        # continue the path with a cosine sample; albedo absorbs the brdf/pdf
        u1 = jax.random.uniform(keys[2 + 2 * b], (r,))
        u2 = jax.random.uniform(keys[3 + 2 * b], (r,))
        new_d = _cosine_sample(n, u1, u2)
        throughput = jnp.where(hit[:, None], throughput * base[None, :], throughput)
        o = jnp.where(hit[:, None], p, o)
        d = jnp.where(hit[:, None], new_d, d)
        alive = hit

        if compact and b < bounces - 1:
            from .ops.morton import morton3d

            # dead rays sink to the end; live rays cluster by direction
            # octant then coarse origin cell (scene is normalized ≈[-1,1]).
            # Full per-lane re-sort every wave: each bounce re-samples every
            # lane's direction, so octant purity — the part of the key that
            # pays (A/B'd round 3) — can never be preserved by cheaper
            # grouped/segmented sorts (tools/mb_compact2.py).
            q = jnp.clip((o + 2.0) * (1023.0 / 4.0), 0.0, 1023.0).astype(jnp.uint32)
            m = morton3d(q[:, 0], q[:, 1], q[:, 2])
            octant = (
                (d[:, 0] < 0).astype(jnp.uint32) * 4
                + (d[:, 1] < 0).astype(jnp.uint32) * 2
                + (d[:, 2] < 0).astype(jnp.uint32)
            )
            if _COMPACT_IMPL == "argsort":
                # reference impl: full 31-bit key through XLA's sort —
                # 12.9 ms flat for 262k keys (PERF.md r3 #9)
                key = (
                    (~alive).astype(jnp.uint32) << jnp.uint32(31)
                    | (octant << jnp.uint32(28))
                    | (m >> jnp.uint32(2))
                )
                perm = jnp.argsort(key)
            else:
                # MXU stable bucket partition (ops/partition.py): the key
                # space that matters is tiny — (alive, octant, top Morton
                # bits) — so per-bucket ranks come from a triangular matmul
                # instead of a 12.9 ms sort network
                from .ops.partition import bucket_partition_perm

                key = (
                    (~alive).astype(jnp.int32) << 7
                    | (octant.astype(jnp.int32) << 4)
                    | ((m >> jnp.uint32(26)).astype(jnp.int32) & 0xF)
                )
                perm = bucket_partition_perm(key, 256)
            o, d = o[perm], d[perm]
            radiance, throughput = radiance[perm], throughput[perm]
            alive, pix = alive[perm], pix[perm]

    # paths still alive after the last bounce collect the ambient sky
    radiance = radiance + jnp.where(alive[:, None], throughput * jnp.float32(_SKY), 0.0)
    from .ops.pallas.traverse import TILE as _T
    if not compact and width % _T == 0 and height % _T == 0:
        # lanes never left tile-block order: undo it with a reshape instead
        # of an (H·W)-scatter
        img = _lanes_to_img(radiance, width, height)
    else:
        radiance = jnp.zeros((r, 3), jnp.float32).at[pix].set(radiance)
        img = radiance.reshape(height, width, 3)
    if stats:
        return img, {"alive_rays": alive_rays, "lane_rays": lane_rays}
    return img


@jax.jit
def accumulate(accum: jax.Array, sample: jax.Array, frame_count: jax.Array):
    """Running mean: frame_count samples already in accum, add one more."""
    n = frame_count.astype(jnp.float32)
    return (accum * n + sample) / (n + 1.0)
