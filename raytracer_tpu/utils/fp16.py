"""FP16 codec utilities — vectorized (NumPy + JAX) half-float packing.

The reference engine stores all BVH bounds as IEEE fp16 pairs packed into u32
words. Two distinct f32→f16 conversions exist in the reference and both are
reproduced here bit-exactly:

* **Round-to-nearest-even** — WGSL ``pack2x16float`` used by the GPU LBVH
  builder (reference ``src/shaders/BVHBuilder.wgsl:65,99-101``). NumPy/JAX
  ``astype(float16)`` implements exactly this rounding, so we use it directly.
* **Truncating** — the JS helper ``f32ToF16`` used by the CPU BVH4 collapse
  (reference ``src/libs/PathTracer.js:42-51``): mantissa bits are dropped,
  exponents ≤0 flush to signed zero, exponents ≥31 become ±inf.

Also provided: the ordered-u16 ±N-ULP stepping used for conservative AABB
expansion (reference ``src/shaders/BVHBuilder.wgsl:63-81`` ``incrementF16``).

All functions are pure elementwise integer/float ops and work on both NumPy
arrays and JAX tracers (pass ``xp=jnp`` style is unnecessary — we only use
operators and ``astype``/``view`` patterns available in both).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "f32_to_f16_bits_rne",
    "f32_to_f16_bits_trunc",
    "f16_bits_to_f32",
    "pack16x2_rne",
    "pack16x2_trunc",
    "unpack16x2",
    "f16_ordered_from_bits",
    "f16_bits_from_ordered",
    "increment_f16",
    "pack_bounds_u32",
    "unpack_bounds_u32",
]


# ---------------------------------------------------------------------------
# NumPy implementations (host-side: artifact IO, oracle, collapse)
# ---------------------------------------------------------------------------

def f32_to_f16_bits_rne(x) -> np.ndarray:
    """f32 → f16 bit pattern with IEEE round-to-nearest-even.

    Matches WGSL ``pack2x16float`` semantics (BVHBuilder.wgsl:65).
    """
    x = np.asarray(x, dtype=np.float32)
    return x.astype(np.float16).view(np.uint16)


def f32_to_f16_bits_trunc(x) -> np.ndarray:
    """f32 → f16 bit pattern, truncating — the JS ``f32ToF16`` semantics
    (PathTracer.js:42-51): drop mantissa bits; exp<=0 → signed zero
    (subnormals flush); exp>=31 → signed infinity.
    """
    x = np.asarray(x, dtype=np.float32)
    u = x.view(np.uint32)
    s = ((u >> np.uint32(16)) & np.uint32(0x8000)).astype(np.uint32)
    e = ((u >> np.uint32(23)) & np.uint32(0xFF)).astype(np.int32) - 112
    m = ((u >> np.uint32(13)) & np.uint32(0x03FF)).astype(np.uint32)
    out = np.where(
        e <= 0,
        s,
        np.where(
            e >= 31,
            s | np.uint32(0x7C00),
            s | (e.astype(np.uint32) << np.uint32(10)) | m,
        ),
    )
    return out.astype(np.uint16)


def f16_bits_to_f32(bits) -> np.ndarray:
    """f16 bit pattern → f32, handling subnormals/inf/nan (PathTracer.js:16-40)."""
    bits = np.asarray(bits, dtype=np.uint16)
    return bits.view(np.float16).astype(np.float32)


def pack16x2_rne(a, b) -> np.ndarray:
    """Pack two f32 into one u32 as (lo=a, hi=b) fp16, RNE rounding.

    Matches WGSL ``pack2x16float(vec2(a, b))``.
    """
    lo = f32_to_f16_bits_rne(a).astype(np.uint32)
    hi = f32_to_f16_bits_rne(b).astype(np.uint32)
    return lo | (hi << np.uint32(16))


def pack16x2_trunc(a, b) -> np.ndarray:
    """Pack two f32 into one u32 via the truncating JS codec (PathTracer.js:53-54)."""
    lo = f32_to_f16_bits_trunc(a).astype(np.uint32)
    hi = f32_to_f16_bits_trunc(b).astype(np.uint32)
    return lo | (hi << np.uint32(16))


def unpack16x2(u, idx: int) -> np.ndarray:
    """Extract fp16 lane ``idx`` (0=lo, 1=hi) of a packed u32 → f32
    (PathTracer.js:56-57, WGSL ``unpack2x16float``)."""
    u = np.asarray(u, dtype=np.uint32)
    bits = ((u >> np.uint32(16 * idx)) & np.uint32(0xFFFF)).astype(np.uint16)
    return f16_bits_to_f32(bits)


# ---------------------------------------------------------------------------
# Ordered-space ULP stepping (conservative bounds)
# ---------------------------------------------------------------------------

def f16_ordered_from_bits(bits):
    """Map fp16 bit patterns to a monotonically ordered u16 space
    (BVHBuilder.wgsl:69-70): negative values map to ~bits, positive to
    bits^0x8000.
    """
    bits = np.asarray(bits, dtype=np.uint32) & np.uint32(0xFFFF)
    sign = (bits & np.uint32(0x8000)) != 0
    return np.where(sign, (~bits) & np.uint32(0xFFFF), bits ^ np.uint32(0x8000))


def f16_bits_from_ordered(ordv):
    """Inverse of :func:`f16_ordered_from_bits` (BVHBuilder.wgsl:76-77)."""
    ordv = np.asarray(ordv, dtype=np.uint32) & np.uint32(0xFFFF)
    ord_sign = (ordv & np.uint32(0x8000)) != 0
    return np.where(ord_sign, ordv ^ np.uint32(0x8000), (~ordv) & np.uint32(0xFFFF))


def increment_f16(value, up: bool, iterations: int = 1) -> np.ndarray:
    """Round f32 to fp16 (RNE) then step ±``iterations`` fp16 ULPs in ordered
    space and convert back to f32 — the conservative-bounds expansion of the
    GPU builder (BVHBuilder.wgsl:63-81).
    """
    bits = f32_to_f16_bits_rne(value).astype(np.uint32)
    ordv = f16_ordered_from_bits(bits)
    step = np.asarray(iterations, dtype=np.uint32)
    ordv = (ordv + step) & np.uint32(0xFFFF) if up else (ordv - step) & np.uint32(0xFFFF)
    bits2 = f16_bits_from_ordered(ordv).astype(np.uint16)
    return f16_bits_to_f32(bits2)


# ---------------------------------------------------------------------------
# Bounds packing helpers (the 3-u32 AABB format shared by BVH2/BVH4 nodes)
# ---------------------------------------------------------------------------

def pack_bounds_u32(mn, mx, *, trunc: bool = False) -> np.ndarray:
    """Pack an AABB (min, max each shape (..., 3)) into 3 u32 words laid out as
    [pack(mn.x,mn.y), pack(mn.z,mx.x), pack(mx.y,mx.z)]
    (BVHBuilder.wgsl:99-101 / PathTracer.js:560-566). No ULP expansion here.
    """
    pack = pack16x2_trunc if trunc else pack16x2_rne
    mn = np.asarray(mn, dtype=np.float32)
    mx = np.asarray(mx, dtype=np.float32)
    b0 = pack(mn[..., 0], mn[..., 1])
    b1 = pack(mn[..., 2], mx[..., 0])
    b2 = pack(mx[..., 1], mx[..., 2])
    return np.stack([b0, b1, b2], axis=-1)


def unpack_bounds_u32(b) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_bounds_u32`: (..., 3) u32 → (min, max) f32
    (PathTracer.js:545-558 / renderer.wgsl:94-99).
    """
    b = np.asarray(b, dtype=np.uint32)
    mn = np.stack(
        [unpack16x2(b[..., 0], 0), unpack16x2(b[..., 0], 1), unpack16x2(b[..., 1], 0)],
        axis=-1,
    )
    mx = np.stack(
        [unpack16x2(b[..., 1], 1), unpack16x2(b[..., 2], 0), unpack16x2(b[..., 2], 1)],
        axis=-1,
    )
    return mn, mx
