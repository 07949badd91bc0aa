"""Sequential pure-Python LBVH2 oracle — ground truth for the vectorized build.

Independent scalar implementation of the same Karras-2012 construction the
GPU builder performs (BVHBuilder.wgsl:134-305): one node at a time, with a
literal recursive/iterative bottom-up bounds pass instead of fixed-point
sweeps. Deliberately slow and simple; used only in tests on small meshes to
validate `ops.lbvh.build_lbvh2` node-for-node (the CPU-oracle test pattern of
SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from ..utils.fp16 import (
    f32_to_f16_bits_rne,
    f16_bits_to_f32,
    f16_bits_from_ordered,
    f16_ordered_from_bits,
)

LEAF_FLAG = 0x80000000
INVALID = 0xFFFFFFFF


def _clz32(x: int) -> int:
    x &= 0xFFFFFFFF
    if x == 0:
        return 32
    return 32 - x.bit_length()


def _inc_f16(v: float, up: bool) -> float:
    bits = int(f32_to_f16_bits_rne(np.float32(v)))
    ordv = int(f16_ordered_from_bits(np.uint32(bits)))
    ordv = (ordv + 1) & 0xFFFF if up else (ordv - 1) & 0xFFFF
    return float(f16_bits_to_f32(np.uint16(f16_bits_from_ordered(np.uint32(ordv)))))


def _pack2(a: float, b: float) -> int:
    lo = int(f32_to_f16_bits_rne(np.float32(a)))
    hi = int(f32_to_f16_bits_rne(np.float32(b)))
    return (lo | (hi << 16)) & 0xFFFFFFFF


def _pack_bounds_conservative(mn, mx) -> list[int]:
    mnl = [_inc_f16(float(v), False) for v in mn]
    mxl = [_inc_f16(float(v), True) for v in mx]
    return [
        _pack2(mnl[0], mnl[1]),
        _pack2(mnl[2], mxl[0]),
        _pack2(mxl[1], mxl[2]),
    ]


def _unpack_bounds(b: list[int]):
    def up(u, idx):
        return float(f16_bits_to_f32(np.uint16((u >> (16 * idx)) & 0xFFFF)))

    mn = [up(b[0], 0), up(b[0], 1), up(b[1], 0)]
    mx = [up(b[1], 1), up(b[2], 0), up(b[2], 1)]
    return mn, mx


def morton_codes_py(centroids: np.ndarray) -> np.ndarray:
    """Scalar Morton codes matching ops.morton semantics (f32 arithmetic)."""
    c = centroids.astype(np.float32)
    mn = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - mn, np.float32(1e-20))
    out = np.zeros(len(c), dtype=np.uint32)
    for t in range(len(c)):
        code = 0
        q = []
        for a in range(3):
            nval = np.float32((c[t, a] - mn[a]) / ext[a])
            qv = int(np.trunc(np.float32(nval * np.float32(1023.0))))
            q.append(max(0, min(1023, qv)))

        def expand(v: int) -> int:
            v &= 1023
            v = (v | (v << 16)) & 0x030000FF
            v = (v | (v << 8)) & 0x0300F00F
            v = (v | (v << 4)) & 0x030C30C3
            v = (v | (v << 2)) & 0x09249249
            return v

        code = (expand(q[0]) << 2) | (expand(q[1]) << 1) | expand(q[2])
        out[t] = code & 0xFFFFFFFF
    return out


def build_lbvh2_oracle(triangles: np.ndarray) -> dict:
    """Sequential LBVH2 build. Returns dict with bounds_u32 (M,3), left,
    right, meta, parent arrays matching ops.lbvh.LBVH2 semantics."""
    tris = np.asarray(triangles, dtype=np.float32)
    n = len(tris)
    assert n >= 1
    centroids = tris.mean(axis=1)
    codes = morton_codes_py(centroids)
    order = np.argsort(codes, kind="stable").astype(np.uint32)
    codes_sorted = codes[order]

    num_internal = n - 1
    num_nodes = 2 * n - 1
    bounds = np.zeros((num_nodes, 3), dtype=np.uint32)
    left = np.zeros(num_nodes, dtype=np.uint32)
    right = np.zeros(num_nodes, dtype=np.uint32)
    meta = np.zeros(num_nodes, dtype=np.uint32)
    parent = np.full(num_nodes, INVALID, dtype=np.uint32)

    def delta(i: int, j: int) -> int:
        if j < 0 or j >= n:
            return -1
        x = int(codes_sorted[i]) ^ int(codes_sorted[j])
        if x == 0:
            return 32 + _clz32(i ^ j)
        return _clz32(x)

    # internal connectivity (scalar Karras)
    for i in range(num_internal):
        d = 1 if (delta(i, i + 1) - delta(i, i - 1)) > 0 else -1
        delta_min = delta(i, i - d)
        lmax = 2
        while delta(i, i + lmax * d) > delta_min:
            lmax <<= 1
        l = 0
        t = lmax >> 1
        while t > 0:
            if delta(i, i + (l + t) * d) > delta_min:
                l += t
            t >>= 1
        j = i + l * d
        first, last = min(i, j), max(i, j)
        delta_node = delta(first, last)
        split = first
        step = last - first
        while step > 1:
            step = (step + 1) >> 1
            new_split = split + step
            if new_split < last and delta(first, new_split) > delta_node:
                split = new_split
        leaf_base = num_internal
        lc = (leaf_base + split) if split == first else split
        rc = (leaf_base + split + 1) if (split + 1) == last else (split + 1)
        left[i], right[i] = lc, rc
        parent[lc] = i
        parent[rc] = i
    parent[0] = INVALID

    # leaves
    for k in range(n):
        node = num_internal + k
        tri = int(order[k])
        v = tris[tri]
        mn, mx = v.min(axis=0), v.max(axis=0)
        bounds[node] = _pack_bounds_conservative(mn, mx)
        meta[node] = (LEAF_FLAG | (tri & 0x7FFFFFFF)) & 0xFFFFFFFF

    # bottom-up bounds: post-order walk so children are final before parents
    def height_order() -> list[int]:
        out, stack, visited = [], [0], set()
        # iterative post-order
        stack = [(0, False)]
        while stack:
            node, processed = stack.pop()
            if node >= num_internal:
                continue
            if processed:
                out.append(node)
            else:
                stack.append((node, True))
                stack.append((int(left[node]), False))
                stack.append((int(right[node]), False))
        return out

    if num_internal > 0:
        for node in height_order():
            lmn, lmx = _unpack_bounds([int(x) for x in bounds[int(left[node])]])
            rmn, rmx = _unpack_bounds([int(x) for x in bounds[int(right[node])]])
            mn = np.minimum(lmn, rmn)
            mx = np.maximum(lmx, rmx)
            bounds[node] = _pack_bounds_conservative(mn, mx)

    return {
        "bounds_u32": bounds,
        "left": left,
        "right": right,
        "meta": meta,
        "parent": parent,
        "order": order,
        "codes_sorted": codes_sorted,
    }
