"""AOT export cache — sub-second first-pixel latency for fresh processes.

Round-2 measured a 27-300 s cold start per process for the Pallas traversal
kernel (SUITE_r02 ``build_seconds_first_run``). Round-3 root cause, measured
on the axon relay (tools/mb_results_r2.md era protocol):

* ``jax.jit(...).lower()`` of the persistent kernel costs **~37 s** of pure
  host-side Python/Mosaic lowering — every process pays it even when the XLA
  persistent compilation cache hits (compile itself: ~4 s on a hit).
* ``jax.export`` serializes the lowered module (~1.2 MB). A fresh process
  then pays **deserialize ≈ 0 s + compile ≈ 1-15 s** (1 s on a persistent-
  cache hit, ~15 s cold) — measured 1.1 s to first pixel vs ~300 s before.
* CAVEAT: wrapping ``exp.call`` in a NEW outer jit (e.g. a ``lax.map`` frame
  batch) builds a different module that recompiles from scratch (~350 s) —
  so exports must happen at the OUTERMOST jit of each production call shape,
  and callers must invoke the deserialized export directly.

Keying: sha256 of (kernel source file, jax version, platform, RT_* env
knobs, the export name, static config repr). Scene-size dependence enters
through the qnodes leading dim M; :func:`pad_qnodes` rounds M up to a
bucket so one export serves every scene in the bucket (padding rows are
unreachable — no node references them).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cached_export", "pad_qnodes", "aot_cache_dir", "source_fingerprint"]

_MEM: dict[str, object] = {}


def _register_pytrees() -> None:
    """Exports whose arguments include the library NamedTuples (WideBVH,
    LBVH2, ClusteredScene) can only be serialized once those types are
    registered with jax.export. Idempotent."""
    from ...ops.cluster import ClusteredScene
    from ...ops.lbvh import LBVH2
    from ...ops.trace import WideBVH

    for nt in (WideBVH, LBVH2, ClusteredScene):
        try:
            jax.export.register_namedtuple_serialization(
                nt, serialized_name=f"raytracer_tpu.{nt.__name__}"
            )
        except ValueError:
            pass  # already registered


_register_pytrees()


def aot_cache_dir() -> Path:
    d = os.environ.get("RT_AOT_CACHE", "")
    if d:
        return Path(d)
    return Path(__file__).resolve().parents[3] / ".aot_cache"


_SRC_FP: str | None = None


def source_fingerprint() -> str:
    """Hash of everything that affects ANY traced program: every .py in the
    package. Exported programs close over arbitrary library code
    (render_pt, render, parallel/mesh, ...), so hashing only the kernel
    sources would silently serve stale executables after a library edit —
    a benchmark would A/B the OLD code. Whole-package hashing trades
    one re-export per source change for that correctness guarantee.
    Memoized: sources cannot change meaningfully within a process (modules
    are already imported), and cached_export sits on per-frame paths."""
    global _SRC_FP
    if _SRC_FP is not None:
        return _SRC_FP
    pkg = Path(__file__).resolve().parents[2]
    h = hashlib.sha256()
    for p in sorted(pkg.rglob("*.py")):
        h.update(p.name.encode())
        h.update(p.read_bytes())
    h.update(jax.__version__.encode())
    for k in sorted(os.environ):
        if k.startswith("RT_") and k != "RT_AOT_CACHE":
            h.update(f"{k}={os.environ[k]}".encode())
    _SRC_FP = h.hexdigest()[:16]
    return _SRC_FP


def _code_fingerprint(fn, _seen=None) -> str:
    """Best-effort structural hash of a Python function: bytecode + consts
    (recursing into nested code objects) + primitive closure-cell values.
    Guards the export cache against two call sites sharing a ``name`` but
    building different programs — a collision would silently serve the
    WRONG executable (it bit a benchmark in round 3). Closure cells holding
    arrays are skipped (shape/dtype live in the spec key)."""
    h = hashlib.sha256()

    def walk_code(code):
        h.update(code.co_code)
        for c in code.co_consts:
            if hasattr(c, "co_code"):
                walk_code(c)
            else:
                h.update(repr(c).encode())

    walk_code(fn.__code__)
    for cell in fn.__closure__ or ():
        v = cell.cell_contents
        if isinstance(v, (int, float, str, bool, bytes, tuple)):
            h.update(repr(v).encode())
        elif hasattr(v, "__code__"):
            walk_code(v.__code__)
        elif isinstance(v, np.ndarray) and v.nbytes <= 65536:
            # small baked-in host constants (camera vectors etc.) — an
            # edited constant must not serve the stale export. Device
            # arrays are deliberately skipped (hashing would force a
            # device sync on the per-frame path).
            h.update(v.tobytes())
            h.update(str(v.shape).encode())
    return h.hexdigest()[:10]


def cached_export(name: str, make_fn, arg_specs, *, platform: str | None = None):
    """Return a callable for ``jax.jit(make_fn())`` specialized to
    ``arg_specs``, served from the on-disk export cache when possible.

    ``make_fn`` is a zero-arg factory returning the jittable function
    (building it is assumed cheap; tracing/lowering only happens on a cache
    miss). On a miss the function is exported (paying the one-time lowering
    cost), serialized to disk, and used. Returns ``exp.call`` — call it
    with arrays matching ``arg_specs``. ``name`` should still uniquely
    describe the program — the code fingerprint below is a guard, not a
    namespace.
    """
    if platform is None:
        platform = jax.default_backend()
    spec_key = ",".join(
        f"{tuple(s.shape)}:{s.dtype}" for s in jax.tree.leaves(arg_specs)
    )
    spec_key += "|" + _code_fingerprint(make_fn())
    key = f"{name}-{platform}-{source_fingerprint()}-" + hashlib.sha256(
        spec_key.encode()
    ).hexdigest()[:12]
    if key in _MEM:
        return _MEM[key].call

    d = aot_cache_dir()
    path = d / f"{key}.jaxexport"
    exp = None
    if path.exists():
        try:
            exp = jax.export.deserialize(path.read_bytes())
        except Exception:
            exp = None  # version skew etc. — fall through to re-export
    if exp is None:
        exp = jax.export.export(jax.jit(make_fn()))(*arg_specs)
        try:
            d.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(".tmp")
            tmp.write_bytes(exp.serialize())
            os.replace(tmp, path)
        except OSError:
            pass  # read-only filesystem — serve from memory only
    _MEM[key] = exp
    return exp.call


def pad_qnodes(qnodes: jax.Array, bucket: int = 16384) -> jax.Array:
    """Round the supernode-record count up to a multiple of ``bucket`` so
    one AOT export serves every scene in the bucket. Pad records are all-
    zero: child refs decode to 'empty', and no real node references the pad
    rows, so traversal never touches them."""
    m = qnodes.shape[0]
    pad = (-m) % bucket
    if pad == 0:
        return qnodes
    return jnp.pad(qnodes, ((0, pad), (0, 0), (0, 0)))
