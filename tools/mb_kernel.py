"""Microbenchmarks for the round-2 kernel design (DESIGN_V2.md).

Measures, on the real TPU, the per-iteration cost of the primitives the
paged/vectorized traversal kernel is built from:

  loop        — empty scalar while_loop floor
  smem24      — 24 scalar SMEM reads per iteration (round-1 record consumption)
  dma{512,2k,8k} — serialized scalar-indexed DMA start+wait per iteration
  dma2k_pipe  — double-buffered 2 KB DMA (start i+1 before wait i)
  dma2k_x4    — 4 independent 2 KB DMAs per iteration (4 starts then 4 waits)
  dma2k_vec   — 2 KB DMA + ~40 vector ops between start and wait (overlap test)
  mxu         — (8,128)·(128,128) one-hot broadcast matmul + mask multiply
  bcast       — six (1,128)→(8,128) sublane broadcasts + slab-test math
  reduce      — one full-tile lane reduction to scalar

Methodology: each kernel runs its body n times in a while_loop whose carry
feeds the output (defeats DCE); cost = (t(n) − t(n0)) / (n − n0) with a host
pull after each call (honest under the axon relay).
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REC = 128


def timed(fn, n):
    fn(n)  # compile+warm
    fn(n)
    reps = 3
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(n)
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(make, n_hi=200_000, n_lo=1_000):
    f = make()
    t_hi = timed(f, n_hi)
    t_lo = timed(f, n_lo)
    return (t_hi - t_lo) / (n_hi - n_lo)


def _run(kernel, hbm_rows, n, scratch):
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=scratch,
    )(jnp.array([n], jnp.int32), hbm_rows)
    return np.asarray(out)


def bench(name, kernel, scratch, rows=1 << 14, **kw):
    hbm = jnp.arange(rows * REC, dtype=jnp.float32).reshape(rows, REC) * 1e-6

    def make():
        def f(n):
            return _run(kernel, hbm, n, scratch)

        return f

    ns = per_iter(make, **kw)
    print(f"{name:12s} {ns * 1e9:8.1f} ns/iter")
    return ns


# --- kernels ---------------------------------------------------------------

def k_loop(n_ref, hbm, out, acc_scr):
    def body(c):
        i, a = c
        return i + 1, a + i

    i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0], body, (jnp.int32(0), jnp.int32(0)))
    out[...] = jnp.full((8, 128), a, jnp.float32)


def k_smem24(n_ref, hbm, out, smem_scr):
    # one DMA up front fills the record; loop does 24 scalar reads per iter
    def body(c):
        i, a = c
        s = jnp.float32(0.0)
        for k in range(24):
            s = s + smem_scr[0, (k * 5 + 1) % 64]
        return i + 1, a + s

    i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0], body, (jnp.int32(0), jnp.float32(0.0)))
    out[...] = jnp.full((8, 128), a, jnp.float32)


def make_k_dma(rows_per, pipelined=False, streams=1, vec_ops=0):
    def k(n_ref, hbm, out, scr, sem, acc_scr):
        nrows = hbm.shape[0]

        def fetch(slot, row):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(row, rows_per)], scr.at[slot], sem.at[slot]
            )

        nslots = scr.shape[0]

        if pipelined:
            def body(c):
                i, a, v = c
                row = (i * 97) % (nrows - rows_per)
                nxt = ((i + 1) * 97) % (nrows - rows_per)
                slot = jax.lax.rem(i, nslots)
                nslot = jax.lax.rem(i + 1, nslots)
                fetch(nslot, nxt).start()
                fetch(slot, row).wait()
                a = a + scr[slot, 0, 1]
                return i + 1, a, v

            fetch(0, 0).start()
            i, a, v = jax.lax.while_loop(
                lambda c: c[0] < n_ref[0], body,
                (jnp.int32(0), jnp.float32(0.0), jnp.zeros((8, 128), jnp.float32)),
            )
            fetch(jax.lax.rem(i, nslots), 0).wait()
        else:
            def body(c):
                i, a, v = c
                for s in range(streams):
                    row = ((i * streams + s) * 97) % (nrows - rows_per)
                    fetch(s, row).start()
                if vec_ops:
                    for _ in range(vec_ops // 4):
                        v = v * jnp.float32(1.000001) + jnp.float32(1e-7)
                        v = jnp.maximum(v, v * jnp.float32(0.999999))
                for s in range(streams):
                    fetch(s, 0).wait()
                    a = a + scr[s, 0, 1]
                return i + 1, a, v

            i, a, v = jax.lax.while_loop(
                lambda c: c[0] < n_ref[0], body,
                (jnp.int32(0), jnp.float32(0.0), jnp.zeros((8, 128), jnp.float32)),
            )
        out[...] = jnp.full((8, 128), a, jnp.float32) + v

    return k


def k_mxu(n_ref, hbm, out, rec_scr, mask_scr, g_scr, sem):
    # rec (1,128) in VMEM; OUT[p,l] = rec[6*(l//32)+p] via mask+dot
    pltpu.make_async_copy(hbm.at[pl.ds(0, 1)], rec_scr.at[pl.ds(0, 1)], sem).start()
    pltpu.make_async_copy(hbm.at[pl.ds(0, 1)], rec_scr.at[pl.ds(0, 1)], sem).wait()

    r8 = jax.lax.broadcast_in_dim(rec_scr[0], (8, 128), (1,))
    def body(c):
        i, v = c
        vm = r8 * mask_scr[...]
        o = jax.lax.dot_general(
            vm, g_scr[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v = v + o
        return i + 1, v

    i, v = jax.lax.while_loop(
        lambda c: c[0] < n_ref[0], body,
        (jnp.int32(0), jnp.zeros((8, 128), jnp.float32)),
    )
    out[...] = v


def k_bcast(n_ref, hbm, out, rec_scr, sem):
    pltpu.make_async_copy(hbm.at[pl.ds(0, 1)], rec_scr.at[pl.ds(0, 1)], sem).start()
    pltpu.make_async_copy(hbm.at[pl.ds(0, 1)], rec_scr.at[pl.ds(0, 1)], sem).wait()

    def body(c):
        i, v = c
        outv = v
        for p in range(6):
            b = jax.lax.broadcast_in_dim(rec_scr[0, p * 8 : p * 8 + 128 - 48 + p], (8, 80 + p), (1,))
            pass
        # six sublane broadcasts of a (1,128) slice + slab math
        mn = [jax.lax.broadcast_in_dim(rec_scr[0, :128], (8, 128), (1,)) for _ in range(3)]
        mx = [jax.lax.broadcast_in_dim(rec_scr[0, :128], (8, 128), (1,)) for _ in range(3)]
        t1 = [(m - v) * v for m in mn]
        t2 = [(m - v) * v for m in mx]
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1[0], t2[0]), jnp.minimum(t1[1], t2[1])), jnp.minimum(t1[2], t2[2]))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1[0], t2[0]), jnp.maximum(t1[1], t2[1])), jnp.maximum(t1[2], t2[2]))
        v = jnp.where(tmax >= tmin, v + jnp.float32(1e-7), v)
        return i + 1, v

    i, v = jax.lax.while_loop(
        lambda c: c[0] < n_ref[0], body,
        (jnp.int32(0), jnp.ones((8, 128), jnp.float32)),
    )
    out[...] = v


def k_reduce(n_ref, hbm, out, acc_scr):
    def body(c):
        i, a, v = c
        v = v * jnp.float32(1.000001)
        a = a + jnp.sum(v.astype(jnp.int32))
        return i + 1, a, v

    i, a, v = jax.lax.while_loop(
        lambda c: c[0] < n_ref[0], body,
        (jnp.int32(0), jnp.int32(0), jnp.ones((8, 128), jnp.float32)),
    )
    out[...] = jnp.full((8, 128), a, jnp.float32) + v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}")
    only = args.only.split(",") if args.only else None

    def want(s):
        return only is None or s in only

    if want("loop"):
        bench("loop", k_loop, [pltpu.SMEM((2,), jnp.int32)])
    if want("smem24"):
        bench("smem24", k_smem24, [pltpu.SMEM((1, 64), jnp.float32)])
    if want("reduce"):
        bench("reduce", k_reduce, [pltpu.SMEM((2,), jnp.int32)])
    if want("mxu"):
        bench("mxu", k_mxu, [
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ])
    if want("bcast"):
        bench("bcast", k_bcast, [
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ])

    dmas = [
        ("dma512", 1, dict()),
        ("dma2k", 4, dict()),
        ("dma8k", 16, dict()),
        ("dma2k_pipe", 4, dict(pipelined=True)),
        ("dma2k_x4", 4, dict(streams=4)),
        ("dma2k_vec", 4, dict(vec_ops=40)),
    ]
    for name, rows_per, kw in dmas:
        if not want(name):
            continue
        streams = kw.get("streams", 1)
        nslots = max(2 if kw.get("pipelined") else 1, streams)
        k = make_k_dma(rows_per, **kw)
        n_hi = 100_000
        ns = bench(name, k, [
            pltpu.VMEM((nslots, rows_per, REC), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SMEM((2,), jnp.int32),
        ], n_hi=n_hi)
        eff = ns / streams
        if streams > 1:
            print(f"{'':12s} -> {eff*1e9:8.1f} ns per DMA ({streams} streams)")


if __name__ == "__main__":
    main()
