"""Follow-up microbenchmarks: SMEM-target DMA, in-context consumption."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REC = 128

def run(kernel, scratch, n, rows=1<<14):
    hbm = jnp.arange(rows * REC, dtype=jnp.float32).reshape(rows, REC) * 1e-6
    out = pl.pallas_call(
        kernel, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=scratch,
    )(jnp.array([n], jnp.int32), hbm)
    return np.asarray(out)

def bench(name, kernel, scratch, n_hi=100_000, n_lo=1_000):
    f = lambda n: run(kernel, scratch, n)
    f(n_hi); f(n_hi)
    ts = {}
    for n in (n_hi, n_lo):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); f(n); best = min(best, time.perf_counter() - t0)
        ts[n] = best
    ns = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)
    print(f"{name:14s} {ns*1e9:8.1f} ns/iter")

# 1. pipelined 512B DMA into SMEM (round-1's target memory)
def k_dma_smem_pipe(n_ref, hbm, out, scr, sem):
    nrows = hbm.shape[0]
    def fetch(slot, row):
        return pltpu.make_async_copy(hbm.at[row], scr.at[slot], sem.at[slot])
    def body(c):
        i, a = c
        row = (i * 97) % nrows
        nxt = ((i + 1) * 97) % nrows
        fetch(jax.lax.rem(i + 1, 2), nxt).start()
        fetch(jax.lax.rem(i, 2), row).wait()
        a = a + scr[jax.lax.rem(i, 2), 1]
        return i + 1, a
    fetch(0, 0).start()
    i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0], body, (jnp.int32(0), jnp.float32(0)))
    fetch(jax.lax.rem(i, 2), 0).wait()
    out[...] = jnp.full((8, 128), a, jnp.float32)

# 2. serialized 512B DMA into SMEM (round-1 pattern exactly)
def k_dma_smem_ser(n_ref, hbm, out, scr, sem):
    nrows = hbm.shape[0]
    def body(c):
        i, a = c
        row = (i * 97) % nrows
        cp = pltpu.make_async_copy(hbm.at[row], scr.at[0], sem.at[0])
        cp.start(); cp.wait()
        a = a + scr[0, 1]
        return i + 1, a
    i, a = jax.lax.while_loop(lambda c: c[0] < n_ref[0], body, (jnp.int32(0), jnp.float32(0)))
    out[...] = jnp.full((8, 128), a, jnp.float32)

# 3. in-context consumption: 24 scalar SMEM reads feeding 4 vector slab tests
#    + sorting network + 2 reductions (the full per-visit vector/scalar mix,
#    minus DMA and stack memory ops)
def k_consume(n_ref, hbm, out, scr, sem):
    cp = pltpu.make_async_copy(hbm.at[0], scr.at[0], sem.at[0])
    cp.start(); cp.wait()
    dx = jnp.full((8,128), 0.3, jnp.float32); dy = jnp.full((8,128), 0.5, jnp.float32)
    dz = jnp.full((8,128), -0.8, jnp.float32)
    ix, iy, iz = 1.0/dx, 1.0/dy, 1.0/dz
    f32 = jnp.float32
    def body(c):
        i, a, best = c
        accs = [jnp.zeros((8,128), jnp.int32), jnp.zeros((8,128), jnp.int32)]
        refs = [jnp.int32(0)]*4; orders = [f32(0)]*4; oks = [jnp.bool_(False)]*4
        base = jax.lax.rem(i, 8)
        for k in range(4):
            mnx, mny, mnz = scr[0, base+6*k], scr[0, base+6*k+1], scr[0, base+6*k+2]
            mxx, mxy, mxz = scr[0, base+6*k+3], scr[0, base+6*k+4], scr[0, base+6*k+5]
            t1x, t2x = (mnx) * ix, (mxx) * ix
            t1y, t2y = (mny) * iy, (mxy) * iy
            t1z, t2z = (mnz) * iz, (mxz) * iz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x,t2x), jnp.minimum(t1y,t2y)), jnp.minimum(t1z,t2z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x,t2x), jnp.maximum(t1y,t2y)), jnp.maximum(t1z,t2z))
            hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best)
            shift = 16 * (k // 2)
            accs[k % 2] = accs[k % 2] + jnp.where(hit, jnp.int32(1) << shift, 0)
            refs[k] = scr[0, base+24+k].astype(jnp.int32)
            orders[k] = (mnx+mxx)*0.5 + (mny+mxy)*0.5 + (mnz+mxz)*0.5
            oks[k] = refs[k] >= 0
        red0 = jnp.sum(accs[0]); red1 = jnp.sum(accs[1])
        sh = [(red0 & 0xFFFF) != 0, (red1 & 0xFFFF) != 0, (red0 >> 16) != 0, (red1 >> 16) != 0]
        oks = [oks[k] & sh[k] for k in range(4)]
        def swap_if(aa, bb):
            da = jnp.where(oks[aa], orders[aa], f32(-1e30))
            db = jnp.where(oks[bb], orders[bb], f32(-1e30))
            pred = da < db
            refs[aa], refs[bb] = jnp.where(pred, refs[bb], refs[aa]), jnp.where(pred, refs[aa], refs[bb])
            orders[aa], orders[bb] = jnp.where(pred, db, da), jnp.where(pred, da, db)
            oks[aa], oks[bb] = jnp.where(pred, oks[bb], oks[aa]), jnp.where(pred, oks[aa], oks[bb])
        swap_if(0,1); swap_if(2,3); swap_if(0,2); swap_if(1,3); swap_if(1,2)
        a = a + refs[0] + refs[1] + refs[2] + refs[3]
        best = best * f32(1.000001)
        return i + 1, a, best
    i, a, best = jax.lax.while_loop(lambda c: c[0] < n_ref[0], body,
        (jnp.int32(0), jnp.int32(0), jnp.full((8,128), 1e30, jnp.float32)))
    out[...] = jnp.full((8, 128), a, jnp.float32) + best

print(f"backend={jax.default_backend()}")
bench("dma_smem_ser", k_dma_smem_ser, [pltpu.SMEM((1, REC), jnp.float32), pltpu.SemaphoreType.DMA((1,))])
bench("dma_smem_pipe", k_dma_smem_pipe, [pltpu.SMEM((2, REC), jnp.float32), pltpu.SemaphoreType.DMA((2,))])
bench("consume", k_consume, [pltpu.SMEM((1, REC), jnp.float32), pltpu.SemaphoreType.DMA((1,))])
