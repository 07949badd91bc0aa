"""Is the wave-compaction permute cost per-gather or per-byte?

mb_partition.py showed argsort+gather(R,3) == gather-only(R,3) == ~4 ms:
the permute is GATHER-bound, the sort is free. render_pt permutes 6 arrays
(14 f32/lane) separately. If gather cost is dominated by row count rather
than row bytes, ONE wide (R,16) gather replaces 6 narrow ones.

Run on TPU: python tools/mb_gather_width.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 512 * 512
N = 32
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1 << 31, size=R).astype(np.uint32))
p3 = [jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32)) for _ in range(4)]
p1 = [jnp.asarray(rng.integers(0, R, size=(R,)).astype(np.int32)) for _ in range(2)]
p16 = jnp.asarray(rng.normal(size=(R, 16)).astype(np.float32))
p8 = jnp.asarray(rng.normal(size=(R, 8)).astype(np.float32))

def timed(name, fn, *args):
    np.asarray(jax.block_until_ready(fn(*args)))
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args)))
        reps.append((time.perf_counter() - t0) * 1e3 / N)
    print(f"{name:34s} {np.median(reps):7.3f} ms/iter", flush=True)

@jax.jit
def six_narrow(k, a, b, c, d, e, f):
    def step(c_, _):
        a, b, c, d, e, f = c_
        perm = jnp.argsort(k + e * 0)
        return (a[perm], b[perm], c[perm], d[perm], e[perm], f[perm]), 0
    out, _ = jax.lax.scan(step, (a, b, c, d, e, f), None, length=N)
    return out[0].sum()

@jax.jit
def one_wide(k, w):
    def step(c_, _):
        perm = jnp.argsort(k + c_[:, 0].astype(k.dtype) * 0)
        return c_[perm], 0
    out, _ = jax.lax.scan(step, w, None, length=N)
    return out.sum()

@jax.jit
def sort_carry(k, w):
    # lax.sort with the payload as extra operands — the sort network moves
    # payload rows directly, no separate gather. Operands must be same-shape
    # 1-D arrays, so each column rides as its own operand.
    cols = w.shape[1]

    def step(c_, _):
        kk = k + c_[:, 0].astype(k.dtype) * 0
        out = jax.lax.sort((kk, *(c_[:, i] for i in range(cols))),
                           dimension=0, num_keys=1)
        return jnp.stack(out[1:], axis=1), 0
    out, _ = jax.lax.scan(step, w, None, length=N)
    return out.sum()

timed("6 narrow gathers (14 f32)", six_narrow, keys, *p3, *p1)
timed("1 wide gather (R,16)", one_wide, keys, p16)
timed("1 wide gather (R,8)", one_wide, keys, p8)
timed("lax.sort carry (R,16)", sort_carry, keys, p16)
timed("lax.sort carry (R,8)", sort_carry, keys, p8)
