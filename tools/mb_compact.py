"""Between-wave compaction alternatives at 512² = 262k rays.

The full (dead | octant | morton) uint32 argsort costs ~12 ms/wave
(tools/mb_pt.py) — as much as a whole trace wave. Candidates:

  a. full argsort (current)
  b. 16-bucket stable counting sort (dead+octant) via one-hot cumsum —
     preserves tile-block order within each bucket
  c. argsort of (dead | octant) only — cheap key, same sort cost?
  d. no morton: argsort of (dead<<31 | octant<<28) (sort cost dominated
     by the sort itself, so ~= a?)

Run on TPU: python tools/mb_compact.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 512 * 512
o0 = jax.random.uniform(jax.random.key(0), (R, 3), minval=-1, maxval=1)
d0 = jax.random.normal(jax.random.key(1), (R, 3))
d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
alive0 = jax.random.uniform(jax.random.key(2), (R,)) < 0.7
aux = jax.random.uniform(jax.random.key(3), (R, 7))
N = 20


def timeit(name, fn, *args):
    np.asarray(fn(*args))
    out = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        out.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(out))
    print(f"{name:40s} {ms:9.2f} ms total  {ms/N:7.2f} ms/wave", flush=True)


def _key_full(o, d, alive):
    from raytracer_tpu.ops.morton import morton3d

    q = jnp.clip((o + 2.0) * (1023.0 / 4.0), 0.0, 1023.0).astype(jnp.uint32)
    m = morton3d(q[:, 0], q[:, 1], q[:, 2])
    octant = ((d[:, 0] < 0).astype(jnp.uint32) * 4
              + (d[:, 1] < 0).astype(jnp.uint32) * 2
              + (d[:, 2] < 0).astype(jnp.uint32))
    return ((~alive).astype(jnp.uint32) << jnp.uint32(31)
            | (octant << jnp.uint32(28)) | (m >> jnp.uint32(2)))


def _bucket(d, alive):
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    return jnp.where(alive, octant, 8 + octant)


@jax.jit
def full_argsort(o, d, alive, a):
    def one(carry, _):
        o_, d_, al_, a_ = carry
        perm = jnp.argsort(_key_full(o_, d_, al_))
        return (o_[perm], d_[perm], al_[perm], a_[perm]), jnp.float32(0)

    (o_, d_, al_, a_), _ = jax.lax.scan(one, (o, d, alive, a), None, length=N)
    return jnp.sum(o_) + jnp.sum(a_)


@jax.jit
def counting16(o, d, alive, a):
    def one(carry, _):
        o_, d_, al_, a_ = carry
        b = _bucket(d_, al_)
        oh = (b[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :]).astype(
            jnp.int32)
        within = jnp.cumsum(oh, axis=0) - oh   # stable rank inside bucket
        counts = jnp.sum(oh, axis=0)
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(counts)[:-1]])
        dest = offs[b] + jnp.take_along_axis(within, b[:, None], 1)[:, 0]
        perm = jnp.zeros((R,), jnp.int32).at[dest].set(
            jnp.arange(R, dtype=jnp.int32))
        return (o_[perm], d_[perm], al_[perm], a_[perm]), jnp.float32(0)

    (o_, d_, al_, a_), _ = jax.lax.scan(one, (o, d, alive, a), None, length=N)
    return jnp.sum(o_) + jnp.sum(a_)


@jax.jit
def octant_argsort(o, d, alive, a):
    def one(carry, _):
        o_, d_, al_, a_ = carry
        b = _bucket(d_, al_).astype(jnp.uint32)
        perm = jnp.argsort(b)
        return (o_[perm], d_[perm], al_[perm], a_[perm]), jnp.float32(0)

    (o_, d_, al_, a_), _ = jax.lax.scan(one, (o, d, alive, a), None, length=N)
    return jnp.sum(o_) + jnp.sum(a_)


timeit("full argsort (current)", full_argsort, o0, d0, alive0, aux)
timeit("16-bucket counting sort", counting16, o0, d0, alive0, aux)
timeit("octant-only argsort", octant_argsort, o0, d0, alive0, aux)

# correctness: counting sort groups buckets contiguously + stable
b = np.asarray(_bucket(d0, alive0))
oh = (b[:, None] == np.arange(16)).astype(np.int64)
within = np.cumsum(oh, axis=0) - oh
counts = oh.sum(0)
offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
dest = offs[b] + within[np.arange(R), b]
perm = np.zeros(R, np.int64); perm[dest] = np.arange(R)
bs = b[perm]
stable = np.all(np.diff(np.where(np.diff(bs) == 0, dest[perm][1:] * 0 + 1, 1)) >= 0)
print("counting sort: buckets contiguous:", np.all(np.diff(bs) >= 0),
      "is permutation:", len(np.unique(perm)) == R, flush=True)
