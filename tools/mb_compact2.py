"""Compaction v2 candidates: the global 262k argsort costs ~13 ms/wave.

Coherence only needs LOCAL grouping — streams are 1024-lane chunks, so
sorting within segments of S rays (S >> 1024) groups octants/origins well
enough while sorting S-length rows vectorized across segments.

Run on TPU: python tools/mb_compact2.py
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


def _key(o, d, alive):
    from raytracer_tpu.ops.morton import morton3d

    q = jnp.clip((o + 2.0) * (1023.0 / 4.0), 0.0, 1023.0).astype(jnp.uint32)
    m = morton3d(q[:, 0], q[:, 1], q[:, 2])
    octant = ((d[:, 0] < 0).astype(jnp.uint32) * 4
              + (d[:, 1] < 0).astype(jnp.uint32) * 2
              + (d[:, 2] < 0).astype(jnp.uint32))
    return ((~alive).astype(jnp.uint32) << jnp.uint32(31)
            | (octant << jnp.uint32(28)) | (m >> jnp.uint32(2)))


def timeit(name, fn, *args):
    np.asarray(fn(*args))
    out = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        out.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(out))
    print(f"{name:44s} {ms/N:7.2f} ms/wave", flush=True)


def run(label, permute):
    @jax.jit
    def loop(o, d, alive, a):
        def one(carry, _):
            o_, d_, al_, a_ = carry
            perm = permute(o_, d_, al_)
            return (o_[perm], d_[perm], al_[perm], a_[perm]), jnp.float32(0)

        (o_, d_, al_, a_), _ = jax.lax.scan(one, (o, d, alive, a), None,
                                            length=N)
        return jnp.sum(o_) + jnp.sum(a_)

    timeit(label, loop, o0, d0, alive0, aux)


def p_full(o, d, al):
    return jnp.argsort(_key(o, d, al))


run("full argsort (baseline)", p_full)

for S in (8192, 16384, 32768):
    def p_seg(o, d, al, S=S):
        k = _key(o, d, al).reshape(R // S, S)
        seg = jnp.argsort(k, axis=1)
        return (seg + (jnp.arange(R // S, dtype=jnp.int32) * S)[:, None]
                ).reshape(R)

    run(f"segmented argsort S={S}", p_seg)


def p_seg2d(o, d, al, S=16384):
    # sort VALUES row-wise via lax.sort with explicit index payload
    k = _key(o, d, al).reshape(R // S, S)
    idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], k.shape)
    _, pi = jax.lax.sort((k, idx), dimension=1, num_keys=1)
    return (pi + (jnp.arange(R // S, dtype=jnp.int32) * S)[:, None]).reshape(R)


run("segmented lax.sort payload S=16384", p_seg2d)
