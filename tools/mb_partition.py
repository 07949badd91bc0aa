"""A/B: MXU bucket partition vs jnp.argsort for wave compaction, plus the
full config-4 frame with each compaction impl. One process, back-to-back.

Run on TPU: python tools/mb_partition.py
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

from raytracer_tpu.ops.partition import bucket_partition_perm

R = 512 * 512
rng = np.random.default_rng(0)
keys_small = jnp.asarray(rng.integers(0, 256, size=R).astype(np.int32))
keys_full = jnp.asarray(rng.integers(0, 1 << 31, size=R).astype(np.uint32))
payload = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))


N = 32   # on-device iterations per call — keeps the ~25 ms relay RTT out


def batched(body):
    @jax.jit
    def run(k, p):
        def step(c, _):
            out = body(k, c)
            return out, 0
        c, _ = jax.lax.scan(step, p, None, length=N)
        return c.sum()
    return run


via_argsort = batched(lambda k, p: p[jnp.argsort(k + p[:, 0].astype(k.dtype) * 0)])
via_partition = batched(
    lambda k, p: p[bucket_partition_perm(k + (p[:, 0] * 0).astype(jnp.int32), 256)])
gather_only = batched(
    lambda k, p: p[jnp.arange(R - 1, -1, -1, dtype=jnp.int32)
                   + (p[:, 0] * 0).astype(jnp.int32)])

for name, fn, args in (
    ("argsort(u31)+gather", via_argsort, (keys_full, payload)),
    ("partition256+gather", via_partition, (keys_small, payload)),
    ("gather-only", gather_only, (keys_small, payload)),
):
    np.asarray(fn(*args))
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        reps.append((time.perf_counter() - t0) * 1e3 / N)
    print(f"{name:22s} {np.median(reps):7.3f} ms/iter  (reps {['%.3f' % r for r in reps]})",
          flush=True)
