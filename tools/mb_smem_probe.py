"""Probe Mosaic's SMEM capacity on the live chip.

Decides whether a whole supernode-record tree can live in SMEM as a
pallas_call input (direct scalar reads per visit — no per-visit DMA at all)
for the config-4 small-scene fast path (PERF.md roadmap #1). Tries
increasing sizes until Mosaic refuses; prints the largest that compiles.
"""
import sys

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices())


def probe(kb: int) -> bool:
    rows = kb * 1024 // (128 * 4)

    def kern(x_ref, o_ref):
        # scalar read with a dynamic index so the array must really be
        # SMEM-addressable, plus a vector write to the output
        i = x_ref[0, 0].astype(jnp.int32) % rows
        o_ref[0, 0] = x_ref[i, 1] + x_ref[rows - 1, 127]

    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(jnp.ones((rows, 128), jnp.float32))
        out.block_until_ready()
        return True
    except Exception as e:
        print(f"  {kb} KB failed: {str(e)[:200]}")
        return False


ok = 0
for kb in (64, 128, 256, 512, 768, 1024, 1536, 2048):
    if probe(kb):
        print(f"  {kb} KB OK")
        ok = kb
    else:
        break
print(f"max SMEM input that compiles: {ok} KB")
