#!/usr/bin/env python
"""Measure the packed-carry permute cost vs column count on the chip."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("devices:", jax.devices(), flush=True)
    r = 512 * 512
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(r).astype(np.int32))
    base = jnp.asarray(rng.random((r,), np.float32))

    for ncols in (26, 33, 40, 47, 56):
        cols = [base + k for k in range(ncols)]

        def f(p):
            packed = jnp.stack(cols, axis=1)[p]
            return [packed[:, k] for k in range(ncols)]

        fj = jax.jit(f)
        out = fj(perm)
        float(out[0].sum())
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = fj(perm)
        float(out[0].sum())
        dt = (time.perf_counter() - t0) / n
        print(f"pack {ncols:3d} cols: {dt*1e3:7.2f} ms", flush=True)

    # argsort for scale
    key = jnp.asarray(rng.integers(0, 3000, r).astype(np.uint32))
    fs = jax.jit(lambda k: jnp.argsort(k))
    out = fs(key)
    float(out.sum())
    t0 = time.perf_counter()
    for _ in range(10):
        out = fs(key)
    float(out.sum())
    print(f"argsort [R] u32: {(time.perf_counter()-t0)/10*1e3:7.2f} ms",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
