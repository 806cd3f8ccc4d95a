#!/usr/bin/env python
"""Find the largest scalar-prefetch (SMEM) array a Mosaic kernel can
hold on this chip — sizes the scene budget of traversal='pallas'
(config5-class scenes need ~5 MB; the flagship needs ~0.6 MB)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_size(n_floats: int) -> bool:
    x = jnp.arange(n_floats, dtype=jnp.float32)
    rays = jnp.ones((8, 128), jnp.float32)

    def kernel(x_ref, rays_ref, out_ref):
        # touch scattered scalars so the array can't be elided
        s = x_ref[0] + x_ref[n_floats // 2] + x_ref[n_floats - 1]
        out_ref[:] = rays_ref[:] * s

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=grid_spec,
    )(a, b))
    try:
        out = float(f(x, rays).sum())
        want = (0 + n_floats // 2 + (n_floats - 1)) * 8 * 128
        return abs(out - want) < max(1e-6 * want, 1.0)
    except Exception as e:  # noqa: BLE001
        print(f"  {n_floats*4/1024:.0f} KB failed: "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        return False


def main():
    print("devices:", jax.devices(), flush=True)
    for kb in (256, 512, 1024, 2048, 4096, 6144, 8192, 12288):
        t0 = time.perf_counter()
        ok = try_size(kb * 256)
        print(f"{kb:6d} KB: {'ok' if ok else 'FAIL'} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
        if not ok:
            break


if __name__ == "__main__":
    main()
