#!/usr/bin/env python
"""Probe which gather strategies Mosaic/Pallas supports on this TPU.

The BVH traversal's primitive op is a per-lane row gather
(``table[idx]`` with vector ``idx``).  This script tries the candidate
implementations inside a Pallas kernel and times the XLA baseline, to pick
the kernel strategy.  Safe to run anywhere (falls back to interpret mode
off-TPU)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from jax.experimental import pallas as pl

    on_tpu = jax.devices()[0].platform == "tpu"
    print(f"platform: {jax.devices()[0].platform}")
    interpret = not on_tpu

    rng = np.random.default_rng(0)
    n_rows, r = 4096, 1 << 18
    table = jnp.asarray(rng.normal(size=(n_rows, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows, size=r).astype(np.int32))
    want = np.asarray(table)[np.asarray(idx)]

    # XLA baseline
    f_xla = jax.jit(lambda t, i: t[i])
    dt = timed(f_xla, table, idx)
    print(f"XLA gather:        {dt*1e3:.3f} ms ({r/dt/1e9:.2f} G rows/s)")

    # Pallas: direct indexing
    def kernel_direct(table_ref, idx_ref, out_ref):
        out_ref[:] = table_ref[idx_ref[:]]

    try:
        from jax.experimental.pallas import tpu as pltpu

        f = jax.jit(lambda t, i: pl.pallas_call(
            kernel_direct,
            out_shape=jax.ShapeDtypeStruct((r, 8), jnp.float32),
            interpret=interpret,
        )(t, i))
        got = f(table, idx)
        ok = np.allclose(np.asarray(got), want)
        dt = timed(f, table, idx)
        print(f"pallas direct idx: {dt*1e3:.3f} ms ok={ok}")
    except Exception as e:
        print(f"pallas direct idx: FAILED {type(e).__name__}: {str(e)[:200]}")

    # Pallas: jnp.take
    def kernel_take(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    try:
        f = jax.jit(lambda t, i: pl.pallas_call(
            kernel_take,
            out_shape=jax.ShapeDtypeStruct((r, 8), jnp.float32),
            interpret=interpret,
        )(t, i))
        got = f(table, idx)
        ok = np.allclose(np.asarray(got), want)
        dt = timed(f, table, idx)
        print(f"pallas jnp.take:   {dt*1e3:.3f} ms ok={ok}")
    except Exception as e:
        print(f"pallas jnp.take:   FAILED {type(e).__name__}: {str(e)[:200]}")

    # one-hot matmul gather (XLA, MXU)
    def onehot_gather(t, i):
        oh = (i[:, None] == jnp.arange(n_rows)[None, :]).astype(jnp.bfloat16)
        return jnp.dot(oh, t.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    f_oh = jax.jit(onehot_gather)
    got = f_oh(table, idx)
    ok = np.allclose(np.asarray(got), want, atol=0.05)
    dt = timed(f_oh, table, idx)
    print(f"onehot matmul:     {dt*1e3:.3f} ms ok={ok} (bf16)")


if __name__ == "__main__":
    main()
