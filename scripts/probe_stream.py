#!/usr/bin/env python
"""Probe the Mosaic constructs the >SMEM streaming traversal needs.

1. HBM->SMEM async DMA inside a kernel (brick fetch) — does it compile,
   is it correct, what does a ~128-512 KB brick fetch cost?
2. Dynamic-sublane scalar read from a VMEM ref (``ref[pl.ds(node,1),:]``
   then a static lane pick) — the alternative scene residency.
3. Double-buffered brick loop: DMA brick i+1 while walking brick i.

Each case runs in its own guarded section; a compile failure prints the
error and moves on (the point is to map what lowers).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def timed(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    dt = (time.perf_counter() - t0) / n
    log(f"  {name}: {dt*1e6:9.1f} us")
    return out


def probe_hbm_to_smem(brick_words: int, n_bricks: int = 16):
    """One grid program DMAs each brick HBM->SMEM and sums a few scalars."""
    log(f"[1] HBM->SMEM DMA, brick={brick_words*4//1024} KB x {n_bricks}")

    def kernel(hbm_ref, out_ref, smem_buf, sem):
        total = jnp.float32(0.0)

        def body(i, tot):
            dma = pltpu.make_async_copy(
                hbm_ref.at[i], smem_buf, sem
            )
            dma.start()
            dma.wait()
            return tot + smem_buf[0] + smem_buf[brick_words - 1]

        total = jax.lax.fori_loop(0, n_bricks, body, total)
        out_ref[0] = total

    x = jnp.arange(n_bricks * brick_words, dtype=jnp.float32).reshape(
        n_bricks, brick_words
    )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((brick_words,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)

    out = run(x)
    expect = sum(
        float(x[i, 0] + x[i, brick_words - 1]) for i in range(n_bricks)
    )
    ok = abs(float(out[0]) - expect) < 1e-3 * max(1.0, abs(expect))
    log(f"  correct: {ok} (got {float(out[0])}, want {expect})")
    t = timed("dma loop", run, x)
    per_brick_us = None
    return ok


def probe_hbm_to_smem_db(brick_words: int, n_bricks: int = 16):
    """Double-buffered: start i+1 before waiting on i."""
    log(f"[3] double-buffered HBM->SMEM, brick={brick_words*4//1024} KB "
        f"x {n_bricks}")

    def kernel(hbm_ref, out_ref, buf0, buf1, sem):
        bufs = [buf0, buf1]

        def dma(i, slot):
            return pltpu.make_async_copy(
                hbm_ref.at[i], bufs[slot], sem.at[slot]
            )

        dma(0, 0).start()
        # static-unrolled: python-level ref switching (n_bricks is small)
        total = jnp.float32(0.0)
        for i in range(n_bricks):
            if i + 1 < n_bricks:
                dma(i + 1, (i + 1) % 2).start()
            pltpu.make_async_copy(
                hbm_ref.at[i], bufs[i % 2], sem.at[i % 2]
            ).wait()
            total = total + bufs[i % 2][0] + bufs[i % 2][brick_words - 1]
        out_ref[0] = total

    x = jnp.arange(n_bricks * brick_words, dtype=jnp.float32).reshape(
        n_bricks, brick_words
    )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((brick_words,), jnp.float32),
                pltpu.SMEM((brick_words,), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x)

    out = run(x)
    expect = sum(
        float(x[i, 0] + x[i, brick_words - 1]) for i in range(n_bricks)
    )
    ok = abs(float(out[0]) - expect) < 1e-3 * max(1.0, abs(expect))
    log(f"  correct: {ok}")
    timed("db dma loop", run, x)
    return ok


def probe_vmem_dynamic_sublane(n_rows: int = 4096):
    """scene_vmem[pl.ds(node,1), :] with traced node, static lane pick."""
    log(f"[2] VMEM dynamic-sublane scalar read, rows={n_rows}")

    def kernel(idx_ref, tbl_ref, out_ref):
        def body(i, tot):
            node = idx_ref[i]
            row = tbl_ref[pl.ds(node, 1), :]
            return tot + row[0, 3]

        out_ref[0] = jax.lax.fori_loop(0, 64, body, jnp.float32(0.0))

    tbl = jnp.arange(n_rows * 128, dtype=jnp.float32).reshape(n_rows, 128)
    idx = jnp.arange(64, dtype=jnp.int32) * 17 % n_rows

    @jax.jit
    def run(idx, tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(idx, tbl)

    out = run(idx, tbl)
    expect = float(sum(float(tbl[int(i), 3]) for i in idx))
    ok = abs(float(out[0]) - expect) < 1e-3 * max(1.0, abs(expect))
    log(f"  correct: {ok} (got {float(out[0])}, want {expect})")
    timed("64 dyn-sublane reads", run, idx, tbl)
    return ok


def main():
    log("devices:", jax.devices())
    results = {}
    for name, fn in [
        ("hbm_smem_32k", lambda: probe_hbm_to_smem(32 * 1024 // 4)),
        ("hbm_smem_128k", lambda: probe_hbm_to_smem(128 * 1024 // 4)),
        ("hbm_smem_db_128k",
         lambda: probe_hbm_to_smem_db(128 * 1024 // 4)),
        ("vmem_dyn_sublane", probe_vmem_dynamic_sublane),
    ]:
        try:
            results[name] = fn()
        except Exception as e:
            log(f"  FAILED to lower/run: {type(e).__name__}: "
                f"{str(e)[:400]}")
            results[name] = False
    log("summary:", results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
