#!/usr/bin/env python
"""Follow-up Mosaic probes for the streaming traversal design.

probe_stream round 1 found: HBM->SMEM DMA crashes the compile helper
(3/3, ambiguous — possibly a service hiccup), VMEM dynamic-sublane
scalar reads lower correctly but 64 reads cost ~2.2 ms/call (fixed
dispatch overhead vs per-read cost unresolved).  This round separates
the variables:

a. HBM->SMEM retry at 4 KB and 32 KB (clean tunnel).
b. HBM->VMEM DMA in-kernel (the guide's own example — sanity).
c. VMEM->SMEM DMA (brick staging via VMEM).
d. dyn-sublane read scaling: 64 vs 1024 reads (fixed vs per-read).
e. dyn-sublane VECTOR row read into computation (read a (1,128) row,
   use whole-row vector math — no scalar extract).
"""

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


def probe_hbm_to_smem(brick_kb: int, n_bricks: int = 8):
    words = brick_kb * 1024 // 4
    log(f"[a] HBM->SMEM DMA retry, brick={brick_kb} KB")

    def kernel(hbm_ref, out_ref, smem_buf, sem):
        def body(i, tot):
            dma = pltpu.make_async_copy(hbm_ref.at[i], smem_buf, sem)
            dma.start()
            dma.wait()
            return tot + smem_buf[0] + smem_buf[words - 1]

        out_ref[0] = jax.lax.fori_loop(0, n_bricks, body, jnp.float32(0.0))

    x = jnp.arange(n_bricks * words, dtype=jnp.float32).reshape(
        n_bricks, words)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((words,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)

    out = run(x)
    expect = sum(float(x[i, 0] + x[i, words - 1]) for i in range(n_bricks))
    log(f"  correct: {abs(float(out[0]) - expect) < 1e-2 * abs(expect)}")
    timed(f"dma {n_bricks}x{brick_kb}KB", run, x)
    return True


def probe_hbm_to_vmem(brick_kb: int = 128, n_bricks: int = 8):
    words = brick_kb * 1024 // 4
    assert words % 128 == 0
    rows = words // 128
    log(f"[b] HBM->VMEM DMA, brick={brick_kb} KB")

    def kernel(hbm_ref, out_ref, vbuf, sem):
        def body(i, tot):
            dma = pltpu.make_async_copy(hbm_ref.at[i], vbuf, sem)
            dma.start()
            dma.wait()
            return tot + jnp.sum(vbuf[0, :]) + jnp.sum(vbuf[rows - 1, :])

        out_ref[0, 0] = jax.lax.fori_loop(0, n_bricks, body,
                                          jnp.float32(0.0))

    x = jnp.ones((n_bricks, rows, 128), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)

    out = run(x)
    log(f"  correct: {abs(float(out[0,0]) - n_bricks*256.0) < 1e-3}")
    timed(f"dma {n_bricks}x{brick_kb}KB hbm->vmem", run, x)
    return True


def probe_vmem_to_smem(kb: int = 32):
    words = kb * 1024 // 4
    rows = words // 128
    log(f"[c] VMEM->SMEM DMA, {kb} KB")

    def kernel(in_ref, out_ref, smem_buf, sem):
        dma = pltpu.make_async_copy(in_ref, smem_buf, sem)
        dma.start()
        dma.wait()
        out_ref[0] = smem_buf[0, 0] + smem_buf[rows - 1, 127]

    x = jnp.ones((rows, 128), jnp.float32) * 3.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)

    out = run(x)
    log(f"  correct: {abs(float(out[0]) - 6.0) < 1e-6}")
    timed(f"vmem->smem {kb}KB", run, x)
    return True


def probe_dyn_sublane_scaling(n_reads: int):
    log(f"[d] VMEM dyn-sublane reads x{n_reads}")
    n_rows = 4096

    def kernel(idx_ref, tbl_ref, out_ref):
        def body(i, tot):
            node = idx_ref[i]
            row = tbl_ref[pl.ds(node, 1), :]
            return tot + row[0, 3]

        out_ref[0] = jax.lax.fori_loop(0, n_reads, body, jnp.float32(0.0))

    tbl = jnp.ones((n_rows, 128), jnp.float32)
    idx = (jnp.arange(n_reads, dtype=jnp.int32) * 17) % n_rows

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
    log(f"  correct: {abs(float(out[0]) - n_reads) < 1e-3}")
    timed(f"{n_reads} reads", run, idx, tbl)
    return True


def probe_dyn_sublane_vector(n_reads: int = 256):
    log(f"[e] VMEM dyn-sublane VECTOR row accumulate x{n_reads}")
    n_rows = 4096

    def kernel(idx_ref, tbl_ref, out_ref):
        def body(i, acc):
            node = idx_ref[i]
            return acc + tbl_ref[pl.ds(node, 1), :]

        out_ref[:, :] = jax.lax.fori_loop(
            0, n_reads, body, jnp.zeros((1, 128), jnp.float32)
        )

    tbl = jnp.ones((n_rows, 128), jnp.float32)
    idx = (jnp.arange(n_reads, dtype=jnp.int32) * 17) % n_rows

    @jax.jit
    def run(idx, tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tbl)

    out = run(idx, tbl)
    log(f"  correct: {abs(float(out[0,0]) - n_reads) < 1e-3}")
    timed(f"{n_reads} row reads", run, idx, tbl)
    return True


def main():
    log("devices:", jax.devices())
    results = {}
    for name, fn in [
        ("hbm_smem_4k", lambda: probe_hbm_to_smem(4)),
        ("hbm_smem_32k", lambda: probe_hbm_to_smem(32)),
        ("hbm_vmem_128k", probe_hbm_to_vmem),
        ("vmem_smem_32k", probe_vmem_to_smem),
        ("dyn_64", lambda: probe_dyn_sublane_scaling(64)),
        ("dyn_1024", lambda: probe_dyn_sublane_scaling(1024)),
        ("dyn_vec_256", probe_dyn_sublane_vector),
    ]:
        try:
            results[name] = fn()
        except Exception as e:
            log(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")
            results[name] = False
    log("summary:", results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
