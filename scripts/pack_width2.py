#!/usr/bin/env python
"""Decompose the packed-carry permute cost: stack vs gather vs unpack."""

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


def timed(name, fn, *args, n=10):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    print(f"{name:34s}: {(time.perf_counter()-t0)/n*1e3:7.2f} ms",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    r = 512 * 512
    ncols = 32
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(r).astype(np.int32))
    cols = [jnp.asarray(rng.random((r,), np.float32)) for _ in range(ncols)]
    packed0 = jnp.stack(cols, axis=1)

    timed("stack only [R,32]", jax.jit(lambda: jnp.stack(cols, axis=1)))
    timed("gather only (pre-packed)", jax.jit(lambda p: packed0[p]), perm)
    timed("gather w/ unique hint",
          jax.jit(lambda p: jnp.take(packed0, p, axis=0,
                                     unique_indices=True)), perm)
    timed("slices only (packed->cols)",
          jax.jit(lambda: [packed0[:, k] for k in range(ncols)]))
    timed("full: stack+gather+slices",
          jax.jit(lambda p: [jnp.stack(cols, axis=1)[p][:, k]
                             for k in range(ncols)]), perm)
    cm = jnp.stack(cols, axis=0)  # [32, R]
    timed("colmajor gather axis=1", jax.jit(lambda p: cm[:, p]), perm)
    # scatter form
    timed("scatter rows .at[perm].set",
          jax.jit(lambda p: jnp.zeros_like(packed0).at[p].set(packed0)),
          perm)
    return 0


def colmajor_full():
    print("-- colmajor full pipeline --", flush=True)
    r = 512 * 512
    ncols = 32
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(r).astype(np.int32))
    cols = [jnp.asarray(rng.random((r,), np.float32)) for _ in range(ncols)]
    timed("stack axis=0 [32,R]", jax.jit(lambda: jnp.stack(cols, axis=0)))
    timed("full colmajor: stack+gath+rows",
          jax.jit(lambda p: [jnp.stack(cols, axis=0)[:, p][k]
                             for k in range(ncols)]), perm)
    for nc in (21, 26, 35, 47):
        cs = cols[:nc]
        timed(f"full colmajor {nc} cols",
              jax.jit(lambda p, cs=cs, nc=nc: [
                  jnp.stack(cs, axis=0)[:, p][k] for k in range(nc)]), perm)


if __name__ == "__main__":
    main()
    colmajor_full()
