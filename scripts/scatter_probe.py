#!/usr/bin/env python
"""Probe: env-gradient accumulation structures on the chip.

The replay backward's floor is ~130 ms of bilinear scatter-add passes
(bwd_profile3/4).  Candidates for one pass of R=262k cotangent rows
into an [H*W, 12] texel grid (env 256: 512x256 texels):

  scatter     raw .at[idx].add(rows)            (what XLA's VJP emits)
  sorted      argsort(idx) + permute rows + segment_sum + UNIQUE scatter
  onehot-seg  sort + boundary-diff scan variant

If `sorted` wins clearly, a custom VJP for the quad lookup is worth
building next round."""

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
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    print(f"{name:34s}: {(time.perf_counter()-t0)/n*1e3:7.2f} ms",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    r = 512 * 512
    hw = 512 * 256
    rng = np.random.default_rng(0)
    # realistic: texel indices cluster (bright env regions)
    idx = jnp.asarray(
        (rng.beta(2, 5, r) * hw).astype(np.int32).clip(0, hw - 1))
    rows = jnp.asarray(rng.random((r, 12), np.float32))

    timed("scatter-add [R,12] -> [HW,12]",
          jax.jit(lambda i, v: jnp.zeros((hw, 12), jnp.float32)
                  .at[i].add(v)), idx, rows)

    def sorted_seg(i, v):
        perm = jnp.argsort(i)
        i_s = i[perm]
        v_s = v[perm]
        acc = jax.ops.segment_sum(v_s, i_s, num_segments=hw,
                                  indices_are_sorted=True)
        return acc

    timed("argsort+segment_sum", jax.jit(sorted_seg), idx, rows)

    def sorted_scan(i, v):
        perm = jnp.argsort(i)
        i_s = i[perm]
        v_s = v[perm]
        # inclusive scan then take the last row of each segment
        csum = jnp.cumsum(v_s, axis=0)
        last = jnp.concatenate([i_s[1:] != i_s[:-1],
                                jnp.ones((1,), bool)])
        seg_tot = jnp.where(last[:, None], csum, 0.0)
        # subtract previous segment's cumulative: gather at boundaries
        out = jnp.zeros((hw, 12), jnp.float32).at[i_s].add(
            jnp.where(last[:, None], v_s, 0.0))  # placeholder cost probe
        return out, seg_tot

    timed("sorted cumsum variant (probe)", jax.jit(sorted_scan), idx, rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
