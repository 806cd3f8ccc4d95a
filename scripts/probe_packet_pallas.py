#!/usr/bin/env python
"""Probe: can Mosaic run a packet-traversal-shaped kernel on this chip?

The round-3 packet traversal (accel/traverse_packet.py) needs only
SCALAR dynamic indexing — one shared stack, scalar node fetches, whole
tile vector tests — which is exactly the Pallas-supported pattern
(scalar-prefetch / SMEM scalars + ``pl.ds`` sublane slices), unlike the
per-lane vector gather that scripts/probe_pallas.py showed Mosaic
rejects.  This probe builds a miniature of that loop and times it:

* nodes as an SMEM scalar-prefetch array, dynamically indexed by a
  scalar popped from an SMEM stack scratch;
* a while loop over the stack with a vector (8, 128) AABB-ish test per
  iteration;
* measures ns/iteration to compare against the ~50 us/iteration the
  XLA ``lax.while_loop`` pays on this tunnel (BASELINE.md round-3
  calibration) — the gap is the headroom a Pallas packet kernel buys.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plat = jax.devices()[0].platform
    print(f"platform: {plat}", flush=True)
    interpret = plat == "cpu"

    n_nodes = 4096
    rng = np.random.default_rng(0)
    nodes = jnp.asarray(rng.normal(size=(n_nodes * 8,)).astype(np.float32))
    topo = jnp.asarray(
        rng.integers(0, n_nodes, size=(n_nodes,)).astype(np.int32)
    )

    def make(n_iters: int, sub: int, loop: str):
        """Kernel walking a pseudo-stack n_iters times over an
        (sub, 128) ray tile.  Body shape mirrors the real traversal:
        scalar SMEM fetches + a vector AABB-ish test + stack update."""
        def kernel(topo_ref, nodes_ref, rays_ref, out_ref, stack_ref):
            stack_ref[0] = 0

            def body_fn(top, it, acc):
                node = stack_ref[jnp.maximum(top - 1, 0)]
                x0 = nodes_ref[node * 8]
                x1 = nodes_ref[node * 8 + 1]
                x2 = nodes_ref[node * 8 + 2]
                x3 = nodes_ref[node * 8 + 3]
                t0 = (rays_ref[:] - x0) * x1
                t1 = (rays_ref[:] - x2) * x3
                acc = acc + jnp.maximum(t0, t1)
                child = topo_ref[node]
                more = it + 1 < n_iters
                stack_ref[jnp.maximum(top - 1, 0)] = child
                top = jnp.where(more, top, 0)
                return top, it + 1, acc

            z = jnp.zeros((sub, 128), jnp.float32)
            if loop == "while":
                _, _, acc = jax.lax.while_loop(
                    lambda s: s[0] > 0,
                    lambda s: body_fn(*s),
                    (jnp.int32(1), jnp.int32(0), z),
                )
            else:
                def fbody(i, s):
                    return body_fn(*s)
                _, _, acc = jax.lax.fori_loop(
                    0, n_iters, fbody, (jnp.int32(1), jnp.int32(0), z)
                )
            out_ref[:] = acc

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
        )
        return jax.jit(lambda t, n, r: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((sub, 128), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(t, n, r))

    n_calls = 20
    for loop in ("while", "fori"):
        for sub in (8, 32):
            rays = jnp.asarray(
                rng.normal(size=(sub, 128)).astype(np.float32))
            per = {}
            for n_iters in (1000, 9000):
                f = make(n_iters, sub, loop)
                float(f(topo, nodes, rays).sum())  # compile + smoke
                t0 = time.perf_counter()
                for _ in range(n_calls):
                    out = f(topo, nodes, rays)
                float(out.sum())
                per[n_iters] = (time.perf_counter() - t0) / n_calls
            # two-point fit: slope = per-iteration cost, intercept = call
            slope = (per[9000] - per[1000]) / 8000
            call = per[1000] - slope * 1000
            print(f"{loop:5s} tile=({sub},128) rays={sub*128}: "
                  f"{slope*1e9:6.0f} ns/iter + {call*1e6:7.0f} us/call "
                  f"-> {slope*1e9/(sub*128)*1024:5.1f} ns/iter/1024rays",
                  flush=True)


if __name__ == "__main__":
    main()
