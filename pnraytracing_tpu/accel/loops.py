"""Loop construction helpers for traversal kernels.

Hardware finding (BASELINE.md round 3, `crash_sweep.py loop_overhead`):
on the tunneled TPU a ``lax.while_loop`` pays ~0.5-0.7 ms PER ITERATION
for its dynamic condition, while ``fori_loop`` iterations cost almost
nothing beyond their body.  A traversal that iterates ~70-200 times per
query therefore spends most of its time in condition sync, not in work.

``chunked_while`` amortizes it: run ``chunk`` body iterations inside a
``fori_loop`` per condition evaluation.  Bodies must be no-ops once their
exit condition holds (the traversal loops are: pops and pushes are masked
by ``top > 0``), so overshooting within a chunk only wastes masked lanes.
"""

from __future__ import annotations

import jax


def chunked_while(cond, body, state, chunk: int):
    """``while cond: state = body(state)`` with the condition evaluated
    every ``chunk`` iterations.  ``chunk <= 1`` is a plain while_loop."""
    if chunk <= 1:
        return jax.lax.while_loop(cond, body, state)

    def outer(s):
        return jax.lax.fori_loop(0, chunk, lambda i, s2: body(s2), s)

    return jax.lax.while_loop(cond, outer, state)
