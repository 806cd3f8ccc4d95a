"""Multi-host (multi-process) bootstrap.

Single-host multi-chip needs nothing beyond ``parallel.mesh``.  Across
hosts, JAX's distributed runtime must be initialized before first device
use; afterwards ``jax.devices()`` spans the pod and the same 1-D ``tiles``
mesh + ``shard_map`` code scales unchanged (collectives ride ICI within a
slice, DCN across slices — XLA picks; SURVEY.md §5 "distributed
communication backend").

Typical launch (one process per host):

    from pnraytracing_tpu.parallel.distributed import initialize
    initialize()  # uses TPU metadata / env when available
    mesh = make_device_mesh()          # now spans all hosts
    img = render_frame_sharded(scene, cam, cfg, 0, mesh)

Rendering output: each host holds its shard of the image; use
``jax.experimental.multihost_utils.process_allgather`` (wrapped below) to
assemble a full image on every host.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed; on TPU pods all arguments are inferred
    from the environment."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_initialized() -> bool:
    """Whether the multi-process runtime is up (public API)."""
    return bool(jax.distributed.is_initialized())


def all_hosts_image(local_sharded_image):
    """Gather a fully-addressable copy of a sharded image on every host."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(local_sharded_image, tiled=True)


def scaling_efficiency(times_by_hosts: dict[int, float]) -> dict[int, float]:
    """eff(n) = t(1) / (n * t(n)) for per-sample wall times — the >=85%
    1->N metric of BASELINE.json."""
    if 1 not in times_by_hosts:
        raise ValueError("need the 1-host time as the baseline")
    t1 = times_by_hosts[1]
    return {n: t1 / (n * t) for n, t in times_by_hosts.items()}
