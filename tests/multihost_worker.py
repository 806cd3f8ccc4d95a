"""Worker for tests/test_multihost.py — NOT a pytest module.

One OS process per "host": 4 local CPU devices, joined into an 8-device
global mesh via jax.distributed (SURVEY §5 multi-host path, exercised for
real instead of faked with a single-process 8-device mesh).

Usage: python multihost_worker.py <coordinator_port> <process_id> <out.npy>
"""

import sys


def main() -> None:
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    from pnraytracing_tpu.parallel.distributed import (
        all_hosts_image,
        initialize,
        is_initialized,
    )

    assert not is_initialized()
    initialize(coordinator_address=f"localhost:{port}", num_processes=2,
               process_id=pid)
    assert is_initialized()
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    import numpy as np

    from pnraytracing_tpu.parallel.mesh import (
        make_device_mesh,
        render_frame_sharded,
    )
    from tests.test_multihost import CFG, scene_and_camera

    scene, cam = scene_and_camera()
    mesh = make_device_mesh()
    assert mesh.size == 8
    img = render_frame_sharded(scene, cam, CFG, 0, mesh)
    full = np.asarray(all_hosts_image(img))
    if pid == 0:
        np.save(out_path, full)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
