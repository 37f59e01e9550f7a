"""Worker for the 2-process distributed CPU test (tests/test_multiprocess.py).

Each process owns 2 virtual CPU devices; the global mesh is 4-wide. The
worker exercises init_distributed -> make_mesh -> shard_batch (which routes
through jax.make_array_from_process_local_data at process_count > 1) -> a
jitted global-batch reduction, and prints the scalar for the parent to check.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # Force the virtual CPU platform before ANY backend use (the machine's
    # sitecustomize imports jax on the axon TPU platform; config still wins
    # until the backend is first touched).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from tecogan_tpu.parallel.mesh import init_distributed, make_mesh, shard_batch

    count = init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert count == nproc, count
    assert jax.process_index() == pid

    import numpy as np
    import jax.numpy as jnp

    n_global = len(jax.devices())
    assert n_global == 2 * nproc, n_global

    mesh = make_mesh({"data": n_global})

    # Global batch of 8 rows; this process holds rows [pid*4, pid*4+4).
    global_batch = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    local = global_batch[pid * 4 : (pid + 1) * 4]
    arr = shard_batch(mesh, local)
    assert arr.shape == (8, 3)  # global shape, assembled across processes

    total = jax.jit(jnp.sum)(arr)
    print("RESULT", float(jax.device_get(total)), flush=True)


if __name__ == "__main__":
    main()
