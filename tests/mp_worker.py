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
    mode = sys.argv[4] if len(sys.argv) > 4 else "batch"

    import jax

    # Force the virtual CPU platform before ANY backend use (the machine's
    # sitecustomize imports jax on the axon TPU platform; config still wins
    # until the backend is first touched).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_default_matmul_precision", "highest")

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

    if mode == "train":
        return train_mode(mesh, pid, nproc)

    # Global batch of 8 rows; this process holds rows [pid*4, pid*4+4).
    global_batch = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    local = global_batch[pid * 4 : (pid + 1) * 4]
    arr = shard_batch(mesh, local)
    assert arr.shape == (8, 3)  # global shape, assembled across processes

    total = jax.jit(jnp.sum)(arr)
    print("RESULT", float(jax.device_get(total)), flush=True)


def train_mode(mesh, pid: int, nproc: int) -> None:
    """Real distributed training: a full TecoGAN adversarial train_step on
    the 2-process global mesh, gradients all-reduced by GSPMD across
    processes. Loss values print for the parent to check against a
    single-process run of the identical configuration (the equality proof
    that the multi-host path computes the same step — VERDICT r2 #4)."""
    import jax
    import numpy as np

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.parallel.dp import DataParallelTrainer

    n_global = len(jax.devices())
    cfg = TecoConfig(
        num_resblock=2, crop_size=8, batch_size=n_global, rnn_n=3,
        pingpong=True, ratio=0.01, vgg_scaling=-0.002, remat_generator=True,
    )
    dp = DataParallelTrainer(cfg, mesh)
    state = dp.init_state(jax.random.PRNGKey(0))
    tar = cfg.hr_load_size
    per = n_global // nproc
    for step in range(2):
        global_batch = np.random.RandomState(step).rand(
            n_global, cfg.rnn_n, tar, tar, 3).astype(np.float32)
        local = global_batch[pid * per : (pid + 1) * per]
        state, metrics = dp.train_step(state, dp.put_batch(local))
        print(f"STEP {step} All_loss_Gen {float(metrics['All_loss_Gen']):.10f}"
              f" t_discrim_loss {float(metrics['t_discrim_loss']):.10f}",
              flush=True)


if __name__ == "__main__":
    main()
