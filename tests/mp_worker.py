"""Worker for the 2-process jax.distributed CPU test (tests/test_multiprocess.py).

Each process: initialize the distributed runtime (Gloo CPU collectives), read ITS
per-host slice of the global batch through the real loader (process_index > 0 branch),
stage it with jax.make_array_from_process_local_data (trainer._stage_batch's
process_count > 1 branch), run ONE sharded train step over the global 8-device mesh,
and print the loss. The parent asserts both processes agree with a single-process run
on the same global batch.

Usage: python mp_worker.py <process_id> <num_processes> <port> <latents_dir>
"""

import os
import sys


def main():
    pid, nproc, port, latents_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from micro_diffusion_tpu.datasets.latents_loader import (
        build_streaming_latents_dataloader,
    )
    from micro_diffusion_tpu.parallel import batch_sharding, make_mesh
    from micro_diffusion_tpu.train import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )
    from micro_diffusion_tpu.train.optim import constant_schedule
    from test_multiprocess import GLOBAL_BATCH, tiny_model

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))  # deterministic across processes

    loader = build_streaming_latents_dataloader(
        latents_dir,
        batch_size=GLOBAL_BATCH // nproc,
        image_size=256,
        cap_seq_size=8,
        cap_emb_dim=16,
        cap_drop_prob=0.0,
        shuffle=True,
        seed=7,
        num_epochs=1,
        process_index=pid,
        process_count=nproc,
    )
    local_batch = next(iter(loader))

    mesh = make_mesh(data=jax.device_count())
    b_sh = batch_sharding(mesh)
    batch = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(b_sh, x), local_batch
    )

    sched = constant_schedule(1e-4)
    tx = build_optimizer(params, sched, clip_norm=0.25)
    state = create_train_state(params, tx)
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(lambda x: jax.device_put(x, rep), state)

    step = jax.jit(
        make_train_step(model, tx, sched, microbatch_size=None),
        out_shardings=(jax.tree.map(lambda _: rep, state), None),
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    print(
        f"RESULT pid={pid} loss={float(metrics['loss']):.8f} "
        f"grad_norm={float(metrics['grad_norm']):.8f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
