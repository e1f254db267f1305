"""Worker for the two-process ``jax.distributed`` test (SURVEY §5.8).

Run as ``python distributed_worker.py <rank> <num_processes> <port> <outdir>``
with ``XLA_FLAGS=--xla_force_host_platform_device_count=2``: each process
contributes 2 virtual CPU devices, the pair forms one 4-device data-parallel
mesh, and one SPMD train step runs across the processes — the multi-host
code path the single-process dryrun cannot exercise.

Also imported by ``tests/test_parallel.py`` for the shared model/batch
builders, so the in-process single-device reference uses byte-identical
inputs.
"""

import sys


def make_tiny_module():
    import jax

    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModule
    from thunder_tpu.text import BatchTextTransformer

    tt = BatchTextTransformer(tokens=list("abcdefghijklmnopqrstuvwxyz '"))
    return CTCModule.create(
        jax.random.PRNGKey(0),
        audio_transform=FilterbankFeatures(dither=0.0),
        encoder=QuartznetEncoder(repeat=1, filters=(64,), kernel_sizes=(33,)),
        decoder=Conv1dDecoder(num_classes=tt.num_tokens),
        text_transform=tt,
        sample_len=2000,
    )


def make_batch(module, batch=8):
    import numpy as np

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((batch, 4000)) * 0.3).astype(np.float32)
    audio_lengths = np.full((batch,), 4000, dtype=np.int32)
    targets, target_lengths = module.text_transform.encode(["hello world"] * batch, pad_to=16)
    return audio, audio_lengths, targets, target_lengths


def main(rank: int, num_processes: int, port: int, outdir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=num_processes, process_id=rank
    )

    import numpy as np
    import optax

    from thunder_tpu.parallel import batch_sharding, make_mesh
    from thunder_tpu.training.trainer import TrainState, make_train_step

    assert jax.process_count() == num_processes
    n_global = jax.device_count()

    module = make_tiny_module()
    batch = make_batch(module)

    mesh = make_mesh(model_parallel=1)
    assert mesh.shape["data"] == n_global
    shard = batch_sharding(mesh)

    # params/targets are identical numpy on every process -> auto-replicated;
    # the batch rows are split per process and assembled into global arrays
    def to_global(x):
        x = np.asarray(x)
        per = x.shape[0] // num_processes
        local = x[rank * per : (rank + 1) * per]
        return jax.make_array_from_process_local_data(shard, local, x.shape)

    global_batch = tuple(to_global(b) for b in batch)

    state = TrainState.create(
        apply_fn=module.model.apply,
        params=module.variables["params"],
        tx=optax.sgd(learning_rate=1e-3),
        batch_stats=module.variables.get("batch_stats"),
    )
    step_fn = make_train_step(module.model, module.blank_idx)
    state, loss = step_fn(state, *global_batch, jax.random.PRNGKey(42))

    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    np.savez(f"{outdir}/rank{rank}.npz", loss=np.float32(float(loss)), **flat)
    print(f"rank {rank}: loss={float(loss):.6f} devices={n_global}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
