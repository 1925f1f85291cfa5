"""Worker for the multi-process jax.distributed test (test_distributed.py).

Each process owns 4 virtual CPU devices; two processes form one 8-device
global 'dp' mesh.  Runs one sharded fit_step on the toy env and prints the
(replicated) value loss — the multi-host analogue of the reference's
single-process trainer, exercising jax.distributed bootstrap + cross-process
collectives (SURVEY.md §2a: DP over DCN).
"""
import os
import sys


def main() -> int:
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n_proc, process_id=pid
    )

    import functools

    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from ppoc_tpu import PPOConfig, envs
    from ppoc_tpu.algo import ppo

    n_dev = len(jax.devices())
    assert n_dev == 4 * n_proc, f"expected {4 * n_proc} global devices, got {n_dev}"

    cfg = PPOConfig(env="simple", n_envs=2 * n_dev, rollout_len=15,
                    minibatch_size=2 * n_dev, fits_per_epoch=1,
                    hidden=(16, 16), kernel_backend="jnp")
    env = envs.make("simple")
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))

    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    local = functools.partial(
        ppo.fit_step, cfg, env, axis_name="dp",
        n_envs=cfg.n_envs // n_dev, mb_size=cfg.minibatch_size // n_dev,
        backend="jnp",
    )
    try:
        smap = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map as smap
    fn = jax.jit(smap(local, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P())))
    new_ts, metrics = fn(ts, jax.random.PRNGKey(1))
    v = float(jax.device_get(metrics.value_loss))
    assert np.isfinite(v)
    print(f"RESULT pid={pid} value_loss={v:.6f}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
