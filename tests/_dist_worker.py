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
    mode = sys.argv[4] if len(sys.argv) > 4 else "fit"

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    if mode == "cli":
        # full CLI path: --coordinator flags drive initialize_distributed,
        # the trainer runs on the global mesh, only rank 0 logs/saves
        import io
        from contextlib import redirect_stdout

        from ppoc_tpu import cli

        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli.main([
                "--env", "simple", "--n-envs", "16", "--rollout-len", "15",
                "--minibatch-size", "16", "--fits-per-epoch", "1",
                "--n-epochs", "2", "--eval-envs", "16", "--eval-len", "15",
                "--hidden", "16", "16", "--kernel-backend", "jnp", "--jsonl",
                "--coordinator", coord, "--num-processes", str(n_proc),
                "--process-id", str(pid),
            ])
        out = buf.getvalue()
        n_lines = len([l for l in out.splitlines() if l.strip()])
        print(f"RESULT pid={pid} rc={rc} stdout_lines={n_lines}", flush=True)
        jax.distributed.shutdown()
        return rc

    if mode in ("trainer", "zero1"):
        # full Trainer over the 2-process global mesh through the public
        # API (train_epoch + evaluate), bootstrapped by our wrapper;
        # mode "zero1" additionally shards the trunk Adams' moments per
        # rank so the parameter-slice psum-gather crosses DCN
        # (ops/adam.update_zero1).  initialize_distributed must precede
        # the trainer/envs imports — the env registry builds jnp constants
        # at import time, which initializes the XLA backend.
        from ppoc_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(coord, n_proc, pid)

        from ppoc_tpu import PPOConfig
        from ppoc_tpu.algo.trainer import Trainer
        from ppoc_tpu.parallel import make_mesh
        n_dev = len(jax.devices())
        assert n_dev == 4 * n_proc, f"expected {4 * n_proc} devices, got {n_dev}"
        cfg = PPOConfig(env="simple", n_envs=2 * n_dev, rollout_len=15,
                        minibatch_size=2 * n_dev, fits_per_epoch=2,
                        eval_envs=2 * n_dev, eval_len=15,
                        hidden=(16, 16), kernel_backend="jnp",
                        zero1=(mode == "zero1"))
        tr = Trainer(cfg, mesh=make_mesh())
        hist = tr.train(n_epochs=2, log=False)
        r = hist[-1]["R"]
        v = hist[-1]["value_loss"]
        print(f"RESULT pid={pid} R={r:.6f} value_loss={v:.6f}", flush=True)
        jax.distributed.shutdown()
        return 0

    if mode == "ep":
        # expert parallelism across PROCESSES: the MoE trunk's experts
        # shard over an 'ep' mesh axis that spans both hosts' devices
        # (the model-axis-over-DCN leg of SURVEY §2a), full Trainer API
        from ppoc_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(coord, n_proc, pid)

        from ppoc_tpu import PPOConfig
        from ppoc_tpu.algo.trainer import Trainer
        n_dev = len(jax.devices())
        assert n_dev == 4 * n_proc, f"expected {4 * n_proc} devices, got {n_dev}"
        # ep_size = ALL devices so the one ep group spans both processes:
        # with ep_size=4 the process-major device order would put each ep
        # group entirely inside one host and nothing would cross DCN
        cfg = PPOConfig(env="simple", n_envs=2 * n_dev, rollout_len=15,
                        minibatch_size=2 * n_dev, fits_per_epoch=2,
                        eval_envs=2 * n_dev, eval_len=15,
                        hidden=(16, 16), kernel_backend="jnp",
                        n_experts=n_dev, moe_topk=2, ep_size=n_dev)
        tr = Trainer(cfg)  # builds the (dp, ep) mesh over global devices
        assert dict(tr.mesh.shape) == {"dp": 1, "ep": n_dev}
        ep_procs = {d.process_index
                    for d in tr.mesh.devices.ravel()}
        assert len(ep_procs) == n_proc, "ep axis must span every process"
        hist = tr.train(n_epochs=2, log=False)
        r = hist[-1]["R"]
        v = hist[-1]["value_loss"]
        print(f"RESULT pid={pid} R={r:.6f} value_loss={v:.6f}", flush=True)
        jax.distributed.shutdown()
        return 0

    if mode == "sp":
        # sequence parallelism across PROCESSES: the ring (ppermute) and
        # the GAE affine-carry all_gather ride DCN.  The mesh is arranged
        # so every sp pair spans both hosts — the default process-major
        # reshape would keep each ring inside one process and nothing
        # would cross.
        from ppoc_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(coord, n_proc, pid)

        import numpy as np
        from jax.sharding import Mesh

        from ppoc_tpu import PPOConfig
        from ppoc_tpu.algo.trainer import Trainer
        n_dev = len(jax.devices())
        assert n_dev == 4 * n_proc, f"expected {4 * n_proc} devices, got {n_dev}"
        devs = np.asarray(jax.devices()).reshape(n_proc, n_dev // n_proc).T
        mesh = Mesh(devs, ("dp", "sp"))  # sp pairs = (proc0_i, proc1_i)
        sp_procs = {d.process_index for d in devs[0]}
        assert len(sp_procs) == n_proc, "sp axis must span every process"
        cfg = PPOConfig(env="recall", n_envs=2 * n_dev, rollout_len=6,
                        minibatch_size=6 * (n_dev // n_proc),
                        fits_per_epoch=2, eval_envs=2 * n_dev, eval_len=6,
                        hidden=(16,), kernel_backend="jnp",
                        attn_dim=8, attn_layers=1, attn_heads=2,
                        sp_size=n_proc)
        tr = Trainer(cfg, mesh=mesh)
        hist = tr.train(n_epochs=2, log=False)
        r = hist[-1]["R"]
        v = hist[-1]["value_loss"]
        print(f"RESULT pid={pid} R={r:.6f} value_loss={v:.6f}", flush=True)
        jax.distributed.shutdown()
        return 0

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
