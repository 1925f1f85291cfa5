"""Reference-checkpoint interop (utils/ref_interop.py).

Validates both directions against the byte layout of the reference's
save_ppo/load_ppo (src/ppo.cu:585-648, src/policy.cu:201-227,
src/neural_network.cu:284-358, src/adam.cu:172-264), including a
hand-packed file that simulates exactly what the C writer emits.
"""
import struct

import jax
import numpy as np
import pytest

from ppoc_tpu import PPOConfig
from ppoc_tpu.algo.trainer import Trainer
from ppoc_tpu.utils import ref_interop as ri


def _tiny_trainer(seed=0, env="pendulum"):
    cfg = PPOConfig(env=env, hidden=(8, 8), n_envs=8, rollout_len=16,
                    minibatch_size=32, fits_per_epoch=1, n_epochs=1,
                    eval_envs=8, eval_len=200, seed=seed,
                    kernel_backend="jnp")
    return Trainer(cfg)


def _trained_trainer(tmp_path):
    tr = _tiny_trainer()
    tr.train(log=False, initial_eval=False)  # nonzero Adam m/v/t
    return tr


def _tree_np(t):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), t)


def test_export_import_roundtrip(tmp_path):
    tr = _trained_trainer(tmp_path)
    path = str(tmp_path / "ref.bin")
    ri.export_trainer(tr, path)

    ck = ri.read_reference(path)
    assert ck.state_size == 3 and ck.action_size == 1
    assert ck.capacity == tr.cfg.steps_per_fit
    assert ck.lam == pytest.approx(tr.cfg.lam)
    assert ck.clip_eps == pytest.approx(tr.cfg.clip_eps)

    st = _tree_np(tr.state)
    for (w0, b0), (w1, b1) in zip(ck.policy_net.params,
                                  st.policy_params["mlp"]):
        np.testing.assert_array_equal(w0, w1)
        np.testing.assert_array_equal(b0, b1)
    for (w0, b0), (w1, b1) in zip(ck.v_net.params, st.v_params):
        np.testing.assert_array_equal(w0, w1)
        np.testing.assert_array_equal(b0, b1)
    np.testing.assert_array_equal(ck.log_std, st.policy_params["log_std"])
    assert ck.adam_policy.t == int(st.opt_policy.t) > 0
    for (mw, mb), (mw1, mb1) in zip(ck.adam_policy.m, st.opt_policy.m):
        np.testing.assert_array_equal(mw, mw1)
        np.testing.assert_array_equal(mb, mb1)
    np.testing.assert_array_equal(ck.adam_log_std.v, st.opt_log_std.v)

    # write->read->write is byte-stable
    path2 = str(tmp_path / "ref2.bin")
    ri.write_reference(path2, ck)
    assert open(path, "rb").read() == open(path2, "rb").read()


def test_load_trainer_matches_source(tmp_path):
    tr = _trained_trainer(tmp_path)
    path = str(tmp_path / "ref.bin")
    ri.export_trainer(tr, path)

    tr2 = ri.load_trainer(path, "pendulum", n_envs=8, rollout_len=16,
                          minibatch_size=32, fits_per_epoch=1,
                          eval_envs=8, eval_len=200)
    assert tr2.cfg.hidden == (8, 8)
    assert tr2.cfg.activation == "relu"
    a, b = _tree_np(tr.state), _tree_np(tr2.state)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(x, y)
    # and the trainer is actually usable
    m = tr2.evaluate()
    assert np.isfinite(m.R)


def test_reference_byte_layout_hand_packed(tmp_path):
    """Parse a file packed field-for-field like the C writer would emit for
    a 2->2->1 net — independent of our writer."""
    W0 = np.array([[1., 2.], [3., 4.]], "<f4")       # [out=2, in=2] row-major
    b0 = np.array([0.5, -0.5], "<f4")
    W1 = np.array([[5., 6.]], "<f4")                 # [out=1, in=2]
    b1 = np.array([0.25], "<f4")

    def net_bytes():
        out = struct.pack("<ii", 3, 1)               # num_layers(nodes), out
        for name in (b"relu\0", b"none\0"):
            out += struct.pack("<i", len(name)) + name
        out += struct.pack("<ii", 2, 2) + W0.tobytes() + b0.tobytes()
        out += struct.pack("<ii", 2, 1) + W1.tobytes() + b1.tobytes()
        return out

    def adam_bytes(size, t, ntensors):
        m = np.arange(size, dtype="<f4")
        v = np.arange(size, dtype="<f4") * 10
        return (struct.pack("<iiffi", size, t, 0.9, 0.999, ntensors)
                + m.tobytes() + v.tobytes())

    nbytes = net_bytes()
    nsz = 2 * 2 + 2 + 2 * 1 + 1                      # 9 params per net
    blob = (struct.pack("<fffff", 0.95, 0.2, 0.0, 3e-4, 3e-4)
            + struct.pack("<iii", 2, 1, 3000)
            + np.array([0.1], "<f4").tobytes()       # log_std
            + nbytes + nbytes
            + adam_bytes(nsz, 7, 4) + adam_bytes(nsz, 7, 4)
            + adam_bytes(1, 7, 1))
    path = str(tmp_path / "hand.bin")
    open(path, "wb").write(blob)

    ck = ri.read_reference(path)
    assert (ck.state_size, ck.action_size, ck.capacity) == (2, 1, 3000)
    # W stored [out,in] row-major -> ours [in,out] transposed
    np.testing.assert_array_equal(ck.policy_net.params[0][0], W0.T)
    np.testing.assert_array_equal(ck.policy_net.params[1][0], W1.T)
    np.testing.assert_array_equal(ck.policy_net.params[0][1], b0)
    assert ck.policy_net.activations == ["relu", "none"]
    # Adam flat order: W0 block (row-major [out,in]), b0, W1, b1
    m = ck.adam_policy.m
    np.testing.assert_array_equal(
        m[0][0], np.arange(4, dtype="<f4").reshape(2, 2).T)
    np.testing.assert_array_equal(m[0][1], [4.0, 5.0])
    np.testing.assert_array_equal(
        m[1][0], np.array([[6.0], [7.0]], "<f4"))
    np.testing.assert_array_equal(m[1][1], [8.0])
    assert ck.adam_policy.t == 7
    np.testing.assert_array_equal(ck.adam_log_std.m, [0.0])

    # and our writer reproduces the hand-packed bytes exactly
    path2 = str(tmp_path / "hand2.bin")
    ri.write_reference(path2, ck)
    assert open(path2, "rb").read() == blob


def test_cli_import_export(tmp_path, capsys):
    from ppoc_tpu import cli

    ref = str(tmp_path / "cli_ref.bin")
    base = ["--env", "pendulum", "--hidden", "8", "8", "--n-envs", "8",
            "--rollout-len", "16", "--minibatch-size", "32",
            "--fits-per-epoch", "1", "--eval-envs", "8", "--eval-len", "200",
            "--kernel-backend", "jnp"]
    assert cli.main(base + ["--n-epochs", "1", "--export-ref", ref]) == 0
    ck = ri.read_reference(ref)
    assert ck.adam_policy.t > 0

    # import + eval; explicit --ent-coeff beats the file's value
    assert cli.main(base + ["--import-ref", ref, "--eval-only"]) == 0
    out = capsys.readouterr().out
    assert "R:" in out

    tr = ri.load_trainer(ref, "pendulum", n_envs=8, rollout_len=16,
                         minibatch_size=32, eval_envs=8, eval_len=200,
                         ent_coeff=0.5)
    assert tr.cfg.ent_coeff == 0.5


def test_interop_error_paths(tmp_path):
    tr = _trained_trainer(tmp_path)
    path = str(tmp_path / "ref.bin")
    ri.export_trainer(tr, path)

    with pytest.raises(ValueError, match="dims"):
        ri.load_trainer(path, "mountain_car", n_envs=8, rollout_len=16,
                        minibatch_size=32, eval_len=999)
    with pytest.raises(ValueError, match="discrete"):
        ri.load_trainer(path, "cartpole", n_envs=8, rollout_len=16,
                        minibatch_size=32, eval_len=500)
    with pytest.raises(ValueError, match="plain"):
        ri.load_trainer(path, "pendulum", tp_size=2)

    # discrete trainers cannot be exported
    cfg = PPOConfig(env="cartpole", hidden=(8, 8), n_envs=8, rollout_len=16,
                    minibatch_size=32, fits_per_epoch=1, n_epochs=1,
                    eval_envs=8, eval_len=500, kernel_backend="jnp")
    with pytest.raises(ValueError, match="Gaussian"):
        ri.export_trainer(Trainer(cfg), str(tmp_path / "d.bin"))

    # truncation is detected
    data = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.bin")
    open(trunc, "wb").write(data[:-8])
    with pytest.raises(ValueError, match="truncated|trailing|size"):
        ri.read_reference(trunc)
