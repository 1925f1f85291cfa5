"""HTTP policy server (serve.make_server / python -m ppoc_tpu.serve).

Spins the threaded stdlib server on an ephemeral port and drives it with
urllib: spec endpoint, batched + single /act, the recurrent hidden-state
protocol, and error paths.
"""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from ppoc_tpu import PPOConfig, serve
from ppoc_tpu.algo.trainer import Trainer


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read().decode())


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_http")
    ff = str(d / "ff.bin")
    cfg = PPOConfig(env="simple", n_envs=16, rollout_len=15,
                    minibatch_size=48, fits_per_epoch=2, eval_envs=16,
                    eval_len=15, hidden=(16,), kernel_backend="jnp")
    tr = Trainer(cfg)
    tr.train(n_epochs=1, log=False, initial_eval=False)
    tr.save(ff)
    rnn = str(d / "rnn.bin")
    cfg2 = PPOConfig(env="recall", n_envs=32, rollout_len=6,
                     minibatch_size=96, fits_per_epoch=2, eval_envs=32,
                     eval_len=6, hidden=(16,), rnn_hidden=8)
    tr2 = Trainer(cfg2)
    tr2.train(n_epochs=1, log=False, initial_eval=False)
    tr2.save(rnn)
    return ff, rnn


def _serve(path):
    server = serve.make_server(path, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address[:2]
    return server, f"http://{host}:{port}"


def test_http_feedforward(ckpts):
    ff, _ = ckpts
    server, base = _serve(ff)
    try:
        spec = _get(base + "/spec")
        assert spec == {"env": "simple", "obs_dim": 1, "action_dim": 1,
                        "discrete": False, "recurrent": False,
                        "rnn_hidden": 0, "deterministic": True}
        out = _post(base + "/act", {"obs": [[0.0], [1.0], [2.0]]})
        a = np.asarray(out["action"])
        assert a.shape == (3, 1) and np.isfinite(a).all()
        assert "h" not in out
        # single-vector form
        out1 = _post(base + "/act", {"obs": [0.0]})
        assert np.asarray(out1["action"]).shape == (1,)
        # deterministic: same obs -> same action
        assert out1 == _post(base + "/act", {"obs": [0.0]})
        # error paths
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/act", {"obs": [[0.0, 1.0]]})  # wrong obs_dim
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base + "/nope")
        assert e.value.code == 404
    finally:
        server.shutdown()


def test_http_recurrent(ckpts):
    _, rnn = ckpts
    server, base = _serve(rnn)
    try:
        spec = _get(base + "/spec")
        assert spec["recurrent"] is True and spec["rnn_hidden"] == 8
        # episode start: omit h -> zeros; thread the returned h
        out = _post(base + "/act", {"obs": [[1.0, 1.0], [-1.0, 1.0]]})
        h = out["h"]
        assert np.asarray(h).shape == (2, 8)
        out2 = _post(base + "/act", {"obs": [[0.0, 0.0], [0.0, 0.0]],
                                     "h": h})
        assert np.asarray(out2["action"]).shape == (2, 1)
        # the cue must flow into the hidden state: different cues -> different h
        assert not np.allclose(np.asarray(h)[0], np.asarray(h)[1])
    finally:
        server.shutdown()


def test_resolve_spec_prefers_file_dims_on_mismatch():
    """A checkpoint whose embedded cfg.env names an env with DIFFERENT dims
    (e.g. saved by a driver that never rewrote the default) must serve with
    the file's own dims, not the registry entry's."""
    from ppoc_tpu.serve import _resolve_spec

    cfg = PPOConfig(env="pendulum")  # registry: obs 3 / act 1
    dims = {"obs_dim": 24, "action_dim": 4, "discrete": False}
    with pytest.warns(UserWarning, match="do not match"):
        spec = _resolve_spec(cfg, dims)
    assert spec.obs_dim == 24 and spec.action_dim == 4
    # matching dims: the registry spec (with horizon etc.) wins
    spec2 = _resolve_spec(cfg, {"obs_dim": 3, "action_dim": 1,
                                "discrete": False})
    assert spec2.horizon == 200


def test_gym_trainer_rewrites_cfg_env(tmp_path):
    """GymTrainer must embed the REAL env id in checkpoints even when the
    caller's config carries a stale env field (the bug that shipped the
    walker artifact claiming to be a pendulum)."""
    gym = pytest.importorskip("gymnasium")
    from ppoc_tpu.envs.gym_bridge import GymTrainer

    cfg = PPOConfig(env="pendulum", n_envs=2, rollout_len=32,
                    minibatch_size=32, fits_per_epoch=1, eval_envs=2,
                    eval_len=32, hidden=(8,))
    tr = GymTrainer(cfg, "Pendulum-v1", actor="host")
    assert tr.cfg.env == "gym:Pendulum-v1"


def test_http_recurrent_rejects_mismatched_h(ckpts):
    _, rnn = ckpts
    server, base = _serve(rnn)
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/act", {"obs": [[0.0, 0.0]],
                                  "h": [[0.0] * 8] * 3})  # 1 obs, 3-row h
        assert e.value.code == 400
        assert "one row per obs" in json.loads(e.value.read().decode())["error"]
    finally:
        server.shutdown()


def test_score_fails_fast_on_impossible_eval():
    from ppoc_tpu.algo.trainer import Trainer, score
    from ppoc_tpu import PPOConfig

    # eval_len 5 << horizon 15: no episode can ever complete; score must
    # raise after a few rounds, not run max_rounds rollouts
    with pytest.warns(UserWarning):
        tr = Trainer(PPOConfig(env="simple", n_envs=8, rollout_len=15,
                               minibatch_size=24, fits_per_epoch=1,
                               eval_envs=8, eval_len=5, hidden=(8,),
                               kernel_backend="jnp"))
    with pytest.raises(RuntimeError, match="eval_len"):
        score(tr, episodes=10)


def test_cli_score_requires_eval_only():
    from ppoc_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["--env", "simple", "--score-episodes", "10"])


def test_actor_recurrent_flag(ckpts):
    ff, rnn = ckpts
    assert serve.load_policy(ff).recurrent is False
    assert serve.load_recurrent_policy(rnn).recurrent is True


def test_http_attention_sessions(tmp_path):
    """Attention checkpoints serve statefully: the KV cache lives
    server-side per session, advanced by /act, lanes reset via 'done',
    freed via 'close'."""
    cfg = PPOConfig(env="recall", n_envs=128, rollout_len=6,
                    minibatch_size=192, fits_per_epoch=8, eval_envs=128,
                    eval_len=6, hidden=(32,), attn_dim=16, attn_layers=1,
                    attn_heads=2, seed=1, lr_policy=1e-3, lr_v=1e-3)
    tr = Trainer(cfg)
    tr.train(n_epochs=3, log=False, initial_eval=False)
    path = str(tmp_path / "attn_http.bin")
    tr.save(path)

    server, url = _serve(path)
    try:
        spec = _get(url + "/spec")
        assert spec["attention"] and spec["protocol"] == "session"
        assert spec["window"] >= 6

        # session required
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url + "/act", {"obs": [[0.0, 1.0]]})
        assert ei.value.code == 400
        assert "session" in json.loads(ei.value.read().decode())["error"]

        # the cache advances per call (t counts steps)
        r1 = _post(url + "/act", {"obs": [[1.0, 1.0], [-1.0, 1.0]],
                                  "session": "s1"})
        assert r1["t"] == 1 and np.asarray(r1["action"]).shape == (2, 1)
        r2 = _post(url + "/act", {"obs": [[0.0, 0.0], [0.0, 0.0]],
                                  "session": "s1",
                                  "done": [True, False]})
        assert r2["t"] == 2

        # batch-size mismatch is a clean 400, session intact
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url + "/act", {"obs": [[0.0, 0.0]], "session": "s1"})
        assert ei.value.code == 400
        r3 = _post(url + "/act", {"obs": [[0.0, 0.0], [0.0, 0.0]],
                                  "session": "s1"})
        assert r3["t"] == 3

        # close frees it; a new session starts at t=1 again
        rc = _post(url + "/act", {"session": "s1", "close": True})
        assert rc["closed"]
        r4 = _post(url + "/act", {"obs": [[0.0, 0.0], [0.0, 0.0]],
                                  "session": "s1"})
        assert r4["t"] == 1

        # served session policy answers recall correctly: drive a full
        # episode through the wire and check the final action matches cue
        correct = 0
        for seed in range(6):
            cue = 1.0 if seed % 2 == 0 else -1.0
            sid = f"ep{seed}"
            obs = [[cue, 1.0]]
            for t in range(6):
                r = _post(url + "/act", {"obs": obs, "session": sid})
                obs = [[0.0, 0.0]]
            correct += int(float(np.asarray(r["action"])[0, 0]) * cue > 0)
            _post(url + "/act", {"session": sid, "close": True})
        assert correct >= 5
    finally:
        server.shutdown()
