"""Recurrent (GRU) policies on partially-observable tasks.

The third model family (models/gru.py + algo/recurrent.py): PPOConfig(
rnn_hidden=H) swaps both trunks for a GRU encoder + MLP head, rollouts
thread the hidden state (zeroed at episode boundaries), and updates replay
whole env sequences with BPTT instead of shuffled transitions.

Two demos:
  1. `recall` (envs/recall.py) — a cue shown once must be remembered to the
     final step.  A memoryless MLP is a coin flip (~0.5); the GRU solves it.
  2. `pendulum_po` (envs/wrappers.mask_obs) — Pendulum with the angular
     velocity hidden.  The GRU recovers the velocity from consecutive
     angles.

Run on CPU: PPOC_PLATFORM=cpu python examples/recurrent_memory.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PPOC_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["PPOC_PLATFORM"])
    if os.environ.get("PPOC_CPU_DEVICES"):
        jax.config.update("jax_num_cpu_devices",
                          int(os.environ["PPOC_CPU_DEVICES"]))

from ppoc_tpu import PPOConfig, Trainer

# 1. the memory differentiator ------------------------------------------------
base = PPOConfig(env="recall", n_envs=128, rollout_len=6, minibatch_size=192,
                 fits_per_epoch=8, n_epochs=5, eval_envs=256, eval_len=6,
                 hidden=(32,), lr_policy=1e-3, lr_v=1e-3, seed=0)

print("== memoryless MLP on recall (can only guess, R ~ 0.5) ==")
Trainer(base).train()

print("== GRU on recall (remembers the cue, R -> 1.0) ==")
Trainer(base.replace(rnn_hidden=16)).train()

# 2. pendulum with hidden velocity -------------------------------------------
print("== GRU on pendulum_po (velocity must be inferred from memory) ==")
cfg = PPOConfig(env="pendulum_po", n_envs=64, rollout_len=200,
                minibatch_size=800, fits_per_epoch=4, n_epochs=15,
                eval_envs=64, rnn_hidden=32, hidden=(64,), seed=0)
Trainer(cfg).train()
