"""Train BipedalWalker-v3 through the host bridge (reference env id 1,
scripts/gym_env.py:15-16).

Actor/learner split at full throughput: numpy policy on the host (weights
synced once per fit — the reference's policy_to_host pattern,
src/ppo.cu:536-538), Box2D physics in gymnasium.vector workers, jitted
device learner.  Swap in any Gymnasium id.

Usage: python examples/gym_bipedal.py [n_epochs] [seed] [obs_norm(0|1)] [save_path] [reward_norm(0|1)]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import math

from ppoc_tpu import PPOConfig
from ppoc_tpu.envs.gym_bridge import GymTrainer

n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
obs_norm = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False

cfg = PPOConfig(n_envs=16, rollout_len=256, minibatch_size=256,
                fits_per_epoch=4, n_epochs=n_epochs, eval_envs=8,
                eval_len=1600, seed=seed,
                reset_per_fit=False,      # 1600-step horizon >> rollout window
                ent_coeff=0.001, kernel_backend="jnp")
save_path = sys.argv[4] if len(sys.argv) > 4 else None
reward_norm = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False

tr = GymTrainer(cfg, "BipedalWalker-v3", actor="host", vector_mode="sync",
                obs_norm=obs_norm, reward_norm=reward_norm)
hist = tr.train(checkpoint_path=save_path,
                checkpoint_every=25 if save_path else 1)
if save_path:
    tr.save(save_path)
print(json.dumps([
    {k: (round(float(v), 2) if math.isfinite(float(v)) else None)
     for k, v in row.items()}
    for row in hist
]))
