"""Train on a Gymnasium env through the host bridge.

BipedalWalker-v3 is the reference's env id 1 (scripts/gym_env.py:15-16):
host actor (one batched device call per step), jitted device learner.
Swap in any Gymnasium id.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppoc_tpu import PPOConfig
from ppoc_tpu.envs.gym_bridge import GymTrainer

cfg = PPOConfig(n_envs=16, rollout_len=400, minibatch_size=256,
                fits_per_epoch=2, n_epochs=50, eval_envs=8, eval_len=1600,
                ent_coeff=0.001, kernel_backend="jnp")
GymTrainer(cfg, "BipedalWalker-v3").train()
