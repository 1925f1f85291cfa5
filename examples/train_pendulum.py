"""Solve Pendulum-v1 on one chip — the reference's src/main.c workload.

Runs the reference hyperparameters with 64 vectorized on-device envs and the
single-dispatch solve loop; saves a checkpoint like the reference does
(ppo_model.bin, src/main.c:58).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppoc_tpu import PPOConfig, Trainer

cfg = PPOConfig(env="pendulum", n_envs=64, rollout_len=200,
                minibatch_size=256, fits_per_epoch=4, eval_envs=64)
trainer = Trainer(cfg)
result = trainer.solve(target_R=-200.0, max_epochs=60)
print(f"solved={result['R'] >= -200} after {result['epochs']} epochs, "
      f"R={result['R']:.1f}")
trainer.save("ppo_model.bin")
