"""Solving recall_xl (T=1024, the flash-attention training regime).

The direct recipe stalls at R ~ 0.72: the cue's attention weight starts at
1/1024 of the softmax mass and the retrieval gradient's SNR falls with the
window (docs/RESULTS.md round-3 record).  The fix is a CURRICULUM through
the product surface, no new machinery:

  phase 1  train `recall_long` (T=512, where the same recipe solves) with
           ``eval_len=1024`` — the trainer sizes the positional table to
           max(rollout_len, eval_len)+1 = 1025 slots, so the checkpoint
           already carries a 1024-step window;
  phase 2  ``Trainer.from_checkpoint(..., env="recall_xl",
           rollout_len=1024)`` — same parameter shapes, the T >= 1024
           parallel passes route through the flash kernel
           (ops/pallas_attn.py, attn.FLASH_MIN_T) — and fine-tune.

The retrieval circuit ("attend the position-0 cue when the observation is
blank") transfers: phase 2 reaches R = 1.0 within 1-2 epochs on one v5e
chip (~50 s phase 1 + ~70 s for 60 phase-2 epochs, seeds 0/2/3; seed 1's
phase 1 itself never takes off within 120 epochs — recall_long's known
seed variance — so gate phase 1 with stop_at_R and reseed on failure).

Usage: python examples/recall_xl_curriculum.py [seed] [ckpt_path]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppoc_tpu import PPOConfig, Trainer
from ppoc_tpu.utils.cache import enable_compilation_cache


def main(argv):
    enable_compilation_cache()
    seed = int(argv[1]) if len(argv) > 1 else 0
    ckpt = argv[2] if len(argv) > 2 else "recall_xl_phase1.bin"

    base = dict(n_envs=32, minibatch_size=2048, fits_per_epoch=2,
                eval_envs=64, hidden=(32,), seed=seed,
                lr_policy=1e-3, lr_v=1e-3,
                attn_dim=32, attn_layers=2, attn_heads=4)

    # phase 1: solve the 512-step window with a 1025-slot positional table
    cfg1 = PPOConfig(env="recall_long", rollout_len=512, eval_len=1024,
                     **base)
    t0 = time.time()
    tr = Trainer(cfg1)
    h1 = tr.train(n_epochs=60, log=False, stop_at_R=0.8)
    print(f"phase 1 (T=512): {len(h1)} epochs, final R {h1[-1]['R']:.3f} "
          f"({time.time() - t0:.0f}s)")
    if h1[-1]["R"] < 0.8:
        print("phase 1 did not reach R >= 0.8 — reseed (recall_long's "
              "known seed variance) before fine-tuning")
        return 1
    tr.save(ckpt)

    # phase 2: same weights, 1024-step windows — the flash-kernel regime
    t0 = time.time()
    tr2 = Trainer.from_checkpoint(ckpt, env="recall_xl", rollout_len=1024,
                                  eval_len=1024)
    h2 = tr2.train(n_epochs=40, log=False, stop_at_R=0.95)
    print(f"phase 2 (T=1024, flash): {len(h2)} epochs, final R "
          f"{h2[-1]['R']:.3f} best {max(h['R'] for h in h2):.3f} "
          f"({time.time() - t0:.0f}s)")
    return 0 if max(h["R"] for h in h2) >= 0.9 else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
