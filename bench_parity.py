"""Learning-curve parity: reference schedule on a data-parallel mesh.

BASELINE.md row 3 demands learning curves that match the reference within
seed variance on 1 chip AND on an N>=2 mesh.  This harness runs the exact
reference schedule (15 envs x 200-step fits, minibatch 64 — src/main.c:33-43)
single-device and sharded over an 8-device mesh for several seeds, and
prints the per-epoch eval R for both, plus the first-solve epochs.

On one real chip the mesh leg runs on 8 virtual CPU devices (the sharded
program is identical; only the interconnect is fake):

    python bench_parity.py --platform cpu --devices 8 --seeds 3

Prints one JSON line with the curves; progress to stderr.
"""
from __future__ import annotations

import argparse
import json
import sys


def run(platform, n_devices, seeds, epochs):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu" and n_devices:
            jax.config.update("jax_num_cpu_devices", n_devices)

    from ppoc_tpu.algo.trainer import Trainer
    from ppoc_tpu.config import PPOConfig
    from ppoc_tpu.parallel import make_mesh

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    curves = {"single": {}, "mesh": {}}
    # n_envs=16 (vs the reference's 15) so envs/minibatches split evenly over
    # 8 shards; steps_per_fit 3200 vs 3000, same minibatch 64 and epochs
    base = dict(env="pendulum", n_envs=16, rollout_len=200, minibatch_size=64,
                fits_per_epoch=10, eval_envs=16, eval_len=200,
                kernel_backend="jnp")
    for seed in range(seeds):
        for leg, mesh in (("single", None), ("mesh", make_mesh(n_devices))):
            tr = Trainer(PPOConfig(**base, seed=seed), mesh=mesh)
            hist = tr.train(n_epochs=epochs, log=False)
            rs = [round(h["R"], 1) for h in hist]
            solve = next((i for i, r in enumerate(rs) if r >= -200), None)
            curves[leg][seed] = {"R": rs, "first_solve_epoch": solve}
            log(f"seed {seed} {leg}: {rs} solve@{solve}")
    return curves


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=14)
    args = ap.parse_args(argv)
    curves = run(args.platform, args.devices, args.seeds, args.epochs)
    solves = {leg: [v["first_solve_epoch"] for v in by_seed.values()]
              for leg, by_seed in curves.items()}
    print(json.dumps({"metric": "curve_parity_reference_schedule",
                      "first_solve_epochs": solves, "curves": curves}),
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
