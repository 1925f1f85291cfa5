"""Hyperparameter grid search as ONE compiled device program.

Runs the reference Pendulum schedule (src/main.c:33-43 semantics) over a
(lr_policy x clip_eps) grid crossed with seeds — every lane trains to the
solve threshold inside a single vmapped train-until dispatch
(ppoc_tpu.sweep.solve_grid).  The swept values ride as traced runtime data,
so the second (zoomed) grid below reuses the compiled executable.

Usage: python examples/hparam_grid.py [max_epochs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppoc_tpu import sweep
from ppoc_tpu.config import reference_preset


def show(tag, axes, out, secs):
    print(f"\n{tag}: {len(out['combos'])} lanes in one dispatch "
          f"({secs:.2f} s wall)")
    print(f"  axes: {axes}")
    for c, e, r in zip(out["combos"], out["epochs"], out["R"]):
        hp = {k: v for k, v in c.items() if k != "seed"}
        mark = " <- best" if c is out["combos"][out["best"]] else ""
        print(f"  {hp} seed={c['seed']}: epochs={e:3d} R={r:8.1f}{mark}")


def main() -> int:
    max_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    cfg = reference_preset("pendulum")
    axes = {"lr_policy": [1e-4, 3e-4, 1e-3], "clip_eps": [0.1, 0.2, 0.3]}
    seeds = [0, 1]

    t0 = time.perf_counter()
    out = sweep.solve_grid(cfg, axes, target_R=-200.0, seeds=seeds,
                           max_epochs=max_epochs)
    show("grid 1 (incl. compile)", axes, out, time.perf_counter() - t0)

    # zoom around the winner: same axis names + lane count -> the compiled
    # executable is reused, only the values change
    best = out["combos"][out["best"]]
    lr, ce = best["lr_policy"], best["clip_eps"]
    axes2 = {"lr_policy": [lr / 1.5, lr, lr * 1.5],
             "clip_eps": [ce - 0.05, ce, ce + 0.05]}
    t0 = time.perf_counter()
    out2 = sweep.solve_grid(cfg, axes2, target_R=-200.0, seeds=seeds,
                            max_epochs=max_epochs)
    show("grid 2 (zoomed, executable reused)", axes2, out2,
         time.perf_counter() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
