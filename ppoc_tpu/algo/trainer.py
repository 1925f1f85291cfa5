"""Training driver: epoch loop, evaluation, metrics, checkpointing.

Equivalent of the reference driver (src/main.c:13-64): build env + PPO state,
evaluate, run n_epochs of train_ppo_epoch with wall-clock timing, evaluate
after each epoch, save.  The per-epoch stdout line carries the same fields as
the reference (`Epoch/Entropy/Time` src/main.c:54 and `J/R/Episodes`
src/ppo.cu:581).

Multi-device: pass a ``jax.sharding.Mesh``; the epoch/eval programs are
wrapped in ``shard_map`` over the data-parallel axis with fully replicated
parameters, per-device local envs and minibatch shards, and psum/pmean
collectives inside (see ppoc_tpu.algo.ppo).
"""
from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ppoc_tpu import envs
from ppoc_tpu.algo import ppo
from ppoc_tpu.config import PPOConfig
from ppoc_tpu.ops import resolve_backend


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


class Trainer:
    def __init__(self, cfg: PPOConfig, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.env = envs.make(cfg.env)
        self.backend = resolve_backend(cfg.kernel_backend)
        self.key = jax.random.PRNGKey(cfg.seed)

        n_dev = 1 if mesh is None else mesh.size
        if n_dev > 1:
            if cfg.n_envs % n_dev or cfg.minibatch_size % n_dev or cfg.eval_envs % n_dev:
                raise ValueError(
                    f"n_envs ({cfg.n_envs}), minibatch_size ({cfg.minibatch_size}) and "
                    f"eval_envs ({cfg.eval_envs}) must divide the mesh size {n_dev}"
                )
            epoch_local = functools.partial(
                ppo.train_epoch, cfg, self.env,
                axis_name=cfg.mesh_axis,
                n_envs=cfg.n_envs // n_dev,
                mb_size=cfg.minibatch_size // n_dev,
                backend=self.backend,
            )
            eval_local = functools.partial(
                ppo.evaluate, cfg, self.env,
                backend=self.backend,
                n_envs=cfg.eval_envs // n_dev,
                axis_name=cfg.mesh_axis,
            )
            self._train_epoch = jax.jit(
                _shard_map(epoch_local, mesh, in_specs=(P(), P()), out_specs=(P(), P()))
            )
            self._evaluate = jax.jit(
                _shard_map(eval_local, mesh, in_specs=(P(), P()), out_specs=P())
            )
        else:
            self._train_epoch = jax.jit(
                functools.partial(ppo.train_epoch, cfg, self.env, backend=self.backend)
            )
            self._evaluate = jax.jit(
                functools.partial(ppo.evaluate, cfg, self.env, backend=self.backend)
            )

        k_init, self.key = jax.random.split(self.key)
        self.state = ppo.init_train_state(cfg, self.env, k_init)
        self._solve_fn = None
        self._solve_args = None

    # -- public API ---------------------------------------------------------

    def evaluate(self) -> ppo.EvalMetrics:
        k, self.key = jax.random.split(self.key)
        m = self._evaluate(self.state.policy_params, k)
        return jax.tree.map(float, jax.device_get(m))

    def train_epoch(self) -> ppo.FitMetrics:
        k, self.key = jax.random.split(self.key)
        self.state, metrics = self._train_epoch(self.state, k)
        return metrics

    def train(
        self,
        n_epochs: Optional[int] = None,
        log: bool = True,
        stop_at_R: Optional[float] = None,
    ) -> List[Dict[str, Any]]:
        """Full training run; returns per-epoch metric dicts.

        ``stop_at_R`` stops early once the mean undiscounted eval return
        reaches the threshold (used by the solve-time benchmark).
        """
        n_epochs = self.cfg.n_epochs if n_epochs is None else n_epochs
        history: List[Dict[str, Any]] = []
        m0 = self.evaluate()
        if log:
            print(f"J: {m0.J:f} R: {m0.R:f} Episodes: {int(m0.episodes)}", flush=True)
        for i in range(n_epochs):
            tic = time.perf_counter()
            fit_metrics = self.train_epoch()
            fit_metrics = jax.tree.map(float, jax.device_get(fit_metrics))
            toc = time.perf_counter()
            ev = self.evaluate()
            row = {
                "epoch": i,
                "entropy": fit_metrics.entropy,
                "time_s": toc - tic,
                "J": ev.J,
                "R": ev.R,
                "episodes": int(ev.episodes),
                "value_loss": fit_metrics.value_loss,
                "policy_loss": fit_metrics.policy_loss,
                "mean_reward": fit_metrics.mean_reward,
            }
            history.append(row)
            if log:
                print(
                    f"Epoch: {i} Entropy: {row['entropy']:f} Time {row['time_s']:f}s "
                    f"J: {row['J']:f} R: {row['R']:f} Episodes: {row['episodes']}",
                    flush=True,
                )
            if stop_at_R is not None and ev.R >= stop_at_R:
                break
        return history

    def solve(self, target_R: float, max_epochs: int = 100) -> Dict[str, Any]:
        """Train until eval R >= target_R as ONE device program (see
        ppo.train_until); returns {"epochs": n, "R": R}.  Compiles on first
        use; subsequent calls with the same config reuse the executable."""
        if self._solve_fn is not None and self._solve_args != (target_R, max_epochs):
            self._solve_fn = None
        self._solve_args = (target_R, max_epochs)
        if self._solve_fn is None:
            if self.mesh is not None:
                n_dev = self.mesh.size
                local = functools.partial(
                    ppo.train_until, self.cfg, self.env,
                    target_R=target_R, max_epochs=max_epochs,
                    axis_name=self.cfg.mesh_axis,
                    n_envs=self.cfg.n_envs // n_dev,
                    mb_size=self.cfg.minibatch_size // n_dev,
                    backend=self.backend,
                    eval_envs=self.cfg.eval_envs // n_dev,
                )
                self._solve_fn = jax.jit(_shard_map(
                    local, self.mesh, in_specs=(P(), P()), out_specs=(P(), P(), P())
                ))
            else:
                self._solve_fn = jax.jit(functools.partial(
                    ppo.train_until, self.cfg, self.env,
                    target_R=target_R, max_epochs=max_epochs,
                    backend=self.backend,
                ))
        k, self.key = jax.random.split(self.key)
        self.state, n, R = self._solve_fn(self.state, k)
        n, R = jax.device_get((n, R))
        return {"epochs": int(n), "R": float(R)}

    def save(self, path: str) -> None:
        from ppoc_tpu.utils import checkpoint

        checkpoint.save(path, self.cfg, self.env.spec, self.state)

    def load(self, path: str) -> None:
        from ppoc_tpu.utils import checkpoint

        _, _, self.state = checkpoint.load(path, template=self.state)
