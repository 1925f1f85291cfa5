"""Numerical-safety tooling: NaN hunting and checked assertions.

The reference's sanitizer layer is ``cudaCheckErrors()`` — a DEBUG-only
device-sync + error check after every kernel launch
(include/cuda_helper.h:4-19) — plus one deliberate race fix (atomicAdd for
grad_log_std, src/policy.cu:155-157).  XLA removes the manual-race surface
entirely; the remaining failure mode is numerical (NaN/Inf from exploding
ratios or bad advantages), covered here by:

  * ``nan_guard()`` — context manager enabling jax_debug_nans, the moral
    equivalent of a DEBUG build: every primitive result is checked, errors
    raise at the faulting op instead of propagating garbage;
  * ``checked(fn)`` — a checkify wrapper that compiles NaN/OOB assertions
    INTO the jitted program (works under jit/scan where debug_nans cannot
    see), returning (error, output) like the reference's per-launch check.
"""
from __future__ import annotations

import contextlib
from typing import Any, Callable, Iterator

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def nan_guard(enable: bool = True) -> Iterator[None]:
    """Enable jax_debug_nans within the scope (the DEBUG-build analogue)."""
    prev = bool(jax.config.jax_debug_nans)
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn: Callable[..., Any], *, jit: bool = True) -> Callable[..., Any]:
    """Compile ``fn`` with float (NaN/Inf) + index OOB checks baked in.

    Returns a callable producing ``(error, output)``; call
    ``error.throw()`` to raise if any check fired.  Use on fit_step /
    train_epoch when debugging divergence::

        f = debug.checked(functools.partial(ppo.fit_step, cfg, env))
        err, (state, metrics) = f(state, key)
        err.throw()
    """
    checked_fn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )
    return jax.jit(checked_fn) if jit else checked_fn
