"""Environment engine: pure-JAX vectorized environments.

Replaces reference components 13-15 (``src/env.c``, ``src/gym_env.c``,
``scripts/gym_env.py``): instead of one host environment stepped through an
embedded CPython bridge, environments are pure functions vectorized on
device.  Host-side environments (Gymnasium, native C++) remain available
through :mod:`ppoc_tpu.envs.gym_bridge` and :mod:`ppoc_tpu.envs.native`.
"""
from .core import Env, EnvSpec, make, register, registry, vector_autoreset_step, vector_reset, vector_step
from . import pendulum as _pendulum  # noqa: F401  (registers "pendulum")
from . import simple as _simple      # noqa: F401  (registers "simple")
from . import cartpole as _cartpole  # noqa: F401  (registers "cartpole")
from . import mountain_car as _mountain_car  # noqa: F401 (registers "mountain_car")
from . import acrobot as _acrobot    # noqa: F401  (registers "acrobot")
from . import reacher as _reacher    # noqa: F401  (registers "reacher")
from . import wrappers as _wrappers  # noqa: F401  (registers "mountain_car_norm", "pendulum_po")
from . import recall as _recall      # noqa: F401  (registers "recall")


def make_for(cfg) -> Env:
    """Build the env a config describes: the registry env, wrapped in the
    config-carried affine observation normalization when ``cfg.obs_loc`` is
    set (envs/wrappers.affine_obs — usually from wrappers.calibrate).  The
    single construction point for Trainer, sweeps and serving, so the
    normalization can never apply in one consumer and not another."""
    env = make(cfg.env)
    loc = getattr(cfg, "obs_loc", ())
    scale = getattr(cfg, "obs_scale", ())
    if bool(loc) != bool(scale):
        raise ValueError(
            "obs_loc and obs_scale must be set together (one without the "
            "other would silently skip normalization)")
    if loc:
        from .wrappers import affine_obs

        if len(loc) != env.spec.obs_dim or len(scale) != len(loc):
            raise ValueError(
                f"obs_loc/obs_scale must have length obs_dim "
                f"({env.spec.obs_dim}), got {len(loc)}/{len(scale)}")
        if any(s == 0.0 for s in scale):
            raise ValueError(
                f"obs_scale contains a zero (division by zero in the "
                f"affine map): {scale}")
        env = affine_obs(env, loc, scale)
    return env


__all__ = [
    "Env",
    "EnvSpec",
    "make",
    "make_for",
    "register",
    "registry",
    "vector_reset",
    "vector_step",
    "vector_autoreset_step",
]
