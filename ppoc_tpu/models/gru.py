"""Recurrent trunk: a GRU encoder + dense MLP head.

The framework's third model family (after the dense MLP, models/mlp.py, and
the mixture-of-experts trunk, models/moe.py).  The reference has no
recurrence — its policy/value nets are stateless MLPs over fully-observed
states (src/neural_network.cu, src/policy.cu) — but a complete PPO framework
needs memory for partially-observable tasks, so this extends the same trunk
slot (``policy_params["mlp"]`` / ``v_params``) with a structural kind that
rollouts and update phases dispatch on (algo/recurrent.py), exactly the way
MoE trunks do.

TPU shape: the per-step cell is three fused [B, D] @ [D, 3H] matmuls
(gates computed jointly so the MXU sees one wide GEMM per input/hidden);
sequence application is a ``lax.scan`` over time with episode-boundary
masking, so a whole [T, E] rollout window BPTTs as one compiled program.

Parameters (a dict so jax.tree utilities, the Adam optimizer, checkpointing
and shard_map specs all treat it like any other trunk):

  {"cell": {"wx": [in, 3H], "wh": [H, 3H], "b": [3H]},
   "head": mlp.Params}                                # [H, *hidden, out]

Gate layout along the 3H axis is (reset | update | candidate).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import mlp

GRUParams = Dict[str, object]


def is_rnn(params) -> bool:
    """Structural test: does this trunk pytree hold a recurrent cell?"""
    return isinstance(params, dict) and "cell" in params


def init(key: jax.Array, obs_dim: int, rnn_hidden: int,
         head_sizes: Sequence[int]) -> GRUParams:
    """GRU cell on the observation + MLP head over the hidden state.

    ``head_sizes`` is the full head layer list, e.g. (H, 128, 128, act).
    Cell weights use the reference's uniform fan-based scheme
    (src/neural_network.cu:40-51) with gain 1 — recurrent nets need the
    conservative gain or the hidden state saturates.
    """
    k_wx, k_wh, k_b, k_head = jax.random.split(key, 4)
    h = rnn_hidden

    def unif(k, fan_in, fan_out, shape):
        std = jnp.sqrt(2.0 / (fan_in + fan_out))
        bound = jnp.sqrt(3.0) * std
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    cell = {
        "wx": unif(k_wx, obs_dim, 3 * h, (obs_dim, 3 * h)),
        "wh": unif(k_wh, h, 3 * h, (h, 3 * h)),
        "b": jax.random.uniform(
            k_b, (3 * h,), jnp.float32,
            -1.0 / jnp.sqrt(obs_dim), 1.0 / jnp.sqrt(obs_dim)),
    }
    return {"cell": cell, "head": mlp.init(k_head, head_sizes)}


def hidden_size(params: GRUParams) -> int:
    return params["cell"]["wh"].shape[0]


def initial_state(params: GRUParams, batch_shape: Tuple[int, ...]) -> jax.Array:
    return jnp.zeros((*batch_shape, hidden_size(params)), jnp.float32)


def cell_step(params: GRUParams, h: jax.Array, x: jax.Array) -> jax.Array:
    """One GRU step: h' given hidden h [.., H] and input x [.., in]."""
    c = params["cell"]
    H = c["wh"].shape[0]
    gx = x @ c["wx"] + c["b"]
    gh = h @ c["wh"]
    r = jax.nn.sigmoid(gx[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gx[..., H:2 * H] + gh[..., H:2 * H])
    n = jnp.tanh(gx[..., 2 * H:] + r * gh[..., 2 * H:])
    return (1.0 - z) * n + z * h


def head_apply(params: GRUParams, h: jax.Array, activation: str) -> jax.Array:
    return mlp.apply(params["head"], h, activation, "jnp")


def step(params: GRUParams, h: jax.Array, x: jax.Array,
         activation: str) -> Tuple[jax.Array, jax.Array]:
    """One trunk step: (new hidden, head output)."""
    h2 = cell_step(params, h, x)
    return h2, head_apply(params, h2, activation)


def apply_seq(
    params: GRUParams,
    xs: jax.Array,            # [T, ..., in]
    reset_after: jax.Array,   # [T, ...] bool: episode ended AT step t, so the
                              # hidden feeding step t+1 restarts from zero
    activation: str,
    h0: jax.Array = None,     # [..., H]; zeros when None (window start)
) -> jax.Array:
    """Head outputs [T, ..., out] for a whole window, BPTT through time.

    The recurrence is masked at episode boundaries: the auto-reset rollout
    (envs/core.vector_autoreset_step) starts a fresh episode in the same
    lane after a done flag, and a fresh episode must not see its
    predecessor's memory.
    """
    if h0 is None:
        # derive the zero state from the inputs so it inherits their
        # device-varying type under shard_map (a plain jnp.zeros would be
        # replicated and fail the scan's carry typecheck on a dp mesh)
        h0 = initial_state(params, xs.shape[1:-1]) + 0.0 * xs[0, ..., :1]

    def body(h, inp):
        x_t, done_t = inp
        h2 = cell_step(params, h, x_t)
        y = head_apply(params, h2, activation)
        keep = jnp.logical_not(done_t)[..., None].astype(h2.dtype)
        return h2 * keep, y

    _, ys = jax.lax.scan(body, h0, (xs, reset_after))
    return ys
