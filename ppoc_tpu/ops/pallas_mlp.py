"""Fused MLP forward/backward as Pallas TPU kernels with a custom VJP.

This is the native-kernel parity component for the reference's hand-written
compute path (``src/mat_mul.cu:132-217`` cuBLAS GEMM wrappers,
``src/neural_network.cu:74-161`` forward/backward orchestration,
``src/activation_function.cu`` ReLU kernels): instead of one GEMM launch +
bias kernel + activation kernel per layer with intermediate HBM traffic, the
entire MLP is ONE Pallas kernel per direction.

Design (see the TPU kernel guide):
  * Grid over batch tiles only. All weights are tiny (<=128x128 for the
    reference nets, 64 KiB each in f32) and live in VMEM for the whole
    kernel; per-tile activations never leave VMEM between layers, so HBM
    traffic is exactly one read of ``x`` + one write per saved activation.
  * Matmuls use ``jnp.dot(..., preferred_element_type=f32)`` so they map to
    the MXU; bias-add and activation fuse into the same kernel on the VPU
    (the reference needs separate add_bias_kernel / ReLU kernels,
    src/mat_mul.cu:122-130, src/activation_function.cu:17-31).
  * Backward is one kernel too: weight/bias gradients accumulate across the
    sequential TPU grid into VMEM-resident output blocks (constant
    index_map, zero-init at program 0) — the Pallas idiom replacing the
    reference's beta=1 cuBLAS accumulation (src/mat_mul.cu:67-79) and
    sum_bias_gradients_kernel (src/neural_network.cu:108-118).
  * Batch padding: inputs and cotangents are zero-padded to a tile multiple.
    Zero cotangent rows contribute exactly zero to every dW/db, so no
    in-kernel masking is needed; padded output rows are sliced off.
  * ReLU'/tanh' are computed from the SAVED POST-ACTIVATION (h>0 resp.
    1-h^2), so only one residual per hidden layer is stored — same trick as
    the reference's in-place ReLU_derivative on the cached activation
    (src/activation_function.cu:33-43).

Off-TPU the kernels run in Pallas interpret mode so the CPU test suite
exercises the same code path (the jnp twin in models/mlp.py is the
cross-check, mirroring the reference's naive-kernel-vs-cuBLAS duality).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = List[Tuple[jax.Array, jax.Array]]  # [(W [din,dout], b [dout]), ...]

_MAX_TILE_B = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _act(h: jax.Array, activation: str) -> jax.Array:
    if activation == "relu":
        return jnp.maximum(h, 0.0)
    if activation == "tanh":
        return jnp.tanh(h)
    if activation == "none":
        return h
    raise ValueError(f"unknown activation '{activation}'")


def _act_grad_from_out(h_out: jax.Array, activation: str) -> jax.Array:
    """Activation derivative from the post-activation value."""
    if activation == "relu":
        return (h_out > 0).astype(h_out.dtype)
    if activation == "tanh":
        return 1.0 - jnp.square(h_out)
    return jnp.ones_like(h_out)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_b(batch: int) -> int:
    return min(_MAX_TILE_B, _round_up(batch, 8))


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(activation: str, n_layers: int, x_ref, *refs):
    """One batch tile through every layer; saves hidden post-activations."""
    w_refs = refs[: 2 * n_layers]           # W1, b1, ..., Wn, bn
    out_ref = refs[2 * n_layers]
    h_refs = refs[2 * n_layers + 1 :]       # hidden activations (n_layers - 1)

    h = x_ref[:]
    for i in range(n_layers):
        w = w_refs[2 * i][:]
        b = w_refs[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = _act(h, activation)
            h_refs[i][:] = h
    out_ref[:] = h


def _forward_padded(params: Params, xp: jax.Array, activation: str):
    """Run the fused forward on a padded 2-D batch. Returns (out, hiddens)."""
    bp, d0 = xp.shape
    tile_b = _tile_b(bp)
    grid = (bp // tile_b,)
    n_layers = len(params)
    dims = [d0] + [w.shape[1] for w, _ in params]

    batch_spec = lambda d: pl.BlockSpec(  # noqa: E731
        (tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    in_specs = [batch_spec(d0)]
    inputs = [xp]
    for w, b in params:
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        inputs += [w, b.reshape(1, -1)]

    out_shapes = [jax.ShapeDtypeStruct((bp, dims[-1]), jnp.float32)] + [
        jax.ShapeDtypeStruct((bp, dims[i + 1]), jnp.float32)
        for i in range(n_layers - 1)
    ]
    out_specs = [batch_spec(dims[-1])] + [
        batch_spec(dims[i + 1]) for i in range(n_layers - 1)
    ]

    flops = 2 * bp * sum(dims[i] * dims[i + 1] for i in range(n_layers))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, activation, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (bp * sum(dims) + sum(w.size + b.size for w, b in params)),
            transcendentals=bp * sum(dims[1:-1]) if activation == "tanh" else 0,
        ),
        interpret=_interpret(),
    )(*inputs)
    return outs[0], list(outs[1:])


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(activation: str, n_layers: int, g_ref, x_ref, *refs):
    """Backprop one batch tile; accumulate dW/db across the sequential grid."""
    h_refs = refs[: n_layers - 1]
    w_refs = refs[n_layers - 1 : 2 * n_layers - 1]
    dx_ref = refs[2 * n_layers - 1]
    grad_refs = refs[2 * n_layers :]        # dW1, db1, ..., dWn, dbn

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in grad_refs:
            r[:] = jnp.zeros(r.shape, r.dtype)

    g = g_ref[:]
    for l in range(n_layers - 1, -1, -1):
        a_in = x_ref[:] if l == 0 else h_refs[l - 1][:]
        # dW_l += a_in^T @ g   (MXU), db_l += colsum(g)  (VPU)
        grad_refs[2 * l][:] += jax.lax.dot_general(
            a_in, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grad_refs[2 * l + 1][:] += jnp.sum(g, axis=0, keepdims=True)
        # dz_{l-1} = (g @ W_l^T) * act'(h_{l-1});  for l==0 this is dx
        g = jax.lax.dot_general(
            g, w_refs[l][:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l > 0:
            g = g * _act_grad_from_out(h_refs[l - 1][:], activation)
    dx_ref[:] = g


def _backward_padded(params: Params, xp: jax.Array, hiddens, gp: jax.Array,
                     activation: str):
    bp, d0 = xp.shape
    tile_b = _tile_b(bp)
    grid = (bp // tile_b,)
    n_layers = len(params)
    dims = [d0] + [w.shape[1] for w, _ in params]

    batch_spec = lambda d: pl.BlockSpec(  # noqa: E731
        (tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    in_specs = [batch_spec(dims[-1]), batch_spec(d0)]
    inputs = [gp, xp]
    for i in range(n_layers - 1):
        in_specs.append(batch_spec(dims[i + 1]))
        inputs.append(hiddens[i])
    for w, _ in params:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        inputs.append(w)

    out_shapes = [jax.ShapeDtypeStruct((bp, d0), jnp.float32)]
    out_specs = [batch_spec(d0)]
    for w, b in params:
        out_shapes += [
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    flops = 6 * bp * sum(dims[i] * dims[i + 1] for i in range(n_layers))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, activation, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * bp * sum(dims) + 2 * sum(w.size + b.size for w, b in params)),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*inputs)

    dx = outs[0]
    dparams = [
        (outs[1 + 2 * i], outs[2 + 2 * i].reshape(-1)) for i in range(n_layers)
    ]
    return dparams, dx


# ---------------------------------------------------------------------------
# public custom-VJP op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mlp_forward(params: Params, x: jax.Array, activation: str = "relu") -> jax.Array:
    """Fused-MLP forward on a batch ``x`` of shape [..., fan_in].

    Hidden layers use ``activation``; the last layer is linear — identical
    semantics to :func:`ppoc_tpu.models.mlp.apply` with backend="jnp".
    """
    out, _ = _mlp_fwd(params, x, activation)
    return out


def _mlp_fwd(params: Params, x: jax.Array, activation: str):
    lead = x.shape[:-1]
    d0 = x.shape[-1]
    x2 = x.reshape(-1, d0)
    b = x2.shape[0]
    bp = _round_up(b, _tile_b(b))
    xp = _pad_rows(x2, bp)
    out, hiddens = _forward_padded(params, xp, activation)
    d_out = out.shape[-1]
    return out[:b].reshape(*lead, d_out), (params, xp, hiddens, b, lead)


def _mlp_bwd(activation: str, res, g: jax.Array):
    params, xp, hiddens, b, lead = res
    d_out = g.shape[-1]
    gp = _pad_rows(g.reshape(-1, d_out), xp.shape[0])
    dparams, dxp = _backward_padded(params, xp, hiddens, gp, activation)
    dx = dxp[:b].reshape(*lead, xp.shape[-1])
    return dparams, dx


mlp_forward.defvjp(_mlp_fwd, _mlp_bwd)
