"""Fused training-phase kernels: the whole minibatch-Adam loop in one
Pallas program with weights and optimizer moments resident in VMEM.

This is the hand-kernel ethos of the reference taken where it actually pays
on TPU.  The reference launches ~10 kernels per minibatch step (gather, 2
GEMMs + bias + ReLU per layer, loss, backward GEMMs, adam_update —
src/ppo.cu:491-533); the XLA scan equivalent keeps params, moments and
minibatch data flowing HBM<->VMEM on every one of the ~350 sequential steps
of a fit's value phase.  At PPO's layer sizes (<=256-wide MLPs) those steps
are bandwidth/overhead-bound, not FLOP-bound, so the win is not bigger
matmuls — it is *never letting the working set leave VMEM*:

  * grid = (steps, sub_tiles): the sequential TPU grid walks minibatch
    steps; params + Adam m/v live in VMEM-resident, input-aliased output
    blocks (constant index maps) across the WHOLE phase — zero param HBM
    traffic between steps;
  * minibatch rows stream through double-buffered input blocks (Pallas
    pipelines the next sub-tile's DMA under the current tile's compute);
  * forward, loss gradient, backward and the Adam update (eps outside the
    sqrt, bias correction in the step size — src/adam.cu:53-74) fuse into
    one kernel invocation per sub-tile;
  * gradients accumulate in VMEM scratch over sub-tiles; the parameter
    update applies on each step's last sub-tile, so larger minibatches
    never blow the ~16 MB VMEM budget.

Numerics are IDENTICAL to the generic path (ops/adam.py + autodiff of
losses.value_loss) up to float-reduction order: same permutations (the
caller pre-gathers with buffer.permutation_minibatches under the same
keys), same update order, same Adam timestep sequence.  Cross-checked
against the jnp twin in tests/test_pallas_update.py.

Data parallelism: at the latency-bound minibatch sizes where these kernels
win, sharding the update is the wrong parallelism — the scan path pays
(n_epochs_value + n_epochs_policy) * n_mb per-minibatch gradient pmeans
(644 collective latencies per fit on the reference schedule) to split
GEMMs that are overhead-bound anyway.  Under dp the phases therefore
REPLICATE (algo/ppo._fused_dp_ready): one all_gather of the small row
buffer, every shard runs this identical kernel under a shard-common
permutation key, and the provably identical results re-type as replicated
via pmax — zero per-minibatch collectives, bit-equal to the single-device
fused phase on the gathered buffer (tests/test_pallas_update.py
::test_fused_dp_*).  Rollouts stay sharded (that is where work scales).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppoc_tpu.data import buffer as buffer_mod
from ppoc_tpu.ops.adam import AdamState

Params = List[Tuple[jax.Array, jax.Array]]

_MAX_TILE = 2048  # sub-tile rows: bounds VMEM for activations

# Large-minibatch (throughput) regime: bf16 MXU matmuls with f32 master
# weights/moments/accumulation.  Activations halve, so sub-tiles double.
# NOT wired into algo/ppo's gating: the round-5 resolution of the
# large-minibatch regime was shuffle_block (block-shuffled minibatches make
# the XLA scan faster than these kernels too — docs/RESULTS.md r5), so the
# bf16 big-tile kernels stay in-tree as the measured, tested alternative
# (tests/test_bigmb.py pins their exactness); bigmb_ok has no production
# caller.
_MAX_TILE_BF16 = 4096
# conservative scoped-VMEM cap for the bf16 big-tile cells (~17 MB live at
# tile 4096 with 2x256 trunks; Mosaic's stack estimate needs headroom —
# 64 MB caused a pathological compile on the rollout kernel, 24-40 is safe)
_BF16_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024)


def bigmb_ok(mb: int) -> bool:
    """Can the bf16 throughput kernels tile this minibatch?  Requires a
    row tile of >= 1024 aligned rows (tiny tiles would re-enter the
    latency-bound regime the f32 kernels already own)."""
    return mb > _MAX_TILE and any(mb % t == 0 for t in (4096, 2048, 1024))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# vma-inheriting output struct, shared with pallas_attn (ops/_pallas_common)
from ppoc_tpu.ops._pallas_common import sds as _sds


def _act(h, activation):
    if activation == "relu":
        return jnp.maximum(h, 0.0)
    if activation == "tanh":
        return jnp.tanh(h)
    return h


def _act_grad(h_out, activation):
    if activation == "relu":
        return (h_out > 0).astype(h_out.dtype)
    if activation == "tanh":
        return 1.0 - jnp.square(h_out)
    return jnp.ones_like(h_out)


def _pow(base: float, t):
    """base**t for traced float t (base in (0,1))."""
    import math

    return jnp.exp(t * math.log(base))


def _value_kernel(activation: str, n_layers: int, n_sub: int, mb: int,
                  lr: float, b1: float, b2: float, eps: float, bf16: bool,
                  x_ref, t_ref, tgt_ref, *refs):
    """One (step, sub-tile) cell: fwd + MSE grad + bwd + (last tile) Adam."""
    # refs layout: 6*n_layers ALIASED INPUT refs, then the
    # [W,b,mW,mb_,vW,vb]*n_layers output refs we read AND write, then
    # loss_ref, then scratch dW/db per layer.
    n_par = 6 * n_layers
    in_par = refs[:n_par]
    par = refs[n_par: 2 * n_par]
    loss_ref = refs[2 * n_par]
    scratch = refs[2 * n_par + 1:]

    step_i = pl.program_id(0)
    sub_j = pl.program_id(1)

    @pl.when(jnp.logical_and(step_i == 0, sub_j == 0))
    def _():
        loss_ref[0, 0] = 0.0
        # compiled Pallas does NOT pre-fill output VMEM blocks from their
        # aliased inputs (interpret mode does) — seed them explicitly
        for src, dst in zip(in_par, par):
            dst[:] = src[:]

    @pl.when(sub_j == 0)
    def _():
        for s in scratch:
            s[:] = jnp.zeros(s.shape, s.dtype)

    w_refs = [par[6 * l + 0] for l in range(n_layers)]
    b_refs = [par[6 * l + 1] for l in range(n_layers)]

    # forward on this sub-tile, keeping post-activations
    x = x_ref[:]
    hs = _fwd_refs(x, w_refs, b_refs, n_layers, activation, bf16)

    v = hs[-1]                     # [tile, 1]
    diff = v - tgt_ref[:]
    loss_ref[0, 0] += jnp.sum(jnp.square(diff))
    g = (2.0 / mb) * diff          # d(mean sq err over the FULL minibatch)

    # backward, accumulating into scratch across sub-tiles
    for l in range(n_layers - 1, -1, -1):
        a_in = x if l == 0 else hs[l - 1]
        scratch[2 * l][:] += jax.lax.dot_general(
            _c(a_in, bf16), _c(g, bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scratch[2 * l + 1][:] += jnp.sum(g, axis=0, keepdims=True)
        if l > 0:
            g = jax.lax.dot_general(
                _c(g, bf16), _c(w_refs[l][:], bf16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * _act_grad(hs[l - 1].astype(jnp.float32), activation)

    # Adam on the completed minibatch gradient (src/adam.cu:53-74 formulas)
    @pl.when(sub_j == n_sub - 1)
    def _():
        t = (t_ref[0, 0] + step_i + 1).astype(jnp.float32)
        bc1 = 1.0 - _pow(b1, t)
        bc2 = 1.0 - _pow(b2, t)
        step_size = lr / bc1
        for l in range(n_layers):
            for k, grad in ((0, scratch[2 * l][:]), (1, scratch[2 * l + 1][:])):
                p_ref = par[6 * l + k]
                m_ref = par[6 * l + 2 + k]
                v_ref = par[6 * l + 4 + k]
                m2 = b1 * m_ref[:] + (1.0 - b1) * grad
                v2 = b2 * v_ref[:] + (1.0 - b2) * jnp.square(grad)
                m_ref[:] = m2
                v_ref[:] = v2
                p_ref[:] = p_ref[:] - step_size * m2 / (
                    jnp.sqrt(v2 / bc2) + eps
                )


def _c(a, bf16: bool):
    """Cast a dot operand to bf16 in the throughput regime (f32 noop
    otherwise).  Accumulation stays f32 via preferred_element_type."""
    return a.astype(jnp.bfloat16) if bf16 else a


def _fwd_refs(x, w_refs, b_refs, n_layers, activation, bf16: bool = False):
    """Forward through VMEM-resident weights, returning post-activations.

    bf16=True runs every GEMM with bf16 operands and f32 accumulation
    (the models/mlp.py "bf16" backend recipe); HIDDEN post-activations are
    stored bf16 — numerically identical to the per-dot input cast (the
    next dot would cast them anyway) and half the VMEM — while the final
    layer's output stays f32 for the loss math."""
    hs = []
    h = x
    for l in range(n_layers):
        h = jnp.dot(_c(h, bf16), _c(w_refs[l][:], bf16),
                    preferred_element_type=jnp.float32) + b_refs[l][:]
        if l < n_layers - 1:
            h = _act(h, activation)
            if bf16:
                h = h.astype(jnp.bfloat16)
        hs.append(h)
    return hs


def _bwd_from_g(x, hs, g, w_refs, n_layers, activation, bf16: bool = False):
    """Backward from output cotangent g; returns flat [dW0, db0, ...]."""
    grads = [None] * (2 * n_layers)
    for l in range(n_layers - 1, -1, -1):
        a_in = x if l == 0 else hs[l - 1]
        grads[2 * l] = jax.lax.dot_general(
            _c(a_in, bf16), _c(g, bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grads[2 * l + 1] = jnp.sum(g, axis=0, keepdims=True)
        if l > 0:
            g = jax.lax.dot_general(
                _c(g, bf16), _c(w_refs[l][:], bf16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * _act_grad(hs[l - 1].astype(jnp.float32), activation)
    return grads


def _adam_refs(par, grads, n_layers, t, lr, b1, b2, eps):
    """In-place Adam on the [W,b,mW,mb,vW,vb]*n_layers ref layout."""
    bc1 = 1.0 - _pow(b1, t)
    bc2 = 1.0 - _pow(b2, t)
    step_size = lr / bc1
    for l in range(n_layers):
        for k in (0, 1):
            grad = grads[2 * l + k]
            p_ref = par[6 * l + k]
            m_ref = par[6 * l + 2 + k]
            v_ref = par[6 * l + 4 + k]
            m2 = b1 * m_ref[:] + (1.0 - b1) * grad
            v2 = b2 * v_ref[:] + (1.0 - b2) * jnp.square(grad)
            m_ref[:] = m2
            v_ref[:] = v2
            p_ref[:] = p_ref[:] - step_size * m2 / (jnp.sqrt(v2 / bc2) + eps)


def _value_kernel_unrolled(activation: str, n_layers: int, U: int, mb: int,
                           lr: float, b1: float, b2: float, eps: float,
                           x_ref, t_ref, tgt_ref, *refs):
    """Fast path for whole-minibatch tiles (n_sub == 1): U complete
    minibatch iterations (fwd + bwd + Adam each) per grid cell.  A grid
    step costs ~10 us of sequencing overhead on this chip — at reference
    minibatch sizes that overhead dominates the math, so amortizing it
    over U minibatches is most of the phase's remaining time."""
    n_par = 6 * n_layers
    in_par = refs[:n_par]
    par = refs[n_par: 2 * n_par]
    loss_ref = refs[2 * n_par]
    cell = pl.program_id(0)

    @pl.when(cell == 0)
    def _():
        loss_ref[0, 0] = 0.0
        for src, dst in zip(in_par, par):
            dst[:] = src[:]

    w_refs = [par[6 * l + 0] for l in range(n_layers)]
    b_refs = [par[6 * l + 1] for l in range(n_layers)]

    for u in range(U):
        x = x_ref[u * mb: (u + 1) * mb, :]
        tgt = tgt_ref[u * mb: (u + 1) * mb, :]
        hs = _fwd_refs(x, w_refs, b_refs, n_layers, activation)
        diff = hs[-1] - tgt
        loss_ref[0, 0] += jnp.sum(jnp.square(diff))
        g = (2.0 / mb) * diff
        grads = _bwd_from_g(x, hs, g, w_refs, n_layers, activation)
        t = (t_ref[0, 0] + cell * U + u + 1).astype(jnp.float32)
        _adam_refs(par, grads, n_layers, t, lr, b1, b2, eps)


def _stream_ids(cfg, key, n_rows: int, n_mb: int, mb: int, n_epochs: int):
    """The phase's flat gather ids + granularity: row ids (reference-exact
    shuffle) or block ids when cfg.shuffle_block is set (the bandwidth-wall
    fix — data/buffer.block_permutation_minibatches)."""
    blk = getattr(cfg, "shuffle_block", 0)
    keys = jax.random.split(key, n_epochs)
    make = (functools.partial(buffer_mod.block_permutation_minibatches,
                              n_rows=n_rows, n_mb=n_mb, mb_size=mb, block=blk)
            if blk else
            functools.partial(buffer_mod.permutation_minibatches,
                              n_rows=n_rows, n_mb=n_mb, mb_size=mb))
    idx = jnp.concatenate([make(k) for k in keys], axis=0)
    return idx.reshape(-1), blk


def _pick_unroll(n_steps: int, mb: int) -> int:
    """Largest divisor of n_steps (<= 8) whose U*mb block stays small."""
    cap = max(1, min(8, _MAX_TILE // max(mb, 1)))
    for u in range(cap, 0, -1):
        if n_steps % u == 0:
            return u
    return 1


def _phase_layout(n_steps: int, mb: int, max_tile: int = _MAX_TILE,
                  allow_unroll: bool = True):
    """Shared grid/BlockSpec construction for all three phase builders.

    Returns (U, n_sub, tile, row_spec, const, smem, grid): U > 1 selects the
    unrolled 1-D grid (U whole minibatches per cell); otherwise the
    (step, sub-tile) 2-D grid with VMEM-bounded sub-tiles.  The bf16
    throughput path passes max_tile=_MAX_TILE_BF16 (half-size activations)
    and allow_unroll=False (its minibatches never fit one tile anyway).
    """
    tile = mb if mb <= max_tile else max(
        d for d in range(1, max_tile + 1) if mb % d == 0
    )
    n_sub = mb // tile
    U = _pick_unroll(n_steps, mb) if (n_sub == 1 and allow_unroll) else 1
    if U > 1:
        row_spec = lambda d: pl.BlockSpec(  # noqa: E731
            (U * mb, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        grid = (n_steps // U,)
    else:
        row_spec = lambda d: pl.BlockSpec(  # noqa: E731
            (tile, d), lambda i, j: (i * n_sub + j, 0),
            memory_space=pltpu.VMEM)
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i, j: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
        grid = (n_steps, n_sub)
    return U, n_sub, tile, row_spec, const, smem, grid


def _run_value_phase(params: Params, opt: AdamState, obs_seq, tgt_seq,
                     n_steps: int, mb: int, activation: str,
                     lr: float, b1: float, b2: float, eps: float,
                     bf16: bool = False):
    """obs_seq [n_steps*mb, d0], tgt_seq [n_steps*mb, 1] pre-gathered in
    minibatch order.  Returns (params', opt', loss_sum)."""
    d0 = obs_seq.shape[-1]
    n_layers = len(params)
    dims = [d0] + [w.shape[1] for w, _ in params]
    U, n_sub, tile, row_spec, const, smem_spec, grid = _phase_layout(
        n_steps, mb, _MAX_TILE_BF16 if bf16 else _MAX_TILE,
        allow_unroll=not bf16)
    if U > 1:
        kernel = functools.partial(_value_kernel_unrolled, activation,
                                   n_layers, U, mb, lr, b1, b2, eps)
    else:
        kernel = functools.partial(_value_kernel, activation, n_layers,
                                   n_sub, mb, lr, b1, b2, eps, bf16)

    inputs = [obs_seq, jnp.asarray(opt.t, jnp.int32).reshape(1, 1), tgt_seq]
    in_specs = [row_spec(d0), smem_spec, row_spec(1)]
    out_shapes, out_specs, aliases = [], [], {}
    flat_par = []
    for l, (w, b) in enumerate(params):
        mw, mb_ = jax.tree.leaves(opt.m)[2 * l], jax.tree.leaves(opt.m)[2 * l + 1]
        vw, vb = jax.tree.leaves(opt.v)[2 * l], jax.tree.leaves(opt.v)[2 * l + 1]
        for arr in (w, b.reshape(1, -1), mw, mb_.reshape(1, -1),
                    vw, vb.reshape(1, -1)):
            aliases[len(inputs)] = len(out_shapes)
            inputs.append(arr)
            in_specs.append(const(arr.shape))
            out_shapes.append(_sds(arr.shape, jnp.float32, inputs))
            out_specs.append(const(arr.shape))
            flat_par.append(arr)
    # loss accumulator
    out_shapes.append(_sds((1, 1), jnp.float32, inputs))
    out_specs.append(smem_spec)

    scratch = []
    if U == 1:
        for l in range(n_layers):
            scratch.append(pltpu.VMEM((dims[l], dims[l + 1]), jnp.float32))
            scratch.append(pltpu.VMEM((1, dims[l + 1]), jnp.float32))

    flops = n_steps * 6 * mb * sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * obs_seq.size + 4 * tgt_seq.size,
            transcendentals=0,
        ),
        compiler_params=_BF16_PARAMS if bf16 else None,
        interpret=_interpret(),
    )(*inputs)

    new_params, new_m, new_v = [], [], []
    for l in range(n_layers):
        w, b, mw, mb_, vw, vb = outs[6 * l: 6 * l + 6]
        new_params.append((w, b.reshape(-1)))
        new_m.append((mw, mb_.reshape(-1)))
        new_v.append((vw, vb.reshape(-1)))
    loss_sum = outs[-1][0, 0]
    new_opt = AdamState(m=new_m, v=new_v,
                        t=opt.t + jnp.int32(n_steps))
    return new_params, new_opt, loss_sum


def _policy_kernel_unrolled(activation: str, n_layers: int, U: int, mb: int,
                            k_act: int, lr: float, b1: float, b2: float,
                            eps: float, clip_eps: float, ent_coeff: float,
                            x_ref, tp_ref, tl_ref, a_ref, lp_ref, adv_ref,
                            *refs):
    """Unrolled Gaussian policy phase (whole-minibatch tiles): U complete
    minibatch iterations per grid cell — see _value_kernel_unrolled."""
    import math

    n_in = 6 * n_layers + 3
    in_par = refs[:n_in]
    out = refs[n_in:]
    par = out[: 6 * n_layers]
    ls_ref, mls_ref, vls_ref = out[6 * n_layers: 6 * n_layers + 3]
    loss_ref = out[6 * n_layers + 3]
    ent_ref = out[6 * n_layers + 4]
    cell = pl.program_id(0)

    @pl.when(cell == 0)
    def _():
        loss_ref[0, 0] = 0.0
        ent_ref[0, 0] = 0.0
        for src, dst in zip(in_par, out[: n_in]):
            dst[:] = src[:]

    w_refs = [par[6 * l + 0] for l in range(n_layers)]
    b_refs = [par[6 * l + 1] for l in range(n_layers)]

    for u in range(U):
        sl = slice(u * mb, (u + 1) * mb)
        x = x_ref[sl, :]
        a = a_ref[sl, :]
        lp_old = lp_ref[sl, :]
        adv = adv_ref[sl, :]
        ls = ls_ref[:]

        ent = 0.5 * k_act * (1.0 + math.log(2.0 * math.pi)) + jnp.sum(ls)
        ent_ref[0, 0] += ent
        loss_ref[0, 0] += -ent_coeff * ent

        hs = _fwd_refs(x, w_refs, b_refs, n_layers, activation)
        mu = hs[-1]
        inv_sigma = jnp.exp(-ls)
        z = (a - mu) * inv_sigma
        logp = (-0.5 * k_act * math.log(2.0 * math.pi) - jnp.sum(ls)
                - 0.5 * jnp.sum(jnp.square(z), axis=1, keepdims=True))
        ratio = jnp.exp(logp - lp_old)
        clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
        surr = jnp.minimum(ratio * adv, clipped * adv)
        loss_ref[0, 0] += -jnp.sum(surr) / mb
        ind = (ratio * adv <= clipped * adv).astype(jnp.float32)
        dlogp = -(adv * ratio / mb) * ind

        gls = jnp.sum(dlogp * (jnp.square(z) - 1.0), axis=0,
                      keepdims=True) - ent_coeff
        g = dlogp * z * inv_sigma
        grads = _bwd_from_g(x, hs, g, w_refs, n_layers, activation)

        t = (tp_ref[0, 0] + cell * U + u + 1).astype(jnp.float32)
        _adam_refs(par, grads, n_layers, t, lr, b1, b2, eps)
        tl = (tl_ref[0, 0] + cell * U + u + 1).astype(jnp.float32)
        bc1l = 1.0 - _pow(b1, tl)
        bc2l = 1.0 - _pow(b2, tl)
        m2 = b1 * mls_ref[:] + (1.0 - b1) * gls
        v2 = b2 * vls_ref[:] + (1.0 - b2) * jnp.square(gls)
        mls_ref[:] = m2
        vls_ref[:] = v2
        ls_ref[:] = ls_ref[:] - (lr / bc1l) * m2 / (jnp.sqrt(v2 / bc2l) + eps)


def _policy_kernel_cat_unrolled(activation: str, n_layers: int, U: int,
                                mb: int, k_act: int, lr: float, b1: float,
                                b2: float, eps: float, clip_eps: float,
                                ent_coeff: float,
                                x_ref, tp_ref, a_ref, lp_ref, adv_ref, *refs):
    """Unrolled categorical policy phase — see _value_kernel_unrolled."""
    n_in = 6 * n_layers
    in_par = refs[:n_in]
    out = refs[n_in:]
    par = out[:n_in]
    loss_ref = out[n_in]
    ent_ref = out[n_in + 1]
    cell = pl.program_id(0)

    @pl.when(cell == 0)
    def _():
        loss_ref[0, 0] = 0.0
        ent_ref[0, 0] = 0.0
        for src, dst in zip(in_par, par):
            dst[:] = src[:]

    w_refs = [par[6 * l + 0] for l in range(n_layers)]
    b_refs = [par[6 * l + 1] for l in range(n_layers)]

    for u in range(U):
        sl = slice(u * mb, (u + 1) * mb)
        x = x_ref[sl, :]
        a_idx = a_ref[sl, :].astype(jnp.int32)
        lp_old = lp_ref[sl, :]
        adv = adv_ref[sl, :]

        hs = _fwd_refs(x, w_refs, b_refs, n_layers, activation)
        logits = hs[-1]
        zmax = jnp.max(logits, axis=1, keepdims=True)
        lse = zmax + jnp.log(jnp.sum(jnp.exp(logits - zmax), axis=1,
                                     keepdims=True))
        logp_all = logits - lse
        p = jnp.exp(logp_all)
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        onehot = (cols == a_idx).astype(jnp.float32)
        logp = jnp.sum(onehot * logp_all, axis=1, keepdims=True)
        ratio = jnp.exp(logp - lp_old)
        clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
        surr = jnp.minimum(ratio * adv, clipped * adv)
        H = -jnp.sum(p * logp_all, axis=1, keepdims=True)
        loss_ref[0, 0] += (-jnp.sum(surr) - ent_coeff * jnp.sum(H)) / mb
        ent_ref[0, 0] += jnp.sum(H) / mb
        ind = (ratio * adv <= clipped * adv).astype(jnp.float32)
        dlogp = -(adv * ratio / mb) * ind
        g = dlogp * (onehot - p) + (ent_coeff / mb) * p * (logp_all + H)
        grads = _bwd_from_g(x, hs, g, w_refs, n_layers, activation)
        t = (tp_ref[0, 0] + cell * U + u + 1).astype(jnp.float32)
        _adam_refs(par, grads, n_layers, t, lr, b1, b2, eps)


def _policy_kernel(activation: str, n_layers: int, n_sub: int, mb: int,
                   k_act: int, lr: float, b1: float, b2: float, eps: float,
                   clip_eps: float, ent_coeff: float, bf16: bool,
                   x_ref, tp_ref, tl_ref, a_ref, lp_ref, adv_ref, *refs):
    """One (step, sub-tile) cell of the Gaussian policy phase: mu forward,
    clipped-surrogate gradient in closed form (grad flows only through the
    unclipped branch — src/ppo.cu:89-100), backward, and on the last
    sub-tile Adam for BOTH the mu net and log_std (their separate states,
    src/ppo.cu:19-25)."""
    import math

    # refs: 6*n_layers aliased mlp inputs + 3 aliased log_std inputs,
    # then outputs [W,b,mW,mb,vW,vb]*n_layers + [ls, m_ls, v_ls] +
    # loss_ref + ent_ref, then scratch dW/db per layer + d_ls.
    n_in = 6 * n_layers + 3
    in_par = refs[:n_in]
    out = refs[n_in:]
    par = out[: 6 * n_layers]
    ls_ref, mls_ref, vls_ref = out[6 * n_layers: 6 * n_layers + 3]
    loss_ref = out[6 * n_layers + 3]
    ent_ref = out[6 * n_layers + 4]
    scratch = refs[n_in + 6 * n_layers + 5:]

    step_i = pl.program_id(0)
    sub_j = pl.program_id(1)

    @pl.when(jnp.logical_and(step_i == 0, sub_j == 0))
    def _():
        loss_ref[0, 0] = 0.0
        ent_ref[0, 0] = 0.0
        # seed output VMEM blocks from their aliased inputs (see
        # _value_kernel — compiled Pallas does not pre-fill them)
        for src, dst in zip(in_par, out[: n_in]):
            dst[:] = src[:]

    @pl.when(sub_j == 0)
    def _():
        for s in scratch:
            s[:] = jnp.zeros(s.shape, s.dtype)

    w_refs = [par[6 * l + 0] for l in range(n_layers)]
    b_refs = [par[6 * l + 1] for l in range(n_layers)]
    ls = ls_ref[:]                               # [1, k]

    # closed-form Gaussian entropy (src/policy.cu:171-178); state-free, so
    # once per minibatch step
    @pl.when(sub_j == 0)
    def _():
        ent = 0.5 * k_act * (1.0 + math.log(2.0 * math.pi)) + jnp.sum(ls)
        ent_ref[0, 0] += ent
        loss_ref[0, 0] += -ent_coeff * ent

    # mu forward on this sub-tile
    x = x_ref[:]
    hs = _fwd_refs(x, w_refs, b_refs, n_layers, activation, bf16)
    mu = hs[-1]                                  # [tile, k]

    a = a_ref[:]
    inv_sigma = jnp.exp(-ls)                     # [1, k]
    z = (a - mu) * inv_sigma                     # [tile, k]
    logp = (-0.5 * k_act * math.log(2.0 * math.pi)
            - jnp.sum(ls) - 0.5 * jnp.sum(jnp.square(z), axis=1,
                                          keepdims=True))   # [tile, 1]
    adv = adv_ref[:]                             # [tile, 1]
    ratio = jnp.exp(logp - lp_ref[:])
    clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    surr = jnp.minimum(ratio * adv, clipped * adv)
    loss_ref[0, 0] += -jnp.sum(surr) / mb

    # d loss / d logp: only the unclipped branch carries gradient
    ind = (ratio * adv <= clipped * adv).astype(jnp.float32)
    dlogp = -(adv * ratio / mb) * ind            # [tile, 1]

    # log_std gradient:  d logp / d ls_j = z_j^2 - 1
    scratch[-1][:] += jnp.sum(dlogp * (jnp.square(z) - 1.0), axis=0,
                              keepdims=True)
    # mu gradient:  d logp / d mu_j = z_j * e^{-ls_j}
    g = dlogp * z * inv_sigma                    # [tile, k]

    for l in range(n_layers - 1, -1, -1):
        a_in = x if l == 0 else hs[l - 1]
        scratch[2 * l][:] += jax.lax.dot_general(
            _c(a_in, bf16), _c(g, bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scratch[2 * l + 1][:] += jnp.sum(g, axis=0, keepdims=True)
        if l > 0:
            g = jax.lax.dot_general(
                _c(g, bf16), _c(w_refs[l][:], bf16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * _act_grad(hs[l - 1].astype(jnp.float32), activation)

    @pl.when(sub_j == n_sub - 1)
    def _():
        # mu net Adam (opt_policy)
        t = (tp_ref[0, 0] + step_i + 1).astype(jnp.float32)
        bc1 = 1.0 - _pow(b1, t)
        bc2 = 1.0 - _pow(b2, t)
        step_size = lr / bc1
        for l in range(n_layers):
            for k, grad in ((0, scratch[2 * l][:]), (1, scratch[2 * l + 1][:])):
                p_ref = par[6 * l + k]
                m_ref = par[6 * l + 2 + k]
                v_ref = par[6 * l + 4 + k]
                m2 = b1 * m_ref[:] + (1.0 - b1) * grad
                v2 = b2 * v_ref[:] + (1.0 - b2) * jnp.square(grad)
                m_ref[:] = m2
                v_ref[:] = v2
                p_ref[:] = p_ref[:] - step_size * m2 / (
                    jnp.sqrt(v2 / bc2) + eps
                )
        # log_std Adam (opt_log_std); entropy bonus contributes -ent_coeff
        tl = (tl_ref[0, 0] + step_i + 1).astype(jnp.float32)
        bc1l = 1.0 - _pow(b1, tl)
        bc2l = 1.0 - _pow(b2, tl)
        gls = scratch[-1][:] - ent_coeff
        m2 = b1 * mls_ref[:] + (1.0 - b1) * gls
        v2 = b2 * vls_ref[:] + (1.0 - b2) * jnp.square(gls)
        mls_ref[:] = m2
        vls_ref[:] = v2
        ls_ref[:] = ls_ref[:] - (lr / bc1l) * m2 / (jnp.sqrt(v2 / bc2l) + eps)


def policy_phase_fused(cfg, policy_params, opt_policy: AdamState,
                       opt_log_std: AdamState, buf, key, bf16: bool = False):
    """Fused Gaussian policy phase (single device): all epochs x minibatches
    of mu-forward + closed-form surrogate gradient + backward + two Adams in
    one kernel.  Returns (policy_params', opt_policy', opt_log_std',
    mean_loss, mean_entropy).  bf16=True: see value_phase_fused."""
    params: Params = policy_params["mlp"]
    log_std = policy_params["log_std"]
    n_rows = buf.obs.shape[0]
    n_mb, mb = cfg.num_minibatches, cfg.minibatch_size
    flat, blk = _stream_ids(cfg, key, n_rows, n_mb, mb, cfg.n_epochs_policy)
    obs_seq, act_seq, lp_seq, adv_seq = buffer_mod.gather_mb(
        (buf.obs, buf.action, buf.log_prob, buf.advantage), flat, blk)
    lp_seq = lp_seq.reshape(-1, 1)
    adv_seq = adv_seq.reshape(-1, 1)
    n_steps = cfg.n_epochs_policy * n_mb

    d0 = obs_seq.shape[-1]
    k_act = act_seq.shape[-1]
    n_layers = len(params)
    dims = [d0] + [w.shape[1] for w, _ in params]
    U, n_sub, tile, row_spec, const, smem, grid = _phase_layout(
        n_steps, mb, _MAX_TILE_BF16 if bf16 else _MAX_TILE,
        allow_unroll=not bf16)
    if U > 1:
        kernel = functools.partial(
            _policy_kernel_unrolled, cfg.activation, n_layers, U, mb, k_act,
            cfg.lr_policy, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps,
            cfg.clip_eps, cfg.ent_coeff)
    else:
        kernel = functools.partial(
            _policy_kernel, cfg.activation, n_layers, n_sub, mb, k_act,
            cfg.lr_policy, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps,
            cfg.clip_eps, cfg.ent_coeff, bf16)

    inputs = [obs_seq,
              jnp.asarray(opt_policy.t, jnp.int32).reshape(1, 1),
              jnp.asarray(opt_log_std.t, jnp.int32).reshape(1, 1),
              act_seq, lp_seq, adv_seq]
    in_specs = [row_spec(d0), smem, smem, row_spec(k_act), row_spec(1),
                row_spec(1)]
    out_shapes, out_specs, aliases = [], [], {}
    m_leaves = jax.tree.leaves(opt_policy.m)
    v_leaves = jax.tree.leaves(opt_policy.v)
    for l, (w, b) in enumerate(params):
        for arr in (w, b.reshape(1, -1),
                    m_leaves[2 * l], m_leaves[2 * l + 1].reshape(1, -1),
                    v_leaves[2 * l], v_leaves[2 * l + 1].reshape(1, -1)):
            aliases[len(inputs)] = len(out_shapes)
            inputs.append(arr)
            in_specs.append(const(arr.shape))
            out_shapes.append(_sds(arr.shape, jnp.float32, inputs))
            out_specs.append(const(arr.shape))
    for arr in (log_std.reshape(1, -1),
                jax.tree.leaves(opt_log_std.m)[0].reshape(1, -1),
                jax.tree.leaves(opt_log_std.v)[0].reshape(1, -1)):
        aliases[len(inputs)] = len(out_shapes)
        inputs.append(arr)
        in_specs.append(const(arr.shape))
        out_shapes.append(_sds(arr.shape, jnp.float32, inputs))
        out_specs.append(const(arr.shape))
    # loss + entropy accumulators
    for _ in range(2):
        out_shapes.append(_sds((1, 1), jnp.float32, inputs))
        out_specs.append(smem)

    scratch = []
    if U == 1:
        for l in range(n_layers):
            scratch.append(pltpu.VMEM((dims[l], dims[l + 1]), jnp.float32))
            scratch.append(pltpu.VMEM((1, dims[l + 1]), jnp.float32))
        scratch.append(pltpu.VMEM((1, k_act), jnp.float32))   # d log_std

    flops = n_steps * 6 * mb * sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (obs_seq.size + act_seq.size
                                + lp_seq.size + adv_seq.size),
            transcendentals=n_steps * mb * 2,
        ),
        compiler_params=_BF16_PARAMS if bf16 else None,
        interpret=_interpret(),
    )(*inputs)

    new_params, new_m, new_v = [], [], []
    for l in range(n_layers):
        w, b, mw, mb_, vw, vb = outs[6 * l: 6 * l + 6]
        new_params.append((w, b.reshape(-1)))
        new_m.append((mw, mb_.reshape(-1)))
        new_v.append((vw, vb.reshape(-1)))
    ls, mls, vls = outs[6 * n_layers: 6 * n_layers + 3]
    loss_sum = outs[-2][0, 0]
    ent_sum = outs[-1][0, 0]
    new_pol = dict(policy_params)
    new_pol["mlp"] = new_params
    new_pol["log_std"] = ls.reshape(-1)
    t_inc = jnp.int32(n_steps)
    return (
        new_pol,
        AdamState(m=new_m, v=new_v, t=opt_policy.t + t_inc),
        AdamState(m=mls.reshape(-1), v=vls.reshape(-1),
                  t=opt_log_std.t + t_inc),
        loss_sum / n_steps,
        ent_sum / n_steps,
    )


def _policy_kernel_cat(activation: str, n_layers: int, n_sub: int, mb: int,
                       k_act: int, lr: float, b1: float, b2: float,
                       eps: float, clip_eps: float, ent_coeff: float,
                       x_ref, tp_ref, a_ref, lp_ref, adv_ref, *refs):
    """Categorical twin of _policy_kernel: softmax policy over k_act logits,
    closed-form surrogate + entropy-bonus gradient, one Adam (no log_std).
    The reference has no discrete path at all; this keeps the native-kernel
    coverage symmetric with the Gaussian family."""
    n_in = 6 * n_layers
    in_par = refs[:n_in]
    out = refs[n_in:]
    par = out[:n_in]
    loss_ref = out[n_in]
    ent_ref = out[n_in + 1]
    scratch = refs[n_in + n_in + 2:]

    step_i = pl.program_id(0)
    sub_j = pl.program_id(1)

    @pl.when(jnp.logical_and(step_i == 0, sub_j == 0))
    def _():
        loss_ref[0, 0] = 0.0
        ent_ref[0, 0] = 0.0
        for src, dst in zip(in_par, par):
            dst[:] = src[:]

    @pl.when(sub_j == 0)
    def _():
        for s in scratch:
            s[:] = jnp.zeros(s.shape, s.dtype)

    w_refs = [par[6 * l + 0] for l in range(n_layers)]
    b_refs = [par[6 * l + 1] for l in range(n_layers)]

    x = x_ref[:]
    hs = _fwd_refs(x, w_refs, b_refs, n_layers, activation)
    logits = hs[-1]                                   # [tile, K]

    zmax = jnp.max(logits, axis=1, keepdims=True)
    lse = zmax + jnp.log(jnp.sum(jnp.exp(logits - zmax), axis=1,
                                 keepdims=True))
    logp_all = logits - lse                           # [tile, K]
    p = jnp.exp(logp_all)

    a_idx = a_ref[:].astype(jnp.int32)                # [tile, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = (cols == a_idx).astype(jnp.float32)
    logp = jnp.sum(onehot * logp_all, axis=1, keepdims=True)   # [tile, 1]

    adv = adv_ref[:]
    ratio = jnp.exp(logp - lp_ref[:])
    clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    surr = jnp.minimum(ratio * adv, clipped * adv)
    H = -jnp.sum(p * logp_all, axis=1, keepdims=True)          # [tile, 1]
    loss_ref[0, 0] += (-jnp.sum(surr) - ent_coeff * jnp.sum(H)) / mb
    ent_ref[0, 0] += jnp.sum(H) / mb

    ind = (ratio * adv <= clipped * adv).astype(jnp.float32)
    dlogp = -(adv * ratio / mb) * ind                 # [tile, 1]
    # d logp_a / d logits = onehot - p ;  entropy bonus:
    # d(-ent_coeff * mean H)/d logits = (ent_coeff/mb) * p * (logp + H)
    g = dlogp * (onehot - p) + (ent_coeff / mb) * p * (logp_all + H)

    for l in range(n_layers - 1, -1, -1):
        a_in = x if l == 0 else hs[l - 1]
        scratch[2 * l][:] += jax.lax.dot_general(
            a_in, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scratch[2 * l + 1][:] += jnp.sum(g, axis=0, keepdims=True)
        if l > 0:
            g = jax.lax.dot_general(
                g, w_refs[l][:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * _act_grad(hs[l - 1], activation)

    @pl.when(sub_j == n_sub - 1)
    def _():
        t = (tp_ref[0, 0] + step_i + 1).astype(jnp.float32)
        bc1 = 1.0 - _pow(b1, t)
        bc2 = 1.0 - _pow(b2, t)
        step_size = lr / bc1
        for l in range(n_layers):
            for k, grad in ((0, scratch[2 * l][:]), (1, scratch[2 * l + 1][:])):
                p_ref = par[6 * l + k]
                m_ref = par[6 * l + 2 + k]
                v_ref = par[6 * l + 4 + k]
                m2 = b1 * m_ref[:] + (1.0 - b1) * grad
                v2 = b2 * v_ref[:] + (1.0 - b2) * jnp.square(grad)
                m_ref[:] = m2
                v_ref[:] = v2
                p_ref[:] = p_ref[:] - step_size * m2 / (
                    jnp.sqrt(v2 / bc2) + eps
                )


def policy_phase_fused_categorical(cfg, policy_params,
                                   opt_policy: AdamState, buf, key):
    """Fused categorical policy phase (single device).  Returns
    (policy_params', opt_policy', mean_loss, mean_entropy)."""
    params: Params = policy_params["mlp"]
    n_rows = buf.obs.shape[0]
    n_mb, mb = cfg.num_minibatches, cfg.minibatch_size
    flat, blk = _stream_ids(cfg, key, n_rows, n_mb, mb, cfg.n_epochs_policy)
    obs_seq, act_seq, lp_seq, adv_seq = buffer_mod.gather_mb(
        (buf.obs, buf.action, buf.log_prob, buf.advantage), flat, blk)
    act_seq = act_seq.astype(jnp.int32)
    lp_seq = lp_seq.reshape(-1, 1)
    adv_seq = adv_seq.reshape(-1, 1)
    n_steps = cfg.n_epochs_policy * n_mb

    d0 = obs_seq.shape[-1]
    k_act = params[-1][0].shape[1]
    n_layers = len(params)
    dims = [d0] + [w.shape[1] for w, _ in params]
    U, n_sub, tile, row_spec, const, smem, grid = _phase_layout(n_steps, mb)
    if U > 1:
        kernel = functools.partial(
            _policy_kernel_cat_unrolled, cfg.activation, n_layers, U, mb,
            k_act, cfg.lr_policy, cfg.adam_beta1, cfg.adam_beta2,
            cfg.adam_eps, cfg.clip_eps, cfg.ent_coeff)
    else:
        kernel = functools.partial(
            _policy_kernel_cat, cfg.activation, n_layers, n_sub, mb, k_act,
            cfg.lr_policy, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps,
            cfg.clip_eps, cfg.ent_coeff)

    inputs = [obs_seq, jnp.asarray(opt_policy.t, jnp.int32).reshape(1, 1),
              act_seq, lp_seq, adv_seq]
    in_specs = [row_spec(d0), smem, row_spec(act_seq.shape[-1]),
                row_spec(1), row_spec(1)]
    out_shapes, out_specs, aliases = [], [], {}
    m_leaves = jax.tree.leaves(opt_policy.m)
    v_leaves = jax.tree.leaves(opt_policy.v)
    for l, (w, b) in enumerate(params):
        for arr in (w, b.reshape(1, -1),
                    m_leaves[2 * l], m_leaves[2 * l + 1].reshape(1, -1),
                    v_leaves[2 * l], v_leaves[2 * l + 1].reshape(1, -1)):
            aliases[len(inputs)] = len(out_shapes)
            inputs.append(arr)
            in_specs.append(const(arr.shape))
            out_shapes.append(_sds(arr.shape, jnp.float32, inputs))
            out_specs.append(const(arr.shape))
    for _ in range(2):   # loss + entropy accumulators
        out_shapes.append(_sds((1, 1), jnp.float32, inputs))
        out_specs.append(smem)

    scratch = []
    if U == 1:
        for l in range(n_layers):
            scratch.append(pltpu.VMEM((dims[l], dims[l + 1]), jnp.float32))
            scratch.append(pltpu.VMEM((1, dims[l + 1]), jnp.float32))

    flops = n_steps * 6 * mb * sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (obs_seq.size + act_seq.size
                                + lp_seq.size + adv_seq.size),
            transcendentals=n_steps * mb * (k_act + 2),
        ),
        interpret=_interpret(),
    )(*inputs)

    new_params, new_m, new_v = [], [], []
    for l in range(n_layers):
        w, b, mw, mb_, vw, vb = outs[6 * l: 6 * l + 6]
        new_params.append((w, b.reshape(-1)))
        new_m.append((mw, mb_.reshape(-1)))
        new_v.append((vw, vb.reshape(-1)))
    loss_sum = outs[-2][0, 0]
    ent_sum = outs[-1][0, 0]
    new_pol = dict(policy_params)
    new_pol["mlp"] = new_params
    return (new_pol,
            AdamState(m=new_m, v=new_v, t=opt_policy.t + jnp.int32(n_steps)),
            loss_sum / n_steps, ent_sum / n_steps)


def value_phase_fused(cfg, v_params: Params, opt_v: AdamState,
                      buf, key,
                      bf16: bool = False) -> Tuple[Params, AdamState,
                                                   jax.Array]:
    """Drop-in fused replacement for algo.ppo.value_phase's scan (single
    device): same permutation stream, same Adam sequence, one kernel.
    Returns (v_params', opt_v', mean_loss).

    bf16=True is the THROUGHPUT regime (mb > _MAX_TILE, where the f32
    kernels lose to the XLA scan — VERDICT r4 #1): bf16 MXU GEMMs, f32
    master weights/moments/gradient accumulation, double-size row tiles.
    NOT engaged by algo/ppo's shipped gating — the large-minibatch regime
    was won by shuffle_block on the XLA scan instead (docs/RESULTS.md r5);
    kept as the tested alternative (tests/test_bigmb.py)."""
    n_rows = buf.obs.shape[0]
    n_mb, mb = cfg.num_minibatches, cfg.minibatch_size
    flat, blk = _stream_ids(cfg, key, n_rows, n_mb, mb, cfg.n_epochs_value)
    obs_seq, tgt_seq = buffer_mod.gather_mb(
        (buf.obs, buf.target), flat, blk)
    tgt_seq = tgt_seq.reshape(-1, 1)
    n_steps = cfg.n_epochs_value * n_mb
    params2, opt2, loss_sum = _run_value_phase(
        v_params, opt_v, obs_seq, tgt_seq, n_steps, mb, cfg.activation,
        cfg.lr_v, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps, bf16,
    )
    return params2, opt2, loss_sum / (n_steps * mb)
