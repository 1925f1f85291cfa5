"""Flash attention for the attention model family (models/attn.py).

The hot op of attention-trunk training is the causal episode-masked
multi-head attention inside ``attn.apply_seq``: the XLA path materializes
[T_q, T_k, B, H] score/weight planes in HBM (T=1024, B=16, H=4 in f32 is
already ~270 MB per layer per direction), so long windows are
bandwidth-bound.  This kernel computes attention the flash way — tiled over
query blocks with the online-softmax recurrence, score tiles living only in
VMEM — with the same masking semantics as models/attn.causal_episode_mask:
query t attends key s iff s <= t AND both steps carry the same episode id.
A custom VJP implements the standard flash backward (per-tile score
recomputation from the forward's row logsumexp), so whole update phases
BPTT through it.

The reference has no attention (SURVEY §2a); this is the same hand-kernel
ethos as its fused GAE/loss kernels (src/ppo.cu:109-251) applied to the new
family's dominant op.  The jnp twin (models/attn._mha) stays the default
and the correctness oracle, mirroring the reference's
naive-kernel-beside-cuBLAS pattern.

Layout (the hardware-probed lesson of this kernel): every in-kernel
``dot_general`` must be MXU-native — A's contraction on LANES, B's on
SUBLANES — or Mosaic inserts a [128, 128] relayout per loop iteration that
costs more than the matmul (first cut ran 8-40x SLOWER than XLA that way).
The wrapper therefore ships each tensor in the orientation(s) its dots
need: row layout [BH, T, hd] where T is the M/N axis, column layout
[BH, hd, T] where hd is contracted from the B side.  The lane padding of
hd (8-64 here) to 128 costs idle MXU columns, not extra passes, and is the
price of dense sequencing.

Numerics: the online softmax reassociates the reduction, so outputs differ
from the jnp twin by f32 rounding only (tested <= 1e-5 on CPU); stored
rollout log-probs are produced by the jnp decode, giving first-epoch PPO
ratios of 1 ± float noise.

Off-TPU the kernel runs in Pallas interpret mode so the CPU test suite
exercises the exact lowering.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9

# Mosaic's stack allocator books ~24 MB of scoped VMEM at tile=128
# (conservative per-op buffers, quadratic in the tile), tripping the default
# 16 MB scoped limit even though the real working set fits v5e VMEM —
# raise the per-kernel cap (hardware-probed: 32 MB suffices; 64 leaves
# headroom for the two-loop backward)
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# vma-inheriting output struct, shared with pallas_update (ops/_pallas_common)
from ppoc_tpu.ops._pallas_common import sds as _sds


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _qpos(tq, tile):
    """Query positions as a [tile, 1] column."""
    return tq * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)


def _kpos(kt, tile):
    """Key positions as a [1, tile] row."""
    return kt * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)


def _tiles(T: int):
    """(query tile, key tile) for a window: a TPU grid cell costs ~2-4 us
    of sequencing regardless of its math, and at (T=2048, BH=128) the
    128x128 tiling spends ~25 ms — the whole flash-op budget — on
    (BH * T/128) cells x 3 kernels of overhead.  Growing tiles with T
    divides the cell count (and the overhead) by up to 16x while the score
    tile (qt x kt f32 <= 1 MB) stays far inside VMEM; key tiles stay
    multiples of 128 (Mosaic lane-slice constraint).  Chip-measured at
    (T=2048, B=16, d=512): 128->512 tiles take the flash op 25.6 -> 7.9 ms
    (fwd+bwd) and the 2-block encoder to 46.7% of bf16 peak.  512 is the
    CEILING, not just the current top rung: at T=8192 a 1024-tile schedule
    was probed and LOSES (fwd+bwd 477.4 vs 340.7 ms; at d=512 width 1561
    vs 1138 ms) — the larger f32 score tile starts crowding VMEM double
    buffering while cell-sequencing overhead is already amortized at 512
    (docs/RESULTS.md round 5)."""
    if T >= 2048:
        return 512, 512
    if T >= 1024:
        return 256, 256
    return 128, 128


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(scale: float, t_real: int, qt: int, kt: int, n_kt_all: int,
                q_ref, kc_ref, v_ref, epc_ref, epl_ref, rel_ref,
                out_ref, lse_ref):
    """One (batch*head, query-tile) cell: online softmax over key tiles.

    Blocks: q/out [1, QT, hd] (row); kc [1, hd, T] (column);
    v [1, T, hd] (row); epc [1, QT, 1]; epl [1, 1, T];
    rel [1, 1] SMEM scalar; lse out [1, QT, 1].

    ``rel`` is the key block's time relation to the query block (ring
    attention, parallel/ring_attn.ring_mha_ids with flash blocks):
    -1 = the whole key block precedes every query (no causal test, full
    key loop); 0 = same block (the single-window case: tile-causal bounds
    and the kpos <= qpos test); +1 = the key block follows (nothing valid,
    zero loop — out 0 / lse NEG, folded away by the block merge).
    """
    tq = pl.program_id(1)
    rel = rel_ref[0, 0]
    q = q_ref[0]                       # [QT, hd]
    epq = epc_ref[0]                   # [QT, 1]
    qpos = _qpos(tq, qt)
    hd = q.shape[-1]

    def body(ki, carry):
        acc, m, l = carry
        kc = kc_ref[0, :, pl.ds(ki * kt, kt)]     # [hd, KT]
        v = v_ref[0, pl.ds(ki * kt, kt), :]       # [KT, hd]
        epk = epl_ref[0, :, pl.ds(ki * kt, kt)]   # [1, KT]
        kpos = _kpos(ki, kt)
        s = jax.lax.dot_general(                       # [TQ, TK], MXU-native
            q, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        causal_ok = jnp.logical_or(rel < 0, kpos <= qpos)
        valid = (causal_ok & (epk == epq)
                 & (kpos < t_real) & (qpos < t_real))
        s = jnp.where(valid, s, NEG)
        m2 = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))   # [TQ, 1]
        # explicit zeroing of invalid lanes: exp(NEG - m2) underflows to 0
        # whenever any valid key was seen, but an all-invalid row would give
        # exp(NEG - NEG) = 1 — the classic flash masking trap
        p = jnp.where(valid, jnp.exp(s - m2), 0.0)
        alpha = jnp.exp(m - m2)
        l2 = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc2 = acc * alpha + jax.lax.dot_general(      # [TQ, hd], MXU-native
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc2, m2, l2

    acc0 = jnp.zeros((qt, hd), jnp.float32)
    m0 = jnp.full((qt, 1), NEG, jnp.float32)
    l0 = jnp.zeros((qt, 1), jnp.float32)
    # diag: visit key tiles overlapping [0, (tq+1)*qt); before: all; after: 0
    n_causal = ((tq + 1) * qt + kt - 1) // kt
    n_kt = jnp.where(rel < 0, n_kt_all,
                     jnp.where(rel == 0, n_causal, 0))
    acc, m, l = jax.lax.fori_loop(0, n_kt, body, (acc0, m0, l0))
    l_safe = jnp.where(l == 0.0, 1.0, l)   # padded rows only
    out_ref[0] = (acc / l_safe).astype(out_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)


def _specs(T, hd, tile):
    row_t = pl.BlockSpec((1, tile, hd), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM)
    row_full = pl.BlockSpec((1, T, hd), lambda bh, t: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    col_full = pl.BlockSpec((1, hd, T), lambda bh, t: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    col_t = pl.BlockSpec((1, tile, 1), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM)
    lane_full = pl.BlockSpec((1, 1, T), lambda bh, t: (bh, 0, 0),
                             memory_space=pltpu.VMEM)
    return row_t, row_full, col_full, col_t, lane_full


_SMEM = pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd(q, kc, v, epc, epl, rel, scale: float, t_real: int, qt: int,
         kt: int):
    BH, T, hd = q.shape
    row_t, row_full, col_full, col_t, lane_full = _specs(T, hd, qt)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale, t_real, qt, kt, T // kt),
        grid=(BH, T // qt),
        in_specs=[row_t, col_full, row_full, col_t, lane_full, _SMEM],
        out_specs=[row_t, col_t],
        out_shape=[
            _sds((BH, T, hd), jnp.float32, (q, kc, v)),
            _sds((BH, T, 1), jnp.float32, (q, kc, v)),
        ],
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(q, kc, v, epc, epl, rel)
    return out, lse


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_dq_kernel(scale: float, t_real: int, qt: int, kt: int,
                   n_kt_all: int,
                   q_ref, kr_ref, kc_ref, vc_ref, epc_ref, epl_ref,
                   do_ref, dsum_ref, lse_ref, rel_ref, dq_ref):
    """dq for one query tile.  Blocks: q/do/dq [1, QT, hd] (row);
    kr [1, T, hd]; kc/vc [1, hd, T]; dsum/lse/epc [1, QT, 1];
    epl [1, 1, T]; rel [1, 1] SMEM (see _fwd_kernel).  ``dsum`` is
    rowsum(dout * out) MINUS any lse cotangent — folding the lse VJP into
    the same kernels (d lse / d s = softmax weight)."""
    tq = pl.program_id(1)
    rel = rel_ref[0, 0]
    q = q_ref[0]
    do = do_ref[0]
    dsum = dsum_ref[0]        # [QT, 1] rowsum(dout * out) - g_lse
    lse = lse_ref[0]          # [QT, 1]
    epq = epc_ref[0]
    qpos = _qpos(tq, qt)
    hd = q.shape[-1]

    def body(ki, dq):
        kc = kc_ref[0, :, pl.ds(ki * kt, kt)]     # [hd, KT]
        kr = kr_ref[0, pl.ds(ki * kt, kt), :]     # [KT, hd]
        vc = vc_ref[0, :, pl.ds(ki * kt, kt)]     # [hd, KT]
        epk = epl_ref[0, :, pl.ds(ki * kt, kt)]   # [1, KT]
        kpos = _kpos(ki, kt)
        s = jax.lax.dot_general(
            q, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        causal_ok = jnp.logical_or(rel < 0, kpos <= qpos)
        valid = (causal_ok & (epk == epq)
                 & (kpos < t_real) & (qpos < t_real))
        w = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(                      # [TQ, TK]
            do.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = w * (dp - dsum) * scale
        return dq + jax.lax.dot_general(               # [TQ, hd]
            ds.astype(kr.dtype), kr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    n_causal = ((tq + 1) * qt + kt - 1) // kt
    n_kt = jnp.where(rel < 0, n_kt_all,
                     jnp.where(rel == 0, n_causal, 0))
    dq_ref[0] = jax.lax.fori_loop(
        0, n_kt, body,
        jnp.zeros((qt, hd), jnp.float32)).astype(dq_ref.dtype)


def _bwd_dkv_kernel(scale: float, t_real: int, qt: int, kt: int,
                    n_qtiles: int,
                    qr_ref, qc_ref, kr_ref, vr_ref, epc_ref, epl_ref,
                    dor_ref, doc_ref, dsum_ref, lse_ref, rel_ref,
                    dk_ref, dv_ref):
    """dk/dv for one key tile, computed in transposed score space so every
    dot stays MXU-native.  Blocks: kr/vr/dk/dv [1, KT, hd] (row, key
    tile); qr/dor [1, T, hd]; qc/doc [1, hd, T]; epc [1, KT, 1] (key);
    epl/dsum/lse [1, 1, T] (lane-oriented, query side).  NOTE the query
    slices ride the LANE dim, so qt must be a multiple of 128 too."""
    ki = pl.program_id(1)
    rel = rel_ref[0, 0]
    kr = kr_ref[0]                     # [KT, hd]
    vr = vr_ref[0]
    epk = epc_ref[0]                   # [KT, 1]
    kpos = _qpos(ki, kt)               # key positions as a column here
    hd = kr.shape[-1]

    def body(tq, carry):
        dk, dv = carry
        qc = qc_ref[0, :, pl.ds(tq * qt, qt)]      # [hd, QT]
        qr = qr_ref[0, pl.ds(tq * qt, qt), :]      # [QT, hd]
        doc = doc_ref[0, :, pl.ds(tq * qt, qt)]    # [hd, QT]
        dor = dor_ref[0, pl.ds(tq * qt, qt), :]    # [QT, hd]
        dsum = dsum_ref[0, :, pl.ds(tq * qt, qt)]  # [1, QT]
        lse = lse_ref[0, :, pl.ds(tq * qt, qt)]    # [1, QT]
        epq = epl_ref[0, :, pl.ds(tq * qt, qt)]    # [1, QT]
        qpos = _kpos(tq, qt)           # query positions as a row here
        st = jax.lax.dot_general(                      # [TK, TQ]
            kr, qc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        causal_ok = jnp.logical_or(rel < 0, kpos <= qpos)
        valid = (causal_ok & (epk == epq)
                 & (kpos < t_real) & (qpos < t_real))
        wt = jnp.where(valid, jnp.exp(st - lse), 0.0)
        dpt = jax.lax.dot_general(                     # [TK, TQ]
            vr, doc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dst = wt * (dpt - dsum) * scale
        dk2 = dk + jax.lax.dot_general(                # [TK, hd]
            dst.astype(qr.dtype), qr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv2 = dv + jax.lax.dot_general(                # [TK, hd]
            wt.astype(dor.dtype), dor, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk2, dv2

    # diag: only query tiles at/after this key tile attend it (causal);
    # before: every query tile; after: none
    tq_causal = (ki * kt) // qt
    tq0 = jnp.where(rel < 0, 0,
                    jnp.where(rel == 0, tq_causal, n_qtiles))
    dk, dv = jax.lax.fori_loop(
        tq0, n_qtiles, body,
        (jnp.zeros((kt, hd), jnp.float32),
         jnp.zeros((kt, hd), jnp.float32)))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _col(x):
    """[BH, T, hd] row layout -> [BH, hd, T] column layout."""
    return jnp.swapaxes(x, 1, 2)


def _bwd(res, gs):
    g, g_lse = gs
    q, kc, v, epc, epl, rel, out, lse, scale, t_real, qt, kt = res
    BH, T, hd = q.shape
    # lse's VJP folds into the same kernels: d lse / d s = softmax weight,
    # so ds = w * (dp - (rowsum(g*out) - g_lse)) — one subtraction here
    dsum = jnp.sum(g * out, axis=-1, keepdims=True)   # [BH, T, 1]
    if g_lse is not None:
        dsum = dsum - g_lse
    g = g.astype(q.dtype)   # bf16 blocks: cotangents ride at block dtype
    kr = _col(kc)                                     # [BH, T, hd]
    row_q, row_full, col_full, col_q, lane_full = _specs(T, hd, qt)
    row_k, _, _, col_k, _ = _specs(T, hd, kt)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale, t_real, qt, kt, T // kt),
        grid=(BH, T // qt),
        in_specs=[row_q, row_full, col_full, col_full, col_q, lane_full,
                  row_q, col_q, col_q, _SMEM],
        out_specs=row_q,
        out_shape=_sds((BH, T, hd), q.dtype, (q, kc, v)),
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(q, kr, kc, _col(v), epc, epl, g, dsum, lse, rel)

    # the dkv kernel's sides flip: it needs KEY ids in column orientation
    # and QUERY ids in lane orientation (a no-op transpose when both sides
    # share one window's ids; load-bearing for ring blocks whose q_ep and
    # k_ep differ — flash_mha_block)
    epc_k = jnp.swapaxes(epl, 1, 2)     # [BH, T, 1] key-side
    epl_q = jnp.swapaxes(epc, 1, 2)     # [BH, 1, T] query-side
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale, t_real, qt, kt, T // qt),
        grid=(BH, T // kt),
        in_specs=[row_full, col_full, row_k, row_k, col_k, lane_full,
                  row_full, col_full, lane_full, lane_full, _SMEM],
        out_specs=[row_k, row_k],
        out_shape=[
            _sds((BH, T, hd), q.dtype, (q, kc, v)),
            _sds((BH, T, hd), q.dtype, (q, kc, v)),
        ],
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(q, _col(q), kr, v, epc_k, epl_q, g, _col(g),
      _col(dsum), _col(lse), rel)
    # kc's gradient must come back in its (column) primal layout
    return dq, _col(dk), dv, None, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash(q, kc, v, epc, epl, rel, scale, t_real, qt, kt):
    return _fwd(q, kc, v, epc, epl, rel, scale, t_real, qt, kt)


def _flash_fwd(q, kc, v, epc, epl, rel, scale, t_real, qt, kt):
    out, lse = _fwd(q, kc, v, epc, epl, rel, scale, t_real, qt, kt)
    return (out, lse), (q, kc, v, epc, epl, rel, out, lse, scale, t_real,
                        qt, kt)


def _flash_bwd(scale, t_real, qt, kt, res, gs):
    return _bwd(res, gs)


_flash.defvjp(_flash_fwd, _flash_bwd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array,
              ep: jax.Array, compute_dtype=None) -> jax.Array:
    """Causal episode-masked multi-head attention, flash-tiled.

    ``q``/``k``/``v``: [T, ..., H, hd] (any batch dims); ``ep``: [T, ...]
    int32 episode ids (models/attn.episode_ids).  Exactly _mha's semantics:
    query t attends key s iff s <= t and ep[s] == ep[t].  Returns
    [T, ..., H, hd] in the input dtype.

    ``compute_dtype=jnp.bfloat16`` carries the q/k/v blocks (and the MXU
    contractions' inputs) in bf16 — half the VMEM/HBM block traffic —
    while softmax statistics and all accumulations stay f32.
    """
    T = q.shape[0]
    H, hd = q.shape[-2], q.shape[-1]
    batch = q.shape[1:-2]
    B = math.prod(batch) if batch else 1
    scale = 1.0 / math.sqrt(hd)

    # tiles grow with the window to amortize grid-cell sequencing
    # overhead (_tiles); both stay multiples of 128 — Mosaic requires
    # dynamic lane-dim slice offsets to be provable multiples of 128
    qt, kt_tile = _tiles(T)
    Tp = _round_up(T, max(qt, kt_tile))

    in_dtype = q.dtype

    def fold(x):  # [T, ..., H, hd] -> [B*H, Tp, hd] row layout
        x = x.reshape(T, B, H, hd).transpose(1, 2, 0, 3).reshape(B * H, T, hd)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    ep_b = ep.reshape(T, B).T                            # [B, T]
    ep_bh = jnp.repeat(ep_b[:, None, :], H, axis=1).reshape(B * H, T)
    ep_bh = jnp.pad(ep_bh, ((0, 0), (0, Tp - T)), constant_values=-1)
    epc = ep_bh[..., None]          # [BH, Tp, 1] column orientation
    epl = ep_bh[:, None, :]         # [BH, 1, Tp] lane orientation

    rel = jnp.zeros((1, 1), jnp.int32)  # single window = the diagonal block
    out, _ = _flash(fold(q), _col(fold(k)), fold(v), epc, epl, rel, scale,
                    T, qt, kt_tile)
    out = out[:, :T].reshape(B, H, T, hd).transpose(2, 0, 1, 3)
    return out.reshape((T,) + batch + (H, hd)).astype(in_dtype)


def flash_mha_block(q: jax.Array, k: jax.Array, v: jax.Array,
                    q_ep: jax.Array, k_ep: jax.Array, rel: jax.Array,
                    compute_dtype=None):
    """One BLOCK of a ring-attention pass: queries from this device's time
    shard against ONE arriving K/V time block, flash-tiled, returning the
    pair the online-softmax block merge needs —

        (out [T, ..., H, hd],  lse [T, ..., H])

    where ``out`` is the softmax-normalized attention over THIS block's
    valid keys and ``lse`` its per-query logsumexp (NEG for queries with no
    valid key in the block).  Fold blocks with :func:`merge_blocks`.

    ``q_ep`` / ``k_ep``: [T, ...] GLOBAL episode ids per side.  ``rel``:
    int32 scalar (traced ok; arrives in SMEM) — the key block's time
    relation: -1 strictly earlier (every pair causally valid), 0 the same
    block (within-block causal), +1 strictly later (nothing valid).
    Gradients flow through both outputs (the lse cotangent folds into the
    flash backward's dsum term), so a jnp-level merge of blocks
    backpropagates exactly.
    """
    T = q.shape[0]
    H, hd = q.shape[-2], q.shape[-1]
    batch = q.shape[1:-2]
    B = math.prod(batch) if batch else 1
    scale = 1.0 / math.sqrt(hd)
    qt, kt_tile = _tiles(T)
    Tp = _round_up(T, max(qt, kt_tile))
    in_dtype = q.dtype

    def fold(x):
        x = x.reshape(T, B, H, hd).transpose(1, 2, 0, 3).reshape(B * H, T, hd)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    def fold_ep(ep):
        ep_b = ep.reshape(T, B).T
        ep_bh = jnp.repeat(ep_b[:, None, :], H, axis=1).reshape(B * H, T)
        return jnp.pad(ep_bh, ((0, 0), (0, Tp - T)), constant_values=-1)

    epc = fold_ep(q_ep)[..., None]      # query side, column orientation
    epl = fold_ep(k_ep)[:, None, :]     # key side, lane orientation
    rel = jnp.asarray(rel, jnp.int32).reshape(1, 1)
    out, lse = _flash(fold(q), _col(fold(k)), fold(v), epc, epl, rel,
                      scale, T, qt, kt_tile)
    out = out[:, :T].reshape(B, H, T, hd).transpose(2, 0, 1, 3)
    lse = lse[:, :T, 0].reshape(B, H, T).transpose(2, 0, 1)
    return (out.reshape((T,) + batch + (H, hd)).astype(in_dtype),
            lse.reshape((T,) + batch + (H,)))


def merge_blocks(a, b):
    """Fold two (out, lse) ring-attention block results into one — the
    jnp-level form of the in-kernel online-softmax merge.  Associative and
    commutative; autodiff-safe (both operands' cotangents flow back into
    their blocks' flash VJPs)."""
    out_a, lse_a = a
    out_b, lse_b = b
    lse = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse)[..., None]
    wb = jnp.exp(lse_b - lse)[..., None]
    return out_a * wa + out_b * wb, lse
