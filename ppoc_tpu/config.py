"""Training configuration.

TPU-native analogue of the reference's hard-coded hyperparameters in
``src/main.c:20-44`` and the ``create_ppo`` signature (``include/ppo.h:30``,
``src/ppo.cu:6``).  Every reference hyperparameter is a first-class field with
the reference default; the TPU-only knobs (number of vectorized envs, rollout
length, mesh axes, kernel backend) have no reference counterpart because the
reference steps exactly one host environment.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    # --- environment -----------------------------------------------------
    env: str = "pendulum"  # registry key, see ppoc_tpu.envs
    seed: int = 0

    # --- network (reference: src/main.c:20-31) ---------------------------
    hidden: Tuple[int, ...] = (128, 128)
    activation: str = "relu"  # hidden-layer activation ("relu" | "tanh" | "none")
    init_std: float = 1.0     # initial policy std (src/main.c:38)

    # --- PPO hyperparameters (reference: src/main.c:33-43) ---------------
    lr_policy: float = 3e-4
    lr_v: float = 3e-4
    adam_beta1: float = 0.9    # src/ppo.cu:19-25
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8     # src/adam.cu:67
    lam: float = 0.95          # GAE lambda
    clip_eps: float = 0.2
    ent_coeff: float = 0.0
    n_epochs_policy: int = 4
    n_epochs_value: int = 10
    minibatch_size: int = 64

    # --- stabilizers beyond the reference (all OFF by default) ------------
    max_grad_norm: float = 0.0  # >0: clip each minibatch gradient's global
                                # L2 norm before Adam (ops/adam.py)
    target_kl: float = 0.0      # >0: within a fit, stop policy updates once
                                # the pmean'd approx KL (E[old - new logp])
                                # of a minibatch exceeds this
    lr_anneal: bool = False     # linearly decay both learning rates to 0
                                # over the cfg.n_epochs schedule, measured
                                # in each optimizer's own Adam steps (a
                                # longer run trains its tail at lr ~ 0)
    clip_value: float = 0.0     # >0: PPO2-style value clipping — the value
                                # loss is max of the unclipped and the
                                # V_old +/- clip_value-clipped squared
                                # errors, keeping V near its rollout-time
                                # predictions
    ent_anneal: bool = False    # linearly decay ent_coeff to 0 over the
                                # cfg.n_epochs schedule (the config-level
                                # form of explore-then-refine staging)

    # --- schedule ---------------------------------------------------------
    # steps_per_fit in the reference is the buffer capacity (3000); here it is
    # n_envs * rollout_len.  The reference layout is one flat 3000-step stream
    # (15 x 200-step Pendulum episodes interleaved); ours is [T=rollout_len,
    # E=n_envs], which is the same data when rollout_len == horizon.
    n_envs: int = 15
    rollout_len: int = 200
    fits_per_epoch: int = 10   # steps_per_epoch / steps_per_fit = 30000/3000
    n_epochs: int = 10

    # --- evaluation (reference: eval_ppo uses steps_per_fit steps) -------
    eval_envs: int = 15
    eval_len: int = 200
    eval_estimator: str = "completed"  # "completed": count only episodes
                                  # that finish inside the eval window (the
                                  # framework's default — partial episodes
                                  # would deflate R on envs whose horizon
                                  # exceeds eval_len).  "reference": the
                                  # reference's exact estimator
                                  # (src/ppo.cu:560-583) applied per env
                                  # stream — counts the window-cut segment
                                  # in n_episodes, drops the oldest
                                  # segment's J — for apples-to-apples
                                  # parity tables

    # --- TPU execution ----------------------------------------------------
    kernel_backend: str = "auto"  # "pallas" | "jnp" | "bf16" | "auto"
                                  # (auto = pallas on TPU). "bf16": f32
                                  # master weights, bf16 MXU matmuls —
                                  # 1.2-1.7x on large-minibatch configs
                                  # with identical solve-epoch counts
    mesh_axis: str = "dp"         # data-parallel mesh axis name
    tp_size: int = 1              # tensor-parallel degree: shard the MLPs'
                                  # hidden dim over a second mesh axis "tp"
                                  # (parallel/tp.py); 1 = pure data parallel
    pp_size: int = 1              # pipeline-parallel degree: partition the
                                  # MLPs' layers into stages over a mesh axis
                                  # "pp" with a GPipe microbatch schedule
                                  # (parallel/pp.py); pp_size must divide
                                  # the layer count (len(hidden)+1)
    pp_microbatches: int = 0      # GPipe microbatches per forward; 0 =
                                  # pp_size (bubble fraction (S-1)/(M+S-1))
    n_experts: int = 1            # >1 swaps BOTH trunks (policy mean-net and
                                  # value net) for a gated mixture of that
                                  # many expert MLPs (models/moe.py) — the
                                  # framework's second model family
    moe_topk: int = 0             # experts kept per input by the gate
                                  # (renormalized); 0 = dense softmax mixture
    ep_size: int = 1              # expert-parallel degree: shard the experts
                                  # over a mesh axis "ep" (parallel/ep.py);
                                  # must divide n_experts
    moe_aux_coeff: float = 0.0    # weight of the Switch-style load-balance
                                  # auxiliary loss on both trunks' routers
                                  # (models/moe.load_balance_loss); use with
                                  # moe_topk > 0 to keep experts from
                                  # starving
    rnn_hidden: int = 0           # >0 swaps BOTH trunks for a GRU encoder of
                                  # this hidden size + the `hidden` MLP head
                                  # (models/gru.py) — the recurrent model
                                  # family for partially-observable envs;
                                  # updates replay whole env sequences
                                  # (algo/recurrent.py) and minibatch_size
                                  # counts transitions as usual
                                  # (floor(mb/rollout_len) sequences per
                                  # minibatch).  Requires reset_per_fit
    rnn_cell: str = "gru"         # recurrent cell kind when rnn_hidden > 0:
                                  # "gru" (3H fused gates) or "lstm" (4H
                                  # fused gates, h‖c carry, forget-bias +1)
    attn_dim: int = 0             # >0 swaps BOTH trunks for a causal
                                  # Transformer encoder of this width over
                                  # the rollout window (models/attn.py) —
                                  # the attention model family for
                                  # partially-observable envs.  Training
                                  # applies it PARALLEL over time (MXU
                                  # GEMMs, BPTT depth 1 vs the GRU's T);
                                  # rollouts decode with a KV cache.
                                  # Same sequence-minibatch update path and
                                  # constraints as rnn_hidden (requires
                                  # reset_per_fit, shards over dp only)
    attn_layers: int = 2          # Transformer blocks when attn_dim > 0
    attn_heads: int = 2           # attention heads (must divide attn_dim)
    attn_ff: int = 0              # FF hidden width per block; 0 = 4*attn_dim
    sp_size: int = 1              # sequence-parallel degree (attention
                                  # trunks only): shard the rollout WINDOW
                                  # over a mesh axis "sp" — parallel
                                  # attention passes run as ring attention
                                  # (parallel/ring_attn.py), GAE merges its
                                  # affine carry across shards
                                  # (parallel/sp.py), rollouts shard envs
                                  # over the flattened (dp, sp) mesh and
                                  # reshard time-major with one all_to_all
                                  # per fit (algo/seqpar.py).  Must divide
                                  # rollout_len; requires attn_dim > 0
    zero1: bool = False           # ZeRO-1 / FSDP-style optimizer-state
                                  # sharding over the dp mesh axis: params
                                  # stay replicated for rollout/backprop,
                                  # but each rank holds a 1/N slice of the
                                  # two trunk Adams' m/v, updates its
                                  # parameter slice and all_gathers
                                  # (ops/adam.update_zero1).  Per-rank
                                  # optimizer memory and math drop N-fold.
                                  # Requires a multi-device mesh; cannot
                                  # combine with tp/pp/ep (those pack
                                  # optimizer state along the model axis)
    obs_loc: Tuple[float, ...] = ()    # static observation normalization:
    obs_scale: Tuple[float, ...] = ()  # the trainer/sweep/serving env maps
                                  # obs -> (obs - loc) / scale when set
                                  # (envs/wrappers.affine_obs).  Carried in
                                  # the config so checkpoints, sweep lanes
                                  # and served policies replay it exactly;
                                  # fill with envs.wrappers.calibrate(cfg)
                                  # (random-policy measurement)
    shuffle_block: int = 0        # >0: shuffle minibatch assignment at this
                                  # block-of-rows granularity instead of per
                                  # row.  The row-level gather is the
                                  # large-minibatch update's bandwidth wall
                                  # (~2% of HBM bandwidth for 44-byte rows;
                                  # 108 of the reacher value phase's 134 ms
                                  # — docs/RESULTS.md round 5); aligned
                                  # blocks gather at full bandwidth.  Every
                                  # row still appears exactly once per
                                  # epoch; assignment is uniformly random
                                  # at block resolution.  0 = the
                                  # reference's exact row shuffle
                                  # (src/trajectory_buffer.cu:126-144).
                                  # Must divide minibatch_size and the
                                  # per-shard row count; row-minibatch
                                  # trunks only (GRU/attention updates
                                  # shuffle whole sequences already)
    transplant_patience: int = 0  # >0 (sequence trunks): if the per-epoch
                                  # eval R fails to improve by >= 0.05 for
                                  # this many consecutive epochs,
                                  # Trainer.train performs a ONE-TIME
                                  # critic->policy encoder transplant
                                  # (Trainer.transplant_value_trunk): the
                                  # policy trunk's encoder is replaced by
                                  # a copy of the CRITIC's (heads and
                                  # log_std kept, policy Adam moments
                                  # reset).  Rationale (measured,
                                  # docs/RESULTS.md round 5): the
                                  # recall_long trap is a policy-side
                                  # chicken-and-egg — the critic builds
                                  # the cue-retrieval circuit supervised
                                  # within ~3 epochs while the policy
                                  # gradient cannot bootstrap it; handing
                                  # the policy the critic's encoder lifts
                                  # the trapped seed in ~3 epochs, while a
                                  # FRESH random encoder does not.
                                  # Default off; not with zero1
    aux_value_coeff: float = 0.0  # >0 (attention trunks): PPG-style
                                  # auxiliary value regression on the
                                  # POLICY trunk (Cobbe et al. 2020).  An
                                  # extra scalar head on the policy
                                  # encoder is trained against the fit's
                                  # value targets DURING the policy phase,
                                  # pushing the critic's supervised
                                  # cue-finding signal into the policy
                                  # trunk.  This is the default-off
                                  # stabilizer for the recall_long
                                  # seed-trap: the trapped mode is a
                                  # policy-side chicken-and-egg (zero
                                  # head readout => no gradient into
                                  # attention) that the critic never
                                  # suffers because value regression is
                                  # supervised — measured anatomy in
                                  # docs/RESULTS.md round 5.  Requires
                                  # attn_dim > 0; not with sp_size > 1
    fit_dispatch: str = "fused"   # "fused" (the architecture default: one
                                  # fit = ONE jitted program) or "phased"
                                  # (sequence trunks, single device):
                                  # rollout / values+GAE / value phase /
                                  # policy phase compile and dispatch as
                                  # SEPARATE programs with the fused fit's
                                  # exact key stream.  Logically identical
                                  # (un-jitted compositions are bit-equal,
                                  # tests/test_fit_dispatch.py); compiled
                                  # programs differ only at XLA
                                  # fusion-rounding (FMA) level across the
                                  # new jit boundaries.
                                  # The next relief valve below
                                  # fits_per_program: at T=16384 even a
                                  # ONE-fit fused program's cold compile
                                  # RPC crashes the transport worker;
                                  # the phase programs stay under the
                                  # ceiling (docs/RESULTS.md round 5)
    rollout_chunk: int = 0        # >0 (with fit_dispatch="phased"): the
                                  # decode rollout runs as ceil(T/chunk)
                                  # dispatches of ONE compiled chunk-step
                                  # scan program, threading (env state,
                                  # obs, trunk cache) between dispatches —
                                  # same per-step key stream as the
                                  # monolithic scan.  The deepest relief
                                  # valve: the bare 16384-step decode scan
                                  # crashes the transport worker on cold
                                  # compile (threshold measured between
                                  # 9216 ok and 12288 crash —
                                  # docs/RESULTS.md round 5); chunked,
                                  # the one compiled segment is reused
                                  # across the window.  Applies to the
                                  # training rollout AND evaluation.
                                  # Must divide rollout_len and eval_len
    fits_per_program: int = 0     # >0: compile the training epoch as
                                  # ceil(fits_per_epoch / N)-dispatch chunks
                                  # of N fits each instead of ONE fused
                                  # scan-of-fits program.  Bit-identical
                                  # training (same per-fit key stream, same
                                  # metrics); the dial exists because a
                                  # fused program's cold compile grows with
                                  # fits_per_epoch x rollout_len and at
                                  # extreme windows (T=8192 attention) the
                                  # single compile+first-run RPC can exceed
                                  # what the accelerator transport survives
                                  # (docs/RESULTS.md round 5).  0 = fused
                                  # (the architecture default); must divide
                                  # fits_per_epoch; single-device meshes
                                  # only
    norm_adv_global: bool = True  # normalize advantages over the whole buffer
                                  # (reference: src/ppo.cu:355-368)
    reset_per_fit: bool = True    # reference resets env at every collection
                                  # entry (src/ppo.cu:55)

    # ----------------------------------------------------------------------
    @property
    def steps_per_fit(self) -> int:
        return self.n_envs * self.rollout_len

    @property
    def steps_per_epoch(self) -> int:
        return self.steps_per_fit * self.fits_per_epoch

    @property
    def num_minibatches(self) -> int:
        # floor division: the reference drops the tail (floor(3000/64)=46
        # minibatches; src/ppo.cu:475-477 via int truncation of ceilf(int/int))
        return self.steps_per_fit // self.minibatch_size

    def replace(self, **kw) -> "PPOConfig":
        return dataclasses.replace(self, **kw)


def validate(cfg: PPOConfig) -> PPOConfig:
    """Config-consistency validation bank — the SINGLE definition.

    Shared by ``Trainer.__init__``, ``ppoc_tpu.sweep`` and the CLI so the
    three surfaces can never drift in what they accept (a bare "jnp" sweep
    silently degrading sparse MoE to dense gating was exactly this hazard).
    Only checks that depend on the config alone live here; checks that need
    a mesh (device counts, axis names, per-shard divisibility) stay with the
    consumer that owns the mesh.  Returns ``cfg`` so call sites can chain.
    """
    if cfg.eval_estimator not in ("completed", "reference"):
        raise ValueError(
            f"eval_estimator must be 'completed' or 'reference', got "
            f"{cfg.eval_estimator!r}"
        )
    if cfg.num_minibatches < 1:
        raise ValueError(
            f"minibatch_size ({cfg.minibatch_size}) exceeds steps_per_fit "
            f"({cfg.steps_per_fit} = n_envs * rollout_len): zero "
            f"minibatches per epoch, nothing would train"
        )
    if cfg.shuffle_block:
        if cfg.shuffle_block < 0:
            raise ValueError(f"shuffle_block must be >= 0, got "
                             f"{cfg.shuffle_block}")
        if (cfg.minibatch_size % cfg.shuffle_block
                or cfg.steps_per_fit % cfg.shuffle_block):
            raise ValueError(
                f"shuffle_block ({cfg.shuffle_block}) must divide both "
                f"minibatch_size ({cfg.minibatch_size}) and steps_per_fit "
                f"({cfg.steps_per_fit})"
            )
        if cfg.rnn_hidden > 0 or cfg.attn_dim > 0:
            raise ValueError(
                "shuffle_block applies to row-minibatch trunks only: "
                "sequence trunks (rnn_hidden/attn_dim) already shuffle "
                "whole sequences"
            )
    if cfg.transplant_patience:
        if cfg.transplant_patience < 0:
            raise ValueError(f"transplant_patience must be >= 0, got "
                             f"{cfg.transplant_patience}")
        if cfg.rnn_hidden <= 0 and cfg.attn_dim <= 0:
            raise ValueError(
                "transplant_patience (critic->policy encoder transplant) "
                "requires a sequence trunk (rnn_hidden or attn_dim > 0): "
                "the policy and value encoders must share a shape"
            )
        if cfg.zero1:
            raise ValueError(
                "transplant_patience resets the policy Adam moments in "
                "the logical tree layout and cannot combine with zero1's "
                "packed optimizer state"
            )
    if cfg.aux_value_coeff:
        if cfg.aux_value_coeff < 0:
            raise ValueError(f"aux_value_coeff must be >= 0, got "
                             f"{cfg.aux_value_coeff}")
        if cfg.attn_dim <= 0:
            raise ValueError(
                "aux_value_coeff (PPG-style auxiliary value head on the "
                "policy trunk) requires the attention family (attn_dim > 0)"
            )
        if cfg.sp_size > 1:
            raise ValueError(
                "aux_value_coeff does not combine with sequence "
                "parallelism (sp_size > 1): the auxiliary head reads the "
                "whole-window hidden plane"
            )
    if cfg.fit_dispatch not in ("fused", "phased"):
        raise ValueError(
            f"fit_dispatch must be 'fused' or 'phased', got "
            f"{cfg.fit_dispatch!r}"
        )
    if cfg.fit_dispatch == "phased":
        if cfg.rnn_hidden <= 0 and cfg.attn_dim <= 0:
            raise ValueError(
                "fit_dispatch='phased' splits the SEQUENCE-trunk fit "
                "(rollout / values+GAE / phases); dense trunks use the "
                "fused fit (their programs are small)"
            )
        if not cfg.reset_per_fit:
            raise ValueError(
                "fit_dispatch='phased' requires reset_per_fit=True "
                "(sequence trunks always reset at window entry)"
            )
        if cfg.fits_per_program:
            raise ValueError(
                "fit_dispatch='phased' already dispatches per fit; do not "
                "combine with fits_per_program"
            )
        if (cfg.tp_size > 1 or cfg.pp_size > 1 or cfg.ep_size > 1
                or cfg.sp_size > 1 or cfg.zero1):
            raise ValueError(
                "fit_dispatch='phased' supports single-device runs only"
            )
    if cfg.rollout_chunk:
        if cfg.rollout_chunk < 0:
            raise ValueError(f"rollout_chunk must be >= 0, got "
                             f"{cfg.rollout_chunk}")
        if cfg.fit_dispatch != "phased":
            raise ValueError(
                "rollout_chunk (segmented decode dispatch) requires "
                "fit_dispatch='phased'"
            )
        if cfg.rollout_len % cfg.rollout_chunk or \
                cfg.eval_len % cfg.rollout_chunk:
            raise ValueError(
                f"rollout_chunk ({cfg.rollout_chunk}) must divide both "
                f"rollout_len ({cfg.rollout_len}) and eval_len "
                f"({cfg.eval_len}): segments are equal-size compiled "
                f"programs"
            )
    if cfg.fits_per_program:
        if cfg.fits_per_program < 0:
            raise ValueError(f"fits_per_program must be >= 0, got "
                             f"{cfg.fits_per_program}")
        if cfg.fits_per_epoch % cfg.fits_per_program:
            raise ValueError(
                f"fits_per_program ({cfg.fits_per_program}) must divide "
                f"fits_per_epoch ({cfg.fits_per_epoch}): the epoch runs as "
                f"equal-size compiled chunks"
            )
        if (cfg.tp_size > 1 or cfg.pp_size > 1 or cfg.ep_size > 1
                or cfg.sp_size > 1 or cfg.zero1):
            raise ValueError(
                "fits_per_program supports single-device runs only "
                "(the parallel modes wrap the fused epoch program); its "
                "target regime — extreme single-chip windows — doesn't "
                "overlap them"
            )
    if cfg.rnn_hidden > 0 or cfg.attn_dim > 0:
        kind = "rnn_hidden" if cfg.rnn_hidden > 0 else "attn_dim"
        if cfg.rnn_hidden > 0 and cfg.attn_dim > 0:
            raise ValueError(
                "rnn_hidden and attn_dim cannot both be set: pick ONE "
                "sequence family (recurrent or attention) per run"
            )
        if cfg.n_experts > 1 or cfg.tp_size > 1 or cfg.pp_size > 1 \
                or cfg.ep_size > 1:
            raise ValueError(
                f"{kind} > 0 (sequence trunks) cannot combine with "
                f"n_experts/tp_size/pp_size/ep_size; sequence training "
                f"shards over the data axis only"
            )
        if not cfg.reset_per_fit:
            raise ValueError(
                f"{kind} > 0 requires reset_per_fit=True: sequence "
                f"updates replay each window from an empty state, so "
                f"windows must start at episode starts"
            )
        if cfg.rnn_hidden > 0 and cfg.rnn_cell not in ("gru", "lstm"):
            raise ValueError(
                f"rnn_cell must be 'gru' or 'lstm', got {cfg.rnn_cell!r}"
            )
        if cfg.attn_dim > 0 and cfg.attn_dim % cfg.attn_heads:
            raise ValueError(
                f"attn_dim ({cfg.attn_dim}) must be divisible by "
                f"attn_heads ({cfg.attn_heads})"
            )
    if cfg.sp_size > 1:
        if cfg.attn_dim <= 0:
            raise ValueError(
                "sp_size > 1 (sequence parallelism) requires attn_dim > 0: "
                "only the attention family computes over the window in "
                "parallel (ring attention); GRU/LSTM scans and feedforward "
                "trunks have no time axis to shard"
            )
        if cfg.rollout_len % cfg.sp_size:
            raise ValueError(
                f"rollout_len ({cfg.rollout_len}) must be divisible by "
                f"sp_size ({cfg.sp_size}): the window shards into "
                f"contiguous equal time blocks"
            )
        if cfg.zero1:
            raise ValueError(
                "sp_size > 1 cannot combine with zero1: the sp update's "
                "gradient reduction spans the (dp, sp) mesh while ZeRO-1 "
                "shards optimizer state over dp alone"
            )
    if cfg.tp_size > 1 and cfg.pp_size > 1:
        raise ValueError(
            "tp_size and pp_size cannot both exceed 1: pick tensor OR "
            "pipeline sharding for the model axis"
        )
    if cfg.zero1 and (cfg.tp_size > 1 or cfg.pp_size > 1
                      or cfg.ep_size > 1):
        raise ValueError(
            "zero1 cannot combine with tp_size/pp_size/ep_size: those "
            "modes already shard optimizer state along the model axis"
        )
    if cfg.ep_size > 1:
        if cfg.tp_size > 1 or cfg.pp_size > 1:
            raise ValueError(
                "ep_size cannot combine with tp_size/pp_size: the model "
                "axis is experts OR tensor OR pipeline"
            )
        if cfg.n_experts <= 1:
            raise ValueError("ep_size > 1 requires n_experts > 1")
        if cfg.n_experts % cfg.ep_size:
            raise ValueError(
                f"n_experts ({cfg.n_experts}) must be divisible by "
                f"ep_size ({cfg.ep_size})"
            )
    if cfg.n_experts > 1 and (cfg.tp_size > 1 or cfg.pp_size > 1):
        raise ValueError(
            "n_experts > 1 (MoE trunks) cannot combine with "
            "tp_size/pp_size; shard experts with ep_size instead"
        )
    if cfg.pp_size > 1:
        n_layers = len(cfg.hidden) + 1
        if n_layers % cfg.pp_size:
            raise ValueError(
                f"{n_layers} MLP layers (hidden={cfg.hidden}) do not "
                f"partition into pp_size={cfg.pp_size} contiguous stages"
            )
    return cfg


# Presets ------------------------------------------------------------------

def reference_preset(env: str = "pendulum", seed: int = 0) -> PPOConfig:
    """Semantics-parity preset: identical step counts, minibatch schedule and
    hyperparameters to the reference driver (src/main.c:33-43)."""
    return PPOConfig(env=env, seed=seed)


def tpu_preset(env: str = "pendulum", seed: int = 0) -> PPOConfig:
    """Throughput preset: many vectorized envs, large minibatches.

    Same algorithm, but sized so the MXU sees real work and the number of
    sequential optimizer steps per second of data collected is far smaller.
    """
    return PPOConfig(
        env=env,
        seed=seed,
        n_envs=1024,
        rollout_len=200,
        minibatch_size=8192,
        fits_per_epoch=1,
        n_epochs_value=10,
        n_epochs_policy=4,
        eval_envs=256,
        eval_len=200,
        # block-shuffled minibatches: the row-level gather is the
        # large-minibatch update's bandwidth wall (docs/RESULTS.md round
        # 5 — reacher phases 3-5x faster, solve-epoch counts identical)
        shuffle_block=1024,
    )


def tuned_preset(env: str = "pendulum", seed: int = 0) -> PPOConfig:
    """Solve-speed preset: what the framework's OWN tooling found.

    A 24-lane sweep.solve_grid dispatch picked lr 1e-3 / clip 0.3, and a
    chip schedule probe cut the update epochs to 5 value + 2 policy (the
    reference's 10+4 over-fits each buffer at these learning rates —
    fewer, larger steps solve in the same epochs at ~half the fit cost).
    Solves Pendulum in 0.060-0.071 s on one v5e chip (70-84x the
    reference; `bench.py --tuned`, docs/RESULTS.md).  The headline bench
    deliberately keeps the reference's exact hyperparameters instead.
    """
    return PPOConfig(
        env=env,
        seed=seed,
        n_envs=64,
        rollout_len=200,
        minibatch_size=256,
        fits_per_epoch=4,
        eval_envs=64,
        eval_len=200,
        kernel_backend="pallas",
        lr_policy=1e-3,
        lr_v=1e-3,
        clip_eps=0.3,
        n_epochs_value=5,
        n_epochs_policy=2,
    )
