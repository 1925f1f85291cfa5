"""Expert parallelism: shard a mixture-of-experts trunk over an ``ep`` axis.

SURVEY.md §2a lists expert parallelism as absent from the reference (no
MoE); this module supplies it for the MoE model family (models/moe.py) to
the same integrated standard as TP (parallel/tp.py) and PP (parallel/pp.py):
``PPOConfig(n_experts=E, ep_size=N)`` trains on a (dp, ep) mesh through the
ordinary Trainer (algo/trainer.py._init_ep).

The layout is deliberately simpler than TP's: the stacked expert leaves
``[(W [E, i, o], b [E, o]), ...]`` already carry the sharding dim in front,
so placing them is a plain ``PartitionSpec("ep")`` on dim 0 — shard_map
slices E -> E/ep on entry and reassembles on exit.  No pack/unpack/unshard
trio is needed; checkpoints always hold the logical (full-E) layout and are
interchangeable with single-device MoE runs (tests/test_ep.py).

Communication per forward: one psum of the mixture output over ``ep``
(models/moe.apply).  Gradients: expert-leaf grads are local by construction
(disjoint parameters); the REPLICATED router's autodiff gradient on each
rank covers only that rank's gate slice, and shard_map's autodiff closes
the gap itself — transposing the invariant->varying conversion (pvary)
psums the partial cotangents over ``ep`` — so after backward every rank
holds the full router gradient and rank-local Adam keeps the router
bit-identical everywhere, with no collective outside the autodiff graph
(the same "transposes correctly" property TP relies on; verified against
the single-device mixture in tests/test_ep.py).
"""
from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def trunk_spec(moe_params, axis_name: str = "ep"):
    """PartitionSpec pytree for a MoE trunk: expert leaves shard their
    leading (expert) dim over ``axis_name``; the router is replicated."""
    return {
        "router": jax.tree.map(lambda _: P(), moe_params["router"]),
        "experts": jax.tree.map(
            lambda leaf: P(axis_name), moe_params["experts"]
        ),
    }
