"""Helpers shared by the Pallas kernel modules.

Single home for the vma-inheriting output-struct helper previously
duplicated in ops/pallas_attn.py and ops/pallas_update.py (the two copies
could drift as the vma API evolves — ADVICE r4).
"""
from __future__ import annotations

import jax


def sds(shape, dtype, like) -> jax.ShapeDtypeStruct:
    """Output struct inheriting the varying-axes type of the kernel inputs:
    under shard_map (e.g. the replicated dp fused phases,
    algo/ppo._fused_dp_ready) pallas_call must declare how outputs vary
    across mesh axes; outside shard_map vma is absent and the plain struct
    is returned."""
    try:
        vma = frozenset().union(*(jax.typeof(a).vma for a in like))
    except AttributeError:
        vma = frozenset()
    if not vma:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
