"""Shared VMEM chunk-count search for the whole-program Pallas kernels.

The whole-rollout kernel (ops/pallas_rollout.py) and the fused GAE kernel
(ops/pallas_gae.py) both hold [T, E]-shaped planes in scoped VMEM and chunk
the env axis through the grid when the single-shot footprint exceeds the
hardware budget (grid cells are double-buffered by the block pipeline, so
the per-cell budget is roughly half the single-shot one).  The divisor
search is identical for both and lives here so VMEM lessons are applied
once.
"""
from __future__ import annotations

from typing import Callable, Optional


def search_chunks(E: int, cell_ok: Callable[[int], bool]) -> Optional[int]:
    """Smallest chunk count ``C > 1`` such that the env axis splits into C
    equal 128-lane-aligned cells of ``E // C`` envs each and
    ``cell_ok(E // C)`` accepts the per-cell footprint.

    Any divisor works as a grid size (not just powers of two: E=384 chunks
    as 3 x 128).  Returns None when no aligned chunking fits.
    """
    for C in range(2, E // 128 + 1):
        if E % C or (E // C) % 128:
            continue
        if cell_ok(E // C):
            return C
    return None
