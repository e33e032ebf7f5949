"""Shared helpers for the fused kernels."""

from __future__ import annotations


def auto_lanes(B, bytes_per_lane, lanes=None, budget=4 * 1024 * 1024):
    """Pick problems-per-grid-step: the largest of {8, 4, 2, 1} dividing B
    whose lane block fits the VMEM budget; validates an explicit choice
    (a non-dividing lanes would truncate the grid and leave tail lanes
    uninitialized)."""
    if lanes is None:
        for cand in (8, 4, 2):
            if B % cand == 0 and cand * bytes_per_lane <= budget:
                return cand
        return 1
    if B % lanes != 0:
        raise ValueError(
            f"lanes={lanes} must divide the batch size B={B} (a truncated "
            "grid would leave the tail lanes uninitialized)"
        )
    return lanes
