"""Segmented run reduction over batched sorted key rows.

After a ``lax.sort`` by key, equal keys form contiguous runs. For runs of
bounded length, a Hillis-Steele shift-compare-add doubling loop computes
every position's within-run prefix sum in ceil(log2(max_run)) steps — no
scatters, no segment ids. The run TOTAL lands on each run's LAST element.

Shared by the impact-ordered inverted index (index/inverted.py) and PLAID
candidate generation (index/plaid.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def segmented_run_totals(keys, vals, max_run: int):
    """(keys [Q, L] sorted per row, vals [Q, L], run length ≤ max_run) →
    (prefix [Q, L] within-run inclusive prefix sums, is_end [Q, L] bool
    marking each run's last element, where ``prefix`` holds the run total).
    """
    q = keys.shape[0]
    seg = vals
    # shifts beyond the row length are no-ops (a run cannot exceed L);
    # without the clamp an over-estimated max_run > 2·L pads an empty
    # slice wider than the row and crashes with a broadcast error
    max_run = min(max_run, keys.shape[1])
    d = 1
    while d < max_run:
        keys_shift = jnp.pad(keys[:, :-d], ((0, 0), (d, 0)), constant_values=-1)
        seg_shift = jnp.pad(seg[:, :-d], ((0, 0), (d, 0)))
        seg = seg + jnp.where(keys_shift == keys, seg_shift, 0.0)
        d *= 2
    is_end = jnp.concatenate(
        [keys[:, 1:] != keys[:, :-1], jnp.ones((q, 1), bool)], axis=1
    )
    return seg, is_end
