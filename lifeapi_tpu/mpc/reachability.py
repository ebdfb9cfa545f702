"""Reachability pruning over stable-unknown backgrounds.

The reference's dormant options-refined ternary step
(bitslicing/unknown_step_refined.py:51-85, reimplemented closed-form in
stable/bitplane.step_ternary_refined) rolls a board whose unknown cells
are stable unknowns forward as a three-state interval.  This module
turns those intervals into SOUND cost bounds for MPC / catalyst search:
a candidate whose lower Hamming bound at the horizon already exceeds
the incumbent provably cannot reach the target under ANY completion of
the stable background — prune it before paying for exact per-completion
rollouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import board as B
from ..stable import bitplane as BP


def refined_rollout(cur_state, cur_unknown, stable: BP.BitStable, steps):
    """Roll the TRACKED options-refined ternary step ``steps`` generations
    in an on-device scan.  Returns (on, unknown, tracking) packed planes:
    cells in ``on`` are ON in EVERY completion of the stable background,
    cells outside ``on | unknown`` are OFF in every completion.

    Round-3 soundness fix: the plain refined step assumes every unknown
    is a stable unknown, which breaks once a known cell is demoted to
    unknown mid-rollout (brute-force verified unsound).  The tracked step
    (stable/bitplane.step_ternary_tracked) carries a per-cell tracking
    mask and widens neighbour-count intervals for free unknowns, keeping
    every multi-step claim sound; the reference's dormant ``unknown_keep``
    correction (its intended semantics) is the tracked step's ``keep``
    output, which prevents most demotions in stable regions."""

    tracking0 = BP.initial_tracking(cur_state, cur_unknown, stable)

    def body(carry, _):
        s, u, tr = carry
        s, u, tr = BP.step_ternary_tracked(s, u, tr, stable)
        return (s, u, tr), None

    (on, unk, tr), _ = jax.lax.scan(
        body, (cur_state, cur_unknown, tracking0), None, length=steps,
    )
    return on, unk, tr


def hamming_bounds(on, unknown, target):
    """Sound lower/upper bounds on the Hamming cost of a three-state
    board against a LifeTarget: mismatches certain to occur vs
    mismatches that could occur."""
    definitely_on = on
    definitely_off = ~on & ~unknown
    lower = (B.population(target.wanted & definitely_off)
             + B.population(target.unwanted & definitely_on))
    upper = (B.population(target.wanted & ~definitely_on)
             + B.population(target.unwanted & ~definitely_off))
    return lower, upper


def prune_candidates(initials, stable: BP.BitStable, target, steps,
                     max_cost):
    """Batched reachability prefilter: for each candidate initial board
    (active pattern over the SAME partially-unknown stable background),
    interval-roll ``steps`` generations and keep only candidates whose
    lower Hamming bound can still beat ``max_cost``.

    ``initials``: packed uint32[C, 64, 2] current states (unknown cells
    at their stable values); ``stable``: the (propagated) background
    knowledge, unbatched.  Returns (keep bool[C], lower[C], upper[C])."""
    C = initials.shape[0]
    st_b = BP.BitStable(
        jnp.broadcast_to(stable.state, (C, 64, 2)),
        jnp.broadcast_to(stable.unknown, (C, 64, 2)),
        tuple(jnp.broadcast_to(r, (C, 64, 2)) for r in stable.ruled),
    )
    unknown0 = jnp.broadcast_to(stable.unknown, (C, 64, 2))
    on, unk, _ = refined_rollout(initials, unknown0, st_b, steps)
    lower, upper = hamming_bounds(on, unk, target)
    return lower <= max_cost, lower, upper
