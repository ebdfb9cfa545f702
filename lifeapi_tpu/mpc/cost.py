"""Cost heads for the MPC engine.

Hamming distance to a LifeTarget is the primary cost (north star); the
LifeStable background constraint and control effort enter as penalties.
All costs exist in a soft (differentiable, on probabilities) and a hard
(exact, on packed boards) form.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import board as B
from ..target import LifeTarget, hamming_cost


class CostWeights(NamedTuple):
    target: float = 1.0
    control: float = 0.01
    stable: float = 0.5
    # weight on the MEAN per-step target cost along the trajectory; > 0
    # rewards reaching (and holding) the target early — essential for
    # receding-horizon control, where a terminal-only cost lets every plan
    # defer the work past the applied window
    path: float = 0.0


def soft_target_cost(p, target: LifeTarget):
    """Expected Hamming violation at a probability board."""
    wanted = B.to_dense(target.wanted).astype(p.dtype)
    unwanted = B.to_dense(target.unwanted).astype(p.dtype)
    return jnp.sum(wanted * (1.0 - p) + unwanted * p, axis=(-2, -1))


def soft_target_cost_any_time(traj, target: LifeTarget, tau=0.5):
    """Soft-min over the horizon of the per-step target cost — for
    objectives where reaching the target at ANY generation counts (the
    usual search-program acceptance, cf. reference Contains checks inside
    stepping loops).  traj: [T, ..., 64, 64]."""
    per_step = soft_target_cost(traj, target)  # [T, ...]
    return -tau * jax.nn.logsumexp(-per_step / tau, axis=0)


def hard_target_cost_any_time(board_traj, target: LifeTarget):
    """Exact min over a packed trajectory [T, ..., 64, 2]."""
    return jnp.min(hamming_cost(board_traj, target), axis=0)


def soft_control_cost(controls):
    """L1 effort on toggle probabilities, summed over horizon and cells."""
    return jnp.sum(controls, axis=(0, -2, -1))


def soft_stable_cost(traj, protected):
    """Penalty for disturbing a protected (still-life background) region:
    total probability mass of deviation from the initial configuration over
    the trajectory.  protected: packed or dense mask; traj: [T, ..., 64, 64]
    with traj0 the background state probabilities."""
    mask = protected if protected.dtype != jnp.uint32 else B.to_dense(protected)
    mask = mask.astype(traj.dtype)
    dev = jnp.abs(traj - traj[:1])
    return jnp.sum(dev * mask, axis=(0, -2, -1))


def soft_total(p_final, traj, controls, target, protected, w: CostWeights):
    c = w.target * soft_target_cost(p_final, target)
    c = c + w.control * soft_control_cost(controls)
    # w.path may be a traced leaf of the problem pytree; always include
    # the term (it is zero-weighted when path == 0)
    c = c + w.path * jnp.mean(soft_target_cost(traj, target), axis=0)
    if protected is not None:
        c = c + w.stable * soft_stable_cost(traj, protected)
    return c


def hard_total(board_final, toggles, target, protected_board, background,
               w: CostWeights):
    """Exact integer-valued counterpart used to score binarized candidates.
    ``background``: packed board of the protected region's intended state."""
    c = w.target * hamming_cost(board_final, target).astype(jnp.float32)
    c = c + w.control * B.population(toggles).sum(axis=0).astype(jnp.float32)
    if protected_board is not None:
        dev = (board_final ^ background) & protected_board
        c = c + w.stable * B.population(dev).astype(jnp.float32)
    return c
