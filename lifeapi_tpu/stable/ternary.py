"""Ternary (three-state) Life stepping: boards with UNKNOWN cells.

This is the vocabulary of the reference's dormant ``bitslicing/
unknown_step*.py`` generators (SURVEY.md section 2.6): stepping a board
whose cells are ON/OFF/UNKNOWN, propagating intervals of possible
neighbour counts.  The MPC relaxation uses exactly this semantics for
reachability pruning.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import options as opt
from .propagate import count9


def step_ternary(state, unknown, naive=False):
    """One interval Life step.  ``state``/``unknown``: dense bool
    [..., 64, 64].  Returns (next_state, next_unknown).

    ``naive=True`` matches the reference's unknown_step.py netlist exactly
    (UNKNOWN centers stay UNKNOWN); the default also resolves unknown
    centers whose fate is independent of their value."""
    from . import rules_vec

    on9 = count9(state)
    unk9 = count9(unknown)
    center = jnp.where(unknown, jnp.int32(opt.UNKNOWN), state.astype(jnp.int32))
    nxt = rules_vec.ternary_code(center, on9, unk9, naive=naive)
    return nxt == opt.ON, nxt == opt.UNKNOWN


def step_ternary_n(state, unknown, n, naive=False):
    import jax

    def body(carry, _):
        s, u = carry
        s, u = step_ternary(s, u, naive=naive)
        return (s, u), None

    (s, u), _ = jax.lax.scan(body, (state, unknown), None, length=n)
    return s, u
