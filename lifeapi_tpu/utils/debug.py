"""Consistency-check kernels runnable under a debug flag (SURVEY.md
section 5.2: the reference's SanityCheck is a disabled stub,
LifeStable.hpp:207-214; here the invariants are real and jit-able)."""

from __future__ import annotations

import jax.numpy as jnp


def check_stable_invariants(st):
    """Returns a dict of bool[...] invariant checks for a stable.Stable:
    every violation indicates internal inconsistency, not merely an
    unsatisfiable CSP."""
    from ..stable import options as opt

    state_and_unknown_disjoint = ~jnp.any(st.state & st.unknown, axis=(-2, -1))
    known_on_has_dead_ruled = ~jnp.any(
        (st.state & ~st.unknown)
        & ((st.ruled & opt.DEAD_MASK) != opt.DEAD_MASK),
        axis=(-2, -1),
    )
    return {
        "state_unknown_disjoint": state_and_unknown_disjoint,
        "known_on_dead_ruled": known_on_has_dead_ruled,
    }


def assert_stable_invariants(st):
    import numpy as np

    checks = check_stable_invariants(st)
    for name, ok in checks.items():
        assert bool(np.asarray(ok).all()), f"stable invariant violated: {name}"


def check_board_packed(board):
    """Packed boards are uint32[..., 64, 2]."""
    assert board.dtype == jnp.uint32, board.dtype
    assert board.shape[-2:] == (64, 2), board.shape
