"""The 16 point-symmetry transforms of the 64x64 torus.

Counterpart of reference Symmetry.hpp:7-173.  Each transform is an affine
index map on the dense view — compositions of axis swap, axis flip
(coordinate c -> -1-c, the "even" reflections whose axis lies between
cells) and flip+roll (c -> -c, the "odd" ones whose axis lies on a cell
row/column).  The reference implements these as compositions of
FlipX/FlipY/Transpose/Move (Symmetry.hpp:105-173); the index maps below are
the same functions, verified against that composition in tests.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

class SymmetryTransform(enum.IntEnum):
    """Reference Symmetry.hpp:7-26.  Even = axis between cells; odd = axis
    on a cell row/column.  ReflectAcrossYeqNegXP1 reflects across
    y = -x + 3/2, fixing (0, 0) (needed for D4x_1)."""

    Identity = 0
    ReflectAcrossXEven = 1
    ReflectAcrossX = 2
    ReflectAcrossYEven = 3
    ReflectAcrossY = 4
    Rotate90Even = 5
    Rotate90 = 6
    Rotate270Even = 7
    Rotate270 = 8
    Rotate180OddBoth = 9
    Rotate180EvenHorizontal = 10
    Rotate180EvenVertical = 11
    Rotate180EvenBoth = 12
    ReflectAcrossYeqX = 13
    ReflectAcrossYeqNegX = 14
    ReflectAcrossYeqNegXP1 = 15


ALL_TRANSFORMS = tuple(SymmetryTransform)

# (swap_axes, x_op, y_op): ops applied after the optional transpose;
# "id" = identity, "even" = c -> -1-c (pure flip), "odd" = c -> -c
# (flip then roll by 1).  result[x, y] = orig[m(x, y)] with m as documented
# per-case in the class docstring derivation.
_SPEC = {
    SymmetryTransform.Identity: (False, "id", "id"),
    SymmetryTransform.ReflectAcrossXEven: (False, "id", "even"),
    SymmetryTransform.ReflectAcrossX: (False, "id", "odd"),
    SymmetryTransform.ReflectAcrossYEven: (False, "even", "id"),
    SymmetryTransform.ReflectAcrossY: (False, "odd", "id"),
    SymmetryTransform.Rotate90Even: (True, "even", "id"),
    SymmetryTransform.Rotate90: (True, "odd", "id"),
    SymmetryTransform.Rotate270Even: (True, "id", "even"),
    SymmetryTransform.Rotate270: (True, "id", "odd"),
    SymmetryTransform.Rotate180OddBoth: (False, "odd", "odd"),
    SymmetryTransform.Rotate180EvenHorizontal: (False, "even", "odd"),
    SymmetryTransform.Rotate180EvenVertical: (False, "odd", "even"),
    SymmetryTransform.Rotate180EvenBoth: (False, "even", "even"),
    SymmetryTransform.ReflectAcrossYeqX: (True, "id", "id"),
    SymmetryTransform.ReflectAcrossYeqNegX: (True, "even", "even"),
    SymmetryTransform.ReflectAcrossYeqNegXP1: (True, "odd", "odd"),
}


def transform_inverse(t):
    """Reference ``TransformInverse`` (Symmetry.hpp:47-55)."""
    t = SymmetryTransform(t)
    m = {
        SymmetryTransform.Rotate90Even: SymmetryTransform.Rotate270Even,
        SymmetryTransform.Rotate90: SymmetryTransform.Rotate270,
        SymmetryTransform.Rotate270Even: SymmetryTransform.Rotate90Even,
        SymmetryTransform.Rotate270: SymmetryTransform.Rotate90,
    }
    return m.get(t, t)


def _axis_op(dense, op, axis):
    if op == "id":
        return dense
    flipped = jnp.flip(dense, axis=axis)
    if op == "even":
        return flipped
    return jnp.roll(flipped, 1, axis=axis)


def transform_dense(dense, t):
    """Apply transform ``t`` to a dense bool grid [..., 64, 64]."""
    swap, x_op, y_op = _SPEC[SymmetryTransform(t)]
    d = dense
    if swap:
        d = jnp.swapaxes(d, -1, -2)
    d = _axis_op(d, x_op, -2)
    d = _axis_op(d, y_op, -1)
    return d


def transform(board, t):
    """Apply transform ``t`` to a packed board (reference
    ``LifeState::Transform``, Symmetry.hpp:105-173).

    Bit-permutation pipeline on the packed representation — no dense
    round-trip: transpose is the block-swap network (core.board.transpose),
    the y ops are bitrev32 word reversal (flip_x) + 64-bit rotate, the x
    ops are column reversal + column roll.  ``transform_dense`` remains the
    independently-derived oracle (tests/test_symmetry.py)."""
    from ..core import board as B

    t = SymmetryTransform(t)
    if t == SymmetryTransform.Identity:
        return board
    swap, x_op, y_op = _SPEC[t]
    out = board
    if swap:
        out = B.transpose(out, which_diagonal=False)
    if x_op != "id":
        out = B.flip_y(out)  # x -> -1-x (column reversal)
        if x_op == "odd":
            out = B.roll_x(out, 1)
    if y_op != "id":
        out = B.flip_x(out)  # y -> -1-y (bit reversal)
        if y_op == "odd":
            out = B.roll_y(out, 1)
    return out


def transform_moved(board, dx, dy, t):
    """Reference ``Transform(dx, dy, transf)`` (LifeAPI.hpp:803-806):
    move first, then transform."""
    from ..core.board import move

    return transform(move(board, dx, dy), t)


def commute_translation(t, vec):
    """How a translation commutes past a transform: T . move(v) =
    move(commute(T, v)) . T (reference ``CommuteTranslation``,
    Symmetry.hpp:344-383)."""
    x, y = vec
    t = SymmetryTransform(t)
    table = {
        SymmetryTransform.Identity: (x, y),
        SymmetryTransform.ReflectAcrossXEven: (x, -y),
        SymmetryTransform.ReflectAcrossX: (x, -y),
        SymmetryTransform.ReflectAcrossYEven: (-x, y),
        SymmetryTransform.ReflectAcrossY: (-x, y),
        SymmetryTransform.Rotate90Even: (-y, x),
        SymmetryTransform.Rotate90: (-y, x),
        SymmetryTransform.Rotate270Even: (y, -x),
        SymmetryTransform.Rotate270: (y, -x),
        SymmetryTransform.Rotate180OddBoth: (-x, -y),
        SymmetryTransform.Rotate180EvenHorizontal: (-x, -y),
        SymmetryTransform.Rotate180EvenVertical: (-x, -y),
        SymmetryTransform.Rotate180EvenBoth: (-x, -y),
        SymmetryTransform.ReflectAcrossYeqX: (y, x),
        SymmetryTransform.ReflectAcrossYeqNegX: (-y, -x),
        SymmetryTransform.ReflectAcrossYeqNegXP1: (-y, -x),
    }
    return table[t]
