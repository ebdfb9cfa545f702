"""Lattice tricks: 2:1 downscales and shear maps used for diagonal-symmetry
offset math (reference Symmetry.hpp:656-727)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.board import from_dense, to_dense

N = 64


def halve_x(board):
    """Keep even columns, duplicated into both board halves (reference
    ``HalveX``, Symmetry.hpp:692-699)."""
    d = to_dense(board)
    half = d[..., 0::2, :]
    return from_dense(jnp.concatenate([half, half], axis=-2))


def halve_y(board):
    """Compress even rows of every column into the low half, duplicated
    (reference ``HalveY``, Symmetry.hpp:701-709, built on the Hacker's
    Delight compress_right)."""
    d = to_dense(board)
    half = d[..., :, 0::2]
    return from_dense(jnp.concatenate([half, half], axis=-1))


def halve(board):
    """2:1 downscale in both axes, result replicated in all four quadrants
    (reference ``Halve``, Symmetry.hpp:681-690)."""
    d = to_dense(board)
    q = d[..., 0::2, 0::2]
    row = jnp.concatenate([q, q], axis=-1)
    return from_dense(jnp.concatenate([row, row], axis=-2))


def skew(board):
    """(x, y) -> (x, y + x) shear (reference ``Skew``, Symmetry.hpp:712-718)."""
    d = to_dense(board)
    idx = (jnp.arange(N)[None, :] - jnp.arange(N)[:, None]) % N
    return from_dense(jnp.take_along_axis(d, jnp.broadcast_to(idx, d.shape), axis=-1))


def inv_skew(board):
    """(x, y) -> (x, y - x) shear (reference ``InvSkew``, Symmetry.hpp:721-727)."""
    d = to_dense(board)
    idx = (jnp.arange(N)[None, :] + jnp.arange(N)[:, None]) % N
    return from_dense(jnp.take_along_axis(d, jnp.broadcast_to(idx, d.shape), axis=-1))
