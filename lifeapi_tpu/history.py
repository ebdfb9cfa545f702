"""LifeHistory: 4-plane Golly "LifeHistory" overlay for visualization and
interchange (reference LifeHistory.hpp:8-105)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np

from .core import board as board_mod
from .core import rle as rle_mod


class LifeHistory(NamedTuple):
    state: jax.Array
    history: jax.Array
    marked: jax.Array
    original: jax.Array

    @staticmethod
    def create(state=None, history=None, marked=None, original=None):
        e = board_mod.empty()
        return LifeHistory(
            e if state is None else state,
            e if history is None else history,
            e if marked is None else marked,
            e if original is None else original,
        )

    def move(self, dx, dy):
        return LifeHistory(*(board_mod.move(p, dx, dy) for p in self))

    def align_with(self, other):
        """Reference LifeHistory.hpp:56-59."""
        from .core import convolve as convolve_mod

        offset = np.asarray(board_mod.first_on(convolve_mod.match(self.state, other)))
        return self.move(-int(offset[0]), -int(offset[1]))

    def rle(self):
        return write_rle(self)

    def rle_with_header(self):
        return "x = 0, y = 0, rule = LifeHistory\n" + self.rle()


def state_to_char(mask):
    """Reference ``StateToChar`` (LifeHistory.hpp:32-42)."""
    return {0b0000: ".", 0b0001: "A", 0b0010: "B", 0b0101: "C",
            0b0100: "D", 0b1001: "E"}.get(mask, "F")


def write_rle(h: LifeHistory):
    """Reference LifeHistory.hpp:62-68."""
    s = np.asarray(board_mod.to_dense(h.state))
    hist = np.asarray(board_mod.to_dense(h.history))
    m = np.asarray(board_mod.to_dense(h.marked))
    o = np.asarray(board_mod.to_dense(h.original))

    def char(x, y):
        val = int(s[x, y]) + (int(hist[x, y]) << 1) + (int(m[x, y]) << 2) + (
            int(o[x, y]) << 3
        )
        return state_to_char(val)

    return rle_mod.write_rle_planes(char)


_PARSE_CHARMAP = {
    "A": ("state",),
    "B": ("history",),
    "C": ("state", "marked"),
    "D": ("marked",),
    "E": ("state", "original"),
}

_BELLMAN_CHARMAP = {"C": ("state",), "E": ("history",)}


def _from_planes(planes):
    import jax.numpy as jnp

    def get(name):
        if name in planes:
            return board_mod.from_dense(jnp.asarray(planes[name]))
        return board_mod.empty()

    return LifeHistory(get("state"), get("history"), get("marked"), get("original"))


def parse(rle):
    """Reference ``LifeHistory::Parse`` (LifeHistory.hpp:70-92)."""
    return _from_planes(rle_mod.parse_dense(rle, _PARSE_CHARMAP))


def parse_bellman(rle):
    """Reference ``ParseBellman`` (LifeHistory.hpp:94-105): Bellman-rule
    RLEs use C for state and E for history."""
    return _from_planes(rle_mod.parse_dense(rle, _BELLMAN_CHARMAP))
