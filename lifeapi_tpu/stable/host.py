"""Pure-NumPy mirror of the stable propagation kernels.

Used by the host-side DFS completer (complete.py) and as an independent
implementation for differential tests against the jax path.  Shares the
LUTs of options.py; single board, dense [64, 64] arrays.
"""

from __future__ import annotations

import numpy as np

from . import options as opt

N = 64


def count9(x):
    x = x.astype(np.int32)
    v = x + np.roll(x, 1, axis=1) + np.roll(x, -1, axis=1)
    return v + np.roll(v, 1, axis=0) + np.roll(v, -1, axis=0)


def zoi(x):
    v = x | np.roll(x, 1, axis=1) | np.roll(x, -1, axis=1)
    return v | np.roll(v, 1, axis=0) | np.roll(v, -1, axis=0)


def big_zoi(x):
    """Reference ``BigZOI`` dilation (LifeAPI.hpp:564-591): plus-dilate,
    then horizontal 3-dilate, then vertical 3-dilate."""
    b = (x | np.roll(x, 1, axis=1) | np.roll(x, -1, axis=1)
         | np.roll(x, 1, axis=0) | np.roll(x, -1, axis=0))
    c = b | np.roll(b, 1, axis=0) | np.roll(b, -1, axis=0)
    return c | np.roll(c, 1, axis=1) | np.roll(c, -1, axis=1)


def zoi_hollow(x):
    v = x | np.roll(x, 1, axis=1) | np.roll(x, -1, axis=1)
    mid = np.roll(x, 1, axis=1) | np.roll(x, -1, axis=1)
    return np.roll(v, 1, axis=0) | np.roll(v, -1, axis=0) | mid


class HostStable:
    """Mutable host-side mirror of propagate.Stable."""

    __slots__ = ("state", "unknown", "ruled")

    def __init__(self, state=None, unknown=None, ruled=None):
        self.state = np.zeros((N, N), bool) if state is None else state.astype(bool).copy()
        self.unknown = np.zeros((N, N), bool) if unknown is None else unknown.astype(bool).copy()
        if self.state.any():
            self.unknown &= ~self.state
        self.ruled = (
            np.zeros((N, N), np.uint8) if ruled is None else ruled.astype(np.uint8).copy()
        )

    def copy(self):
        return HostStable(self.state, self.unknown, self.ruled)

    def center_code(self):
        return np.where(self.unknown, opt.UNKNOWN, self.state.astype(np.int32))

    def set_on(self, cells):
        self.state |= cells
        self.unknown &= ~cells
        self.ruled[cells] |= opt.DEAD_MASK

    def set_off(self, cells):
        self.state &= ~cells
        self.unknown &= ~cells
        self.ruled[cells] |= opt.LIVE_MASK

    # -- kernels (mirror propagate.py; reference LifeStable.hpp:526-729) ---

    def synchronise_state_known(self):
        known_on = ~self.unknown & self.state
        known_off = ~self.unknown & ~self.state
        maybe_dead_b = (self.ruled & opt.DEAD_MASK) != opt.DEAD_MASK
        maybe_live_b = (self.ruled & opt.LIVE_MASK) != opt.LIVE_MASK
        changes = (maybe_dead_b & known_on) | (maybe_live_b & known_off)
        self.ruled[known_on] |= opt.DEAD_MASK
        self.ruled[known_off] |= opt.LIVE_MASK
        maybe_dead = (self.ruled & opt.DEAD_MASK) != opt.DEAD_MASK
        maybe_live = (self.ruled & opt.LIVE_MASK) != opt.LIVE_MASK
        if (~maybe_live & ~maybe_dead).any():
            return False, False
        forced_on = maybe_live & ~maybe_dead
        changes |= ~self.state & forced_on
        self.state |= forced_on
        still_unknown = maybe_live & maybe_dead
        changes |= self.unknown & ~still_unknown
        self.unknown &= still_unknown
        return True, bool(changes.any())

    def update_options(self):
        lut = opt.update_lut()
        out = lut[self.center_code(), count9(self.state), count9(self.unknown)]
        add = (out & 0xFF).astype(np.uint8)
        if ((out >> 8) != 0).any():
            return False, False
        changed = bool((add & ~self.ruled).any())
        self.ruled |= add
        return True, changed

    def signal_neighbours(self):
        lut = opt.signal_lut()
        on9 = count9(self.state)
        m9 = count9(self.state | self.unknown)
        bits = lut[self.center_code(), self.ruled.astype(np.int32), on9, m9]
        off_zoi = zoi_hollow((bits & 2) != 0) | ((bits & 8) != 0)
        on_zoi = zoi_hollow((bits & 1) != 0) | ((bits & 4) != 0)
        if (off_zoi & on_zoi & self.unknown).any():
            return False, False
        changes = bool(((off_zoi | on_zoi) & self.unknown).any())
        self.set_off(off_zoi & self.unknown)
        self.set_on(on_zoi & self.unknown)
        return True, changes

    def propagate_step(self):
        ok, c1 = self.synchronise_state_known()
        if not ok:
            return False, False
        ok, c2 = self.update_options()
        if not ok:
            return False, False
        ok, c3 = self.signal_neighbours()
        if not ok:
            return False, False
        return True, c1 | c2 | c3

    def propagate(self):
        ever = False
        while True:
            ok, changed = self.propagate_step()
            if not ok:
                return False, False
            if not changed:
                return True, ever
            ever = True

    def perturbed_unknowns(self):
        return (self.ruled != 0) & self.unknown

    def vulnerable(self):
        lut = opt.vulnerable_lut()
        bits = lut[
            self.ruled.astype(np.int32), count9(self.state), count9(self.unknown)
        ]
        on = zoi_hollow((bits & 1) != 0) | ((bits & 4) != 0)
        off = zoi_hollow((bits & 2) != 0) | ((bits & 8) != 0)
        return on & off
