"""Dense numpy oracle implementations used for differential testing.

Everything here is deliberately naive and independent of the packed bitboard
code paths (the same testing strategy as the reference's StepAltTest,
tests/StepAltTest.cpp:5-13: two independently derived implementations must
agree)."""

import numpy as np

N = 64


def life_step_dense(grid):
    """B3/S23 on a [.., 64, 64] bool grid indexed [x, y], torus."""
    g = np.asarray(grid).astype(np.int32)
    count = np.zeros_like(g)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            count += np.roll(np.roll(g, dx, axis=-2), dy, axis=-1)
    return (count == 3) | ((g == 1) & (count == 2))


def neighbour_count_dense(grid, include_center=True):
    g = np.asarray(grid).astype(np.int32)
    count = np.zeros_like(g)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if not include_center and dx == 0 and dy == 0:
                continue
            count += np.roll(np.roll(g, dx, axis=-2), dy, axis=-1)
    return count


def dilate_dense(grid, kernel_cells):
    """OR-dilation: result[x+c, y+d] |= grid[x, y] for each (c, d) kernel
    cell — index-sum semantics of the reference's Convolve
    (LifeAPI.hpp:1284-1370)."""
    g = np.asarray(grid).astype(bool)
    out = np.zeros_like(g)
    for c, d in kernel_cells:
        out |= np.roll(np.roll(g, c, axis=-2), d, axis=-1)
    return out


def random_dense(rng, p=0.3, batch=()):
    return rng.random((*batch, N, N)) < p
