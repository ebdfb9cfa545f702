"""Adversarial randomized sweep of the beam completer against the host
DFS oracle (VERDICT round-1 item: the ``proved_inconsistent`` soundness
claim is load-bearing for weld.unweldable_mask and deserves hundreds of
instances, not a handful).

Instance generator: small still lifes (block/eater/tub/beehive/boat/
loaf/pond) placed at random, with random hidden cells and a random
unknown repair ring; plus adversarial perturbations (a spurious ON cell
with little or no unknown space around it) that make many instances
unsatisfiable.

For EVERY instance the sweep asserts:

1. beam ``found`` => the returned incumbent is a genuine still life
   (independent exact Life step), consistent with the instance's known
   cells and contained in state|unknown;
2. beam ``proved_inconsistent`` => the host DFS (reference
   CompleteStableStep semantics, LifeStable.hpp:1340-1412) also returns
   INCONSISTENT — the proof is sound;
3. DFS finds a completion => the beam must NOT claim an inconsistency
   proof (the contrapositive of 2, checked directly);
4. the sweep is not vacuous: both verdicts occur many times.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lifeapi_tpu.core import board, rle
from lifeapi_tpu.core.step import step as life_step
from lifeapi_tpu.stable import complete as C
from lifeapi_tpu.stable import host as H
from lifeapi_tpu.stable import propagate as P

N = 64

STILL_LIFES = [
    "2o$2o!",            # block
    "2b2o$bobo$bo$2o!",  # eater
    "b2o$o2bo$b2o!",     # beehive
    "bo$obo$bo!",        # tub
    "2o$obo$bo!",        # boat
    "b2o$o2bo$bobo$2bo!",  # loaf
    "b2o$o2bo$o2bo$b2o!",  # pond
]


def _instances(rng, n):
    """Build n random instances; returns (state[n,64,64], unknown[n,64,64])."""
    pats = [np.asarray(board.to_dense(rle.parse(s))) for s in STILL_LIFES]
    states, unknowns = [], []
    for i in range(n):
        pat = pats[rng.integers(len(pats))]
        dx, dy = rng.integers(8, 48, 2)
        truth = np.roll(np.roll(pat, dx, axis=0), dy, axis=1)
        kind = rng.integers(3)
        if kind == 0:
            # hidden-cell reconstruction: hide some cells, allow a ring
            hide = (rng.random((N, N)) < 0.35) & H.zoi(truth)
            state = truth & ~hide
            unknown = hide | (H.zoi(truth) & ~truth)
        elif kind == 1:
            # spurious ON cell far from any unknown space: usually UNSAT
            state = truth.copy()
            x, y = rng.integers(8, 48, 2)
            state[(dx + 20 + x) % N, (dy + 20 + y) % N] = True
            unknown = (H.zoi(truth) & ~state) if rng.random() < 0.5 else (
                np.zeros((N, N), bool)
            )
        else:
            # spurious ON cell INSIDE the pattern's ring with repair space:
            # mixed verdicts
            state = truth.copy()
            ring = H.zoi(H.zoi(truth)) & ~truth
            xs, ys = np.nonzero(ring)
            j = rng.integers(len(xs))
            state[xs[j], ys[j]] = True
            unknown = H.zoi(H.zoi(state)) & ~state
            # knock unknown down so repair is not always possible
            unknown &= rng.random((N, N)) < 0.6
        unknown &= ~state
        states.append(state)
        unknowns.append(unknown)
    return np.stack(states), np.stack(unknowns)


@pytest.mark.parametrize("seed", [0])
def test_beam_vs_dfs_adversarial_sweep(seed):
    rng = np.random.default_rng(seed)
    n = 224
    states, unknowns = _instances(rng, n)

    st = P.make(state=jnp.asarray(states), unknown=jnp.asarray(unknowns))
    res = C.complete_stable_beam(st, frontier=8, iters=96, minimise=False)

    # host DFS verdicts via the RAW recursion (C._Search.step, the
    # faithful CompleteStableStep counterpart).  The complete_stable
    # wrapper is NOT a fair oracle here: the reference early-returns
    # COMPLETED when unknown is empty without checking stability
    # (LifeStable.hpp:1418-1420) — the beam instead propagates and
    # correctly proves such instances inconsistent.
    import time

    dfs = []
    for i in range(n):
        hst = H.HostStable(state=states[i], unknown=unknowns[i])
        search = C._Search(time.monotonic() + 10.0, False, False,
                           np.zeros((N, N), bool))
        r = search.step(hst)
        if r == C.CompletionResult.COMPLETED and search.best is None:
            r = C.CompletionResult.INCONSISTENT  # cannot happen w/ inf bound
        dfs.append(r)

    n_proved = 0
    n_found_checked = 0
    for i in range(n):
        assert dfs[i] != C.CompletionResult.TIMEOUT, f"DFS timeout @ {i}"
        if res.found[i]:
            b = board.from_dense(jnp.asarray(res.best[i]))
            # a genuine still life...
            assert bool(board.equal(life_step(b), b)), f"not a still life @ {i}"
            # ...consistent with the knowns: contains every known-ON cell,
            # adds nothing outside state|unknown
            assert (res.best[i] & states[i] == states[i]).all(), i
            assert (res.best[i] & ~(states[i] | unknowns[i])).sum() == 0, i
            n_found_checked += 1
        if res.proved_inconsistent[i]:
            n_proved += 1
            assert dfs[i] == C.CompletionResult.INCONSISTENT, (
                f"unsound inconsistency proof @ {i}"
            )
        if dfs[i] == C.CompletionResult.COMPLETED:
            # DFS found a completion (or the instance was trivially
            # complete): the beam must never prove it inconsistent
            assert not res.proved_inconsistent[i], i

    # the sweep must actually exercise both verdicts
    assert n_found_checked >= 40, n_found_checked
    assert n_proved >= 40, n_proved
