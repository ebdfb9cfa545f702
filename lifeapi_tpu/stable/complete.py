"""Still-life completion search: find a stable background consistent with a
partial board.

Two engines with the same result contract as the reference
``CompleteStable`` (LifeStable.hpp:1340-1458: return *a* valid still life,
minimal population when ``minimise``):

* :func:`complete_stable` — host-side DFS branch-and-bound, a faithful
  counterpart of the reference recursion, running on the NumPy kernel
  mirror.  The correctness oracle and the single-problem API.
* :func:`complete_stable_beam` — the TPU-native engine: a batched frontier
  (beam) search where thousands of branch candidates propagate per kernel
  call under jit (SURVEY.md section 7 "batched best-first/beam search").
"""

from __future__ import annotations

import enum
import time
from typing import NamedTuple

import numpy as np

from . import options as opt
from .host import HostStable, count9, zoi


class CompletionResult(enum.Enum):
    COMPLETED = 0
    INCONSISTENT = 1
    TIMEOUT = 2


def _first_on(mask):
    xs, ys = np.nonzero(mask)
    if len(xs) == 0:
        return None
    return int(xs[0]), int(ys[0])


def _branch_cell(st: HostStable, settable):
    """Branch-cell heuristic (reference LifeStable.hpp:1377-1391):
    vulnerable first, then cells with exactly 2 then 3 unknowns in their
    window, then anything settable."""
    cell = _first_on(st.vulnerable() & settable)
    if cell is not None:
        return cell
    unk9 = count9(st.unknown)
    cell = _first_on(settable & (unk9 == 2))
    if cell is not None:
        return cell
    cell = _first_on(settable & (unk9 == 3))
    if cell is not None:
        return cell
    return _first_on(settable)


class _Search:
    def __init__(self, deadline, minimise, use_seed, seed):
        self.deadline = deadline
        self.minimise = minimise
        self.use_seed = use_seed
        self.seed = seed
        self.best = None
        self.max_pop = np.inf

    def step(self, st: HostStable):
        """Reference ``CompleteStableStep`` (LifeStable.hpp:1340-1412)."""
        while True:  # manual tail call for the ON branch (:1409)
            if time.monotonic() > self.deadline:
                return CompletionResult.TIMEOUT
            ok, _ = st.propagate()
            if not ok:
                return CompletionResult.INCONSISTENT

            current_pop = int(st.state.sum())
            if current_pop >= self.max_pop:
                return CompletionResult.COMPLETED

            dead0_ruled = (st.ruled & opt.DEAD0) != 0
            settable = st.perturbed_unknowns() & zoi(dead0_ruled)
            if not settable.any():
                self.best = st.state.copy()
                self.max_pop = current_pop
                return CompletionResult.COMPLETED

            if self.use_seed:
                seed_zoi = self.seed.copy()
                while not (settable & seed_zoi).any():
                    seed_zoi = zoi(seed_zoi)
                settable = settable & seed_zoi

            cell = _branch_cell(st, settable)
            if cell is None:
                return CompletionResult.INCONSISTENT

            mask = np.zeros_like(st.state)
            mask[cell] = True

            off_branch = st.copy()
            off_branch.set_off(mask)
            result = self.step(off_branch)
            if result == CompletionResult.TIMEOUT:
                return CompletionResult.TIMEOUT
            if not self.minimise and result == CompletionResult.COMPLETED:
                return CompletionResult.COMPLETED

            st.set_on(mask)
            # loop = tail recursion on the ON branch


def complete_stable(st: HostStable, timeout=1.0, minimise=False, use_seed=False,
                    seed=None):
    """Reference ``CompleteStable`` (LifeStable.hpp:1414-1458).  Returns
    (CompletionResult, dense bool[64, 64] best still life)."""
    empty = np.zeros((64, 64), bool)
    if not st.state.any():
        return CompletionResult.COMPLETED, empty
    if not st.unknown.any():
        return CompletionResult.COMPLETED, st.state.copy()

    deadline = time.monotonic() + timeout
    search = _Search(deadline, minimise, use_seed, seed if seed is not None else empty)

    result = CompletionResult.TIMEOUT
    search_area = zoi(st.state)
    while (st.unknown & ~search_area).any():
        search_area = zoi(search_area)
        copy = st.copy()
        copy.unknown &= search_area
        result = search.step(copy)
        if (search.best is not None and search.best.any()) or time.monotonic() > deadline:
            break
    else:
        copy = st.copy()
        result = search.step(copy)

    best_empty = search.best is None or not search.best.any()
    if result == CompletionResult.TIMEOUT and best_empty:
        return CompletionResult.TIMEOUT, empty
    if result == CompletionResult.INCONSISTENT and best_empty:
        return CompletionResult.INCONSISTENT, empty

    if minimise:
        big = zoi(zoi(zoi(search_area)))
        copy = st.copy()
        copy.unknown &= big
        search.use_seed = True
        search.seed = st.state | (search.best if search.best is not None else empty)
        search.step(copy)

    return CompletionResult.COMPLETED, (
        search.best if search.best is not None else empty
    )



# ---------------------------------------------------------------------------
# Batched TPU beam search
# ---------------------------------------------------------------------------


class BeamResult(NamedTuple):
    found: "np.ndarray"  # bool[B]
    best: "np.ndarray"  # bool[B, 64, 64]
    best_pop: "np.ndarray"  # int32[B]
    # True iff the search ran to exhaustion WITHOUT ever dropping an
    # active candidate (frontier never overflowed) and found nothing: a
    # sound proof the instance has no completion (reference
    # ``CompletionResult::INCONSISTENT``, LifeStable.hpp:186-190).
    proved_inconsistent: "np.ndarray" = None  # bool[B]


def _propagate_frontier(cur, fused, interpret):
    """Propagate a [B, F] frontier of BitStables and compute the
    branch-priority level masks of the result.  The fused path runs BOTH
    in one Pallas call (ops/stable_pallas.propagate_fused_beam) on a flat
    [B*F] batch in kernel layout; the jnp path composes
    bitplane.propagate + bitplane.branch_levels.  Returns
    (BitPropagateResult, levels 4-tuple of packed masks)."""
    from . import bitplane as BP

    if not fused:
        res = BP.propagate(cur)
        return res, BP.branch_levels(res.stable)

    import jax.numpy as jnp

    from ..ops import stable_pallas as SP

    B, F = cur.state.shape[:2]
    flat = B * F
    tile = 128 if flat >= 128 else flat
    pad = (-flat) % tile

    def flatten(x):
        x = x.reshape((flat,) + x.shape[2:])
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        return x

    fbst = BP.BitStable(
        flatten(cur.state), flatten(cur.unknown),
        tuple(flatten(r) for r in cur.ruled),
    )
    res, flat_levels = SP.propagate_fused_beam(fbst, batch_tile=tile,
                                               interpret=interpret)

    def unflatten(x):
        return x[:flat].reshape((B, F) + x.shape[1:])

    st = BP.BitStable(
        unflatten(res.stable.state), unflatten(res.stable.unknown),
        tuple(unflatten(r) for r in res.stable.ruled),
    )
    return BP.BitPropagateResult(
        st, res.consistent[:flat].reshape(B, F),
        res.changed[:flat].reshape(B, F),
    ), tuple(unflatten(l) for l in flat_levels)


def _first_cell_mask(packed):
    """Isolate the lexicographically first set cell (lowest column, then
    lowest row) of each packed board: word-level argmax + lowest-set-bit,
    no dense 64x64 expansion."""
    import jax.numpy as jnp

    lead = packed.shape[:-2]
    words = packed.reshape(lead + (128,))
    idx = jnp.argmax(words != 0, axis=-1)
    w = jnp.take_along_axis(words, idx[..., None], axis=-1)[..., 0]
    bit = w & (~w + jnp.uint32(1))  # w & -w
    sel = jnp.arange(128, dtype=idx.dtype) == idx[..., None]
    cellw = jnp.where(sel, bit[..., None], jnp.uint32(0))
    return cellw.reshape(lead + (64, 2))


def _beam_body(carry, minimise, fused, interpret):
    """One beam round: propagate every frontier candidate, harvest leaves,
    branch on the heuristic cell, keep the best F children."""
    import jax.numpy as jnp

    from ..core import board as BRD
    from . import bitplane as BP

    cur, active, best, best_pop, found, complete = carry
    B, F = active.shape
    N = 64

    res, levels = _propagate_frontier(cur, fused, interpret)
    cur = res.stable
    ok = active & res.consistent

    pop = BRD.population(cur.state)
    if minimise:
        # population bound (reference LifeStable.hpp:1351-1355)
        ok = ok & ~(pop >= best_pop[:, None])
    else:
        # first-solution mode: stop working on solved problems
        ok = ok & ~found[:, None]

    settable = levels[3]
    is_leaf = ok & BRD.is_empty(settable)

    # record the best leaf of this round per problem
    leaf_pop = jnp.where(is_leaf, pop, jnp.iinfo(jnp.int32).max)
    which = jnp.argmin(leaf_pop, axis=1)
    round_pop = jnp.take_along_axis(leaf_pop, which[:, None], axis=1)[:, 0]
    round_state = jnp.take_along_axis(
        cur.state, which[:, None, None, None], axis=1
    )[:, 0]
    better = round_pop < best_pop
    best = jnp.where(better[:, None, None], round_state, best)
    best_pop = jnp.where(better, round_pop, best_pop)
    found = found | better

    ok = ok & ~is_leaf

    # branch-cell heuristic (reference LifeStable.hpp:1377-1391): first
    # cell of the highest nonempty priority level, picked word-wise on the
    # packed masks (no dense 64x64 expansion)
    chosen = levels[3]
    for lvl in (levels[2], levels[1], levels[0]):
        has = ~BRD.is_empty(lvl)
        chosen = jnp.where(has[..., None, None], lvl, chosen)
    cell_mask = _first_cell_mask(chosen) & jnp.where(
        ok[..., None, None], jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
    )

    off_child = BP.set_off(cur, cell_mask)
    on_child = BP.set_on(cur, cell_mask)

    # 2F candidates -> keep F best (active first, then lower pop)
    cat = lambda a, b: jnp.concatenate([a, b], axis=1)
    cand = BP.BitStable(
        cat(off_child.state, on_child.state),
        cat(off_child.unknown, on_child.unknown),
        tuple(cat(a, b) for a, b in zip(off_child.ruled, on_child.ruled)),
    )
    cand_active = cat(ok, ok)
    cand_pop = cat(pop, pop + 1)
    score = jnp.where(cand_active, cand_pop, jnp.iinfo(jnp.int32).max)
    full_order = jnp.argsort(score, axis=1)
    order = full_order[:, :F]
    take = lambda x: jnp.take_along_axis(
        x, order.reshape(B, F, *([1] * (x.ndim - 2))), axis=1
    )
    cur = BP.BitStable(
        take(cand.state), take(cand.unknown),
        tuple(take(r) for r in cand.ruled),
    )
    active = jnp.take_along_axis(cand_active, order, axis=1)

    # an active candidate beyond capacity was dropped: the search is no
    # longer exhaustive, so a later empty frontier proves nothing
    dropped = jnp.take_along_axis(cand_active, full_order[:, F:], axis=1)
    complete = complete & ~jnp.any(dropped, axis=1)

    return (cur, active, best, best_pop, found, complete)


N_PLANES = 10  # state, unknown, 8 ruled (kernel layout: lo/hi per plane)


def _make_beam_runner_planes():
    """Kernel-layout beam runner (the fused/TPU path).

    Decision-for-decision equivalent to the packed jnp runner below, but
    the frontier's 10-plane state stays in kernel layout (20 uint32[64, L]
    half-planes, L = B*F lanes) for the whole search:

    * no per-round packing transposes (the jnp path moves all 20 planes
      HBM->HBM twice per round just to change layout);
    * children are built by a one-hot select over the F-slot frontier axis
      (pure elementwise, fused by XLA) instead of materializing 2F child
      boards and gathering F of them — the old path's dominant cost;
    * population / leaf / first-cell math runs directly on the half-planes.
    """
    import functools

    import jax

    @functools.partial(
        jax.jit,
        static_argnames=("B", "F", "iters", "minimise", "interpret", "tile"),
    )
    def run(planes0, active0, *, B, F, iters, minimise, interpret, tile):
        import jax.numpy as jnp

        from ..ops import stable_pallas as SP

        INTMAX = jnp.iinfo(jnp.int32).max

        def sel_slot(x_bf, which):
            """x_bf[B, F] selected at slot ``which``[B] by one-hot chain."""
            out = x_bf[:, 0]
            for f in range(1, F):
                out = jnp.where(which == f, x_bf[:, f], out)
            return out

        def cond(carry):
            active, it = carry[1], carry[-1]
            return jnp.any(active) & (it < iters)

        def body(carry):
            planes, active, best_lo, best_hi, best_pop, found, complete, it = carry

            planes, _, cons_mask, prio = SP.propagate_fused_beam_planes(
                planes, batch_tile=tile, interpret=interpret
            )
            consistent = jnp.all(cons_mask != 0, axis=0).reshape(B, F)
            ok = active & consistent

            s_lo, s_hi = planes[0], planes[1]
            pop = (
                jnp.sum(jax.lax.population_count(s_lo).astype(jnp.int32), axis=0)
                + jnp.sum(jax.lax.population_count(s_hi).astype(jnp.int32), axis=0)
            ).reshape(B, F)
            if minimise:
                # population bound (reference LifeStable.hpp:1351-1355)
                ok = ok & ~(pop >= best_pop[:, None])
            else:
                ok = ok & ~found[:, None]

            # leaves: settable (priority level 3) empty
            set_lo, set_hi = prio[6], prio[7]
            is_leaf = ok & jnp.all((set_lo | set_hi) == 0, axis=0).reshape(B, F)

            # harvest the best leaf of this round per problem
            leaf_pop = jnp.where(is_leaf, pop, INTMAX)
            which = jnp.argmin(leaf_pop, axis=1)
            round_pop = sel_slot(leaf_pop, which)
            sl_r = s_lo.reshape(64, B, F)
            sh_r = s_hi.reshape(64, B, F)
            round_lo, round_hi = sl_r[:, :, 0], sh_r[:, :, 0]
            for f in range(1, F):
                m = (which == f)[None, :]
                round_lo = jnp.where(m, sl_r[:, :, f], round_lo)
                round_hi = jnp.where(m, sh_r[:, :, f], round_hi)
            better = round_pop < best_pop
            best_lo = jnp.where(better[None, :], round_lo, best_lo)
            best_hi = jnp.where(better[None, :], round_hi, best_hi)
            best_pop = jnp.where(better, round_pop, best_pop)
            found = found | better
            ok = ok & ~is_leaf

            # branch cell: first cell of the highest nonempty priority level
            ch_lo, ch_hi = set_lo, set_hi
            for k in (2, 1, 0):
                has = jnp.any((prio[2 * k] | prio[2 * k + 1]) != 0, axis=0)
                ch_lo = jnp.where(has[None, :], prio[2 * k], ch_lo)
                ch_hi = jnp.where(has[None, :], prio[2 * k + 1], ch_hi)
            # lexicographic first set cell (lowest column, then lowest row):
            # first column with any bit, low half-word first within it
            nz = (ch_lo | ch_hi) != 0
            col = jnp.argmax(nz, axis=0)
            onehot_col = jnp.arange(64)[:, None] == col[None, :]
            lo_w = jnp.max(jnp.where(onehot_col, ch_lo, jnp.uint32(0)), axis=0)
            hi_w = jnp.max(jnp.where(onehot_col, ch_hi, jnp.uint32(0)), axis=0)
            use_lo = lo_w != 0
            bit_lo = lo_w & (~lo_w + jnp.uint32(1))
            bit_hi = hi_w & (~hi_w + jnp.uint32(1))
            okm = ok.reshape(1, B * F)
            cell_lo = jnp.where(onehot_col & use_lo[None, :] & okm,
                                bit_lo[None, :], jnp.uint32(0))
            cell_hi = jnp.where(onehot_col & ~use_lo[None, :] & okm,
                                bit_hi[None, :], jnp.uint32(0))

            # 2F candidates (OFF children first, then ON) -> keep the F
            # best by (active, pop); stable argsort = same tie-breaking as
            # the packed runner
            cand_pop = jnp.concatenate([pop, pop + 1], axis=1)
            cand_active = jnp.concatenate([ok, ok], axis=1)
            score = jnp.where(cand_active, cand_pop, INTMAX)
            full_order = jnp.argsort(score, axis=1)
            order = full_order[:, :F]
            src = order % F  # parent slot of each kept child
            is_on = order >= F

            new_active = jnp.broadcast_to(ok[:, 0:1], (B, F))
            for f in range(1, F):
                new_active = jnp.where(src == f, ok[:, f : f + 1], new_active)
            rest_src = full_order[:, F:] % F
            dropped = jnp.zeros((B, F), bool)
            for f in range(F):
                dropped = dropped | ((rest_src == f) & ok[:, f : f + 1])
            complete = complete & ~jnp.any(dropped, axis=1)

            # gather parent planes + cell masks by one-hot select over F,
            # then apply the OFF/ON child update elementwise
            onm = is_on[None, :, :]
            srcm = src[None, :, :]

            def pick(x):
                xr = x.reshape(64, B, F)
                out = jnp.broadcast_to(xr[:, :, 0:1], (64, B, F))
                for f in range(1, F):
                    out = jnp.where(srcm == f, xr[:, :, f : f + 1], out)
                return out

            g_cl = pick(cell_lo)
            g_ch = pick(cell_hi)
            new_planes = []
            for i in range(N_PLANES):
                for h, g_cell in ((0, g_cl), (1, g_ch)):
                    g = pick(planes[2 * i + h])
                    if i == 0:  # state
                        g = jnp.where(onm, g | g_cell, g & ~g_cell)
                    elif i == 1:  # unknown
                        g = g & ~g_cell
                    elif i in (2, 3):  # ruled live2/live3: OFF rules out
                        g = jnp.where(onm, g, g | g_cell)
                    else:  # ruled dead*: ON rules out
                        g = jnp.where(onm, g | g_cell, g)
                    new_planes.append(g.reshape(64, B * F))

            return (tuple(new_planes), new_active, best_lo, best_hi,
                    best_pop, found, complete, it + 1)

        best_lo0 = jnp.zeros((64, B), jnp.uint32)
        best_hi0 = jnp.zeros((64, B), jnp.uint32)
        best_pop0 = jnp.full((B,), INTMAX, jnp.int32)
        found0 = jnp.zeros((B,), bool)
        complete0 = jnp.ones((B,), bool)
        out = jax.lax.while_loop(
            cond,
            body,
            (planes0, active0, best_lo0, best_hi0, best_pop0, found0,
             complete0, jnp.int32(0)),
        )
        return out[1:-1]  # active, best_lo, best_hi, best_pop, found, complete

    return run


def _make_beam_runner():
    import functools

    import jax

    @functools.partial(
        jax.jit, static_argnames=("iters", "minimise", "fused", "interpret")
    )
    def run(cur0, active0, best0, best_pop0, found0, iters, minimise,
            fused, interpret):
        import jax.numpy as jnp

        complete0 = jnp.ones(found0.shape, bool)
        carry = (cur0, active0, best0, best_pop0, found0, complete0,
                 jnp.int32(0))

        def cond(carry):
            # early exit once every frontier is exhausted (all leaves
            # harvested / pruned) — matches the DFS returning when its
            # stack empties
            active = carry[1]
            it = carry[-1]
            return jnp.any(active) & (it < iters)

        def loop_body(carry):
            *state, it = carry
            out = _beam_body(tuple(state), minimise, fused, interpret)
            return out + (it + 1,)

        return jax.lax.while_loop(cond, loop_body, carry)[:-1]

    return run


_BEAM_RUN = None
_BEAM_RUN_PLANES = None


def complete_stable_beam(stable, frontier=8, iters=192, minimise=True,
                         fused=None, interpret=False, dense=True):
    """Batched frontier search over ``[B]`` independent problems.

    Each problem keeps a frontier of up to ``frontier`` candidate partial
    boards; every iteration propagates ALL candidates in one batched
    bit-plane fixpoint (stable/bitplane.py — 64 cells per word pair),
    records completed leaves into a per-problem incumbent
    (population-minimal if ``minimise``), and replaces each active
    candidate by its OFF/ON children on the heuristically chosen branch
    cell.  Children beyond capacity are kept by lowest population.  This
    trades the reference's DFS order for breadth — thousands of branches
    advance per kernel call (SURVEY.md section 7).  The compiled loop is
    cached at module level, so repeated calls with the same shapes reuse
    the executable.

    ``fused`` selects the in-kernel Pallas propagate fixpoint
    (ops/stable_pallas.py) instead of the jnp bit-plane path; ``None``
    auto-enables it on TPU backends.  ``interpret`` runs the Pallas kernel
    in interpreter mode (CPU testing only).  ``dense=False`` returns
    ``best`` as a packed uint32[B, 64, 2] board instead of dense bools —
    an 8x smaller readback, which matters through a tunneled backend.
    """
    import math

    import jax
    import jax.numpy as jnp

    from ..core import board as BRD
    from . import bitplane as BP

    if fused is None:
        fused = jax.default_backend() == "tpu"

    F = frontier
    N = 64
    if hasattr(stable, "ruled") and isinstance(stable.ruled, tuple):
        bst0 = stable
    else:
        bst0 = BP.from_dense_stable(stable)
    B = bst0.state.shape[0]

    if fused:
        # kernel-layout runner: the frontier never leaves kernel layout
        global _BEAM_RUN_PLANES
        if _BEAM_RUN_PLANES is None:
            _BEAM_RUN_PLANES = _make_beam_runner_planes()
        from ..ops import stable_pallas as SP

        flat = B * F
        if flat >= 128:
            step = max(1, 128 // math.gcd(F, 128))
            b_pad = -(-B // step) * step
            lane_tile = 128
        else:
            b_pad, lane_tile = B, flat
        planes = SP._to_kernel_planes(bst0)
        if b_pad != B:
            planes = tuple(
                jnp.pad(p, ((0, 0), (0, b_pad - B))) for p in planes
            )
        planes0 = tuple(jnp.repeat(p, F, axis=1) for p in planes)
        active0 = jnp.zeros((b_pad, F), bool).at[:B, 0].set(True)
        active, best_lo, best_hi, best_pop, found, complete = _BEAM_RUN_PLANES(
            planes0, active0, B=b_pad, F=F, iters=iters, minimise=minimise,
            interpret=interpret, tile=lane_tile,
        )
        best = jnp.stack(
            [jnp.transpose(best_lo), jnp.transpose(best_hi)], axis=-1
        )[:B]
        best_out = BRD.to_dense(best) if dense else best
        exhausted = ~jnp.any(active[:B], axis=1)
        proved = exhausted & complete[:B] & ~found[:B]
        return BeamResult(
            np.asarray(found[:B]), np.asarray(best_out),
            np.asarray(best_pop[:B]), np.asarray(proved),
        )

    global _BEAM_RUN
    if _BEAM_RUN is None:
        _BEAM_RUN = _make_beam_runner()

    def tile(x):
        return jnp.broadcast_to(x[:, None], (B, F) + x.shape[1:])

    cur0 = BP.BitStable(
        tile(bst0.state), tile(bst0.unknown), tuple(tile(r) for r in bst0.ruled)
    )
    active0 = jnp.zeros((B, F), bool).at[:, 0].set(True)
    best0 = jnp.zeros((B, N, 2), jnp.uint32)
    best_pop0 = jnp.full((B,), jnp.iinfo(jnp.int32).max, jnp.int32)
    found0 = jnp.zeros((B,), bool)

    out = _BEAM_RUN(cur0, active0, best0, best_pop0, found0, iters, minimise,
                    fused, interpret)
    _, active, best, best_pop, found, complete = out
    best_out = BRD.to_dense(best) if dense else best
    exhausted = ~jnp.any(active, axis=1)
    proved = exhausted & complete & ~found
    return BeamResult(
        np.asarray(found), np.asarray(best_out), np.asarray(best_pop),
        np.asarray(proved),
    )
