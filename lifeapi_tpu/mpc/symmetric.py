"""Symmetry-constrained MPC search (north-star config 4): control
sequences constrained to a symmetry orbit (C2/D4/... via symmetry/groups),
with batched still-life constraint propagation running inside the solve
loop to score background feasibility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..symmetry import groups as groups_mod
from ..symmetry import transforms as tr
from . import solver as solver_mod
from . import soft as soft_mod


def orbit_symmetrize(dense, sym):
    """Average a dense [..., 64, 64] field over the group orbit — the
    projection onto the symmetric subspace.  Gradients flow through all
    cosets, so optimizing symmetrized logits IS optimization in the
    quotient space."""
    cosets = groups_mod.GROUPS[groups_mod.StaticSymmetry(sym)]
    acc = None
    for t in cosets:
        img = tr.transform_dense(dense, t)
        acc = img if acc is None else acc + img
    return acc / len(cosets)


def symmetric_objective(logits, problem, sym, tau=None):
    """Relaxed cost of orbit-symmetrized control logits."""
    sym_logits = orbit_symmetrize(logits, sym)
    return solver_mod.soft_objective(sym_logits, problem, tau)


def stable_consistency(final_board, region_mask):
    """Batched in-loop still-life feasibility: cells of ``region_mask``
    are taken as known (from the final board), everything else unknown;
    returns the per-board consistency bool of the constraint propagation
    fixpoint (the stable_count/signal machinery, stable/propagate.py)."""
    from ..core import board as B
    from ..stable import bitplane as BP

    region_packed = B.from_dense(
        jnp.broadcast_to(region_mask.astype(bool), (*final_board.shape[:-2], 64, 64))
    )
    st = BP.make(
        state=final_board & region_packed,
        unknown=~region_packed,
    )
    res = BP.propagate(st)
    return res.consistent


@functools.partial(jax.jit, static_argnames=("iters", "sym"))
def _optimize(logits0, problem, sym, iters, lr):
    import optax

    opt = optax.adam(lr)

    grad_fn = jax.vmap(
        jax.value_and_grad(lambda l: symmetric_objective(l, problem, sym))
    )

    def step(carry, _):
        logits, opt_state = carry
        vals, grads = grad_fn(logits)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(logits, updates), opt_state), vals

    (logits, _), _ = jax.lax.scan(step, (logits0, opt.init(logits0)), None,
                                  length=iters)
    return logits


def solve_symmetric(problem, key, sym, n_candidates=16, iters=120, lr=0.15,
                    stable_region=None, infeasible_penalty=1e4):
    """End-to-end symmetric solve: optimize orbit-symmetrized logits, then
    hard-rescore each candidate bit-exactly; candidates whose final board
    fails the in-loop stable propagation on ``stable_region`` are penalized
    out of the elite selection."""
    logits0 = solver_mod.init_logits(key, problem, n_candidates)
    logits = _optimize(logits0, problem, sym, iters, lr)

    sym_logits = jax.vmap(lambda l: orbit_symmetrize(l, sym))(logits)
    probs = jax.nn.sigmoid(sym_logits) * problem.control_mask

    def score(p):
        cost, final = solver_mod.hard_score(p, problem)
        if stable_region is not None:
            ok = stable_consistency(final, stable_region)
            cost = cost + jnp.where(ok, 0.0, infeasible_penalty)
        return cost, final

    costs, finals = jax.vmap(score)(probs)
    best = jnp.argmin(costs)
    return solver_mod.MPCSolution(
        controls=soft_mod.binarize_controls(probs[best]),
        control_probs=probs[best],
        final_board=finals[best],
        cost=costs[best],
        all_costs=costs,
    )
