import numpy as np
import jax
import jax.numpy as jnp

from lifeapi_tpu.core import board, rle
from lifeapi_tpu.mpc import CostWeights, MPCProblem
from lifeapi_tpu.mpc import symmetric as sym_mod
from lifeapi_tpu.symmetry import StaticSymmetry as S
from lifeapi_tpu.symmetry import transforms as tr
from lifeapi_tpu.target import LifeTarget, hamming_cost

N = 64


def test_orbit_symmetrize_is_projection(rng):
    x = jnp.asarray(rng.random((N, N)).astype(np.float32))
    for sym in (S.C2even, S.D4even, S.D2AcrossXEven):
        p = sym_mod.orbit_symmetrize(x, sym)
        # projection: idempotent and invariant under every coset
        p2 = sym_mod.orbit_symmetrize(p, sym)
        assert np.allclose(np.asarray(p), np.asarray(p2), atol=1e-5)
        from lifeapi_tpu.symmetry.groups import GROUPS

        for t in GROUPS[sym]:
            img = tr.transform_dense(p, t)
            assert np.allclose(np.asarray(img), np.asarray(p), atol=1e-5), t


def test_symmetric_solve_produces_symmetric_controls():
    # target: a C2even-symmetric pair of blocks; controls constrained to the
    # C2even orbit must reach it with symmetric toggles
    blk = rle.parse("2o$2o!")
    target_state = board.move(blk, 20, 20) | tr.transform(
        board.move(blk, 20, 20), tr.SymmetryTransform.Rotate180EvenBoth
    )
    target = LifeTarget.from_state(target_state)
    mask = sym_mod.orbit_symmetrize(
        jnp.zeros((N, N)).at[18:24, 18:24].set(1.0), S.C2even
    ) > 0
    problem = MPCProblem(
        initial=board.empty(),
        target=target,
        horizon=3,
        control_mask=mask,
        weights=CostWeights(target=1.0, control=0.01),
    )
    sol = sym_mod.solve_symmetric(
        problem, jax.random.key(0), S.C2even, n_candidates=8, iters=120
    )
    assert int(hamming_cost(sol.final_board, target)) == 0
    # the binarized toggles are C2even-symmetric
    probs = np.asarray(sol.control_probs > 0.5)
    for t_ in range(probs.shape[0]):
        img = np.asarray(
            tr.transform_dense(jnp.asarray(probs[t_]),
                               tr.SymmetryTransform.Rotate180EvenBoth)
        )
        assert (img == probs[t_]).all()


def test_stable_consistency_in_loop():
    # a block region is consistent; a lone-cell region is not
    blk = board.move(rle.parse("2o$2o!"), 30, 30)
    region = np.zeros((N, N), bool)
    region[28:34, 28:34] = True
    ok = sym_mod.stable_consistency(blk, jnp.asarray(region))
    assert bool(ok)
    lone = board.from_cells([(30, 30)])
    # known region contains the lone cell and its OFF neighbours: a lone ON
    # cell cannot be part of any still life
    ok2 = sym_mod.stable_consistency(lone, jnp.asarray(region))
    assert not bool(ok2)
