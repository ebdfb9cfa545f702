import numpy as np
import jax
import jax.numpy as jnp

from lifeapi_tpu.core import board, step
from lifeapi_tpu.ops import step_pallas
from oracle import random_dense


def _is_tpu():
    return jax.devices()[0].platform == "tpu"


def test_step_lohi_matches_core(rng):
    d = random_dense(rng, p=0.4, batch=(16,))
    p = board.from_dense(jnp.asarray(d))
    lo, hi = step_pallas.to_kernel_layout(p)
    nlo, nhi = step_pallas.step_lohi(lo, hi)
    got = step_pallas.from_kernel_layout(nlo, nhi)
    expect = step.step(p)
    assert bool(board.equal(got, expect).all())


def test_layout_roundtrip(rng):
    d = random_dense(rng, batch=(8,))
    p = board.from_dense(jnp.asarray(d))
    lo, hi = step_pallas.to_kernel_layout(p)
    back = step_pallas.from_kernel_layout(lo, hi)
    assert (np.asarray(back) == np.asarray(p)).all()


def test_rollout_interpret_matches_scan(rng):
    d = random_dense(rng, p=0.35, batch=(128,))
    p = board.from_dense(jnp.asarray(d))
    got = step_pallas.rollout(p, steps=8, batch_tile=128, interpret=not _is_tpu())
    expect = step.step_n(p, 8)
    assert bool(board.equal(got, expect).all())
