"""Differential tests against the independent native C oracle (the
framework's analog of the reference's StepAltTest strategy, SURVEY.md
section 4: independently-derived implementations must agree bit-exactly)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lifeapi_tpu.core import board, step

native = pytest.importorskip("lifeapi_tpu.native")
from lifeapi_tpu.native import build as nb  # noqa: E402
from oracle import life_step_dense, random_dense  # noqa: E402


def test_c_dense_matches_numpy(rng):
    d = random_dense(rng, p=0.4, batch=(16,))
    got = nb.step_dense(d)
    expect = life_step_dense(d)
    assert (got.astype(bool) == expect).all()


def test_c_packed_matches_c_dense(rng):
    d = random_dense(rng, p=0.5, batch=(8,))
    # build uint64 boards
    p32 = np.asarray(board.from_dense(jnp.asarray(d)))
    p64 = nb.packed32_to_packed64(p32)
    got64 = nb.step_packed64(p64)
    got = nb.packed64_to_packed32(got64)
    expect = np.asarray(board.from_dense(jnp.asarray(life_step_dense(d))))
    assert (got == expect).all()


def test_jax_step_matches_c_oracle_many(rng):
    # the headline bit-exactness gate: 256 random boards x 16 generations
    d = random_dense(rng, p=0.45, batch=(256,))
    p = board.from_dense(jnp.asarray(d))
    ours = np.asarray(step.step_n(p, 16))
    p64 = nb.packed32_to_packed64(np.asarray(p))
    oracle64 = nb.step_packed64(p64, steps=16)
    theirs = nb.packed64_to_packed32(oracle64)
    assert (ours == theirs).all()


def test_packed64_roundtrip(rng):
    d = random_dense(rng, p=0.3, batch=(4,))
    p32 = np.asarray(board.from_dense(jnp.asarray(d)))
    back = nb.packed64_to_packed32(nb.packed32_to_packed64(p32))
    assert (back == p32).all()
