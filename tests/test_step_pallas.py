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


def test_interleave_roundtrip(rng):
    from lifeapi_tpu.core import bitops

    vals = rng.integers(0, 2**64, size=64, dtype=np.uint64)
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    e, o = bitops.interleave_split(lo, hi)
    # bit k of e is bit 2k of the 64-bit value
    for i in [0, 5, 63]:
        v = int(vals[i])
        ev = int(e[i])
        ov = int(o[i])
        for k in range(32):
            assert (ev >> k) & 1 == (v >> (2 * k)) & 1
            assert (ov >> k) & 1 == (v >> (2 * k + 1)) & 1
    rlo, rhi = bitops.interleave_merge(e, o)
    assert (np.asarray(rlo) == np.asarray(lo)).all()
    assert (np.asarray(rhi) == np.asarray(hi)).all()


def test_step_eo_matches_core(rng):
    from lifeapi_tpu.core import bitops

    d = random_dense(rng, p=0.4, batch=(16,))
    p = board.from_dense(jnp.asarray(d))
    lo, hi = step_pallas.to_kernel_layout(p)
    e, o = bitops.interleave_split(lo, hi)
    ne, no = step_pallas.step_eo(e, o)
    nlo, nhi = bitops.interleave_merge(ne, no)
    got = step_pallas.from_kernel_layout(nlo, nhi)
    expect = step.step(p)
    assert bool(board.equal(got, expect).all())


def test_rollout_interpret_matches_scan(rng):
    d = random_dense(rng, p=0.35, batch=(128,))
    p = board.from_dense(jnp.asarray(d))
    got = step_pallas.rollout(p, steps=8, batch_tile=128, interpret=not _is_tpu())
    expect = step.step_n(p, 8)
    assert bool(board.equal(got, expect).all())


def test_controlled_rollout_matches_hard_rollout(rng):
    from lifeapi_tpu.mpc import soft

    d = random_dense(rng, p=0.3, batch=(128,))
    p = board.from_dense(jnp.asarray(d))
    T = 6
    tog_dense = random_dense(rng, p=0.02, batch=(T, 128))
    toggles = board.from_dense(jnp.asarray(tog_dense))
    got = step_pallas.controlled_rollout(
        p, toggles, batch_tile=128, interpret=not _is_tpu()
    )
    # reference path: scan of xor + step, per board (hard_rollout maps over
    # the [T, B, ...] toggles with boards batched)
    expect = soft.hard_rollout(p, toggles)
    assert bool(board.equal(got, expect).all())
