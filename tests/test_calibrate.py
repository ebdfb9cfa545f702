"""Calibration kernel (ops/calibrate_pallas): the op counter and both
mixes must execute and differ, and the op chain must be data-dependent
(different inputs give different outputs — nothing constant-folds)."""

import numpy as np
import jax.numpy as jnp

from lifeapi_tpu.ops import calibrate_pallas as CAL


def test_calibrate_mixes_and_counts(rng):
    a = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint32))
    out_e = CAL.calibrate(a, b, iters=4, mix="elemwise", batch_tile=8,
                          interpret=True)
    out_r = CAL.calibrate(a, b, iters=4, mix="rolls", batch_tile=8,
                          interpret=True)
    assert out_e.shape == (64, 8)
    assert not (np.asarray(out_e) == np.asarray(out_r)).all()
    # data dependence: different inputs, different outputs
    out_e2 = CAL.calibrate(a ^ 1, b, iters=4, mix="elemwise", batch_tile=8,
                           interpret=True)
    assert not (np.asarray(out_e) == np.asarray(out_e2)).all()
    # iters matter (the loop really runs)
    out_e8 = CAL.calibrate(a, b, iters=8, mix="elemwise", batch_tile=8,
                           interpret=True)
    assert not (np.asarray(out_e) == np.asarray(out_e8)).all()
    assert CAL.ops_per_iter("rolls") == CAL.ops_per_iter("elemwise") + 2
