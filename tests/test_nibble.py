import numpy as np
import jax.numpy as jnp

from lifeapi_tpu.stable import nibble as nb


def _rand_vals(rng, hi=16, batch=()):
    return jnp.asarray(rng.integers(0, hi, size=(*batch, 64, 64), dtype=np.int32))


def test_encode_decode(rng):
    v = _rand_vals(rng)
    assert (np.asarray(nb.decode(nb.encode(v))) == np.asarray(v)).all()


def test_add_sub(rng):
    a = _rand_vals(rng)
    b = _rand_vals(rng)
    s = nb.decode(nb.add(nb.encode(a), nb.encode(b)))
    assert (np.asarray(s) == np.asarray((a + b) % 16)).all()
    d = nb.decode(nb.sub(nb.encode(a), nb.encode(b)))
    assert (np.asarray(d) == np.asarray((a - b) % 16)).all()


def test_add_sub_bit(rng):
    a = _rand_vals(rng)
    from lifeapi_tpu.core.board import from_dense

    bit = from_dense(np.asarray(_rand_vals(rng, hi=2)).astype(bool))
    d = nb.decode(nb.sub_bit(nb.encode(a), bit))
    bd = nb.decode(nb.from_bit(bit))
    assert (np.asarray(d) == np.asarray((a - bd) % 16)).all()
    s = nb.decode(nb.add_bit(nb.encode(a), bit))
    assert (np.asarray(s) == np.asarray((a + bd) % 16)).all()


def test_comparators(rng):
    from lifeapi_tpu.core.board import to_dense

    a = _rand_vals(rng)
    enc = nb.encode(a)
    av = np.asarray(a)
    for k in (0, 1, 3, 7, 9, 15):
        assert (np.asarray(to_dense(nb.eq_const(enc, k))) == (av == k)).all(), k
        assert (np.asarray(to_dense(nb.gt_const(enc, k))) == (av > k)).all(), k
        assert (np.asarray(to_dense(nb.lt_const(enc, k))) == (av < k)).all(), k
    b = _rand_vals(rng)
    assert (
        np.asarray(to_dense(nb.gt(enc, nb.encode(b)))) == (av > np.asarray(b))
    ).all()
    assert (np.asarray(to_dense(nb.eq(enc, nb.encode(b)))) == (av == np.asarray(b))).all()


def test_min_max(rng):
    a = _rand_vals(rng)
    b = _rand_vals(rng)
    assert (
        np.asarray(nb.decode(nb.maximum(nb.encode(a), nb.encode(b))))
        == np.maximum(np.asarray(a), np.asarray(b))
    ).all()
    assert (
        np.asarray(nb.decode(nb.minimum(nb.encode(a), nb.encode(b))))
        == np.minimum(np.asarray(a), np.asarray(b))
    ).all()
