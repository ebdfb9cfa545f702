"""Fused two-prime NTT convolution kernel.

The XLA-level NTT path (core/convolve._conv_ntt) is HBM-bound: ~10
dense [B, 64, 64] intermediates round-trip HBM per convolution.  This
kernel runs the WHOLE transform pipeline — forward NTTs of both
operands, pointwise product, inverse NTT, CRT combine — inside VMEM,
so HBM traffic drops to the dense bf16 inputs and the int32 output.

Same number theory as core/convolve (reference contract
LifeAPI.hpp:1284-1370, OR-accumulated placements = counts > 0): primes
193/257 whose NTT twiddles are integers <= 256, hence EXACT in bfloat16
— every matmul is a single MXU pass with exact f32 accumulation (row
sums <= 64 * 256^2 < 2^24).

Layout: boards enter dense bf16 [B, 64, 64] (bit-unpack is XLA-side,
cheap and fusable), stacked row-wise per tile as [64*nb, 64] so every
transform stage is ONE [64nb, 64] @ [64, 64] matmul; the corner turn
between the y- and x-transforms is a per-board block transpose
([nb, 64, 64] swapaxes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.convolve import _NTT_PRIMES, _mod_p, _ntt_matrices

F32 = jnp.float32
BF16 = jnp.bfloat16


def _mm(x, w):
    """Single-pass bf16 MXU matmul with f32 accumulation (exact for the
    integer ranges in play; see module docstring)."""
    return jax.lax.dot_general(
        x.astype(BF16), w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=F32,
    )


def _blockt(x, nb):
    """Per-board corner turn: [64*nb, 64] -> [64*nb, 64] with each
    board's 64x64 block transposed in place."""
    return jnp.swapaxes(x.reshape(nb, 64, 64), 1, 2).reshape(nb * 64, 64)


def _conv_kernel(a_ref, b_ref, *rest, nb):
    w1_ref, v1_ref, w2_ref, v2_ref, out_ref = rest
    p1, p2 = _NTT_PRIMES
    xa = a_ref[:].reshape(nb * 64, 64)
    xb = b_ref[:].reshape(nb * 64, 64)

    def one_prime(w, v, p):
        # forward: y-transform, corner turn, x-transform (both operands
        # M-stacked into one matmul per stage)
        s1 = _mod_p(_mm(jnp.concatenate([xa, xb], axis=0), w), p)
        s1t = jnp.concatenate(
            [_blockt(s1[: nb * 64], nb), _blockt(s1[nb * 64:], nb)], axis=0
        )
        s2 = _mod_p(_mm(s1t, w), p)
        fa, fb = s2[: nb * 64], s2[nb * 64:]
        prod = _mod_p(fa * fb, p)
        # inverse (input is in transposed orientation; the mid corner
        # turn restores the original)
        i1 = _mod_p(_mm(prod, v), p)
        i2 = _mod_p(_mm(_blockt(i1, nb), v), p)
        return i2

    c1 = one_prime(w1_ref[:], v1_ref[:], p1)
    c2 = one_prime(w2_ref[:], v2_ref[:], p2)
    # CRT: counts = c1 + p1 * ((c2 - c1) * inv(p1) mod p2)
    inv_p1 = pow(p1, p2 - 2, p2)
    t = _mod_p((c2 - c1) * inv_p1, p2)
    counts = c1 + p1 * t
    out_ref[:] = counts.astype(jnp.int32).reshape(nb, 64, 64)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def conv_counts_fused(da, db, nb=64, interpret=False):
    """Exact circular-convolution counts of dense [B, 64, 64] boards in
    one fused kernel.  ``da``/``db``: bool or numeric (cast to bf16 —
    exact for 0/1 boards).  Returns int32 [B, 64, 64]."""
    B = da.shape[0]
    nb = min(nb, B)
    assert B % nb == 0
    grid = (B // nb,)
    (W1, V1), (W2, V2) = _ntt_matrices()
    spec = pl.BlockSpec((nb, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, nb=nb),
        out_shape=jax.ShapeDtypeStruct((B, 64, 64), jnp.int32),
        grid=grid,
        in_specs=[spec, spec, wspec, wspec, wspec, wspec],
        out_specs=spec,
        interpret=interpret,
    )(
        da.astype(BF16), db.astype(BF16),
        jnp.asarray(W1, BF16), jnp.asarray(V1, BF16),
        jnp.asarray(W2, BF16), jnp.asarray(V2, BF16),
    )
    return out
