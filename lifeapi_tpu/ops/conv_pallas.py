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

Layout (v2, prime-paired): TPU lanes are 128 wide and 64-wide arrays
waste half of them, so the two primes ride side-by-side: every working
array is [*, 128] with prime-1 residues in lanes 0-63 and prime-2 in
64-127, and the twiddle matrices are block-diagonal [128, 128]
(diag(W1, W2) — the off-diagonal zeros cost flops but buy full MXU
occupancy and HALVE the op count: 4 wide matmuls + 4 wide mod
reductions instead of 12 + 10 narrow ones).  Boards are stacked
row-wise ([64*nb, 128]); the corner turn between the y- and x-
transform stages is a per-board block transpose of each prime half.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.convolve import _NTT_PRIMES, _ntt_matrices

F32 = jnp.float32
BF16 = jnp.bfloat16

_PAIR_MATS = None


def _pair_matrices():
    """Block-diagonal diag(W1, W2) / diag(V1, V2) bf16 [128, 128]
    constants plus the per-lane prime / reciprocal vectors [1, 128]."""
    global _PAIR_MATS
    if _PAIR_MATS is None:
        (W1, V1), (W2, V2) = _ntt_matrices()
        W = np.zeros((128, 128), np.float32)
        V = np.zeros((128, 128), np.float32)
        W[:64, :64], W[64:, 64:] = W1, W2
        V[:64, :64], V[64:, 64:] = V1, V2
        p1, p2 = _NTT_PRIMES
        pv = np.concatenate([np.full(64, p1, np.float32),
                             np.full(64, p2, np.float32)])[None, :]
        _PAIR_MATS = (W.astype(np.float32), V.astype(np.float32), pv,
                      (1.0 / pv).astype(np.float32))
    return _PAIR_MATS


def _mm(x, w):
    """Single-pass bf16 MXU matmul with f32 accumulation (exact for the
    integer ranges in play; see module docstring)."""
    return jax.lax.dot_general(
        x.astype(BF16), w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=F32,
    )


def _mod2(x, pv, rv):
    """Per-lane exact mod (prime-paired lanes): reciprocal multiply +
    correction — a true divide would hit the slow transcendental unit."""
    q = jnp.floor(x * rv)
    r = x - q * pv
    r = jnp.where(r < 0, r + pv, r)
    return jnp.where(r >= pv, r - pv, r)


def _blockt2(x, nboards):
    """Per-board corner turn of BOTH prime halves: [64*nboards, 128] ->
    same shape with each board's per-prime 64x64 block transposed."""
    h1 = jnp.swapaxes(x[:, :64].reshape(nboards, 64, 64), 1, 2)
    h2 = jnp.swapaxes(x[:, 64:].reshape(nboards, 64, 64), 1, 2)
    return jnp.concatenate(
        [h1.reshape(nboards * 64, 64), h2.reshape(nboards * 64, 64)], axis=1
    )


def _conv_kernel(a_ref, b_ref, w_ref, v_ref, out_ref, *, nb):
    p1, p2 = _NTT_PRIMES
    # per-lane prime vectors built in-kernel (a captured jnp constant is
    # rejected by pallas_call)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    pv = jnp.where(lane < 64, jnp.float32(p1), jnp.float32(p2))
    rv = jnp.where(lane < 64, jnp.float32(1.0 / p1), jnp.float32(1.0 / p2))
    xa = a_ref[:].reshape(nb * 64, 64)
    xb = b_ref[:].reshape(nb * 64, 64)
    # both operands M-stacked, both primes lane-paired (data duplicated
    # into each prime's lane block)
    x = jnp.concatenate([xa, xb], axis=0)
    x2 = jnp.concatenate([x, x], axis=1)

    w = w_ref[:]
    v = v_ref[:]
    s1 = _mod2(_mm(x2, w), pv, rv)          # y-transform, both ops+primes
    s2 = _mod2(_mm(_blockt2(s1, 2 * nb), w), pv, rv)   # x-transform
    fa, fb = s2[: nb * 64], s2[nb * 64:]
    prod = _mod2(fa * fb, pv, rv)
    i1 = _mod2(_mm(prod, v), pv, rv)        # inverse x
    i2 = _mod2(_mm(_blockt2(i1, nb), v), pv, rv)       # inverse y
    # CRT: counts = c1 + p1 * ((c2 - c1) * inv(p1) mod p2)
    c1, c2 = i2[:, :64], i2[:, 64:]
    p2v = pv[:, 64:]
    r2v = rv[:, 64:]
    inv_p1 = pow(_NTT_PRIMES[0], _NTT_PRIMES[1] - 2, _NTT_PRIMES[1])
    t = _mod2((c2 - c1) * inv_p1, p2v, r2v)
    counts = c1 + p1 * t
    out_ref[:] = counts.astype(jnp.int32).reshape(nb, 64, 64)


_SMALL_MATS = None


def _small_matrices():
    """diag(W1, W1) / diag(V1, V1) for the single-prime fast path (two
    DIFFERENT boards ride the two lane halves)."""
    global _SMALL_MATS
    if _SMALL_MATS is None:
        (W1, V1), _ = _ntt_matrices()
        W = np.zeros((128, 128), np.float32)
        V = np.zeros((128, 128), np.float32)
        W[:64, :64] = W[64:, 64:] = W1
        V[:64, :64] = V[64:, 64:] = V1
        _SMALL_MATS = (W, V)
    return _SMALL_MATS


def _conv_kernel_small(a_ref, b_ref, w_ref, v_ref, out_ref, *, nb, out_or):
    """Single-prime (193) kernel, boards paired across the two lane
    halves: half the transform work of the CRT kernel.  EXACT only when
    every count < 193 (callers guarantee min(pop) < 193 — the
    pattern-matching regime); then residue == count and the zero test is
    exact."""
    p = jnp.float32(_NTT_PRIMES[0])
    r = jnp.float32(1.0 / _NTT_PRIMES[0])

    # Tuned on v5e (benches/conv_sweep.py): tile nb=128 reaches 1.335e7
    # conv/s (3.3x over nb=64) — matmul rows per block double and the
    # per-block mod/turn overhead amortizes; nb=128 stages fit VMEM
    # (s1/s2 are [8192, 128] f32 = 4.2 MB each).
    def pair(ref):
        # static-index slices of a reshaped view — a strided x[0::2]
        # becomes a 3D gather, which Mosaic cannot lower
        x4 = ref[:].reshape(nb // 2, 2, 64, 64)
        even = x4[:, 0].reshape(nb // 2 * 64, 64)
        odd = x4[:, 1].reshape(nb // 2 * 64, 64)
        return jnp.concatenate([even, odd], axis=1)

    x = jnp.concatenate([pair(a_ref), pair(b_ref)], axis=0)
    w = w_ref[:]
    v = v_ref[:]
    s1 = _mod2(_mm(x, w), p, r)
    s2 = _mod2(_mm(_blockt2(s1, nb), w), p, r)
    half = nb // 2 * 64
    prod = _mod2(s2[:half] * s2[half:], p, r)
    i1 = _mod2(_mm(prod, v), p, r)
    counts = _mod2(_mm(_blockt2(i1, nb // 2), v), p, r)
    h1 = counts[:, :64].reshape(nb // 2, 64, 64)
    h2 = counts[:, 64:].reshape(nb // 2, 64, 64)
    full = jnp.stack([h1, h2], axis=1).reshape(nb, 64, 64)
    if out_or:
        out_ref[:] = (full > 0.5).astype(jnp.int8)
    else:
        out_ref[:] = full.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nb", "out_or", "interpret"))
def conv_small_fused(da, db, nb=128, out_or=True, interpret=False):
    """Single-prime fused convolution — EXACT iff every count < 193,
    i.e. ``min(pop(a), pop(b)) < 193`` per board (true for the whole
    Match / pattern family, where one operand is a small pattern).
    ``out_or=True`` returns the OR-convolution as int8 [B, 64, 64]
    (the reference ``Convolve`` contract); otherwise int32 counts.
    Inputs ride HBM as int8 and are cast in-kernel (Mosaic supports
    signed-int -> float casts only; an XLA-side bf16 cast would
    materialize 2x33 MB per call)."""
    B = da.shape[0]
    nb = min(nb, B)
    if nb % 2:
        nb *= 2  # keep board pairs together; pad below
    pad = -B % nb
    if pad:
        zeros = jnp.zeros((pad, 64, 64), da.dtype)
        da = jnp.concatenate([da, zeros])
        db = jnp.concatenate([db, zeros])
    Bp = B + pad
    grid = (Bp // nb,)
    W, V = _small_matrices()
    spec = pl.BlockSpec((nb, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    dtype = jnp.int8 if out_or else jnp.int32
    out = pl.pallas_call(
        functools.partial(_conv_kernel_small, nb=nb, out_or=out_or),
        out_shape=jax.ShapeDtypeStruct((Bp, 64, 64), dtype),
        grid=grid,
        in_specs=[spec, spec, wspec, wspec],
        out_specs=spec,
        interpret=interpret,
    )(
        da.astype(jnp.int8), db.astype(jnp.int8),
        jnp.asarray(W, BF16), jnp.asarray(V, BF16),
    )
    return out[:B]


def _unpack_pair(ref, nb):
    """packed uint32[nb, 64, 2] -> pair-layout bf16 [nb/2*64, 128]:
    row (p, x), lanes 0-63 = board 2p's y (lo word then hi), lanes
    64-127 = board 2p+1.  In-kernel bit expansion: the packed input is
    512 B/board vs 16 KB dense, so HBM traffic (and the XLA-side
    to_dense materialization) disappears."""
    x4 = ref[:].reshape(nb // 2, 2, 64, 2)
    iota32 = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)

    def bits(w):  # [nb/2, 64] uint32 -> [nb/2*64, 32] bits
        col = w.reshape(nb // 2 * 64, 1)
        b = (col >> iota32) & jnp.uint32(1)
        # Mosaic has no uint32 -> bf16 cast; go via int32 (values are 0/1)
        return b.astype(jnp.int32).astype(BF16)

    return jnp.concatenate(
        [bits(x4[:, 0, :, 0]), bits(x4[:, 0, :, 1]),
         bits(x4[:, 1, :, 0]), bits(x4[:, 1, :, 1])], axis=1)


_BYTE_PACK = None


def _byte_pack_matrix():
    """[128, 128] bf16: column 8k+j accumulates lanes 8k..8k+7 with
    weights 2^0..2^7 into byte k of the packed result (exact in f32:
    values <= 255); only the first 16 columns are used."""
    global _BYTE_PACK
    if _BYTE_PACK is None:
        P = np.zeros((128, 128), np.float32)
        for lane in range(128):
            P[lane, lane // 8] = float(1 << (lane % 8))
        _BYTE_PACK = P
    return _BYTE_PACK


def _conv_kernel_small_packed(a_ref, b_ref, w_ref, v_ref, p_ref, out_ref,
                              *, nb):
    """Single-prime OR-convolution, packed uint32 in -> byte-planes out.
    Same transform pipeline as _conv_kernel_small; the dense bit fields
    exist only in VMEM."""
    p = jnp.float32(_NTT_PRIMES[0])
    r = jnp.float32(1.0 / _NTT_PRIMES[0])
    x = jnp.concatenate(
        [_unpack_pair(a_ref, nb), _unpack_pair(b_ref, nb)], axis=0)
    w = w_ref[:]
    v = v_ref[:]
    s1 = _mod2(_mm(x, w), p, r)
    s2 = _mod2(_mm(_blockt2(s1, nb), w), p, r)
    half = nb // 2 * 64
    prod = _mod2(s2[:half] * s2[half:], p, r)
    i1 = _mod2(_mm(prod, v), p, r)
    counts = _mod2(_mm(_blockt2(i1, nb // 2), v), p, r)
    bits = (counts > 0.5).astype(BF16)
    packed = _mm(bits, p_ref[:])  # [nb/2*64, 128], bytes in cols 0..15
    # int32 output: Mosaic float->unsigned casts are unsupported, and
    # byte values reach 255 (overflow int8); the extra bytes are noise
    out_ref[:] = packed[:, :16].astype(jnp.int32).reshape(nb // 2, 64, 16)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def conv_small_packed(pa, pb, nb=64, interpret=False):
    """Single-prime fused OR-convolution on PACKED boards: uint32
    [B, 64, 2] in, uint32 [B, 64, 2] out — no dense materialization on
    either side (in-kernel bit expansion + byte-matmul packing), so the
    library-level call costs kernel-rate, not pack/unpack-rate.  Exact
    iff every count < 193 (the Match/pattern family guarantee), like
    conv_small_fused.

    ``nb`` stays at 64: nb=128 was tried (round-2 advisor suggestion —
    the dense-input kernel's knee) and exceeds the 16 MB scoped-VMEM
    limit by 4 MB (measured, benches/conv_sweep.py round 3): this kernel
    additionally holds the unpacked bit fields and the byte-matmul
    packing buffers that the dense-input kernel does not."""
    B = pa.shape[0]
    nb = min(nb, B)
    if nb % 2:
        nb *= 2
    pad = -B % nb
    if pad:
        zeros = jnp.zeros((pad, 64, 2), jnp.uint32)
        pa = jnp.concatenate([pa, zeros])
        pb = jnp.concatenate([pb, zeros])
    Bp = B + pad
    grid = (Bp // nb,)
    W, V = _small_matrices()
    spec = pl.BlockSpec((nb, 64, 2), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((nb // 2, 64, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    by = pl.pallas_call(
        functools.partial(_conv_kernel_small_packed, nb=nb),
        out_shape=jax.ShapeDtypeStruct((Bp // 2, 64, 16), jnp.int32),
        grid=grid,
        in_specs=[spec, spec, wspec, wspec, wspec],
        out_specs=ospec,
        interpret=interpret,
    )(
        pa.astype(jnp.uint32), pb.astype(jnp.uint32),
        jnp.asarray(W, BF16), jnp.asarray(V, BF16),
        jnp.asarray(_byte_pack_matrix(), BF16),
    )
    # byte planes -> uint32 words + pair de-interleave (a few MB of
    # traffic; the dense alternative moved 67+ MB)
    w8 = by.astype(jnp.uint32)  # [Bp/2, 64, 16]
    words = (w8[..., 0::4] | (w8[..., 1::4] << 8) | (w8[..., 2::4] << 16)
             | (w8[..., 3::4] << 24))  # [Bp/2, 64, 4] = even lo,hi, odd lo,hi
    pairs = jnp.stack([words[..., :2], words[..., 2:]], axis=1)
    return pairs.reshape(Bp, 64, 2)[:B]


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def conv_counts_fused(da, db, nb=32, interpret=False):
    """Exact circular-convolution counts of dense [B, 64, 64] boards in
    one fused kernel.  ``da``/``db``: bool or numeric (cast to bf16 —
    exact for 0/1 boards).  Returns int32 [B, 64, 64]."""
    B = da.shape[0]
    nb = min(nb, B)
    assert B % nb == 0
    grid = (B // nb,)
    W, V, _, _ = _pair_matrices()
    spec = pl.BlockSpec((nb, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, nb=nb),
        out_shape=jax.ShapeDtypeStruct((B, 64, 64), jnp.int32),
        grid=grid,
        in_specs=[spec, spec, wspec, wspec],
        out_specs=spec,
        interpret=interpret,
    )(
        da.astype(jnp.int8), db.astype(jnp.int8),
        jnp.asarray(W, BF16), jnp.asarray(V, BF16),
    )
    return out
