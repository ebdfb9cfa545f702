#!/usr/bin/env python
"""Headline benchmark: bit-exact 64x64 Life steps/sec/chip.

Runs the fused Pallas rollout kernel (even/odd interleaved packing) on
whatever accelerator jax exposes and prints ONE JSON line.

Measurement methodology (round 3 — made robust against tunnel jitter):

* exactly one compiled TPU computation (the rollout kernel); all packing
  conversions and the bit-exactness gate run host-side (numpy + the
  independent native C oracle);
* the measured program is ONE dispatch that loops the rollout kernel M
  times on-device (fori_loop feeding the boards back through the kernel —
  data dependence defeats CSE, the 2 MB carry is cheap), so the fixed
  per-dispatch + readback cost is paid once per MEASUREMENT, not once per
  chained call.  Host-chained dispatches through the tunnel showed
  +-400 ms of per-call queuing jitter (round-3 measurement), drowning any
  realistic per-call compute;
* timing is fenced by a host readback (``block_until_ready`` can return
  before execution completes on tunneled backends);
* the per-kernel-call cost is the M-difference slope
  (t(M_hi) - t(M_lo)) / (M_hi - M_lo), sampled REPS times; the MEDIAN is
  reported.  If the median is non-positive or the spread of the middle
  samples exceeds SPREAD_LIMIT, an explicit ``error`` JSON is printed —
  never a fabricated value (round-2 verdict: a max(dt, 1e-9) clamp once
  printed a 4e15 "result" when two single-sample timings crossed).

Baseline: the reference C++ LifeAPI ``Step`` measured at 5.55e6 steps/s on
one Xeon 2.1 GHz core (BASELINE.md).  ``vs_baseline`` is the speedup.
"""

import json
import statistics
import time

import numpy as np

import jax

# Persistent compilation cache: remote compiles through the tunnel can
# stall 10-30+ min per fresh process; a disk cache makes repeat runs
# compile in seconds when the backend supports executable serialization.
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

from lifeapi_tpu.ops import step_pallas

BASELINE_STEPS_PER_SEC = 5.55e6  # reference LifeAPI.hpp:1196-1216, 1 CPU core

M_LO, M_HI = 1, 1025  # on-device kernel-call loop counts; slope over the diff
REPS = 5              # slope samples per round; median reported
ROUNDS = 3            # re-measure on an unstable round (jitter is bursty)
SPREAD_LIMIT = 1.5    # max/min over the inner samples (outliers trimmed)


def _np_expand_even(x):
    x = x.astype(np.uint32) & np.uint32(0x0000FFFF)
    x = (x | (x << np.uint32(8))) & np.uint32(0x00FF00FF)
    x = (x | (x << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    x = (x | (x << np.uint32(2))) & np.uint32(0x33333333)
    x = (x | (x << np.uint32(1))) & np.uint32(0x55555555)
    return x


def eo_to_u64(e, o):
    """even/odd kernel packing [64, B] -> uint64 boards [B, 64] in the
    reference column layout (for the C oracle)."""
    e = e.T  # [B, 64]
    o = o.T
    lo = _np_expand_even(e & 0xFFFF) | (_np_expand_even(o & 0xFFFF) << np.uint32(1))
    hi = _np_expand_even(e >> 16) | (_np_expand_even(o >> 16) << np.uint32(1))
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))


def _fail(reason, **extra):
    out = {
        "metric": "life_steps_per_sec_per_chip",
        "value": 0.0,
        "unit": "steps/s",
        "vs_baseline": 0.0,
        "error": reason,
    }
    out.update(extra)
    print(json.dumps(out))


def main():
    import functools

    on_accel = jax.devices()[0].platform != "cpu"
    B = 8192 if on_accel else 512
    T = 512 if on_accel else 32
    m_lo, m_hi = (M_LO, M_HI) if on_accel else (1, 3)

    rng = np.random.default_rng(0)
    e0 = rng.integers(0, 2**32, size=(64, B), dtype=np.uint32)
    o0 = rng.integers(0, 2**32, size=(64, B), dtype=np.uint32)
    e = jax.device_put(e0)
    o = jax.device_put(o0)

    def run(a, b):
        return step_pallas.rollout_eo(a, b, T, interpret=not on_accel)

    @functools.partial(jax.jit, static_argnames=("m",))
    def run_m(a, b, m):
        # ONE dispatch: m kernel calls chained on-device; the carry is the
        # board state itself, so no call can be CSE'd away
        return jax.lax.fori_loop(0, m, lambda i, c: run(*c), (a, b))

    # warm up (compile) and grab one output for the bit-exactness gate
    a1, b1 = run(e, o)
    a1_np = np.asarray(a1)
    b1_np = np.asarray(b1)

    # bit-exactness: native C oracle steps the same boards T generations
    try:
        from lifeapi_tpu.native import build as nb

        n_check = 64
        start64 = eo_to_u64(e0[:, :n_check], o0[:, :n_check])
        oracle64 = nb.step_packed64(start64, steps=T)
        ours64 = eo_to_u64(a1_np[:, :n_check], b1_np[:, :n_check])
        bit_exact = bool((ours64 == oracle64).all())
    except Exception as exc:  # oracle build failure should not kill the bench
        bit_exact = f"oracle unavailable: {exc}"

    if bit_exact is not True:
        _fail(f"bit-exactness gate failed: {bit_exact}")
        return

    def timed(m):
        t0 = time.perf_counter()
        a, _ = run_m(e, o, m)
        np.asarray(a)  # host readback = execution fence
        return time.perf_counter() - t0

    timed(m_lo)  # compile both programs + warm dispatch
    timed(m_hi)
    median = spread = None
    all_slopes = []
    for _ in range(ROUNDS):
        slopes = []
        for _ in range(REPS):
            t_lo = timed(m_lo)
            t_hi = timed(m_hi)
            slopes.append((t_hi - t_lo) / (m_hi - m_lo))
        all_slopes.append([s * 1e3 for s in slopes])
        med = statistics.median(slopes)
        inner = sorted(slopes)[1:-1]
        if med > 0 and inner and min(inner) > 0:
            spr = max(inner) / min(inner)
        else:
            spr = float("inf")
        if med > 0 and spr <= SPREAD_LIMIT:
            median, spread = med, spr
            break
    if median is None:
        _fail(
            f"no measurement round achieved positive median slope with "
            f"spread <= {SPREAD_LIMIT}x ({ROUNDS} rounds x {REPS} "
            f"samples); tunnel too unstable — never reporting a "
            f"fabricated value", slopes_ms_rounds=all_slopes,
        )
        return

    steps_per_sec = B * T / median
    print(
        json.dumps(
            {
                "metric": "life_steps_per_sec_per_chip",
                "value": steps_per_sec,
                "unit": "steps/s",
                "vs_baseline": steps_per_sec / BASELINE_STEPS_PER_SEC,
                "spread": round(spread, 3),
                "samples": REPS,
            }
        )
    )


if __name__ == "__main__":
    main()
