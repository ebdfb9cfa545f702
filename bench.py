#!/usr/bin/env python
"""Headline benchmark: bit-exact 64x64 Life steps/sec/chip.

Runs the fused Pallas rollout kernel on whatever accelerator jax exposes
(the driver runs this on one real TPU chip) and prints ONE JSON line.

Baseline: the reference C++ LifeAPI ``Step`` measured at 5.55e6 steps/s on
one Xeon 2.1 GHz core (BASELINE.md).  ``vs_baseline`` is the speedup over
that number.
"""

import json
import time

import jax

from lifeapi_tpu.core import board, step
from lifeapi_tpu.ops import step_pallas

BASELINE_STEPS_PER_SEC = 5.55e6  # reference LifeAPI.hpp:1196-1216, 1 CPU core


def main():
    on_accel = jax.devices()[0].platform != "cpu"
    B = 8192 if on_accel else 512
    T = 512 if on_accel else 32

    from lifeapi_tpu.core import bitops

    key = jax.random.key(0)
    boards = board.random(key, (B,))
    lo, hi = step_pallas.to_kernel_layout(boards)
    e, o = bitops.interleave_split(lo, hi)

    # Correctness gate: kernel must agree with the independent scan path.
    check = boards[:128]
    ok = bool(
        board.equal(
            step_pallas.rollout(check, steps=16, interpret=not on_accel),
            step.step_n(check, 16),
        ).all()
    )
    if not ok:
        print(json.dumps({"metric": "life_steps_per_sec_per_chip", "value": 0.0,
                          "unit": "steps/s", "vs_baseline": 0.0,
                          "error": "kernel mismatch vs scan oracle"}))
        return

    import numpy as np

    def run(a, b):
        return step_pallas.rollout_eo(a, b, T, interpret=not on_accel)

    def timed_chain(reps):
        """Chain reps calls and force a host readback at the end: on
        tunneled backends block_until_ready can return before execution, so
        the readback is the only reliable fence."""
        a, b = e, o
        t0 = time.perf_counter()
        for _ in range(reps):
            a, b = run(a, b)
        np.asarray(a)  # full materialization on host
        return time.perf_counter() - t0

    timed_chain(1)  # warm up compile + readback path
    reps = 10 if on_accel else 2
    base = timed_chain(1)
    total = timed_chain(reps + 1)
    dt = max((total - base) / reps, 1e-9)

    steps_per_sec = B * T / dt
    print(
        json.dumps(
            {
                "metric": "life_steps_per_sec_per_chip",
                "value": steps_per_sec,
                "unit": "steps/s",
                "vs_baseline": steps_per_sec / BASELINE_STEPS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
