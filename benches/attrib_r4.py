#!/usr/bin/env python
"""Round-4 attribution probes (VERDICT r03 directives #3 and #6):

1. dispatch+readback round-trip floor (jitted identity on 4 bytes);
2. beam end-to-end (compact readback) vs batch size — shows the fixed
   per-call cost amortizing toward the kernel-marginal rate;
3. XLA compiled-artifact cost_analysis for the flagship Pallas kernels
   (expected: the custom call is opaque — documenting WHICH counts are
   available is the directive's deliverable; utils/roofline.lane_ops_cse
   provides the executed-op estimate instead).

Prints one JSON line per probe.
"""

import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def _med(fn, reps=9):
    fn()
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def probe_rtt():
    x = jnp.zeros((1,), jnp.uint32)
    f = jax.jit(lambda v: v + 1)
    dt = _med(lambda: np.asarray(f(x)))
    print(json.dumps({"metric": "dispatch_readback_floor_seconds",
                      "value": dt, "unit": "s"}), flush=True)
    return dt


def probe_beam_scaling(rtt):
    from lifeapi_tpu.core import board, rle
    from lifeapi_tpu.stable import bitplane as BP
    from lifeapi_tpu.stable import complete as C

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    on_accel = jax.devices()[0].platform != "cpu"
    for B in ((8192, 16384, 32768) if on_accel else (128,)):
        bst = BP.make(
            state=jnp.broadcast_to(eater & ~hide, (B, 64, 2)),
            unknown=jnp.broadcast_to(unknown, (B, 64, 2)),
        )
        dt = _med(lambda: C.complete_stable_beam(
            bst, frontier=4, iters=24, return_boards=False,
            interpret=not on_accel), reps=5)
        print(json.dumps({
            "metric": f"beam_e2e_compact_B{B}",
            "value": B / dt, "unit": "solves/s",
            "seconds_per_call": dt,
            "nonkernel_seconds_est": dt - B / 5.47e5,
            "note": "nonkernel est = call time minus B/kernel-marginal "
                    "(bench.py beam_solves_per_sec)",
        }), flush=True)


def probe_cost_analysis():
    from lifeapi_tpu.ops import step_pallas
    from lifeapi_tpu.utils import roofline as R

    e = jnp.zeros((64, 128), jnp.uint32)
    ca = R.compiled_cost_analysis(
        lambda a, b: step_pallas.rollout_eo(a, b, 8), e, e)
    flops = None if not ca else ca.get("flops")
    out = {
        "metric": "xla_cost_analysis_step_kernel",
        "value": flops if flops is not None else -1,
        "unit": "flops (XLA cost model)",
        "keys": sorted(k for k in (ca or {}) if not k.startswith("utiliz")),
        "lane_ops_cse_per_board_per_gen": R.step_lane_ops_per_board(
            post_cse=True),
        "fixpoint_lane_ops_cse_per_board_per_step":
            R.fixpoint_step_lane_ops_per_board(post_cse=True),
        "note": "Pallas custom calls are opaque to XLA's cost model; "
                "lane_ops_cse (value-numbering CSE + DCE on the kernel "
                "jaxpr) is the executed-op estimate used for % peak",
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["rtt", "beam", "cost"]
    rtt = probe_rtt() if "rtt" in which else None
    if "beam" in which:
        probe_beam_scaling(rtt)
    if "cost" in which:
        probe_cost_analysis()
