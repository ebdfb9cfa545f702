#!/usr/bin/env python
"""Measure the empirical VPU lane-ops/s ceiling with the synthetic
calibration kernel (ops/calibrate_pallas), per tile and mix, and derive
measured utilization for the step / fixpoint / beam kernels (VERDICT r04
directive #8).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benches/calibrate_r5.py
"""

import functools
import json
import time

import numpy as np

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp

from lifeapi_tpu.ops import calibrate_pallas as CAL


from _bench_util import median_slope as _median_slope  # noqa: E402


def main():
    B = 4096
    ITERS = 4096
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(0, 2**32, (64, B), dtype=np.uint32))
    b = jax.device_put(rng.integers(0, 2**32, (64, B), dtype=np.uint32))

    for tile in (128, 256, 512):
        for mix in ("elemwise", "rolls"):
            @functools.partial(jax.jit, static_argnames=("m",))
            def run_m(a, b, m, tile=tile, mix=mix):
                def body(i, c):
                    aa, bb = c
                    out = CAL.calibrate(aa, bb, iters=ITERS, mix=mix,
                                        batch_tile=tile)
                    return out, aa  # feed back: no CSE
                return jax.lax.fori_loop(0, m, body, (a, b))[0]

            def timed(m):
                t0 = time.perf_counter()
                out = run_m(a, b, m)
                np.asarray(out)
                return time.perf_counter() - t0

            med, spr = _median_slope(timed, 1, 33)
            if med is None:
                print(json.dumps({"metric": f"calib_{mix}_tile{tile}",
                                  "error": "unstable"}), flush=True)
                continue
            total_ops = ITERS * CAL.ops_per_iter(mix) * 64 * B
            rate = total_ops / med
            print(json.dumps({
                "metric": f"calib_lane_ops_per_sec_{mix}_tile{tile}",
                "value": rate, "unit": "u32 lane-ops/s",
                "ops_per_call": total_ops, "spread": round(spr, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
