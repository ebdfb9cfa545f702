"""Shared measurement helpers for the secondary bench scripts.

One copy of the M-differencing slope estimator (the bench.py discipline:
median slope over reps, spread-gated, re-rolled on unstable rounds,
NEVER a fabricated value).  bench.py keeps its own self-contained copy
by design — the driver runs it standalone and it must not depend on
this package-relative module.
"""

import statistics


def median_slope(timed, m_lo, m_hi, reps=5, rounds=3, spread_limit=1.5):
    """(median_seconds_per_call, spread) or (None, None) when no round
    achieves a positive median with bounded spread."""
    timed(m_lo)  # compile both programs + warm dispatch
    timed(m_hi)
    for _ in range(rounds):
        slopes = []
        for _ in range(reps):
            t_lo = timed(m_lo)
            t_hi = timed(m_hi)
            slopes.append((t_hi - t_lo) / (m_hi - m_lo))
        med = statistics.median(slopes)
        inner = sorted(slopes)[1:-1]
        if med > 0 and inner and min(inner) > 0:
            spr = max(inner) / min(inner)
            if spr <= spread_limit:
                return med, spr
    return None, None
