"""Per-kernel roofline accounting (SURVEY.md §5.1 promise; round-2
VERDICT missing #3).

The hot kernels here are integer/boolean VPU code — the roofline that
matters is *vector lane-ops per second* against the VPU's issue-rate
ceiling, not FLOPs against the MXU.  This module counts the lane-ops of a
kernel body mechanically from its jaxpr (so the counts track the code),
and benches divide measured throughput by the documented peak to report a
``% of VPU peak`` column (BENCH_NOTES.md).

Peak model (documented so the number is auditable):

  TPU v5e, one TensorCore: the VPU is an (8 sublane x 128 lane) vector
  unit with 4 independent ALU slots per lane-position at ~0.94 GHz
  (public "How to Scale Your Model" figures), i.e.

      peak = 8 * 128 * 4 * 0.94e9 ~= 3.85e12 uint32 lane-ops/s.

  This is the *issue-rate* ceiling for elementwise int ops, assuming
  perfect 4-way slot packing; shifts/selects/shuffles occupy the same
  slots, and not every op mix reaches 4-way issue, so sustained fractions
  above ~50% are excellent and >80% is effectively speed-of-light.

  Round 5: the model is superseded for utilization quotes by the
  MEASURED ceiling of ops/calibrate_pallas.py — a known-op-count kernel
  in the bit-kernel mix sustains ~5.9e12 (elemwise) / 4.9e12 (+rolls)
  lane-ops/s at lane tile 128, falling to ~3.1e12 at tile 512, i.e. the
  model UNDERSTATES small-tile hardware by ~1.5x and the ceiling is
  tile-dependent.  BENCH_NOTES quotes calibrated utilization (measured
  lane-ops/s over the rolls-mix ceiling at the kernel's own tile).

CPU baseline model (for the host-oracle comparisons): one Xeon core at
2.1 GHz executing ~3 scalar 64-bit ALU ops/cycle ~= 6.3e9 word-ops/s;
each 64-bit word-op is 2 lane-ops in the 32-bit accounting below.
"""

from __future__ import annotations

import jax
import numpy as np

V5E_VPU_PEAK_LANE_OPS = 8 * 128 * 4 * 0.94e9  # ~3.85e12 uint32 lane-ops/s

# primitives that are pure data-plumbing in a fused kernel: either
# compiled away entirely or not representative of ALU pressure
_FREE_PRIMS = {
    "broadcast_in_dim", "reshape", "squeeze", "transpose", "copy",
    "convert_element_type", "stop_gradient", "slice",
}


def _count_jaxpr(jaxpr):
    """Total output elements across counted eqns (recursing into control
    flow is deliberately NOT done: trace loop *bodies*)."""
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _FREE_PRIMS:
            continue
        if name in ("pjit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                total += _count_jaxpr(
                    inner.jaxpr if hasattr(inner, "jaxpr") else inner
                )
            continue
        for out in eqn.outvars:
            shape = getattr(out.aval, "shape", ())
            total += int(np.prod(shape, dtype=np.int64)) if shape else 1
    return total


def lane_ops(fn, *example_args):
    """Count vector lane-ops of one evaluation of ``fn`` (a loop BODY —
    no data-dependent control flow) by tracing its jaxpr.  Every counted
    primitive contributes its output element count; shuffles (concatenate
    for sublane rolls) count as one op per element, matching how they
    occupy VPU issue slots.

    CAVEAT (measured round 3): these are PRE-compiler counts — an UPPER
    bound on executed ops.  Mosaic/XLA CSE already eliminates repeated
    subexpressions: a source-level rewrite that removed 27% of the
    jaxpr ops of the propagate step changed its measured wall-clock by
    <2%, i.e. the compiler had already deduplicated them.  `% of peak`
    derived from these counts therefore UNDERSTATES true utilization of
    circuits with heavy shared subexpressions (the fixpoint's real
    fraction is higher than the quoted ~44%); the step kernel's count
    has no such redundancy and its ~110% reading stands."""
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    return _count_jaxpr(jaxpr.jaxpr)


def pct_of_peak(achieved_lane_ops_per_s, peak=V5E_VPU_PEAK_LANE_OPS):
    return 100.0 * achieved_lane_ops_per_s / peak


# -- post-CSE counting (round-3 VERDICT directive #6) -----------------------

_COMMUTATIVE = {"and", "or", "xor", "add", "mul", "max", "min"}


def _params_key(params):
    return tuple(sorted(
        (k, repr(v)) for k, v in params.items()
        if k not in ("jaxpr", "call_jaxpr", "branches", "cond_jaxpr",
                     "body_jaxpr")
    ))


def _cse_count_jaxpr(jaxpr):
    """Output-element count after local value-numbering CSE + dead-code
    elimination on the jaxpr: two eqns with the same primitive, params and
    (operand-order-normalized, for commutative prims) inputs count ONCE,
    and eqns whose results never reach an output count ZERO.  This is the
    dedup XLA/Mosaic provably performs (a 31% pre-CSE source reduction
    moved wall-clock <2%, BENCH_NOTES), so these counts are the honest
    numerator for ``% of peak``.  Remaining slack vs the true executed
    count: algebraic rewrites beyond CSE, and cross-``pjit``-boundary
    sharing (not attempted — sub-jaxprs are counted independently)."""
    vn = {}          # var -> value number
    next_vn = [0]

    def fresh():
        next_vn[0] += 1
        return next_vn[0] - 1

    def operand_vn(v):
        if hasattr(v, "val"):  # Literal
            key = ("lit", str(getattr(v, "aval", None)), repr(v.val))
            if key not in seen:
                seen[key] = fresh()
            return seen[key]
        return vn[v]

    seen = {}
    for v in list(jaxpr.invars) + list(jaxpr.constvars):
        vn[v] = fresh()

    _CALL_PRIMS = ("jit", "pjit", "closed_call", "custom_jvp_call",
                   "custom_vjp_call")

    kept = []          # live-analysis worklist, program order
    inner_count = {}   # id(eqn) -> nested sub-jaxpr count (call prims)
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _CALL_PRIMS:
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            n = 0
            if inner is not None:
                n = _cse_count_jaxpr(
                    inner.jaxpr if hasattr(inner, "jaxpr") else inner
                )
            inner_count[id(eqn)] = n
            for out in eqn.outvars:
                vn[out] = fresh()
            kept.append(eqn)
            continue
        ops = [operand_vn(v) for v in eqn.invars]
        if name in _COMMUTATIVE:
            ops = sorted(ops)
        key = (name, _params_key(eqn.params), tuple(ops))
        if key in seen and not eqn.effects:
            for out, o in zip(eqn.outvars, seen[key]):
                vn[out] = o
        else:
            outs = tuple(fresh() for _ in eqn.outvars)
            seen[key] = outs
            for out, o in zip(eqn.outvars, outs):
                vn[out] = o
            kept.append(eqn)

    # dead-code elimination: walk kept eqns backwards from the outputs
    live = set()
    for v in jaxpr.outvars:
        if not hasattr(v, "val"):
            live.add(vn.get(v))
    total = 0
    for eqn in reversed(kept):
        out_vns = [vn[o] for o in eqn.outvars]
        if not any(o in live for o in out_vns) and not eqn.effects:
            continue
        for v in eqn.invars:
            if not hasattr(v, "val"):
                live.add(vn[v])
        if id(eqn) in inner_count:
            total += inner_count[id(eqn)]
            continue
        if eqn.primitive.name in _FREE_PRIMS:
            continue
        for out in eqn.outvars:
            shape = getattr(out.aval, "shape", ())
            total += int(np.prod(shape, dtype=np.int64)) if shape else 1
    return total


def lane_ops_cse(fn, *example_args):
    """Post-CSE/DCE lane-op count of one evaluation of ``fn`` — the
    executed-op estimate that replaces the pre-CSE upper bound of
    :func:`lane_ops` in ``% of peak`` columns (see _cse_count_jaxpr)."""
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    return _cse_count_jaxpr(jaxpr.jaxpr)


def compiled_cost_analysis(fn, *example_args):
    """XLA's own cost model for the COMPILED artifact
    (``jit(fn).lower(...).compile().cost_analysis()``) — flops /
    transcendentals / bytes accessed.  For Pallas kernels the custom
    call is opaque to XLA's analysis (counts ~0), so this is only
    meaningful for jnp-path pipelines; the Pallas kernels use
    :func:`lane_ops_cse` instead."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    try:
        return compiled.cost_analysis()
    except Exception:
        return None


V5E_MXU_PEAK_BF16_FLOPS = 197e12  # public v5e figure, bf16


def matmul_flops(fn, *example_args):
    """Total dot_general FLOPs (2*M*N*K) of one evaluation of ``fn`` —
    the MXU-side roofline numerator for the NTT convolution kernels."""

    def walk(jaxpr):
        total = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                a, b = eqn.invars[0].aval, eqn.invars[1].aval
                ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
                k = int(np.prod([a.shape[i] for i in lc]))
                batch = int(np.prod([a.shape[i] for i in lb])) if lb else 1
                m = int(np.prod(a.shape)) // (k * batch)
                n = int(np.prod(b.shape)) // (k * batch)
                total += 2 * batch * m * n * k
            for key in ("jaxpr",):
                inner = eqn.params.get(key)
                if inner is not None:
                    total += walk(
                        inner.jaxpr if hasattr(inner, "jaxpr") else inner
                    )
        return total

    jaxpr = jax.make_jaxpr(fn)(*example_args)
    return walk(jaxpr.jaxpr)


# -- canned counters for the flagship kernels -------------------------------


def step_lane_ops_per_board(post_cse=False):
    """Lane-ops per board per generation of the fused even/odd step
    (ops/step_pallas.step_eo): each op processes the board's 64 uint32
    column half-words per array.  ``post_cse`` counts after
    value-numbering CSE + DCE (identical here: the CSA step has no
    redundant subexpressions — measured 3328 both ways)."""
    import jax.numpy as jnp

    from ..ops import step_pallas

    B = 8  # lane count cancels: we count per-board
    e = jnp.zeros((64, B), jnp.uint32)
    count = lane_ops_cse if post_cse else lane_ops
    ops = count(lambda a, b: step_pallas.step_eo(a, b), e, e)
    return ops // B


def fixpoint_step_lane_ops_per_board(post_cse=False):
    """Lane-ops per board per full propagate step (sync+update+signal,
    ops/stable_pallas._step_planes on 20 half-planes).  ``post_cse``
    gives the executed-op estimate (the shared-threshold circuits carry
    ~25% CSE-able redundancy at source level)."""
    import jax.numpy as jnp

    from ..ops import stable_pallas

    B = 8
    planes = tuple(jnp.zeros((64, B), jnp.uint32) for _ in range(20))
    count = lane_ops_cse if post_cse else lane_ops
    ops = count(lambda *p: stable_pallas._step_planes(p)[0], *planes)
    return ops // B


def simple_step_lane_ops_per_board(post_cse=False):
    """Lane-ops per board per cheap simple-rule iteration
    (ops/stable_pallas._simple_quiescence body: 2 counts + circuit)."""
    import jax.numpy as jnp

    from ..ops import stable_pallas
    from ..stable import bitplane as BP

    B = 8
    z = jnp.zeros((64, B), jnp.uint32)

    def body(sl, sh, ul, uh):
        on9 = stable_pallas._count9(sl, sh)
        unk9 = stable_pallas._count9(ul, uh)
        outs = []
        for k, (s, u) in enumerate(((sl, ul), (sh, uh))):
            outs.extend(BP.simple_circuit(s, u, on9[k], unk9[k]))
        return outs

    count = lane_ops_cse if post_cse else lane_ops
    return count(body, z, z, z, z) // B
