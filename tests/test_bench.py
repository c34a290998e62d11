"""bench.py instrument tests (fast tier).

The r3 MFU headline was WRONG because the FLOPs meter compiled through the
timed step function: the force_xla scope is a ContextVar no jit/tracing
cache key can see, and the tracing cache is keyed by the underlying function
id — so metering poisoned the timed fn's cache with the XLA-attention jaxpr
and the timed loop never ran the Pallas kernels (measured 759 vs 1070 img/s
on the chip). The fix is a fresh lambda per meter (bench.metered_flops).
These tests pin (a) that failure mode exists in jax, (b) that the helper
avoids it, (c) that the bench paths actually use the helper, and (d) the
two-point chained-timing arithmetic.
"""
import inspect
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from artgraph_tpu.models.vit import _FORCE_XLA_ATTENTION, force_xla_attention


def _branching_step():
    """A step fn whose trace depends on the force_xla ContextVar, like the
    real train step: forced trace does TWO matmuls, normal trace one."""

    def step_fn(x):
        if _FORCE_XLA_ATTENTION.get():
            return (x @ x) @ x
        return x @ x

    return step_fn


X = jnp.eye(8, dtype=jnp.float32) * 2.0  # x@x = 4I, (x@x)@x = 8I
MATMUL_FLOPS = 2 * 8**3  # XLA cost model: 2*M*N*K per f32 matmul


def test_two_point_rate_cancels_fixed_overhead():
    """t(n) = overhead + n*step_time: the slope-based rate must recover
    items/step_time exactly, independent of the overhead magnitude."""
    step_time, batch = 0.02, 128
    for overhead in (0.0, 0.7, 5.0):
        t_lo = overhead + 6 * step_time
        t_hi = overhead + 30 * step_time
        rate = bench.two_point_rate(t_lo, 6, t_hi, 30, batch)
        assert rate == pytest.approx(batch / step_time, rel=1e-9)


def test_metered_flops_honors_force_context():
    """The meter must compile the FORCED (kernel-off) trace: its FLOPs are
    the two-matmul branch, not the one-matmul branch."""
    flops = bench.metered_flops(_branching_step(), force_xla_attention, X)
    assert flops == pytest.approx(2 * MATMUL_FLOPS, rel=0.01)


def test_meter_leaves_timed_cache_clean():
    """THE r3 REGRESSION TEST: metering through bench.metered_flops must not
    poison the timed jit's tracing cache — afterwards the timed fn still
    runs the UNFORCED (kernel-on) trace."""
    step_fn = _branching_step()
    timed = jax.jit(step_fn)  # created before metering, as in bench_model
    bench.metered_flops(step_fn, force_xla_attention, X)
    y = np.asarray(timed(X))
    assert y[0, 0] == pytest.approx(4.0), (
        "timed fn ran the forced two-matmul trace: the FLOPs meter poisoned "
        "its tracing cache (the r3 bug — bench.metered_flops must compile "
        "through a FRESH lambda, never through step_fn itself)")


def test_buggy_meter_pattern_does_poison():
    """Pin the jax failure mode the fresh lambda defends against: compiling
    a SEPARATE jax.jit(step_fn) under the force context hands the forced
    trace to every other jit of the same function object. If this ever
    fails, jax changed its tracing-cache keying and metered_flops' fresh
    lambda is no longer load-bearing (the comment should be updated, and
    this test relaxed)."""
    step_fn = _branching_step()
    timed = jax.jit(step_fn)
    with force_xla_attention():
        jax.jit(step_fn).lower(X).compile()  # the buggy (pre-r4) pattern
    y = np.asarray(timed(X))
    assert y[0, 0] == pytest.approx(8.0)


def test_bench_paths_use_the_helpers():
    """bench_model / bench_infer must meter via metered_flops and rate via
    two_point_rate — reintroducing an inline meter bypasses the regression
    coverage above."""
    for fn in (bench.bench_model, bench.bench_infer):
        src = inspect.getsource(fn)
        assert "metered_flops(" in src, fn.__name__
        assert "two_point_rate(" in src, fn.__name__
    assert "two_point_rate(" in inspect.getsource(bench.bench_gnn)


def test_metered_flops_on_real_models_smoke():
    """The meter end-to-end on a tiny real forward: non-zero, scales with
    the forced branch on the CPU backend too (cost_analysis contract)."""

    def fwd(x):
        return jnp.sum(x @ x)

    flops = bench.metered_flops(fwd, force_xla_attention, X)
    assert flops >= MATMUL_FLOPS
