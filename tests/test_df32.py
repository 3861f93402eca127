# Double-float32 compensated arithmetic (ops/df32.py): operator accuracy
# vs a float64 oracle, the kinetics DSL evaluated through DF32 pairs, and
# the accurate_rates="df32" N2 RHS against the float64 chain.

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dme_case import dme_kinetics, make_model_input
from rmt_tpu.kinetics.dsl import compile_rate_program
from rmt_tpu.models import homo
from rmt_tpu.ops import df32 as D


def _rel(a, b, floor=1e-300):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), floor)))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_df32_arithmetic_vs_f64(rng):
    x = rng.uniform(0.1, 10, 2048) * 10.0 ** rng.integers(-8, 8, 2048)
    y = rng.uniform(0.1, 10, 2048) * 10.0 ** rng.integers(-8, 8, 2048)
    X = D.DF32.from_value(jnp.asarray(x))
    Y = D.DF32.from_value(jnp.asarray(y))
    assert _rel(X.value(jnp.float64), x) < 1e-14
    assert _rel((X + Y).value(jnp.float64), x + y) < 1e-13
    assert _rel((X * Y).value(jnp.float64), x * y) < 1e-13
    assert _rel((X / Y).value(jnp.float64), x / y) < 1e-13
    assert _rel(D.sqrt(X).value(jnp.float64), np.sqrt(x)) < 1e-13
    assert _rel((X**3).value(jnp.float64), x**3) < 1e-13
    # subtraction of nearby values -- the cancellation case the pairs exist
    # for: relative accuracy of the DIFFERENCE stays at pair resolution
    z = x * (1 + 1e-6)
    Z = D.DF32.from_value(jnp.asarray(z))
    assert _rel((Z - X).value(jnp.float64), z - x) < 1e-6


def test_df32_python_float_constants_keep_full_precision():
    # python floats carry f64 precision; the overloads must split them
    c = 1.7069e4
    t = np.float64(523.0)
    T = D.DF32.from_value(jnp.asarray(t))
    assert _rel((T * c).value(jnp.float64), t * c) < 1e-14
    assert _rel((c / T).value(jnp.float64), c / t) < 1e-13
    assert _rel((1 - T * 1e-4).value(jnp.float64), 1 - t * 1e-4) < 1e-13


def test_df32_transcendentals(rng):
    # targets: ~2e-9 for exp-family (f32 Taylor tail, ops/df32.py), ~1e-9
    # for log -- 20x tighter than the TPU-emulated-f64 transcendentals
    # (4e-8, round-1 hardware finding) and far below the 1e-6 north star
    a = rng.uniform(-35, 35, 2048)
    A = D.DF32.from_value(jnp.asarray(a))
    assert _rel(D.exp(A).value(jnp.float64), np.exp(a)) < 5e-9
    t = rng.uniform(1e-8, 1500, 2048)
    T = D.DF32.from_value(jnp.asarray(t))
    assert _rel(D.log(T).value(jnp.float64), np.log(t)) < 2e-9
    assert _rel(D.log10(T).value(jnp.float64), np.log10(t)) < 2e-9
    lk = rng.uniform(-8, 8, 2048)
    LK = D.DF32.from_value(jnp.asarray(lk))
    assert _rel((10.0**LK).value(jnp.float64), 10.0**lk) < 5e-9
    b = rng.uniform(0.5, 50, 2048)
    e = rng.uniform(-3, 3, 2048)
    B = D.DF32.from_value(jnp.asarray(b))
    E = D.DF32.from_value(jnp.asarray(e))
    assert _rel((B**E).value(jnp.float64), b**e) < 5e-9


def test_dme_rates_df32_vs_f64(rng):
    """The full DME dict-program through DF32 pairs matches the f64 chain
    to pair resolution -- 7 orders below plain f32 (measured ~1e-5)."""
    prog = compile_rate_program(dme_kinetics())
    z = 20
    T = np.float32(rng.uniform(500, 620, z)).astype(np.float64)
    P = np.float32(rng.uniform(4.5e6, 5e6, z)).astype(np.float64)
    mf = np.float32(rng.dirichlet(np.ones(6), z).T).astype(np.float64)
    conc = np.float32(mf * 1.15).astype(np.float64)
    r64 = np.asarray(
        prog(jnp.asarray(T), jnp.asarray(P), jnp.asarray(mf), jnp.asarray(conc))
    )
    rdf = prog(
        D.DF32.from_value(jnp.asarray(T)),
        D.DF32.from_value(jnp.asarray(P)),
        D.DF32.from_value(jnp.asarray(mf)),
        D.DF32.from_value(jnp.asarray(conc)),
    )
    assert isinstance(rdf, D.DF32)
    assert _rel(rdf.value(jnp.float64), r64) < 2e-8


def test_n2_rhs_df32_matches_f64_chain():
    """accurate_rates='df32' matches accurate_rates=True (the f64 kinetics
    chain) evaluated on IDENTICAL f32 params/states to ~f32-ulp of the
    RHS's characteristic scale -- both paths share every non-kinetics f32
    operation, so the deviation isolates the compensated-vs-f64 chain.

    (A naive pointwise-relative metric against the all-f64 RHS is
    unusable here: near steady state the convection and source terms
    cancel, so dxdt -> 0 while its f32-computed terms stay O(1) -- ANY
    f32 arithmetic, including the proven f64-chain hybrid, explodes on
    that metric. Whole-run accuracy is covered by the bench probes.)"""
    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs_f64chain = homo.make_n2_rhs(spec, accurate_rates=True)
    rhs_df = homo.make_n2_rhs(spec, accurate_rates="df32")
    y0 = np.asarray(homo.n2_initial_state(spec, p, d))
    rng_ = np.random.default_rng(3)

    cast32 = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x, np.float32))
        if hasattr(x, "dtype")
        and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        tree,
    )
    p32, d32 = cast32(p), cast32(d)
    f_ref = jax.jit(lambda t, y: rhs_f64chain(t, y, p32, d32))
    f_df = jax.jit(lambda t, y: rhs_df(t, y, p32, d32))
    worst, scale = 0.0, 0.0
    for _ in range(8):
        y = (y0 * (1 + 0.5 * rng_.uniform(-1, 1, y0.shape))).astype(
            np.float32
        )
        t = np.float32(0.1)
        a = np.asarray(f_ref(t, jnp.asarray(y))).astype(np.float64)
        b = np.asarray(f_df(t, jnp.asarray(y))).astype(np.float64)
        worst = max(worst, float(np.abs(b - a).max()))
        scale = max(scale, float(np.abs(a).max()))
    assert worst / scale < 3e-7  # measured 4.1e-8; f32 ulp is 6e-8


def test_n2_lockstep_df32_smoke():
    """run_n2_ensemble_lockstep(accurate_rates='df32') integrates a tiny
    sweep and lands near the plain run (hybrid-cast path: x64 process)."""
    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray([523.0, 524.0])}
    ys_df, st_df = run_n2_ensemble_lockstep(
        mi, sweep, max_steps=512, rtol=1e-5, atol=1e-7,
        accurate_rates="df32", exact_solve=True, newton_iters=5,
    )
    assert ys_df.dtype == jnp.float32
    assert int(jnp.sum(st_df.seg < ys_df.shape[0] - 1)) == 0
    ys, _ = run_n2_ensemble_lockstep(
        mi, sweep, max_steps=512, rtol=1e-5, atol=1e-7, newton_iters=5,
    )
    rel = np.abs(np.asarray(ys_df, np.float64) - np.asarray(ys, np.float64))
    rel /= np.maximum(np.abs(np.asarray(ys, np.float64)), 1e-7)
    assert float(rel.max()) < 5e-3  # same trajectory, different precision
