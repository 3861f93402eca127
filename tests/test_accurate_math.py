# Accurate f32 transcendentals (ops/accurate_math): correctness vs f64
# over the kinetics DSL's real argument ranges, f64 pass-through, edge
# semantics, and differentiability (the colored Jacobians JVP through the
# DSL, so these must have clean gradients).

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmt_tpu.ops import accurate_math as am


def _rel(a, b):
    b = np.asarray(b, dtype=np.float64)
    return np.abs(np.asarray(a, dtype=np.float64) - b) / np.maximum(np.abs(b), 1e-300)


# Arrhenius/equilibrium exponent range: K3 uses -52940/(R*T) ~ -12.2 at
# 523 K; KCO2 +15.5; the KP's |ln| <= ~30
_EXP_ARGS = np.concatenate([
    np.linspace(-30.0, 30.0, 4001),
    np.linspace(-0.01, 0.01, 101),
])


def test_exp_f32_near_ieee():
    x = jnp.asarray(_EXP_ARGS, jnp.float32)
    got = jax.jit(am.exp)(x)
    assert got.dtype == jnp.float32
    # f32 argument representation alone costs |x|*eps (~1.8e-6 at |x|=30);
    # subtract that inherent part by evaluating the oracle at the ROUNDED
    # argument -- the implementation itself must be a few ulp
    oracle = np.exp(np.asarray(x, np.float64))
    err = _rel(got, oracle)
    assert err.max() < 5e-7, err.max()


def test_log_f32_near_ieee():
    x = jnp.asarray(
        np.concatenate([
            np.logspace(-30, 30, 4001),
            np.linspace(0.9, 1.1, 201),   # cancellation region
        ]),
        jnp.float32,
    )
    got = jax.jit(am.log)(x)
    oracle = np.log(np.asarray(x, np.float64))
    # absolute error bound near log=0; relative elsewhere
    err = np.abs(np.asarray(got, np.float64) - oracle) / np.maximum(np.abs(oracle), 0.25)
    assert err.max() < 5e-7, err.max()


def test_log10_f32_near_ieee():
    x = jnp.asarray(np.logspace(-10, 10, 2001), jnp.float32)
    got = jax.jit(am.log10)(x)
    oracle = np.log10(np.asarray(x, np.float64))
    err = np.abs(np.asarray(got, np.float64) - oracle) / np.maximum(np.abs(oracle), 0.25)
    assert err.max() < 5e-7, err.max()


def test_pow_f32_near_ieee():
    # 10**(3066/T - 10.92) over T in [450, 700]: exponents in [-6.6, -4.1];
    # partial-pressure powers p**3 with p ~ [1e-3, 50] bar
    T = np.linspace(450.0, 700.0, 501)
    z = 3066.0 / T - 10.92
    got = jax.jit(am.pow)(jnp.float32(10.0), jnp.asarray(z, jnp.float32))
    oracle = np.power(10.0, np.asarray(jnp.asarray(z, jnp.float32), np.float64))
    assert _rel(got, oracle).max() < 1e-6

    p = jnp.asarray(np.logspace(-3, 1.7, 301), jnp.float32)
    y = jnp.asarray(np.linspace(-3.0, 3.0, 301), jnp.float32)
    got2 = jax.jit(am.pow)(p, y)
    oracle2 = np.power(np.asarray(p, np.float64), np.asarray(y, np.float64))
    assert _rel(got2, oracle2).max() < 1e-6


def test_pow_static_integer_exponent_is_exact_chain():
    x = jnp.asarray([1.5, 2.5, 523.0], jnp.float32)
    np.testing.assert_array_equal(am.pow(x, 2), x * x)
    np.testing.assert_array_equal(am.pow(x, 3), x * x * x)


def test_f64_passes_through_unchanged():
    if not jax.config.jax_enable_x64:
        pytest.skip("x64 disabled")
    x = jnp.asarray([0.5, 1.0, 12.2], jnp.float64)
    np.testing.assert_array_equal(am.exp(x), jnp.exp(x))
    np.testing.assert_array_equal(am.log(x), jnp.log(x))
    np.testing.assert_array_equal(am.pow(x, jnp.float64(1.7)),
                                  jnp.power(x, jnp.float64(1.7)))


def test_edge_semantics_match_native():
    x = jnp.asarray([-1.0, 0.0, jnp.inf, 100.0, -100.0], jnp.float32)
    ge, ne = am.exp(x), jnp.exp(x)
    np.testing.assert_array_equal(np.isfinite(ge), np.isfinite(ne))
    assert np.asarray(ge)[2] == np.inf and np.asarray(ge)[3] == np.inf
    assert np.asarray(ge)[4] == 0.0
    gl = np.asarray(am.log(x))
    assert np.isnan(gl[0]) and gl[1] == -np.inf and gl[2] == np.inf
    gp = np.asarray(am.pow(jnp.float32(-2.0), jnp.float32(0.5)))
    assert np.isnan(gp)


def test_gradients_are_clean_and_accurate():
    def f(t):
        # a miniature Arrhenius/equilibrium composite like the DSL's VARS
        k = 35.45 * am.exp(-1.7069e4 / (8.314 * t))
        kp = am.pow(jnp.float32(10.0), 3066.0 / t - 10.92)
        return k * kp + am.log(t)

    t = jnp.float32(523.0)
    g = jax.grad(f)(t)
    assert np.isfinite(g)
    t64 = 523.0
    eps = 1e-3
    fd = (float(f(jnp.float32(t64 + eps))) - float(f(jnp.float32(t64 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=5e-3)
    # masked branches must not leak NaN into gradients
    g2 = jax.grad(lambda z: jnp.sum(am.log(z)))(jnp.asarray([2.0, 5.0], jnp.float32))
    assert np.all(np.isfinite(g2))


def test_dsl_shim_routes_through_accurate_math():
    """The DME kinetics program evaluated in f32 matches its f64 evaluation
    to ~1e-6 (native TPU-grade approximations would sit at ~1e-5; on CPU
    this pins the routing rather than the win)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from dme_case import make_model_input

    from rmt_tpu.kinetics.dsl import RateProgram

    mi = make_model_input(model="N1")
    rr = mi["reaction-rates"]
    prog = RateProgram(rr["VARS"], rr["RATES"])
    T = 523.0
    P = 5e6
    mf = np.array([0.5, 0.4, 0.01, 0.01, 0.06, 0.02])
    conc = mf * P / (8.314 * T) / 1000.0
    r64 = prog(jnp.float64(T), jnp.float64(P), jnp.asarray(mf),
               jnp.asarray(conc)) if jax.config.jax_enable_x64 else None
    r32 = prog(jnp.float32(T), jnp.float32(P), jnp.asarray(mf, jnp.float32),
               jnp.asarray(conc, jnp.float32))
    assert np.all(np.isfinite(np.asarray(r32)))
    if r64 is not None:
        np.testing.assert_allclose(
            np.asarray(r32, np.float64), np.asarray(r64, np.float64),
            rtol=3e-6,
        )
