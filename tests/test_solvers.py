# Integrator correctness: fixed steppers vs the reference's odeSolver.py,
# adaptive Dopri5 and stiff Radau IIA(5) vs closed forms / scipy.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmt_tpu.solvers import dopri5, fixed, radau


def _lotka(t, z, params):
    a, b, c, d = params
    x, y = z
    return jnp.stack([a * x - b * x * y, -c * y + d * x * y])


@pytest.mark.reference
@pytest.mark.parametrize("method", ["RK4", "AdBash3", "PreCorr3"])
def test_fixed_steppers_match_reference(method):
    from PyREMOT.solvers import odeSolver

    params = (1.5, 1.0, 3.0, 1.0)
    y0 = np.array([10.0, 5.0])
    n, t0, tn = 150, 0.0, 10.0

    def f_np(t, z, p):
        a, b, c, d = p
        x, y = z
        return [a * x - b * x * y, -c * y + d * x * y]

    ref_fn = getattr(odeSolver, method)
    ref = ref_fn(t0, tn, n, y0, f_np, params)  # (2, n+1)

    ours_fn = {"RK4": fixed.rk4, "AdBash3": fixed.adams_bashforth3, "PreCorr3": fixed.precorr3}[method]
    ours = np.asarray(ours_fn(_lotka, t0, tn, n, jnp.asarray(y0), args=(params,)))
    np.testing.assert_allclose(ours.T, ref, rtol=1e-9, atol=1e-9)


def test_dopri5_exponential_decay():
    f = lambda t, y: -2.0 * y
    ts = jnp.linspace(0.0, 2.0, 11)
    ys, stats = dopri5.odeint(f, jnp.asarray([1.0, 3.0]), ts, rtol=1e-9, atol=1e-12)
    expected = np.exp(-2.0 * np.asarray(ts))[:, None] * np.array([1.0, 3.0])
    np.testing.assert_allclose(np.asarray(ys), expected, rtol=1e-7)
    assert int(stats.n_accepted) > 0


def test_dopri5_matches_scipy_on_nonstiff():
    from scipy.integrate import solve_ivp

    params = (1.5, 1.0, 3.0, 1.0)
    y0 = np.array([10.0, 5.0])
    ts = np.linspace(0, 10, 21)
    sol = solve_ivp(
        lambda t, y: np.asarray(_lotka(t, jnp.asarray(y), params)),
        [0, 10], y0, t_eval=ts, rtol=1e-10, atol=1e-12, method="LSODA",
    )
    ys, _ = dopri5.odeint(_lotka, jnp.asarray(y0), jnp.asarray(ts), rtol=1e-10, atol=1e-12, args=(params,))
    np.testing.assert_allclose(np.asarray(ys).T, sol.y, rtol=1e-6)


def test_radau_tableau_is_radau5():
    c, A, b, bhat = radau.radau_tableau(3)
    s6 = np.sqrt(6)
    np.testing.assert_allclose(c, [(4 - s6) / 10, (4 + s6) / 10, 1.0], rtol=1e-12)
    np.testing.assert_allclose(b, [(16 - s6) / 36, (16 + s6) / 36, 1 / 9], rtol=1e-12)
    # gamma0 is the real eigenvalue of A
    np.testing.assert_allclose(bhat[0], 0.27488882959567715, rtol=1e-9)


def test_radau_on_stiff_robertson():
    # Robertson chemical kinetics: the canonical stiff test problem
    def rob(t, y):
        y1, y2, y3 = y
        d1 = -0.04 * y1 + 1e4 * y2 * y3
        d3 = 3e7 * y2**2
        return jnp.stack([d1, -d1 - d3, d3])

    ts = jnp.asarray([0.0, 1e-2, 1e0, 1e2, 1e4])
    ys, stats = radau.odeint(rob, jnp.asarray([1.0, 0.0, 0.0]), ts, rtol=1e-8, atol=1e-12)
    from scipy.integrate import solve_ivp

    sol = solve_ivp(
        lambda t, y: np.asarray(rob(t, jnp.asarray(y))),
        [0, 1e4], [1.0, 0.0, 0.0], t_eval=np.asarray(ts), rtol=1e-10, atol=1e-14,
        method="Radau",
    )
    np.testing.assert_allclose(np.asarray(ys).T, sol.y, rtol=5e-6, atol=1e-10)
    # conservation
    np.testing.assert_allclose(np.asarray(ys).sum(axis=1), 1.0, rtol=1e-9)


def test_radau_vmaps_over_parameters():
    def decay(t, y, k):
        return -k * y

    ks = jnp.asarray([0.5, 1.0, 2.0])
    ts = jnp.linspace(0.0, 1.0, 5)

    def solve_one(k):
        ys, _ = radau.odeint(lambda t, y: decay(t, y, k), jnp.asarray([1.0]), ts, rtol=1e-9, atol=1e-12)
        return ys[:, 0]

    ys = jax.vmap(solve_one)(ks)
    expected = np.exp(-np.asarray(ks)[:, None] * np.asarray(ts)[None, :])
    np.testing.assert_allclose(np.asarray(ys), expected, rtol=1e-7)
