# Integrator correctness: fixed steppers vs the reference's odeSolver.py,
# adaptive Dopri5 and stiff Radau IIA(5) vs closed forms / scipy.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmt_tpu.solvers import dopri5, fixed, newton, radau


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


def _tridiag_reaction_residual(var_no, z_no, kappa):
    """Batched residual of a nonlinear reaction-diffusion steady state:
    tridiagonal z-coupling (CD Laplacian), dense local species coupling."""
    dz = 1.0 / (z_no - 1)

    def f(x):  # (B, n) flat v*z layout
        X = x.reshape(-1, var_no, z_no)
        u, v = X[:, 0], X[:, 1]

        def lap(w):
            wl = jnp.concatenate([w[:, 1:2], w[:, :-1]], axis=1)
            wr = jnp.concatenate([w[:, 1:], w[:, -2:-1]], axis=1)
            return (wl - 2.0 * w + wr) / dz**2

        ru = 0.02 * lap(u) + 1.0 - u - kappa[:, None] * u * v * v
        rv = 0.02 * lap(v) + kappa[:, None] * u * v * v - v
        return jnp.stack([ru, rv], axis=1).reshape(x.shape[0], -1)

    return f


def test_root_batched_matches_per_member_root():
    """root_batched (lockstep scan, masked members) agrees with the
    sequential damped Newton per member, for dense, bidiagonal-block and
    tridiagonal-block linear solves."""
    var_no, z_no = 2, 9
    n = var_no * z_no
    kappa = jnp.asarray([4.0, 5.0, 6.5])
    f = _tridiag_reaction_residual(var_no, z_no, kappa)
    x0 = jnp.full((3, n), 0.8)

    # per-member oracle
    want = []
    for b in range(3):
        fb = lambda x: f(jnp.tile(x[None], (3, 1)))[b]
        sol = newton.root(fb, x0[b], max_iter=40, tol=1e-12)
        assert bool(sol.converged)
        want.append(np.asarray(sol.x))
    want = np.stack(want)

    for block in (None, (var_no, z_no, "tridiag")):
        sol = newton.root_batched(
            f, x0, max_iter=40, tol=1e-12, block=block
        )
        assert bool(jnp.all(sol.converged)), block
        np.testing.assert_allclose(
            np.asarray(sol.x), want, rtol=1e-8, atol=1e-10
        )
    # residuals actually vanish
    np.testing.assert_array_less(
        np.asarray(jnp.abs(f(jnp.asarray(want)))).max(), 1e-9
    )


def test_root_batched_bidiag_block():
    """Block-bidiagonal mode on a convection-style lower-coupled system."""
    var_no, z_no = 2, 7
    n = var_no * z_no
    a = jnp.asarray([0.5, 0.9])

    def f(x):  # upwind convection + local nonlinearity: couples z, z-1
        X = x.reshape(-1, var_no, z_no)
        Xm = jnp.concatenate([X[:, :, :1], X[:, :, :-1]], axis=2)
        r = (X - Xm) * 3.0 + X**3 - a[:, None, None]
        return r.reshape(x.shape[0], -1)

    x0 = jnp.full((2, n), 0.5)
    sol_d = newton.root_batched(f, x0, max_iter=30, tol=1e-12)
    sol_b = newton.root_batched(
        f, x0, max_iter=30, tol=1e-12, block=(var_no, z_no)
    )
    assert bool(jnp.all(sol_d.converged)) and bool(jnp.all(sol_b.converged))
    np.testing.assert_allclose(
        np.asarray(sol_b.x), np.asarray(sol_d.x), rtol=1e-8, atol=1e-12
    )


def test_lockstep_dense_output_interpolant():
    """dense_output=True records output-boundary states from the Radau
    collocation interpolant instead of clamping steps onto every
    boundary: on a linear stiff system the dense states must match the
    exact solution at the step-controller tolerance, and the forced
    stops disappear (fewer attempts than boundaries)."""
    from rmt_tpu.solvers import stiff_ensemble

    lam = jnp.asarray([[-1.0, -10.0], [-0.5, -40.0]])   # (B=2, n=2)

    def f(t, y):
        return lam * y

    y0 = jnp.ones((2, 2))
    ts = jnp.linspace(0.0, 2.0, 65)                      # 64 boundaries
    ys_d, st_d = stiff_ensemble.odeint_ensemble(
        f, y0, ts, rtol=1e-7, atol=1e-10, max_steps=512,
        batched=True, dense_output=True,
    )
    assert int(jnp.min(st_d.seg)) == len(ts) - 1
    exact = jnp.exp(lam[None] * ts[:, None, None]) * y0[None]
    # error scaled like the step controller (atol + rtol*|y|): the fast
    # components decay to ~1e-35 where any absolute floor dwarfs them
    scaled = jnp.max(jnp.abs(ys_d - exact) / (1e-8 + 1e-5 * jnp.abs(exact)))
    assert float(scaled) < 1.0, float(scaled)
    # no forced boundary stops: dense costs no more attempts than the
    # clamped mode (which must land on all 64 boundaries)
    ys_c, st_c = stiff_ensemble.odeint_ensemble(
        f, y0, ts, rtol=1e-7, atol=1e-10, max_steps=512,
        batched=True,
    )
    att_d = jnp.max(st_d.n_accepted + st_d.n_rejected)
    att_c = jnp.max(st_c.n_accepted + st_c.n_rejected)
    assert int(att_d) <= int(att_c)
    scaled_c = jnp.max(jnp.abs(ys_c - exact) / (1e-8 + 1e-5 * jnp.abs(exact)))
    assert float(scaled_c) < 1.0, float(scaled_c)


def test_lockstep_dense_output_n2_matches_clamped():
    """On the N2 ensemble the dense trajectories agree with the clamped
    ones within the step-control tolerance and cost no more attempts."""
    import sys

    sys.path.insert(0, "tests")
    from dme_case import make_model_input

    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray([523.0, 527.0])}
    kw = dict(max_steps=768, rtol=1e-5, atol=1e-7, newton_iters=5,
              j_every=8)
    ys_c, st_c = run_n2_ensemble_lockstep(mi, sweep, **kw)
    ys_d, st_d = run_n2_ensemble_lockstep(mi, sweep, dense_output=True,
                                          **kw)
    assert int(jnp.min(st_d.seg)) == ys_d.shape[0] - 1
    rel = jnp.max(jnp.abs(ys_d - ys_c) / jnp.maximum(jnp.abs(ys_c), 1e-7))
    assert float(rel) < 5e-5, float(rel)
    att_c = jnp.mean(st_c.n_accepted + st_c.n_rejected)
    att_d = jnp.mean(st_d.n_accepted + st_d.n_rejected)
    assert float(att_d) <= float(att_c) + 1
