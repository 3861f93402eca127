# Stiff implicit integrator: Radau IIA collocation (order 2s-1, default s=3
# i.e. the classic Radau5) with a modified-Newton inner solve using an
# autodiff Jacobian, fully jittable and vmap-able.
#
# Replaces scipy's LSODA/BDF/Radau in the reference's run methods for the
# stiff packed-bed chemistry (the DME kinetics make the steady model too
# stiff for explicit RK: scipy RK45 needs ~2.5M RHS evals where LSODA needs
# ~2.5k). Design notes:
#   * tableau coefficients are derived numerically at build time from
#     Legendre polynomial roots (right-Radau nodes) and exact polynomial
#     quadrature -- no hard-coded magic constants;
#   * the s-stage nonlinear system solves for stacked stage derivatives K
#     with the modified-Newton matrix I - h (A (x) J), J = autodiff Jacobian
#     of the RHS at the step start, LU-factored once per attempted step;
#   * the embedded error estimate uses an order-s quadrature over the same
#     stages plus f(t0,y0), smoothed by one (I - h*bhat0*J)^-1 solve as in
#     Hairer-Wanner, so stiff error components don't trigger spurious
#     rejections;
#   * everything (step controller, Newton loop, output interpolation) lives
#     under lax.while_loop/scan, so a whole trajectory is one XLA program.

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 8.0
_NEWTON_ITERS = 8
_NEWTON_TOL = 0.03  # in units of the local error tolerance


def extrap_weights(c_np, r):
    """Collocation-extrapolation weights for the Radau stage predictor.

    W[..., i, j] = l_j(1 + c_i * r), the Lagrange basis over the node set
    {0, c_1..c_s} evaluated at the NEXT step's stage abscissae expressed in
    the previous step's local coordinate (r = h_new / h_prev). Used for
    RADAU5's 'starting values by extrapolation' (Hairer-Wanner; scipy's
    Radau does the same through its dense output: Z0 = sol(t + h*C) - y).
    The previous stage offsets Z_j vanish at node 0, so that basis column
    is dropped. r may be batched: output shape r.shape + (s, s).
    """
    xs = [0.0] + [float(x) for x in c_np]
    s = len(c_np)
    r = jnp.asarray(r)
    sv = 1.0 + jnp.asarray(c_np, r.dtype) * r[..., None]   # (..., s)
    cols = []
    for j in range(1, s + 1):
        num = jnp.ones_like(sv)
        den = 1.0
        for m in range(s + 1):
            if m == j:
                continue
            num = num * (sv - xs[m])
            den = den * (xs[j] - xs[m])
        cols.append(num / den)
    return jnp.stack(cols, axis=-1)                        # (..., s, s)


def radau_tableau(s: int = 3):
    """Radau IIA nodes/weights on [0,1], derived numerically.

    Right-Radau nodes (c_s = 1) are 1 - reversed(left-Radau nodes), where the
    left-Radau nodes are the roots of P_{s-1}(2x-1) + P_s(2x-1).
    A is the collocation integral of the Lagrange basis; b = A[-1] (stiffly
    accurate). bhat is the unique order-(s+1) quadrature over nodes
    {0, c_1..c_s} used for the embedded error estimate.
    """
    from numpy.polynomial import legendre as L

    coef = np.zeros(s + 1)
    coef[s - 1] = 1.0
    coef[s] = 1.0
    u_roots = L.legroots(coef)           # roots of P_{s-1}+P_s in u=2x-1
    x_left = np.sort((u_roots + 1) / 2)  # left-Radau nodes, includes 0
    c = np.sort(1.0 - x_left)            # right-Radau nodes, includes 1

    V = np.vander(c, increasing=True)    # V[i,k] = c_i^k
    Vinv = np.linalg.inv(V)
    powers = np.arange(1, s + 1)
    Cmat = (c[:, None] ** powers) / powers  # int_0^{c_i} x^k dx, k=0..s-1
    A = Cmat @ Vinv
    b = A[-1].copy()

    # embedded order-s quadrature over nodes {0, c_1..c_s} with the weight of
    # the explicit node *pinned* to gamma0 (the real eigenvalue of A), as in
    # Hairer-Wanner's Radau5 error estimate: pinning makes the embedded rule
    # genuinely lower order (the unconstrained fit would reproduce b) and
    # lets the smoothing matrix reuse the step's Jacobian scale.
    eig = np.linalg.eigvals(A)
    gamma0 = float(eig[np.abs(eig.imag) < 1e-12].real[0])
    M = c[None, :] ** np.arange(s)[:, None]          # (s, s): c_j^k, k=0..s-1
    rhs = 1.0 / np.arange(1, s + 1)
    rhs[0] -= gamma0                                  # k=0 row includes 0^0=1
    bhat_tail = np.linalg.solve(M, rhs)
    bhat = np.concatenate([[gamma0], bhat_tail])     # bhat[0] multiplies f(t0,y0)
    return c, A, b, bhat


class RadauStats(NamedTuple):
    n_fev: jnp.ndarray
    n_jev: jnp.ndarray
    n_lu: jnp.ndarray
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    n_unreached: jnp.ndarray  # output times NOT reached within max_steps;
                              # the run only succeeded if this is 0


def _norm(v, scale):
    return jnp.sqrt(jnp.mean((v / scale) ** 2))


@partial(jax.jit, static_argnums=(0, 5, 6, 8))
def odeint(f, y0, ts, rtol=1e-7, atol=1e-10, max_steps: int = 10_000, s: int = 3, args=None,
           jac=None):
    """Integrate the stiff ODE dy/dt = f(t, y, *args); returns y at each ts.

    ts must be increasing; ys[0] == y0. jac(t, y) optionally overrides the
    dense autodiff Jacobian (e.g. a colored MoL Jacobian from ops.jacobian).
    """
    if args is not None:
        f_ = lambda t, y: f(t, y, *args)
    else:
        f_ = f

    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    n = y0.shape[0]
    ts = jnp.asarray(ts, dtype)
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)

    c_np, A_np, b_np, bhat_np = radau_tableau(s)
    C = jnp.asarray(c_np, dtype)
    A = jnp.asarray(A_np, dtype)
    B = jnp.asarray(b_np, dtype)
    BHAT = jnp.asarray(bhat_np, dtype)
    Ainv = jnp.asarray(np.linalg.inv(A_np), dtype)
    order_exp = -1.0 / (s + 1)

    def predict_K(Kp, hp, h_new):
        """Newton starting guess from the previous accepted step's
        collocation polynomial (see extrap_weights). Falls back to the
        constant guess exactly in the h_new/hp -> 0 limit (A 1 = c)."""
        r = jnp.clip(h_new / jnp.maximum(hp, 1e-300), 0.0, 4.0)
        W = extrap_weights(c_np, r).astype(dtype)          # (s, s)
        Z = hp * (A @ Kp.reshape(s, n))                    # (s, n)
        Zg = W @ Z - Z[-1:]
        Kg = (Ainv @ Zg) / h_new
        return jnp.where(jnp.isfinite(Kg), Kg, 0.0).reshape(-1)

    eye_n = jnp.eye(n, dtype=dtype)
    eye_sn = jnp.eye(s * n, dtype=dtype)

    if jac is None:
        jac = jax.jacfwd(f_, argnums=1)

    # Mixed-precision linear algebra: on TPU, float64 LU/solve does not
    # compile (f64 is emulated elementwise only), and the Newton matrix is
    # merely a preconditioner -- so factorize in float32 (native MXU path)
    # and keep states/residuals in the working dtype, with one iterative
    # refinement pass per solve to recover accuracy.
    solve_dtype = jnp.float32 if (dtype == jnp.float64 and jax.default_backend() == "tpu") else dtype

    def _factor(M):
        return jax.scipy.linalg.lu_factor(M.astype(solve_dtype))

    def _solve(fac, M, b):
        x = jax.scipy.linalg.lu_solve(fac, b.astype(solve_dtype)).astype(dtype)
        if solve_dtype != dtype:
            r = b - M @ x
            x = x + jax.scipy.linalg.lu_solve(fac, r.astype(solve_dtype)).astype(dtype)
        return x

    def attempt_step(t, y, h, f0, J, K0):
        """One Radau step of size h from (t, y). Returns
        (y1, err_norm, nfe, K)."""
        # modified-Newton matrix M = I - h (A (x) J), factored once
        M = eye_sn - h * jnp.kron(A, J)
        fac = _factor(M)

        scale = atol + rtol * jnp.abs(y)

        def newton_body(state):
            K, it, dk_norm, done = state
            Kmat = K.reshape(s, n)
            Y = y[None, :] + h * (A @ Kmat)
            F = jax.vmap(lambda ci, yi: f_(t + ci * h, yi))(C, Y)
            R = K - F.reshape(-1)
            dK = _solve(fac, M, -R)
            K_new = K + dK
            dn = _norm(dK.reshape(s, n), scale[None, :] * jnp.sqrt(jnp.asarray(float(s))))
            dn = jnp.where(jnp.isfinite(dn), dn, jnp.inf)
            converged = dn < _NEWTON_TOL
            return K_new, it + 1, dn, converged

        def newton_cond(state):
            _, it, _, done = state
            return (~done) & (it < _NEWTON_ITERS)

        K, iters, dk_norm, converged = lax.while_loop(
            newton_cond,
            newton_body,
            (K0, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, dtype), jnp.asarray(False)),
        )
        Kmat = K.reshape(s, n)
        y1 = y + h * (B @ Kmat)

        # embedded error estimate, smoothed through (I - h*bhat0*J)
        err_raw = h * ((B - BHAT[1:]) @ Kmat - BHAT[0] * f0)
        M1 = eye_n - h * BHAT[0] * J
        fac1 = _factor(M1)
        err = _solve(fac1, M1, err_raw)
        scale2 = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
        err_norm = _norm(err, scale2)
        err_norm = jnp.where(jnp.isfinite(err_norm), err_norm, jnp.inf)
        err_norm = jnp.where(converged, err_norm, jnp.inf)
        n_newton_fev = iters * s
        return y1, err_norm, n_newton_fev, K

    def segment(carry, t_end):
        t, y, fval, h, err_prev, stats, Kp, hp, pv = carry

        def cond(state):
            t, *_, steps = state
            return (t < t_end) & (steps < max_steps)

        def body(state):
            t, y, fval, h, err_prev, stats, Kp, hp, pv, steps = state
            h_eff = jnp.minimum(h, t_end - t)
            J = jac(t, y)
            K0 = jnp.where(pv, predict_K(Kp, hp, h_eff), jnp.tile(fval, (s,)))
            y1, err_norm, nfe, K = attempt_step(t, y, h_eff, fval, J, K0)
            accept = err_norm <= 1.0

            # clamp before the pow: TPU-emulated f64 yields NaN for inf**-x,
            # which would poison the step size forever
            err_c = jnp.clip(err_norm, 1e-10, 1e10)
            # Gustafsson predictive (PI) controller: the pure I-controller
            # oscillates accept/reject on strongly nonnormal stiff systems
            # (measured ~56% rejection on the OC-particle models); blending
            # in the previous accepted error damps the oscillation
            # (Hairer-Wanner IV.8). Falls back to the I-controller until a
            # first error history exists.
            fac_i = _SAFETY * err_c**order_exp
            ep = jnp.clip(err_prev, 1e-10, 1e10)
            fac_pi = _SAFETY * err_c ** (0.6 * order_exp) * ep ** (-0.25 * order_exp)
            factor = jnp.where(err_prev > 0, jnp.minimum(fac_i, fac_pi), fac_i)
            factor = jnp.where(
                err_norm == 0.0, _MAX_FACTOR,
                jnp.clip(factor, _MIN_FACTOR, _MAX_FACTOR),
            )
            factor = jnp.where(accept, factor, jnp.minimum(1.0, factor))
            clamped = h_eff < h
            h_next = jnp.where(
                accept & clamped, jnp.maximum(h, h_eff * factor), h_eff * factor
            )

            t_new = jnp.where(accept, t + h_eff, t)
            f_new = jnp.where(accept, f_(t_new, y1), fval)
            y_new = jnp.where(accept, y1, y)
            err_prev_new = jnp.where(accept, err_c, err_prev)
            Kp_new = jnp.where(accept, K, Kp)
            hp_new = jnp.where(accept, h_eff, hp)
            pv_new = pv | accept
            new_stats = RadauStats(
                stats.n_fev + nfe + 1,
                stats.n_jev + 1,
                stats.n_lu + 1,
                stats.n_accepted + accept.astype(jnp.int32),
                stats.n_rejected + (~accept).astype(jnp.int32),
                stats.n_unreached,
            )
            return (t_new, y_new, f_new, h_next, err_prev_new, new_stats,
                    Kp_new, hp_new, pv_new, steps + 1)

        t, y, fval, h, err_prev, stats, Kp, hp, pv, _ = lax.while_loop(
            cond, body,
            (t, y, fval, h, err_prev, stats, Kp, hp, pv,
             jnp.asarray(0, jnp.int32)),
        )
        # a segment that exhausted max_steps leaves t short of t_end and its
        # output row holds a state at the wrong time -- count it as a failure
        eps_t = 8 * jnp.finfo(dtype).eps * jnp.maximum(jnp.abs(t_end), 1.0)
        unreached = (t < t_end - eps_t).astype(jnp.int32)
        stats = stats._replace(n_unreached=stats.n_unreached + unreached)
        return (t, y, fval, h, err_prev, stats, Kp, hp, pv), y

    f0 = f_(ts[0], y0)
    span = ts[-1] - ts[0]
    h0 = jnp.minimum(1e-3 * span, jnp.asarray(1e-4, dtype) * jnp.maximum(span, 1.0))
    zero = jnp.asarray(0, jnp.int32)
    stats0 = RadauStats(jnp.asarray(1, jnp.int32), zero, zero, zero, zero, zero)
    carry, ys = lax.scan(
        segment,
        (ts[0], y0, f0, h0, jnp.asarray(0.0, dtype), stats0,
         jnp.tile(f0, (s,)), jnp.asarray(1.0, dtype), jnp.asarray(False)),
        ts[1:],
    )
    ys = jnp.concatenate([y0[None], ys], axis=0)
    return ys, carry[5]
