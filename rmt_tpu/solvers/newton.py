# Damped Newton root solver with autodiff Jacobians, fully jittable.
#
# Replaces scipy.optimize.fsolve/root/least_squares in the reference's
# steady-state models (particle T2, hetero M9/M14 ramped continuation --
# reference call sites: PyREMOT/docs/pbReactor.py:7615-7640,
# examples/particleModels.py:1554-1580, docs/pbHeterReactor.py:1032-1065).
# Armijo backtracking on the residual 2-norm; the linear solve factorizes
# in float32 with one working-dtype refinement pass (TPU has no f64 LU).

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    residual_norm: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


@partial(jax.jit, static_argnums=(0, 3, 4))
def root(f, x0, args=None, max_iter: int = 50, n_backtrack: int = 8,
         tol=1e-10, damping_init=1.0):
    """Solve f(x, *args) = 0 from x0 by damped Newton.

    Convergence: ||f||_2 / sqrt(n) < tol * (1 + ||x||_inf).
    """
    if args is not None:
        f_ = lambda x: f(x, *args)
    else:
        f_ = f

    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    dtype = x0.dtype
    tol = jnp.asarray(tol, dtype)
    jac = jax.jacfwd(f_)
    f32 = jnp.float32
    use_mixed = dtype == jnp.float64 and jax.default_backend() == "tpu"

    def lin_solve(J, b):
        if use_mixed:
            fac = jax.scipy.linalg.lu_factor(J.astype(f32))
            x = jax.scipy.linalg.lu_solve(fac, b.astype(f32)).astype(dtype)
            r = b - J @ x
            return x + jax.scipy.linalg.lu_solve(fac, r.astype(f32)).astype(dtype)
        return jnp.linalg.solve(J, b)

    def norm(v):
        return jnp.sqrt(jnp.mean(v**2))

    def cond(state):
        x, fx, fn, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        x, fx, fn, it, _ = state
        J = jac(x)
        dx = lin_solve(J, -fx)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        def bt_body(carry, _):
            lam, best_x, best_fx, best_fn, found = carry
            x_try = x + lam * dx
            f_try = f_(x_try)
            fn_try = norm(f_try)
            ok = jnp.isfinite(fn_try) & (fn_try < fn * (1 - 0.25 * lam)) & (~found)
            best_x = jnp.where(ok, x_try, best_x)
            best_fx = jnp.where(ok, f_try, best_fx)
            best_fn = jnp.where(ok, fn_try, best_fn)
            return (lam * 0.5, best_x, best_fx, best_fn, found | ok), None

        (_, x_new, fx_new, fn_new, found), _ = lax.scan(
            bt_body,
            (jnp.asarray(damping_init, dtype), x, fx, fn, jnp.asarray(False)),
            None,
            length=n_backtrack,
        )
        # if no damping works, take the full step anyway (may escape plateaus)
        x_new = jnp.where(found, x_new, x + dx)
        fx_new = jnp.where(found, fx_new, f_(x + dx))
        fn_new = jnp.where(found, fn_new, norm(fx_new))

        done = fn_new < tol * (1 + jnp.max(jnp.abs(x_new)))
        return (x_new, fx_new, fn_new, it + 1, done)

    fx0 = f_(x0)
    state0 = (x0, fx0, norm(fx0), jnp.asarray(0, jnp.int32),
              jnp.asarray(False))
    x, fx, fn, it, done = lax.while_loop(cond, body, state0)
    return NewtonResult(x, fn, it, done)
