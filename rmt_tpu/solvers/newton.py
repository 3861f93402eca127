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


def _default_batched_jac(f, Bsz, n):
    """Dense (B, n, n) Jacobian of a batched residual of INDEPENDENT
    members, from n JVP columns broadcast across the batch."""

    def jac(x):
        eye = jnp.eye(n, dtype=x.dtype)
        cols = jax.vmap(
            lambda col: jax.jvp(
                f, (x,), (jnp.tile(col[None], (Bsz, 1)),)
            )[1]
        )(eye)                          # (n_in, B, n_out)
        return jnp.moveaxis(cols, 0, -1)

    return jac


def _make_batched_lin_solve(block, Bsz, n):
    """Batched linear solve A x = b, A (B, n, n), b (B, n).

    block=(m, z[, "tridiag"]): A is block bidiagonal/tridiagonal with
    (m x m) node blocks in the flat layout v*z + node (ops.jacobian
    conventions) -> exact structured elimination via ops.block_solve
    (batched small-block work; lax.linalg LU lowers to sequential scalar
    loops on TPU). None -> batched dense solve.
    """
    if block is not None:
        from ..ops import block_solve as _bs

        m_b, z_b = block[0], block[1]
        tridiag = len(block) > 2 and block[2] == "tridiag"
        if m_b * z_b != n:
            raise ValueError(f"block {block} does not tile state size {n}")

        def lin_solve(J, b):
            rb = b.reshape(Bsz, m_b, z_b).transpose(0, 2, 1)
            if tridiag:
                Jd, Jl, Ju = _bs.extract_tridiag_blocks(J, m_b, z_b)
                fac = _bs.tridiag_factor(Jd, Jl, Ju)
                xb = _bs.tridiag_solve(fac, rb)
            else:
                Jd, Jl = _bs.extract_bidiag_blocks(J, m_b, z_b)
                Minv = _bs.batched_inv(Jd.reshape(-1, m_b, m_b)).reshape(
                    Bsz, z_b, m_b, m_b
                )
                C = -jnp.einsum(
                    "bzij,bzjk->bzik", Minv, Jl,
                    precision=lax.Precision.HIGHEST,
                )
                xb = _bs.solve_bidiag(Minv, C, rb)
            return xb.transpose(0, 2, 1).reshape(Bsz, n)

        return lin_solve

    def lin_solve(J, b):
        return jnp.linalg.solve(J, b[..., None])[..., 0]

    return lin_solve


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 7))
def root_batched(f, x0, max_iter: int = 30, n_backtrack: int = 6,
                 jac=None, tol=1e-10, damping_init=1.0, block=None):
    """Damped Newton on a BATCH of independent systems, lockstep.

    The TPU-native twin of root(): a fixed iteration budget under
    lax.scan with per-member masking instead of a while_loop (on the
    tunneled TPU runtime a while_loop iteration costs ~1s of apparent
    host sync vs ~10ms for the identical scan body), and exact
    block-structured linear solves instead of per-member dense LU
    (lax.linalg LU lowers to sequential scalar loops on TPU).

    f: batched residual f(x (B, n)) -> (B, n) (close per-member
    parameters over it); members must be independent.
    jac: optional batched Jacobian jac(x) -> (B, n, n); default builds
    it from n JVP columns of the batched f (exact, since members are
    independent).
    block=(m, z[, "tridiag"]): the per-member Jacobian is block
    bidiagonal/tridiagonal with (m x m) node blocks (flat index
    v*z + node, ops.jacobian conventions); Newton steps then solve
    exactly via ops.block_solve. None -> batched dense solve.

    Convergence per member: ||f||_rms < tol * (1 + ||x||_inf).
    Returns NewtonResult of batched fields ((B, n), (B,), (B,), (B,)).
    """
    x0 = jnp.asarray(x0)
    Bsz, n = x0.shape
    dtype = x0.dtype
    tol = jnp.asarray(tol, dtype)

    if jac is None:
        jac = _default_batched_jac(f, Bsz, n)
    lin_solve = _make_batched_lin_solve(block, Bsz, n)

    def norm(v):
        return jnp.sqrt(jnp.mean(v**2, axis=-1))

    def body(state, _):
        x, fx, fn, it, done = state
        J = jac(x)
        dx = lin_solve(J, -fx)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        def bt_body(carry, _):
            lam, best_x, best_fx, best_fn, found = carry
            x_try = x + lam[:, None] * dx
            f_try = f(x_try)
            fn_try = norm(f_try)
            ok = (
                jnp.isfinite(fn_try)
                & (fn_try < fn * (1 - 0.25 * lam))
                & (~found)
            )
            best_x = jnp.where(ok[:, None], x_try, best_x)
            best_fx = jnp.where(ok[:, None], f_try, best_fx)
            best_fn = jnp.where(ok, fn_try, best_fn)
            return (lam * 0.5, best_x, best_fx, best_fn, found | ok), None

        lam0 = jnp.full((Bsz,), damping_init, dtype)
        (_, x_new, fx_new, fn_new, found), _ = lax.scan(
            bt_body, (lam0, x, fx, fn, jnp.zeros(Bsz, bool)),
            None, length=n_backtrack,
        )
        # if no damping works, take the full step anyway (plateau escape)
        x_full = x + dx
        f_full = f(x_full)
        x_new = jnp.where(found[:, None], x_new, x_full)
        fx_new = jnp.where(found[:, None], fx_new, f_full)
        fn_new = jnp.where(found, fn_new, norm(f_full))

        conv = fn_new < tol * (1 + jnp.max(jnp.abs(x_new), axis=-1))
        # frozen members keep their state (their residual is not re-evaluated)
        x_keep = jnp.where(done[:, None], x, x_new)
        fx_keep = jnp.where(done[:, None], fx, fx_new)
        fn_keep = jnp.where(done, fn, fn_new)
        it_keep = jnp.where(done, it, it + 1)
        return (x_keep, fx_keep, fn_keep, it_keep, done | conv), None

    fx0 = f(x0)
    fn0 = norm(fx0)
    done0 = fn0 < tol * (1 + jnp.max(jnp.abs(x0), axis=-1))
    state0 = (x0, fx0, fn0, jnp.zeros(Bsz, jnp.int32), done0)
    (x, fx, fn, it, done), _ = lax.scan(
        body, state0, None, length=max_iter
    )
    return NewtonResult(x, fn, it, done)


# NOTE: a batched SER pseudo-transient-continuation solver (implicit-
# Euler steps (I - dt*J) dx = dt*f with switched-evolution-relaxation dt
# control) was prototyped here as the globalization for the M13 particle
# BVPs and REMOVED: on the LHHW particle residual the pseudo-flow is a
# narrow curved valley -- implicit Euler rejects any dt > ~1e-7 from the
# hard states (measured: 80 iterations cover tau ~ 3e-6 with the
# residual oscillating), while the problem's natural globalization is
# continuation in the gas-bulk parameters (see the bulk-homotopy rescue
# in parallel.ensemble._run_m13_sweep_lockstep).
