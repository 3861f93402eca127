# Reverse-differentiable implicit integration: fixed-step Radau IIA whose
# stage solves carry an implicit-function-theorem custom_vjp.
#
# The adaptive solvers (radau.odeint, the lockstep ensemble engine) live
# under lax.while_loop and cannot be reverse-differentiated; round 1's
# estimation path therefore fell back to explicit RK4, which the DME
# chemistry's stiffness limits to ~1e-5 s horizons -- far short of the
# 0.5 s operating period of the flagship dynamic config. Here each Radau
# step solves the stage system g(K) = K - F(y0 + h A K) = 0 with a damped
# Newton iteration wrapped in jax.custom_vjp: the backward pass solves
# (dg/dK)^T w = Kbar once and pulls gradients back through a single vjp of
# g -- the textbook IFT adjoint, so the cost of the backward sweep is one
# linear solve per step regardless of Newton iteration count, and the
# whole scan of steps reverse-differentiates exactly.
#
# The custom_vjp function is a MODULE-LEVEL singleton taking a hashable
# static spec (f, s, n, tableau): defining a fresh custom_vjp object
# inside a traced function breaks jit-of-grad ("No constant handler for
# DynamicJaxprTracer" at pjit linearization).
#
# No reference counterpart (the reference has no sensitivity machinery at
# all); this backs BASELINE config #5 at realistic stiffness.

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .radau import radau_tableau

_NEWTON_ITERS = 8
_MAX_ROUNDS = 4


class _StageSpec(NamedTuple):
    """Hashable static description of one Radau stage system."""
    f: Callable[..., Any]
    s: int
    n: int
    A: tuple                     # (s, s) tableau rows as nested tuples
    C: tuple                     # (s,) nodes


def _resid(spec: _StageSpec, K, y0, t, h, args):
    A_j = jnp.asarray(spec.A, K.dtype)
    C_j = jnp.asarray(spec.C, K.dtype)
    Kmat = K.reshape(spec.s, spec.n)
    Y = y0[None, :] + h * (A_j @ Kmat)
    F = jax.vmap(lambda ci, yi: spec.f(t + ci * h, yi, args))(C_j, Y)
    return K - F.reshape(-1)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stage_solve(spec: _StageSpec, K0, y0, t, h, args):
    """Solve g(K) = 0 by damped Newton with periodic re-factorization:
    the cold constant-stage guess can sit far outside the Newton basin on
    violent transients (a frozen-Jacobian iteration then stalls or
    diverges), so run rounds of [factor dg/dK at current K -> damped
    iterations] until the residual reaches roundoff."""
    # fixed round count (fori, not while): converged rounds cost little
    # (dK at roundoff), and a while_loop here trips XLA lowering of the
    # custom-vjp call under jit-of-grad
    def round_(i, K):
        J = jax.jacfwd(_resid, argnums=1)(spec, K, y0, t, h, args)
        fac = jax.scipy.linalg.lu_factor(J)

        def body(j, Kr):
            K_, _ = Kr
            r = _resid(spec, K_, y0, t, h, args)
            rn_ = jnp.linalg.norm(r)
            dK = -jax.scipy.linalg.lu_solve(fac, r)

            def trial(alpha):
                nrm = jnp.linalg.norm(
                    _resid(spec, K_ + alpha * dK, y0, t, h, args)
                )
                return jnp.where(jnp.isfinite(nrm), nrm, jnp.inf)

            n1, n2, n3 = trial(1.0), trial(0.5), trial(0.125)
            alpha = jnp.where(n1 <= rn_, 1.0, jnp.where(n2 <= rn_, 0.5, 0.125))
            n_new = jnp.where(n1 <= rn_, n1, jnp.where(n2 <= rn_, n2, n3))
            return K_ + alpha * dK, n_new

        K_new, _ = lax.fori_loop(
            0, _NEWTON_ITERS, body, (K, jnp.asarray(jnp.inf, K.dtype))
        )
        return K_new

    return lax.fori_loop(0, _MAX_ROUNDS, round_, K0)


def _stage_solve_fwd(spec, K0, y0, t, h, args):
    K = _stage_solve(spec, K0, y0, t, h, args)
    return K, (K, y0, t, h, args)


def _stage_solve_bwd(spec, res, Kbar):
    K, y0, t, h, args = res
    # adjoint linear solve (dg/dK)^T w = Kbar at the CONVERGED K
    J = jax.jacfwd(_resid, argnums=1)(spec, K, y0, t, h, args)
    w = jax.scipy.linalg.lu_solve(jax.scipy.linalg.lu_factor(J.T), Kbar)
    _, vjp_fn = jax.vjp(
        lambda y0_, t_, h_, args_: _resid(spec, K, y0_, t_, h_, args_),
        y0, t, h, args,
    )
    gy0, gt, gh, gargs = vjp_fn(-w)
    return jnp.zeros_like(K), gy0, gt, gh, gargs


_stage_solve.defvjp(_stage_solve_fwd, _stage_solve_bwd)


def radau_fixed(f, y0, t_span, n_steps: int, args=None, s: int = 3):
    """Fixed-step Radau IIA(2s-1) over t_span = (t0, t1), reverse-mode
    differentiable in y0 and args via IFT stage solves.

    f(t, y, args) -> dy/dt with args an arbitrary pytree. Returns y(t1).
    L-stable, so step count buys accuracy, not stability -- the stiff DME
    transients integrate at any n_steps without blowup. Not jitted here;
    jit at the call site."""
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    n = y0.shape[0]
    c_np, A_np, b_np, _ = radau_tableau(s)
    B_j = jnp.asarray(b_np, dtype)
    spec = _StageSpec(
        f, s, n,
        tuple(tuple(row) for row in A_np.tolist()),
        tuple(c_np.tolist()),
    )

    t0 = jnp.asarray(t_span[0], dtype)
    t1 = jnp.asarray(t_span[1], dtype)

    # geometric warm-up ramp into uniform steps: dynamic models start from
    # clean initial states whose first instants are violently fast (rates
    # at the 1e-6 seed); tiny leading steps keep the cold Newton guess
    # inside its basin, exactly as an adaptive controller would
    n_ramp = min(12, n_steps // 2)
    raw = np.ones(n_steps)
    if n_ramp > 0:
        raw[:n_ramp] = np.geomspace(1e-6, 1.0, n_ramp)
    fracs = jnp.asarray(raw / raw.sum(), dtype)
    hs = fracs * (t1 - t0)
    t_starts = t0 + jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.cumsum(hs)[:-1]]
    )

    def step(y, th):
        t, h = th
        f0 = f(t, y, args)
        K0 = jnp.tile(f0, (s,))
        K = _stage_solve(spec, K0, y, t, h, args)
        y1 = y + h * (B_j @ K.reshape(s, n))
        return y1, None

    yT, _ = lax.scan(step, y0, (t_starts, hs))
    return yT
