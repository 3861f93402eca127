# Adaptive Dormand-Prince 5(4) integrator, fully jittable.
#
# Replaces scipy.integrate.solve_ivp(method="RK45"/"LSODA" non-stiff mode)
# in the reference's run methods (e.g. PyREMOT/docs/pbHomoReactor.py:2918-2932,
# 3609-3610). Design: a lax.scan over the requested output times with an
# adaptive lax.while_loop integrating each segment, so a whole trajectory --
# including error control -- is one XLA computation that can be vmapped over
# ensemble members and differentiated.

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# Dormand-Prince 5(4) tableau
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
]
_B = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B_ERR = _B - jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER_EXP = -1.0 / 5.0


class Dopri5Stats(NamedTuple):
    n_fev: jnp.ndarray          # RHS evaluations
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    n_unreached: jnp.ndarray    # output times NOT reached within max_steps


def _error_norm(err, y0, y1, rtol, atol):
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return jnp.sqrt(jnp.mean((err / scale) ** 2))


def _initial_step(f, t0, y0, f0, rtol, atol, direction):
    """Hairer/Norsett/Wanner initial step size heuristic."""
    scale = atol + jnp.abs(y0) * rtol
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * direction * f0
    f1 = f(t0 + h0 * direction, y1)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2)) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(dmax <= 1e-15, jnp.maximum(1e-6, h0 * 1e-3), (0.01 / dmax) ** 0.2)
    return jnp.minimum(100 * h0, h1)


def _step(f, t, y, f0, h):
    """One Dopri5 step (FSAL). Returns y1, f1(=k7), err_vec."""
    k = [f0]
    for i in range(1, 7):
        yi = y + h * sum(a * kj for a, kj in zip(_A[i], k))
        k.append(f(t + _C[i] * h, yi))
    y1 = y + h * sum(b * kj for b, kj in zip(_A[6], k[:6]))
    # note: row 6 of A equals b, so k[6] = f(t+h, y1) is the FSAL eval
    err = h * sum(be * kj for be, kj in zip(_B_ERR, k))
    return y1, k[6], err


@partial(jax.jit, static_argnums=(0, 5))
def odeint(f, y0, ts, rtol=1e-7, atol=1e-9, max_steps: int = 100_000, args=None):
    """Integrate dy/dt = f(t, y, *args) from ts[0], returning y at each ts.

    ts must be increasing. Returns (ys, stats): ys[0] == y0,
    ys.shape == (len(ts),) + y0.shape.
    """
    if args is not None:
        f_ = lambda t, y: f(t, y, *args)
    else:
        f_ = f

    y0 = jnp.asarray(y0)
    ts = jnp.asarray(ts)
    dtype = y0.dtype
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)

    f0 = f_(ts[0], y0)
    h0 = _initial_step(f_, ts[0], y0, f0, rtol, atol, jnp.asarray(1.0, dtype))

    def segment(carry, t_end):
        t, y, fval, h, nfev, nacc, nrej, nunr = carry

        def cond(state):
            t, *_, steps = state
            return (t < t_end) & (steps < max_steps)

        def body(state):
            t, y, fval, h, nfev, nacc, nrej, steps = state
            h_eff = jnp.minimum(h, t_end - t)
            y1, f1, err = _step(f_, t, y, fval, h_eff)
            err_norm = _error_norm(err, y, y1, rtol, atol)
            # NaN/Inf in the step (e.g. an over-long step driving the state
            # out of the kinetics domain) counts as a maximal error
            err_norm = jnp.where(jnp.isfinite(err_norm), err_norm, jnp.inf)
            accept = err_norm <= 1.0

            # clamp before the pow: TPU-emulated f64 yields NaN for inf**-x,
            # which would poison the step size forever
            err_c = jnp.clip(err_norm, 1e-10, 1e10)
            factor = jnp.where(
                err_norm == 0.0,
                _MAX_FACTOR,
                jnp.clip(_SAFETY * err_c**_ORDER_EXP, _MIN_FACTOR, _MAX_FACTOR),
            )
            factor = jnp.where(accept, factor, jnp.minimum(1.0, factor))
            # don't let clamping a step to the output boundary shrink the
            # controller's step size estimate on an accepted step
            clamped = h_eff < h
            h_next = jnp.where(accept & clamped, jnp.maximum(h, h_eff * factor), h_eff * factor)

            t_new = jnp.where(accept, t + h_eff, t)
            y_new = jnp.where(accept, y1, y)
            f_new = jnp.where(accept, f1, fval)
            return (
                t_new,
                y_new,
                f_new,
                h_next,
                nfev + 6,
                nacc + accept.astype(jnp.int32),
                nrej + (~accept).astype(jnp.int32),
                steps + 1,
            )

        t, y, fval, h, nfev, nacc, nrej, _ = lax.while_loop(
            cond, body, (t, y, fval, h, nfev, nacc, nrej, jnp.asarray(0, jnp.int32))
        )
        eps_t = 8 * jnp.finfo(dtype).eps * jnp.maximum(jnp.abs(t_end), 1.0)
        nunr = nunr + (t < t_end - eps_t).astype(jnp.int32)
        return (t, y, fval, h, nfev, nacc, nrej, nunr), y

    init = (
        ts[0],
        y0,
        f0,
        h0,
        jnp.asarray(2, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    carry, ys = lax.scan(segment, init, ts[1:])
    ys = jnp.concatenate([y0[None], ys], axis=0)
    stats = Dopri5Stats(carry[4], carry[5], carry[6], carry[7])
    return ys, stats
