# Fixed-step explicit integrators under lax.scan.
#
# Parity ports of the reference's hand-rolled steppers
# (reference: PyREMOT/solvers/odeSolver.py:17-102): classic RK4,
# Adams-Bashforth 3, and the AB3/AM4 predictor-corrector "PreCorr3"
# (selected by solver-config ivp == "AM"). The python time loops become a
# single lax.scan so the whole trajectory is one XLA computation; histories
# for the multistep methods ride in the scan carry.

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _ts(t0, tn, n):
    return jnp.linspace(t0, tn, n + 1)


def rk4(f, t0, tn, n: int, y0, args=()):
    """Classic RK4; returns ys with shape (n+1,) + y0.shape."""
    h = jnp.abs(tn - t0) / n
    ts = _ts(t0, tn, n)

    def step(y, t):
        k1 = f(t, y, *args)
        k2 = f(t + h / 2, y + k1 * (h / 2), *args)
        k3 = f(t + h / 2, y + k2 * (h / 2), *args)
        k4 = f(t + h, y + k3 * h, *args)
        y1 = y + h * (k1 + 2 * k2 + 2 * k3 + k4) / 6
        return y1, y1

    _, ys = lax.scan(step, y0, ts[:-1])
    return jnp.concatenate([y0[None], ys], axis=0)


def adams_bashforth3(f, t0, tn, n: int, y0, args=()):
    """AB3 with an RK4 bootstrap for the first two steps
    (matches reference AdBash3, odeSolver.py:43-68)."""
    h = jnp.abs(tn - t0) / n
    ts = _ts(t0, tn, n)
    boot = rk4(f, t0, t0 + 2 * h, 2, y0, args)  # ys[0..2]

    k2 = f(ts[0], boot[0], *args)
    k1 = f(ts[1], boot[1], *args)

    def step(carry, t):
        y, k1, k2 = carry
        k3 = k2
        k2n = k1
        k1n = f(t, y, *args)
        y1 = y + h * (23 * k1n - 16 * k2n + 5 * k3) / 12
        return (y1, k1n, k2n), y1

    _, ys = lax.scan(step, (boot[2], k1, k2), ts[2:-1])
    return jnp.concatenate([boot[:3], ys], axis=0)


def precorr3(f, t0, tn, n: int, y0, args=()):
    """AB3 predictor / AM4 corrector (reference PreCorr3, odeSolver.py:71-102)."""
    h = jnp.abs(tn - t0) / n
    ts = _ts(t0, tn, n)
    boot = rk4(f, t0, t0 + 2 * h, 2, y0, args)

    k2 = f(ts[0], boot[0], *args)
    k1 = f(ts[1], boot[1], *args)

    def step(carry, tpair):
        t, t_next = tpair
        y, k1, k2 = carry
        k3 = k2
        k2n = k1
        k1n = f(t, y, *args)
        y_pred = y + h * (23 * k1n - 16 * k2n + 5 * k3) / 12
        k0 = f(t_next, y_pred, *args)
        y1 = y + h * (9 * k0 + 19 * k1n - 5 * k2n + k3) / 24
        return (y1, k1n, k2n), y1

    tpairs = (ts[2:-1], ts[3:])
    _, ys = lax.scan(step, (boot[2], k1, k2), tpairs)
    return jnp.concatenate([boot[:3], ys], axis=0)
