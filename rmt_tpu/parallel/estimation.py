# Adjoint-gradient parameter estimation of kinetic constants.
#
# BASELINE.json config #5: estimate kinetic/adsorption constants (K1-K3,
# KH2/KCO2/KCO) against measured axial profiles. The reference has no such
# capability (its kinetics are opaque python lambdas); here the DSL
# compiler exposes any DSL variable as a differentiable override
# (rmt_tpu/kinetics/dsl.py), and the fixed-step integrators (lax.scan) are
# reverse-mode differentiable, so a full ensemble loss gets exact adjoint
# gradients in one backward pass. For the adaptive implicit solvers
# (lax.while_loop, no reverse-mode), use forward-mode sensitivities via
# jax.jacfwd -- efficient for the handful of kinetic parameters.

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

from ..models import homo
from ..solvers import fixed
from ..solvers.implicit_diff import radau_fixed


def simulate_n2_fixed(spec: homo.HomoSpec, params, theta: Mapping[str, Any], n_steps: int = 200):
    """Differentiable N2 trajectory with kinetic overrides theta.

    Fixed-step RK4 under lax.scan (reverse-mode safe). Returns the final
    dimensionless state (varNo*zNo,).
    """
    p = dict(params)
    p["kinetic_overrides"] = {**params.get("kinetic_overrides", {}), **theta}
    d = homo.feed_state(spec, p)
    y0 = homo.n2_initial_state(spec, p, d)
    rhs = homo.make_n2_rhs(spec)
    ys = fixed.rk4(lambda t, y: rhs(t, y, p, d), 0.0, p["opT"], n_steps, y0)
    return ys[-1]


def simulate_n2_implicit(spec: homo.HomoSpec, params, theta: Mapping[str, Any],
                         n_steps: int = 64, rhs=None):
    """Differentiable N2 trajectory over the FULL operating period with
    kinetic overrides theta, on the L-stable fixed-step Radau with IFT
    stage solves (solvers/implicit_diff.py). Unlike simulate_n2_fixed,
    this handles the real stiffness: the 0.5 s DME period integrates at
    n_steps ~ 64 where explicit RK4 requires h ~ 1e-6 s for stability.
    Returns the final dimensionless state (varNo*zNo,).

    rhs: optionally a prebuilt make_n2_rhs(spec) closure. When this call
    runs inside a jit/vmap trace the closure MUST be built outside it
    (make_estimation_step does); a closure constructed mid-trace reaches
    the IFT custom_vjp's static spec and trips XLA constant lowering."""
    p = dict(params)
    p["kinetic_overrides"] = {**params.get("kinetic_overrides", {}), **theta}
    d = homo.feed_state(spec, p)
    y0 = homo.n2_initial_state(spec, p, d)
    if rhs is None:
        rhs = homo.make_n2_rhs(spec)
    return radau_fixed(
        lambda t, y, a: rhs(t, y, a[0], a[1]),
        y0, (0.0, p["opT"]), n_steps, args=(p, d),
    )


def outlet_mole_fractions(spec: homo.HomoSpec, y_final):
    """Outlet (z = L) mole fractions from the final dimensionless state."""
    Y = y_final.reshape(spec.var_no_n2, spec.z_no)
    conc = Y[: spec.n_comp, -1]
    return conc / jnp.sum(conc)


def make_estimation_step(
    spec: homo.HomoSpec,
    axes,
    target,                     # (B, n_comp) target outlet mole fractions
    param_names: Sequence[str] = ("K1", "K2", "K3"),
    n_steps: int = 200,
    lr: float = 1e-2,
    integrator: str = "rk4",    # "rk4" (short horizons) | "radau" (stiff)
):
    """Build a jitted SGD step over log-kinetic-constants.

    theta holds log-space parameters (kinetic constants are positive and
    span decades); the loss is the ensemble MSE of outlet mole fractions.
    integrator="radau" routes through the IFT-differentiable implicit
    solver and handles the full stiff operating period.
    Returns step(theta, params_batch) -> (theta_new, loss).
    """
    if integrator == "radau":
        # build the RHS closure once, OUTSIDE the jitted/vmapped traces
        rhs = homo.make_n2_rhs(spec)
        simulate = lambda sp, q, th, n: simulate_n2_implicit(
            sp, q, th, n, rhs=rhs
        )
    else:
        simulate = simulate_n2_fixed

    def member_loss(q, th, tgt):
        theta = {k: jnp.exp(th[k]) for k in param_names}
        yf = simulate(spec, q, theta, n_steps)
        mf = outlet_mole_fractions(spec, yf)
        return jnp.sum((mf - tgt) ** 2)

    def loss_fn(theta_log, params):
        losses = jax.vmap(member_loss, in_axes=(axes, None, 0))(
            params, theta_log, target
        )
        return jnp.mean(losses)

    @jax.jit
    def step(theta_log, params):
        loss, grads = jax.value_and_grad(loss_fn)(theta_log, params)
        theta_new = {k: theta_log[k] - lr * grads[k] for k in theta_log}
        return theta_new, loss

    return step
