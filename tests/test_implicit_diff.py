# IFT-differentiable implicit Radau: accuracy vs the adaptive solver at
# the REAL stiff operating period, reverse-mode gradient check vs finite
# differences, and estimation-loss descent (BASELINE config #5 at
# realistic stiffness -- round 1 could only differentiate a 2e-5 s
# explicit horizon).

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import homo
from rmt_tpu.parallel import batch_params
from rmt_tpu.parallel.estimation import (
    make_estimation_step,
    outlet_mole_fractions,
    simulate_n2_implicit,
)
from rmt_tpu.solvers import radau
from rmt_tpu.solvers.implicit_diff import radau_fixed

PERIOD = 0.5
Z_NO = 10

RT = 8.314472 * 523.0
THETA_TRUE = {
    "K1": math.log(35.45 * math.exp(-1.7069e4 / RT)),
    "K2": math.log(7.3976 * math.exp(-2.0436e4 / RT)),
    "K3": math.log(8.2894e4 * math.exp(-5.2940e4 / RT)),
}


def _setup():
    mi = make_model_input(model="N2", op_period=PERIOD)
    spec = homo.build_spec(mi, z_no=Z_NO)
    p = homo.build_params(mi)
    return spec, p


def test_radau_fixed_matches_adaptive_at_full_period():
    spec, p = _setup()
    d = homo.feed_state(spec, p)
    y0 = homo.n2_initial_state(spec, p, d)
    rhs = homo.make_n2_rhs(spec)

    y_ref, stats = radau.odeint(
        lambda t, y: rhs(t, y, p, d), y0,
        jnp.asarray([0.0, PERIOD]), rtol=1e-9, atol=1e-12,
    )
    assert int(stats.n_unreached) == 0
    y_fix = radau_fixed(
        lambda t, y, a: rhs(t, y, a[0], a[1]), y0, (0.0, PERIOD), 96,
        args=(p, d),
    )
    err = np.abs(np.asarray(y_fix) - np.asarray(y_ref[-1]))
    scale = np.abs(np.asarray(y_ref[-1])) + 1e-8
    assert (err / scale).max() < 1e-4


def test_ift_gradient_matches_finite_differences():
    spec, p = _setup()

    def loss(theta_log):
        theta = {k: jnp.exp(v) for k, v in theta_log.items()}
        yf = simulate_n2_implicit(spec, p, theta, n_steps=24)
        mf = outlet_mole_fractions(spec, yf)
        # arbitrary smooth functional of the outlet composition
        w = jnp.arange(1.0, spec.n_comp + 1)
        return jnp.sum(w * mf)

    theta0 = {k: jnp.asarray(v) for k, v in THETA_TRUE.items()}
    val, grads = jax.value_and_grad(loss)(theta0)
    assert bool(jnp.isfinite(val))

    eps = 1e-4
    for k in THETA_TRUE:
        tp = dict(theta0)
        tm = dict(theta0)
        tp[k] = theta0[k] + eps
        tm[k] = theta0[k] - eps
        fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
        ad = float(grads[k])
        assert abs(ad - fd) <= 2e-4 * max(abs(fd), abs(ad), 1e-3), (
            f"{k}: adjoint {ad} vs FD {fd}"
        )


def test_estimation_descends_at_real_period():
    spec, p = _setup()
    B = 3
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-2.0, 2.0, B))}
    params, axes = batch_params(p, sweep)

    # synthesize targets from the true kinetics, then start from perturbed
    # constants and check the implicit-adjoint SGD reduces the loss
    theta_true = {k: jnp.asarray(v) for k, v in THETA_TRUE.items()}

    def member_outlet(q):
        yf = simulate_n2_implicit(
            spec, q, {k: jnp.exp(v) for k, v in theta_true.items()}, 24
        )
        return outlet_mole_fractions(spec, yf)

    target = jax.vmap(member_outlet, in_axes=(axes,))(params)

    step = make_estimation_step(
        spec, axes, target, n_steps=24, lr=0.5, integrator="radau"
    )
    theta = {k: v + 0.15 for k, v in theta_true.items()}
    dist0 = sum(float(abs(theta[k] - theta_true[k])) for k in theta)
    _, loss0 = step(theta, params)
    for _ in range(4):
        theta, loss = step(theta, params)
    assert float(loss) < float(loss0)
    assert all(bool(jnp.isfinite(v)) for v in theta.values())
    # recovery: the constants move toward the truth, not just downhill on
    # the loss surface
    dist = sum(float(abs(theta[k] - theta_true[k])) for k in theta)
    assert dist < dist0
