# Closing-the-loop accuracy tests: integrate the REFERENCE's own RHS
# (modelEquationN1/N2) with tight-tolerance scipy LSODA as the oracle and
# compare OUR solver on OUR RHS at tight tolerance. Unlike the default e2e
# tests (which compare against the reference's rtol=1e-3 LSODA defaults and
# therefore allow 5e-3), this pins the full pipeline -- RHS + integrator --
# to <=1e-6-scale relative state error with no loose-tolerance excuse.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import homo
from test_n1 import _reference_n1_params
from test_n2 import _reference_n2_params


@pytest.mark.reference
def test_n1_trajectory_vs_tight_reference():
    from scipy.integrate import solve_ivp

    from PyREMOT.docs.pbHomoReactor import PackedBedHomoReactorClass

    from rmt_tpu.solvers import radau

    mi = make_model_input(model="N1")
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs = homo.make_n1_rhs(spec)
    jrhs = jax.jit(lambda t, y: rhs(t, y, p, d))
    y0 = np.asarray(homo.n1_initial_state(spec, p, d))
    ts = np.linspace(0, 1, 21)

    params_set = _reference_n1_params(mi)
    ref = solve_ivp(
        PackedBedHomoReactorClass.modelEquationN1, [0, 1], y0,
        method="LSODA", t_eval=ts, rtol=1e-11, atol=1e-13,
        args=(params_set,),
    )
    assert ref.success

    ys, _ = radau.odeint(jrhs, jnp.asarray(y0), jnp.asarray(ts),
                         rtol=1e-9, atol=1e-12)
    rel = np.abs(np.asarray(ys).T - ref.y) / np.maximum(np.abs(ref.y), 1e-8)
    assert rel.max() <= 1e-6, rel.max()


@pytest.mark.reference
def test_n2_trajectory_vs_tight_reference():
    # short period: the reference RHS is a per-node Python loop, so a tight
    # LSODA run over the full 0.5 s would take minutes; the early transient
    # already exercises kinetics + stencil + P/v march + energy balance
    from scipy.integrate import solve_ivp

    from PyREMOT.docs.pbHomoReactor import PackedBedHomoReactorClass

    from rmt_tpu.solvers import radau

    period = 0.02
    mi = make_model_input(model="N2", op_period=period)
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs = homo.make_n2_rhs(spec)
    jrhs = jax.jit(lambda t, y: rhs(t, y, p, d))
    y0 = np.asarray(homo.n2_initial_state(spec, p, d))
    ts = np.linspace(0, period, 5)

    params_set = _reference_n2_params(mi)
    ref = solve_ivp(
        PackedBedHomoReactorClass.modelEquationN2, [0, period], y0,
        method="LSODA", t_eval=ts, rtol=1e-10, atol=1e-12,
        args=(params_set,),
    )
    assert ref.success

    ys, _ = radau.odeint(jrhs, jnp.asarray(y0), jnp.asarray(ts),
                         rtol=1e-9, atol=1e-12)
    rel = np.abs(np.asarray(ys).T - ref.y) / np.maximum(np.abs(ref.y), 1e-6)
    assert rel.max() <= 2e-6, rel.max()
