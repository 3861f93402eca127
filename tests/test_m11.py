# M11: dynamic heterogeneous packed bed with the particle interior in the
# ODE state. Pointwise parity of the coupled RHS vs reference
# pbReactor.modelEquationM7, colored-vs-dense Jacobian equality, and an
# end-to-end rmtExe({"model": "M11"}) run.

import io
from contextlib import redirect_stdout

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import hetero_dyn
from rmt_tpu.ops import jacobian as jac_ops
from test_m13 import _m13_model_input, _reference_m13_args


def _m11_model_input():
    mi = _m13_model_input()
    mi["model"] = "M11"
    return mi


def _setup(z_no=10, r_no=7):
    mi = _m11_model_input()
    spec = hetero_dyn.m13_build_spec(mi, z_no=z_no, r_no=r_no)
    p = hetero_dyn.m13_params(mi)
    d = hetero_dyn.m13_feed(spec, p)
    return mi, spec, p, d


def _random_state(spec, p, rng, z_no):
    c_in = np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"])))
    c_gas = c_in[:, None, None] * rng.uniform(0.3, 1.1, (spec.n_comp, 1, z_no))
    c_sol = c_in[:, None, None] * rng.uniform(0.2, 1.0, (spec.n_comp, spec.r_no, z_no))
    t_all = rng.uniform(-0.02, 0.08, (1, spec.r_no + 1, z_no))
    return np.concatenate(
        [np.concatenate([c_gas, c_sol], axis=1), t_all], axis=0
    ).reshape(-1)


@pytest.mark.reference
def test_m11_rhs_matches_reference_pointwise():
    from PyREMOT.docs.pbReactor import PackedBedReactorClass

    z_no = 5
    mi, spec, p, d = _setup(z_no=z_no)
    # scaled_sources=False pins the reference's raw-source quirk
    # (pbReactor.py:5288,5468); the driver integrates the scaled form
    rhs = hetero_dyn.make_m11_rhs(spec, scaled_sources=False)
    sorted_, coeff, fun_param, dl_params = _reference_m13_args(mi, z_no, spec.r_no)
    params_set = (sorted_, coeff, fun_param, dl_params)

    rng = np.random.default_rng(3)
    for trial in range(2):
        y = _random_state(spec, p, rng, z_no)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                PackedBedReactorClass.modelEquationM7(0.1, y, params_set)
            )
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p, d))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m11_colored_jacobian_matches_dense():
    z_no = 5
    mi, spec, p, d = _setup(z_no=z_no)
    rhs = hetero_dyn.make_m11_rhs(spec)
    rng = np.random.default_rng(9)
    y = jnp.asarray(_random_state(spec, p, rng, z_no))

    dense = jax.jacfwd(lambda yy: rhs(0.0, yy, p, d))(y)
    coloring = jac_ops.two_phase_coloring(spec.n_layer, spec.r_no + 1, z_no)
    colored = jac_ops.colored_jacobian_from(
        lambda t, yy: rhs(t, yy, p, d), coloring
    )(0.0, y)
    np.testing.assert_allclose(
        np.asarray(colored), np.asarray(dense), rtol=1e-12, atol=1e-14
    )


def test_m11_api_end_to_end():
    from rmt_tpu.api import rmt

    # small grid: the e2e check exercises routing/integration/postprocessing,
    # not discretization fidelity (the parity tests pin the physics); the
    # reference-default zNo=10/rNo=7 state (560 unknowns -> 1680^2 stage LU
    # per Radau step) is minutes of CPU time
    mi = _m11_model_input()
    mi["operating-conditions"]["period"] = 5.0
    mi["solver-config"].update({"zNo": 6, "rNo": 4, "tNo": 5})
    res = rmt.rmtExe(mi)
    packs = res["resModel"]["dataPack"]
    assert len(packs) == 5
    for pack in packs:
        assert pack["successStatus"]
        assert np.all(np.isfinite(pack["dataYs"]))
    last = packs[-1]
    n_comp = len(mi["feed"]["components"]["shell"])
    mo_fri = last["dataYs"][:n_comp]
    np.testing.assert_allclose(np.sum(mo_fri, axis=0), 1.0, rtol=1e-6)
    # exothermic chemistry: the bed warms up and the catalyst interior
    # runs at least as hot as the local gas
    t_gas = last["dataYTemp"].ravel()
    t_sol = last["dataYTemps"]
    assert t_gas.max() > 0.0
    assert t_sol.max() >= t_gas.max() - 1e-6
