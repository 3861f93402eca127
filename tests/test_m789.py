# M7/M8 (concentration-based steady) and M9 (dynamic + velocity march):
# RHS parity vs the reference equations.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import pb


def _conc_model_input(model, kmol=False):
    mi = make_model_input(model=model)
    if kmol:
        mi["feed"]["concentration"] = np.asarray(mi["feed"]["concentration"]) / 1e3
    mi["feed"]["mixture-viscosity"] = 2.51e-5
    return mi


def _fun_param(mi, extra_const=None):
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.rmtThermo import calStandardEnthalpyOfReaction
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
    import PyREMOT.core.constants as CONST

    comp_list = mi["feed"]["components"]["shell"]
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    const = {
        "CrSeAr": CONST.PI_CONST * mi["reactor"]["ReInDi"] ** 2 / 4,
        "MoWei": [it["MW"] for it in internal],
        "StHeRe25": np.array(list(map(calStandardEnthalpyOfReaction, reaction_list))),
        "GaMiVi": mi["feed"]["mixture-viscosity"],
    }
    if extra_const:
        const.update(extra_const)
    fun_param = {
        "compList": comp_list,
        "const": const,
        "ReSpec": mi["reactor"],
        "ExHe": mi["external-heat"],
        "reactionRateExpr": mi["reaction-rates"],
        "constBC1": {
            "VoFlRa0": mi["feed"]["volumetric-flowrate"],
            "SpCoi0": np.asarray(mi["feed"]["concentration"]),
            "SpCo0": float(np.sum(mi["feed"]["concentration"])),
            "P0": mi["operating-conditions"]["pressure"],
            "T0": mi["operating-conditions"]["temperature"],
        },
    }
    return sorted_, coeff, fun_param


@pytest.mark.reference
@pytest.mark.parametrize("which", ["M7", "M8"])
def test_m7_m8_rhs_matches_reference(which):
    from PyREMOT.docs.pbReactor import PackedBedReactorClass

    mi = _conc_model_input(which)
    spec = pb.build_spec(mi)
    p = pb.build_params(mi)
    sorted_, coeff, fun_param = _fun_param(mi)
    if which == "M7":
        rhs = pb.make_m3_rhs(spec)
        y0 = np.asarray(pb.m3_initial_state(spec, p))
        ref_fn = PackedBedReactorClass.modelEquationM3
    else:
        rhs = pb.make_m4_rhs(spec)
        y0 = np.asarray(pb.m4_initial_state(spec, p))
        ref_fn = PackedBedReactorClass.modelEquationM4

    rng = np.random.default_rng(21)
    for _ in range(4):
        y = y0 * rng.uniform(0.7, 1.3, y0.shape)
        ref = np.asarray(ref_fn(0.3, y, sorted_, coeff, fun_param))
        ours = np.asarray(rhs(0.3, jnp.asarray(y), p))
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-14)


@pytest.mark.reference
def test_m9_rhs_matches_reference():
    from PyREMOT.docs.pbReactor import PackedBedReactorClass

    mi = _conc_model_input("M9", kmol=True)
    z_no = 20
    spec = pb.build_spec(mi, z_no=z_no)
    p = pb.build_params(mi)
    rhs = pb.make_m9_rhs(spec)
    y0 = np.asarray(pb.m9_initial_state(spec, p))
    sorted_, coeff, fun_param = _fun_param(
        mi,
        extra_const={"zNo": z_no, "varNo": 7, "varNoT": 7 * z_no,
                     "reactionListNo": 3, "dz": mi["reactor"]["ReLe"] / (z_no - 1)},
    )
    rng = np.random.default_rng(41)
    for _ in range(3):
        y = y0 * rng.uniform(0.98, 1.02, y0.shape)
        ref = np.asarray(
            PackedBedReactorClass.modelEquationM5(0.1, y, sorted_, coeff, fun_param)
        )
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m9_colored_jacobian_variant_consistent():
    """The frozen-march Jacobian variant evaluates the same RHS values."""
    mi = _conc_model_input("M9", kmol=True)
    spec = pb.build_spec(mi, z_no=10)
    p = pb.build_params(mi)
    rhs = pb.make_m9_rhs(spec)
    rhs_f = pb.make_m9_rhs(spec, frozen_march_jac=True)
    y0 = pb.m9_initial_state(spec, p)
    a = np.asarray(rhs(0.1, y0, p))
    b = np.asarray(rhs_f(0.1, y0, p))
    np.testing.assert_allclose(a, b, rtol=1e-12)
