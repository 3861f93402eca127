# M0/M4 plug-flow and M1 packed-bed (flow-variable) model parity.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import feed_mole_fraction, make_model_input
from rmt_tpu.models import pb, pf


def _flow_model_input(model):
    mi = make_model_input(model=model)
    mi["feed"]["mole-fraction"] = np.asarray(feed_mole_fraction(), dtype=np.float64)
    mi["feed"]["molar-flowrate"] = 0.26
    mi["feed"]["mixture-viscosity"] = 2.51e-5
    return mi


@pytest.mark.reference
def test_m1_rhs_matches_reference_pointwise():
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.pbReactor import PackedBedReactorClass
    from PyREMOT.docs.rmtThermo import calStandardEnthalpyOfReaction
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
    import PyREMOT.core.constants as CONST

    mi = _flow_model_input("M1")
    spec = pb.build_spec(mi)
    p = pb.build_params(mi)
    rhs = pb.make_m1_rhs(spec)
    y0 = np.asarray(pb.m1_initial_state(spec, p))

    comp_list = mi["feed"]["components"]["shell"]
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    fun_param = {
        "compList": comp_list,
        "const": {
            "CrSeAr": CONST.PI_CONST * mi["reactor"]["ReInDi"] ** 2 / 4,
            "MoWei": [it["MW"] for it in internal],
            "StHeRe25": np.array(list(map(calStandardEnthalpyOfReaction, reaction_list))),
            "GaMiVi": mi["feed"]["mixture-viscosity"],
        },
        "ReSpec": mi["reactor"],
        "ExHe": {"OvHeTrCo": mi["external-heat"]["OvHeTrCo"],
                 "EfHeTrAr": 4 / mi["reactor"]["ReInDi"],
                 "MeTe": mi["external-heat"]["MeTe"]},
        "reactionRateExpr": mi["reaction-rates"],
    }
    rng = np.random.default_rng(7)
    for _ in range(5):
        y = y0 * rng.uniform(0.7, 1.3, y0.shape)
        ref = np.asarray(
            PackedBedReactorClass.modelEquationM1(0.3, y, sorted_, coeff, fun_param)
        )
        ours = np.asarray(rhs(0.3, jnp.asarray(y), p))
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-14)


@pytest.mark.reference
def test_m1_end_to_end_vs_reference():
    import PyREMOT.docs.pbReactor as pbr

    pbr.pltc.plots2DSub = staticmethod(lambda *a, **k: None)
    from PyREMOT import rmtExe as ref_rmt_exe

    from rmt_tpu import rmtExe

    ours = np.asarray(rmtExe(_flow_model_input("M1"))["resModel"]["dataYs"])
    ref = np.asarray(ref_rmt_exe(_flow_model_input("M1"))["resModel"]["dataYs"])
    assert ours.shape == ref.shape
    # mole fractions within the reference's default-tolerance error
    assert np.max(np.abs(ours[:6] - ref[:6])) < 1e-3
    # temperature row
    assert np.max(np.abs(ours[6] - ref[6]) / ref[6]) < 1e-3


@pytest.mark.reference
def test_m0_rhs_matches_reference_intended_equations():
    """The reference pfReactor RHS crashes inside rmtExe (missing FunParam
    keys, pfReactor.py:262-264); validate against it called directly with
    the keys supplied."""
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.pfReactor import PlugFlowReactorClass
    from PyREMOT.docs.rmtThermo import calStandardEnthalpyOfReaction
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
    import PyREMOT.core.constants as CONST

    mi = _flow_model_input("M0")
    spec = pf.build_spec(mi)
    p = pf.build_params(mi)
    rhs = pf.make_rhs(spec)
    y0 = np.asarray(pf.initial_state(spec, p))

    comp_list = mi["feed"]["components"]["shell"]
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    fun_param = {
        "compList": comp_list,
        "const": {
            "CrSeAr": CONST.PI_CONST * mi["reactor"]["ReInDi"] ** 2 / 4,
            "MoWei": [it["MW"] for it in internal],
            "StHeRe25": np.array(list(map(calStandardEnthalpyOfReaction, reaction_list))),
            "GaMiVi": mi["feed"]["mixture-viscosity"],
            # keys the reference RHS needs but runM1 never provides:
            "reactionListNo": len(reaction_list),
            "dz": 0.01,
        },
        "ReSpec": mi["reactor"],
        "ExHe": {"OvHeTrCo": mi["external-heat"]["OvHeTrCo"],
                 "EfHeTrAr": 4 / mi["reactor"]["ReInDi"],
                 "MeTe": mi["external-heat"]["MeTe"]},
        "reactionRateExpr": mi["reaction-rates"],
        "constBC1": {"MoFri0": mi["feed"]["mole-fraction"],
                     "MoFlRa0": mi["feed"]["molar-flowrate"],
                     "P0": mi["operating-conditions"]["pressure"],
                     "T0": mi["operating-conditions"]["temperature"]},
    }
    params_set = (sorted_, coeff, fun_param)
    rng = np.random.default_rng(11)
    for _ in range(5):
        y = y0 * rng.uniform(0.7, 1.3, y0.shape)
        ref = np.asarray(PlugFlowReactorClass.modelEquationM1(0.3, y, params_set))
        ours = np.asarray(rhs(0.3, jnp.asarray(y), p))
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-14)


def test_m0_runs_end_to_end():
    from rmt_tpu import rmtExe

    res = rmtExe(_flow_model_input("M0"))["resModel"]
    assert [d["leg"] for d in res["dataList"]][-1] == "Temperature"
    T_out = res["dataList"][-1]["y"][-1]
    assert 500 < float(T_out) < 800
