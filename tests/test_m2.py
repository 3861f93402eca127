# M2 dynamic packed-bed model: RHS parity + end-to-end structure.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import pb


def _m2_model_input():
    mi = make_model_input(model="M2")
    mi["feed"]["concentration"] = np.asarray(mi["feed"]["concentration"]) / 1e3
    mi["feed"]["mixture-viscosity"] = 2.51e-5
    return mi


@pytest.mark.reference
def test_m2_rhs_matches_reference_pointwise():
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.pbReactor import PackedBedReactorClass
    from PyREMOT.docs.rmtThermo import calStandardEnthalpyOfReaction
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
    import PyREMOT.core.constants as CONST

    mi = _m2_model_input()
    z_no = 20
    spec = pb.build_spec(mi, z_no=z_no)
    p = pb.build_params(mi)
    rhs = pb.make_m2_rhs(spec)
    y0 = np.asarray(pb.m2_initial_state(spec, p))

    comp_list = mi["feed"]["components"]["shell"]
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    fun_param = {
        "compList": comp_list,
        "const": {"CrSeAr": CONST.PI_CONST * mi["reactor"]["ReInDi"] ** 2 / 4,
                  "MoWei": [it["MW"] for it in internal],
                  "StHeRe25": np.array(list(map(calStandardEnthalpyOfReaction, reaction_list))),
                  "GaMiVi": mi["feed"]["mixture-viscosity"], "zNo": z_no,
                  "varNo": 7, "varNoT": 7 * z_no, "reactionListNo": 3,
                  "dz": mi["reactor"]["ReLe"] / (z_no - 1)},
        "ReSpec": mi["reactor"],
        "ExHe": mi["external-heat"],
        "reactionRateExpr": mi["reaction-rates"],
        "constBC1": {"VoFlRa0": mi["feed"]["volumetric-flowrate"],
                     "SpCoi0": np.asarray(mi["feed"]["concentration"]),
                     "SpCo0": float(np.sum(mi["feed"]["concentration"])),
                     "P0": mi["operating-conditions"]["pressure"],
                     "T0": mi["operating-conditions"]["temperature"]},
    }
    rng = np.random.default_rng(5)
    for _ in range(4):
        y = y0 * rng.uniform(0.7, 1.3, y0.shape)
        ref = np.asarray(
            PackedBedReactorClass.modelEquationM2(0.1, y, sorted_, coeff, fun_param)
        )
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m2_end_to_end_structure():
    from rmt_tpu import rmtExe

    mi = _m2_model_input()
    mi["solver-config"]["zNo"] = 20
    res = rmtExe(mi)["resModel"]
    assert len(res["dataPack"]) == 10
    dp = res["dataPack"][-1]
    assert dp["dataYCons"].shape == (6, 20)
    np.testing.assert_allclose(dp["dataYs"][:6].sum(axis=0), 1.0, rtol=1e-9)
    # temperature rose above feed (exothermic chemistry, mild cooling)
    assert float(dp["dataYTemp"][0, -1]) > 523.0


def test_m2_checkpoint_resume_matches_single_run():
    """M2 carries the same first-class checkpoint/resume contract as N2:
    two chained half-period runs land on the full-period state."""
    from rmt_tpu import rmtExe

    def mi_with(period):
        mi = _m2_model_input()
        mi["solver-config"]["zNo"] = 20
        mi["operating-conditions"]["period"] = period
        return mi

    full = rmtExe(mi_with(5.0))["resModel"]
    a = rmtExe(mi_with(2.5))["resModel"]
    ck = a["checkpoint"]
    assert ck["model"] == "M2" and abs(ck["t"] - 2.5) < 1e-12
    mi_b = mi_with(2.5)
    mi_b["resume-state"] = ck
    b = rmtExe(mi_b)["resModel"]
    assert abs(b["dataPack"][-1]["dataTime"] - 5.0) < 1e-9
    np.testing.assert_allclose(
        b["checkpoint"]["state"], full["checkpoint"]["state"],
        rtol=1e-5, atol=1e-8,
    )
