# N1 steady-state model: RHS parity vs the reference equations (machine
# precision) and converged-solution accuracy (<=1e-6 relative state error).

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import homo


def _reference_n1_params(mi):
    """Build the reference's paramsSet exactly as runN1 does
    (pbHomoReactor.py:2744-2921)."""
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.gasTransPor import calGasViscosity, calMixturePropertyM1
    from PyREMOT.docs.rmtThermo import (
        calDensityIG,
        calMeanHeatCapacityAtConstantPressure,
        calMixtureHeatCapacityAtConstantPressure,
        calStandardEnthalpyOfReaction,
    )
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
    import PyREMOT.core.constants as CONST

    comp_list = mi["feed"]["components"]["shell"]
    n = len(comp_list)
    P = mi["operating-conditions"]["pressure"]
    T = mi["operating-conditions"]["temperature"]
    process_type = mi["operating-conditions"]["process-type"]
    re_spec = mi["reactor"]
    cr_se_ar = CONST.PI_CONST * re_spec["ReInDi"] ** 2 / 4
    vo_fl_ra0 = mi["feed"]["volumetric-flowrate"]
    sp_coi0 = 1 * np.array(mi["feed"]["concentration"])
    sp_co0 = np.sum(sp_coi0)
    su_ga_ve0 = vo_fl_ra0 / cr_se_ar
    mo_fri0 = np.array(rmtUtil.moleFractionFromConcentrationSpecies(sp_coi0))
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    mo_wei = [it["MW"] for it in internal]
    ga_vii0 = calGasViscosity(comp_list, T)
    ga_mi_vi = calMixturePropertyM1(n, ga_vii0, mo_fri0, np.array(mo_wei))
    cp0 = calMeanHeatCapacityAtConstantPressure(comp_list, T)
    cp_mix0 = calMixtureHeatCapacityAtConstantPressure(mo_fri0, cp0)
    mi_mo_we0 = rmtUtil.mixtureMolecularWeight(mo_fri0, np.array(mo_wei), "kg/mol")
    ga_de0 = calDensityIG(mi_mo_we0, sp_co0)
    cif = np.copy(sp_coi0)
    ga_ma_co_te0 = (su_ga_ve0 / re_spec["ReLe"]) * np.repeat(np.max(cif), n)
    ga_he_co_te0 = ga_de0 * su_ga_ve0 * T * (cp_mix0 / mi_mo_we0) / re_spec["ReLe"]
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    st_he_re25 = np.array(list(map(calStandardEnthalpyOfReaction, reaction_list)))
    var_no = n + 2 if process_type != "iso-thermal" else n + 1
    fun_param = {
        "compList": comp_list,
        "const": {"CrSeAr": cr_se_ar, "MoWei": mo_wei, "StHeRe25": st_he_re25,
                  "GaMiVi": ga_mi_vi, "varNo": var_no},
        "ReSpec": re_spec,
        "ExHe": {"OvHeTrCo": mi["external-heat"]["OvHeTrCo"],
                 "EfHeTrAr": 4 / re_spec["ReInDi"],
                 "MeTe": mi["external-heat"]["MeTe"]},
        "constBC1": {"VoFlRa0": vo_fl_ra0, "SpCoi0": sp_coi0, "SpCo0": sp_co0,
                     "P0": P, "T0": T, "GaDe0": ga_de0, "GaCpMeanMix0": cp_mix0},
        "reactionRateExpr": mi["reaction-rates"],
    }
    dim = {"Cif": cif, "Cf": sp_co0, "Tf": T, "Pf": P, "vf": su_ga_ve0,
           "zf": re_spec["ReLe"], "Cpif": cp0, "Cpf": cp_mix0,
           "GaMaCoTe0": ga_ma_co_te0, "GaHeCoTe0": ga_he_co_te0}
    return (sorted_, coeff, fun_param, dim, {"timesLength": 100}, process_type)


@pytest.mark.reference
def test_n1_rhs_matches_reference_pointwise():
    from PyREMOT.docs.pbHomoReactor import PackedBedHomoReactorClass

    mi = make_model_input(model="N1")
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs = homo.make_n1_rhs(spec)
    y0 = np.asarray(homo.n1_initial_state(spec, p, d))
    params_set = _reference_n1_params(mi)

    rng = np.random.default_rng(0)
    for _ in range(6):
        y = y0 * rng.uniform(0.5, 1.5, size=y0.shape)
        y[-1] = rng.uniform(-0.02, 0.08)
        ref = np.asarray(PackedBedHomoReactorClass.modelEquationN1(0.3, y, params_set))
        ours = np.asarray(rhs(0.3, jnp.asarray(y), p, d))
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-14)


def test_n1_converged_solution_vs_scipy():
    """Our Radau trajectory agrees with tight-tolerance scipy LSODA on the
    same RHS to <=1e-6 relative state error (the BASELINE.json criterion)."""
    from scipy.integrate import solve_ivp

    from rmt_tpu.solvers import radau

    mi = make_model_input(model="N1")
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs = homo.make_n1_rhs(spec)
    jrhs = jax.jit(lambda t, y: rhs(t, y, p, d))
    y0 = np.asarray(homo.n1_initial_state(spec, p, d))
    ts = np.linspace(0, 1, 21)

    sol = solve_ivp(lambda t, y: np.asarray(jrhs(t, y)), [0, 1], y0,
                    method="LSODA", t_eval=ts, rtol=1e-11, atol=1e-13)
    ys, _ = radau.odeint(jrhs, jnp.asarray(y0), jnp.asarray(ts), rtol=1e-9, atol=1e-12)
    rel = np.abs(np.asarray(ys).T - sol.y) / np.maximum(np.abs(sol.y), 1e-8)
    assert rel.max() <= 1e-6, rel.max()


@pytest.mark.reference
def test_n1_rmt_exe_end_to_end():
    """Full rmtExe parity: schema identical; values agree within the
    reference's own LSODA default-tolerance truncation error."""
    from PyREMOT import rmtExe as ref_rmt_exe

    from rmt_tpu import rmtExe

    mi = make_model_input(model="N1")
    ours = rmtExe(mi)["resModel"][0]
    ref = ref_rmt_exe(make_model_input(model="N1"))["resModel"][0]

    assert ours["labelList"] == ref["labelList"]
    assert ours["indexList"] == ref["indexList"]
    for key in ("dataYs", "dataYCons1", "dataYCons2", "dataYTemp1", "dataYTemp2"):
        a, b = np.asarray(ours[key]), np.asarray(ref[key])
        assert a.shape == b.shape, key
    # mole fractions: reference integrates at rtol=1e-3
    mf_ours = np.asarray(ours["dataYs"])[:6]
    mf_ref = np.asarray(ref["dataYs"])[:6]
    assert np.max(np.abs(mf_ours - mf_ref)) < 5e-3
    # temperature profile within LSODA default tolerance
    t_ours = np.asarray(ours["dataYTemp2"])
    t_ref = np.asarray(ref["dataYTemp2"])
    assert np.max(np.abs(t_ours - t_ref) / t_ref) < 2e-3


def test_n1_isothermal_runs():
    from rmt_tpu import rmtExe

    mi = make_model_input(model="N1", process_type="iso-thermal")
    pack = rmtExe(mi)["resModel"][0]
    assert np.asarray(pack["dataYs"]).shape[0] == 7  # 6 mole fractions + P
    np.testing.assert_allclose(np.asarray(pack["dataYTemp2"]), 523.0)
