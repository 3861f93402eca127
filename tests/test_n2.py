# N2 dynamic model: RHS parity vs reference equations + converged-solution
# accuracy + end-to-end schema.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import homo


def _reference_n2_params(mi):
    """Build the reference's paramsSet exactly as runN2 does
    (pbHomoReactor.py:3370-3580)."""
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
    be_vo_fr = re_spec["BeVoFr"]
    vo_fl_ra0 = mi["feed"]["volumetric-flowrate"]
    sp_coi0 = np.array(mi["feed"]["concentration"])
    sp_co0 = np.sum(sp_coi0)
    in_ga_ve0 = vo_fl_ra0 / (cr_se_ar * be_vo_fr)
    su_ga_ve0 = in_ga_ve0 * be_vo_fr
    mo_fri0 = np.array(rmtUtil.moleFractionFromConcentrationSpecies(sp_coi0))
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    mo_wei = [it["MW"] for it in internal]
    ga_vii0 = calGasViscosity(comp_list, T)
    ga_mi_vi = calMixturePropertyM1(n, ga_vii0, mo_fri0, np.array(mo_wei))
    cp0 = calMeanHeatCapacityAtConstantPressure(comp_list, T)
    cp_mix0 = calMixtureHeatCapacityAtConstantPressure(mo_fri0, cp0)
    mi_mo_we0 = rmtUtil.mixtureMolecularWeight(mo_fri0, np.array(mo_wei), "kg/mol")
    ga_de0 = calDensityIG(mi_mo_we0, sp_co0)
    z_no = 20
    cif = np.copy(sp_coi0)
    ga_ma_co_te0 = (su_ga_ve0 / re_spec["ReLe"]) * np.repeat(np.max(cif), n)
    ga_he_co_te0 = ga_de0 * su_ga_ve0 * T * (cp_mix0 / mi_mo_we0) / re_spec["ReLe"]
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    st_he_re25 = np.array(list(map(calStandardEnthalpyOfReaction, reaction_list)))
    var_no = n + 1 if process_type != "iso-thermal" else n
    fun_param = {
        "compList": comp_list,
        "const": {"CrSeAr": cr_se_ar, "MoWei": mo_wei, "StHeRe25": st_he_re25,
                  "GaMiVi": ga_mi_vi, "zNo": z_no, "varNo": var_no,
                  "varNoT": var_no * z_no, "reactionListNo": len(reaction_list),
                  "dz": 1.0 / (z_no - 1)},
        "ReSpec": re_spec,
        "ExHe": {"OvHeTrCo": mi["external-heat"]["OvHeTrCo"],
                 "EfHeTrAr": 4 / re_spec["ReInDi"],
                 "MeTe": mi["external-heat"]["MeTe"]},
        "constBC1": {"VoFlRa0": vo_fl_ra0, "SpCoi0": sp_coi0, "SpCo0": sp_co0,
                     "P0": P, "T0": T, "SuGaVe0": su_ga_ve0,
                     "GaDe0": ga_de0, "GaCpMeanMix0": cp_mix0},
        "reactionRateExpr": mi["reaction-rates"],
    }
    dim = {"Cif": cif, "Cf": sp_co0, "Tf": T, "Pf": P, "vf": su_ga_ve0,
           "zf": re_spec["ReLe"], "Cpif": cp0, "Cpf": cp_mix0,
           "GaMaCoTe0": ga_ma_co_te0, "GaHeCoTe0": ga_he_co_te0}
    return (sorted_, coeff, fun_param, dim, process_type)


@pytest.mark.reference
def test_n2_rhs_matches_reference_pointwise():
    from PyREMOT.docs.pbHomoReactor import PackedBedHomoReactorClass

    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs = homo.make_n2_rhs(spec)
    y0 = np.asarray(homo.n2_initial_state(spec, p, d))
    params_set = _reference_n2_params(mi)

    rng = np.random.default_rng(1)
    for _ in range(5):
        y = y0 * rng.uniform(0.6, 1.4, size=y0.shape)
        y[-20:] = rng.uniform(-0.01, 0.05, 20)  # temperature rows
        ref = np.asarray(PackedBedHomoReactorClass.modelEquationN2(0.1, y, params_set))
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p, d))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_n2_converged_solution_vs_scipy():
    from scipy.integrate import solve_ivp

    from rmt_tpu.solvers import radau

    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs = homo.make_n2_rhs(spec)
    jrhs = jax.jit(lambda t, y: rhs(t, y, p, d))
    y0 = np.asarray(homo.n2_initial_state(spec, p, d))
    ts = np.linspace(0, 0.5, 6)

    sol = solve_ivp(lambda t, y: np.asarray(jrhs(t, y)), [0, 0.5], y0,
                    method="LSODA", t_eval=ts, rtol=1e-10, atol=1e-12)
    ys, _ = radau.odeint(jrhs, jnp.asarray(y0), jnp.asarray(ts), rtol=1e-9, atol=1e-12)
    rel = np.abs(np.asarray(ys).T - sol.y) / np.maximum(np.abs(sol.y), 1e-6)
    assert rel.max() <= 1e-6, rel.max()


@pytest.mark.reference
def test_n2_rmt_exe_end_to_end():
    from PyREMOT import rmtExe as ref_rmt_exe

    from rmt_tpu import rmtExe

    mi = make_model_input(model="N2")
    ours = rmtExe(mi)["resModel"]
    ref = ref_rmt_exe(make_model_input(model="N2"))["resModel"]

    assert len(ours["dataPack"]) == len(ref["dataPack"]) == 5
    for op, rp in zip(ours["dataPack"], ref["dataPack"]):
        assert op["labelList"] == rp["labelList"]
        a, b = np.asarray(op["dataYs"]), np.asarray(rp["dataYs"])
        assert a.shape == b.shape
        # mole-fraction rows within the reference's LSODA default tolerance
        assert np.max(np.abs(a[:6] - b[:6])) < 5e-3
        # temperature row
        assert np.max(np.abs(a[6] - b[6]) / b[6]) < 2e-3


def test_n2_period_and_interval_structure():
    from rmt_tpu import rmtExe

    mi = make_model_input(model="N2", op_period=0.5)
    res = rmtExe(mi)["resModel"]
    times = [p["dataTime"] for p in res["dataPack"]]
    np.testing.assert_allclose(times, [0.1, 0.2, 0.3, 0.4, 0.5])
    pack = res["dataPack"][0]
    assert np.asarray(pack["dataYCons1"]).shape == (6, 20)
    assert np.asarray(pack["dataYs"]).shape == (7, 20)


def test_n2_checkpoint_resume_matches_single_run():
    """Integration state is a first-class checkpoint: two chained 0.25 s
    runs (save -> resume) land on the same state as one 0.5 s run (the
    reference only re-seeds in memory, pbHomoReactor.py:3684-3685)."""
    from rmt_tpu.api import rmt

    mi_full = make_model_input(model="N2", op_period=0.5)
    full = rmt.rmtExe(mi_full)["resModel"]

    mi_a = make_model_input(model="N2", op_period=0.25)
    res_a = rmt.rmtExe(mi_a)["resModel"]
    ck = res_a["checkpoint"]
    assert ck["model"] == "N2" and abs(ck["t"] - 0.25) < 1e-12

    mi_b = make_model_input(model="N2", op_period=0.25)
    mi_b["resume-state"] = ck
    res_b = rmt.rmtExe(mi_b)["resModel"]

    # times continue from the checkpoint
    assert abs(res_b["dataPack"][-1]["dataTime"] - 0.5) < 1e-12
    end_chained = res_b["checkpoint"]["state"]
    end_full = full["checkpoint"]["state"]
    np.testing.assert_allclose(end_chained, end_full, rtol=1e-5, atol=1e-8)
