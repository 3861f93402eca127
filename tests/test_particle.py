# Particle models T1/T2: RHS/residual parity vs reference + end-to-end.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import particle

GA_DII = np.array([6.61512999110972e-06, 2.12995183554984e-06, 1.39108654241678e-06,
                   2.20809430865725e-06, 9.64429037148681e-07, 8.74374373632434e-07])
MA_TR_CO = np.array([0.0273301866548795, 0.0149179341780856, 0.0108707796723462,
                     0.0157945517381349, 0.0104869502041277, 0.00898673624257253])


def _t1_model_input():
    mi = make_model_input(model="T1", op_period=5.0)
    mi["feed"]["concentration"] = np.asarray(mi["feed"]["concentration"]) / 1e3
    mi["feed"]["diffusivity"] = GA_DII
    mi["feed"]["mixture-thermal-conductivity"] = 0.125
    mi["reactor"].update({"CaPo": 0.45, "CaTo": 2.0, "CaThCo": 12.6,
                          "BeVoFr": 0.39, "CaSpHeCa": 0.96})
    mi["test-const"] = {
        "MaTrCo0": MA_TR_CO, "HeTrCo0": 1731.0,
        "Cbi": np.asarray(mi["feed"]["concentration"]), "Tb": 523.0,
        "numerical-method": "fdm",
    }
    return mi


def _t2_model_input():
    mi = make_model_input(model="T2")
    mi["feed"]["superficial-velocity"] = 0.2
    mi["reactor"].update({"CaPo": 0.87, "CaTo": 2.0, "CaThCo": 960.0,
                          "BeVoFr": 0.45, "CaSpHeCa": 960.0})
    return mi


def _reference_t1_params(mi, spec):
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.rmtThermo import calStandardEnthalpyOfReaction
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
    from PyREMOT.solvers.solOrCo import OrCoClass
    import PyREMOT.core.constants as CONST

    comp_list = mi["feed"]["components"]["shell"]
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    st25 = np.array(list(map(calStandardEnthalpyOfReaction, reaction_list)))
    T = mi["operating-conditions"]["temperature"]
    sp_coi0 = np.asarray(mi["feed"]["concentration"])
    r_no = spec.r_no
    rf = mi["reactor"]["PaDi"] / 2
    cmax = np.max(sp_coi0)
    dif = GA_DII
    so_ma = (dif * np.repeat(cmax, 6)) / rf**2
    so_he = (0.125 * T / rf**2) * 1e-3
    fun_param = {
        "compList": comp_list,
        "const": {"CrSeAr": 1.0, "MoWei": [it["MW"] for it in internal],
                  "StHeRe25": st25, "GaMiVi": 1e-5, "varNo": 7, "varNoT": 140,
                  "reactionListNo": 3},
        "ReSpec": mi["reactor"],
        "ExHe": mi["external-heat"],
        "constBC1": {"VoFlRa0": 1.0, "SpCoi0": sp_coi0, "SpCo0": float(sp_coi0.sum()),
                     "P0": mi["operating-conditions"]["pressure"], "T0": T,
                     "SuGaVe0": 0.2, "GaDii0": dif, "GaThCoi0": np.ones(6) * 0.03,
                     "GaVii0": np.ones(6), "GaDe0": 0.0,
                     "GaCpMeanMix0": 0.0, "GaThCoMix0": 0.125},
        "meshSetting": {"solverMesh": "normal", "solverMeshSet": True,
                        "noLayerC": 6, "noLayerT": 1, "noLayer": 7,
                        "varNoLayer": 160, "varNoLayerT": 1120, "varNoRows": 1,
                        "varNoColumns": r_no, "rNo": r_no, "zNo": 20, "dz": 1 / 19},
        "solverSetting": {"OrCoClassSetRes": OrCoClass().buildMatrix()},
        "reactionRateExpr": mi["reaction-rates"],
    }
    dap = {"Cif": sp_coi0, "Tf": T, "vf": 0.2, "Dif": dif, "Cpif": np.zeros(6),
           "Cpf": 0.0, "rf": rf, "SoMaDiTe0": so_ma, "SoHeDiTe0": so_he,
           "HeTrCo": 1731.0, "MaTrCo": MA_TR_CO}
    pp = {"numericalMethod": "fdm", "SoCpMeanMixEff": 279.34,
          "GaDii0": dif, "Cbs": sp_coi0 / cmax, "Tb": (523.0 - T) / T}
    return ({"reactionListSorted": sorted_, "reactionStochCoeff": coeff},
            fun_param, pp, dap, "non-iso-thermal")


@pytest.mark.reference
def test_t1_rhs_matches_reference_pointwise():
    from PyREMOT.examples.particleModels import ParticleModelClass

    mi = _t1_model_input()
    spec = particle.build_spec(mi)
    p = particle.build_params(mi)
    rhs = particle.make_t1_rhs(spec)
    y0 = np.asarray(particle.t1_initial_state(spec, p))
    params_set = _reference_t1_params(mi, spec)

    rng = np.random.default_rng(9)
    for _ in range(4):
        y = np.abs(y0 + rng.uniform(0.001, 0.5, y0.shape))
        y[-7:] = rng.uniform(-0.01, 0.05, 7)
        ref = np.asarray(ParticleModelClass.modelEquationT1(0.1, y, params_set))
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


@pytest.mark.reference
def test_t2_derived_transport_matches_reference():
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.fluidFilm import (
        calHeatTransferCoefficientEq1,
        calMassTransferCoefficientEq1,
        calNuNoEq1,
        calPrNoEq1,
        calReNoEq1,
        calScNoEq1,
        calShNoEq1,
    )
    from PyREMOT.docs.gasTransPor import (
        calGasDiffusivity,
        calGasThermalConductivity,
        calGasViscosity,
        calMixturePropertyM1,
    )
    from PyREMOT.docs.rmtThermo import (
        calDensityIG,
        calMeanHeatCapacityAtConstantPressure,
        calMixtureHeatCapacityAtConstantPressure,
    )
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil

    mi = _t2_model_input()
    spec = particle.build_spec(mi)
    p = particle.build_params(mi)
    d = particle.t2_derived(spec, p)

    comp_list = mi["feed"]["components"]["shell"]
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    mw = np.array([it["MW"] for it in internal])
    tc = np.array([it["Tc"] for it in internal])
    pc = np.array([it["Pc"] for it in internal])
    T = mi["operating-conditions"]["temperature"]
    P = mi["operating-conditions"]["pressure"]
    sp = np.asarray(mi["feed"]["concentration"])
    mf = sp / sp.sum()
    dii = calGasDiffusivity(1, comp_list, {"MoFri": mf, "T": T, "P": P,
                                           "MWi": mw, "CrTei": tc, "CrPri": pc})
    vii = calGasViscosity(comp_list, T)
    mi_vi = calMixturePropertyM1(6, vii, mf, mw)
    ki = calGasThermalConductivity(comp_list, T)
    k_mix = calMixturePropertyM1(6, ki, mf, mw)
    mw_mix = rmtUtil.mixtureMolecularWeight(mf, mw, "kg/mol")
    de = calDensityIG(mw_mix, sp.sum())
    cp = calMixtureHeatCapacityAtConstantPressure(
        mf, calMeanHeatCapacityAtConstantPressure(comp_list, T))
    pa_di = mi["reactor"]["PaDi"]
    re = calReNoEq1(de, 0.2, pa_di, mi_vi)
    sh = calShNoEq1(calScNoEq1(de, mi_vi, dii), re, 1)
    nu = calNuNoEq1(calPrNoEq1(cp, mi_vi, k_mix, mw_mix), re)
    np.testing.assert_allclose(np.asarray(d["MaTrCo"]),
                               calMassTransferCoefficientEq1(sh, dii, pa_di), rtol=1e-12)
    np.testing.assert_allclose(float(d["HeTrCo"]),
                               calHeatTransferCoefficientEq1(nu, k_mix, pa_di), rtol=1e-12)


def test_t2_end_to_end_solves():
    from rmt_tpu import rmtExe

    res = rmtExe(_t2_model_input())["resModel"]
    dp = res["dataPack"][0]
    assert dp["successStatus"]
    # particle is hotter than the bulk (exothermic), monotone toward center
    t_prof = dp["dataYT"][0]
    assert t_prof[0] >= t_prof[-1] >= 523.0 - 1e-6
    np.testing.assert_allclose(dp["dataYMoFr"].sum(axis=0), 1.0, rtol=1e-9)


# Frozen oracle: reference modelEquationT1 under scipy LSODA (its default
# rtol=1e-3/atol=1e-6 -- the only tolerances the explosive T1 transient is
# integrable at; see _run_t1) from the 1e-6 IV to t=0.5 s, state reshaped
# (n_layer, rNo). Captured 2026-08-16 on this machine (takes ~4 min live,
# hence frozen).
_T1_REF_Y_05 = np.array([
    [0.84802096, 0.84802097, 0.84802098, 0.84802101, 0.84802104, 0.8480211, 0.84815766],
    [0.44807949, 0.44807945, 0.44807936, 0.44807922, 0.44807905, 0.44807888, 0.44815804],
    [0.05131567, 0.05131565, 0.05131561, 0.05131554, 0.05131545, 0.05131536, 0.05122681],
    [0.53234244, 0.5323424, 0.53234229, 0.53234213, 0.53234193, 0.53234173, 0.53229087],
    [0.005363, 0.005363, 0.00536301, 0.00536303, 0.00536306, 0.00536308, 0.00535283],
    [0.00363528, 0.00363529, 0.00363532, 0.00363535, 0.00363539, 0.00363543, 0.00362629],
    [0.25397063, 0.25397057, 0.2539704, 0.25397015, 0.25396986, 0.2539696, 0.25409553],
])


def test_t1_end_to_end_runs():
    from rmt_tpu import rmtExe

    mi = _t1_model_input()
    mi["operating-conditions"]["period"] = 0.5
    res = rmtExe(mi)["resModel"]
    assert len(res["dataPack"]) == 10
    assert res["dataPack"][-1]["dataY"].shape == (7, 7)
    # dimensionless state at t = 0.5 vs the frozen reference-LSODA oracle;
    # both runs are O(rtol=1e-3) accurate, so agree to ~1e-3
    last = res["dataPack"][-1]
    ours = np.concatenate([last["dataYCo_DiLe"], last["dataYT_DiLe"]], axis=0)
    np.testing.assert_allclose(ours, _T1_REF_Y_05, rtol=5e-3, atol=5e-4)


def test_t2_oc_branch_consistent_with_fdm():
    """Steady particle with numerical-method "oc" (the reference OC path
    crashes in solCatParticle, so cross-consistency with the proven FDM
    branch is the oracle, per the same-PDE-different-basis argument).
    The OC and FDM steady solutions must agree up to discretization
    error; the DME particle profiles are nearly radially uniform."""
    from rmt_tpu import rmtExe

    res_f = rmtExe(_t2_model_input())["resModel"]

    mi2 = _t2_model_input()
    mi2.setdefault("solver-config", {})["numerical-method"] = "oc"
    res_o = rmtExe(mi2)["resModel"]

    fa = np.asarray(res_f["dataPack"][0]["dataY"])
    fb = np.asarray(res_o["dataPack"][0]["dataY"])
    assert np.all(np.isfinite(fb))
    # surface (last) and innermost values agree between bases; 5% covers
    # the 7-point-basis discretization difference on the interior trace
    # peaks (H2O/CH3OH build-up in the particle core), measured ~4%
    np.testing.assert_allclose(fb[:, -1], fa[:, -1], rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(fb[:, 0], fa[:, 0], rtol=5e-2, atol=5e-3)


def test_t2_fem_branch_consistent_with_fdm():
    """Steady particle with numerical-method "fem" (OCFE; the reference's
    own solCatParticle2 assembler cannot produce a correct system, see
    ops/ocfe.py, so FDM cross-consistency is the oracle). The 6-element
    Lobatto grid (19 radial points) resolves the near-uniform DME profiles
    tighter than the 7-point bases, so the surface/center agreement bound
    is the FDM discretization error."""
    from rmt_tpu import rmtExe

    res_f = rmtExe(_t2_model_input())["resModel"]

    mi2 = _t2_model_input()
    mi2.setdefault("solver-config", {})["numerical-method"] = "fem"
    res_o = rmtExe(mi2)["resModel"]

    fa = np.asarray(res_f["dataPack"][0]["dataY"])
    fb = np.asarray(res_o["dataPack"][0]["dataY"])
    assert fb.shape == (fa.shape[0], 19)
    assert np.all(np.isfinite(fb))
    np.testing.assert_allclose(fb[:, -1], fa[:, -1], rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(fb[:, 0], fa[:, 0], rtol=5e-2, atol=5e-3)
    # the output grid is the OCFE element grid
    xs = res_o["dataList"][0]["x"]
    assert xs.shape == (19,) and xs[0] == 0.0 and abs(xs[-1] - 1.0) < 1e-12


def test_t1_checkpoint_resume_matches_single_run():
    """T1 checkpoint/resume: chained half-period runs reproduce the
    full-period particle state."""
    from rmt_tpu import rmtExe

    def mi_with(period):
        mi = _t1_model_input()
        mi["operating-conditions"]["period"] = period
        return mi

    full = rmtExe(mi_with(5.0))["resModel"]
    a = rmtExe(mi_with(2.5))["resModel"]
    ck = a["checkpoint"]
    assert ck["model"] == "T1" and abs(ck["t"] - 2.5) < 1e-12
    mi_b = mi_with(2.5)
    mi_b["resume-state"] = ck
    b = rmtExe(mi_b)["resModel"]
    assert abs(b["dataPack"][-1]["dataTime"] - 5.0) < 1e-9
    np.testing.assert_allclose(
        b["checkpoint"]["state"], full["checkpoint"]["state"],
        rtol=1e-3, atol=1e-6,
    )
