# M13: dynamic heterogeneous packed bed by operator splitting. Pointwise
# parity of the gas-phase MoL RHS vs reference pbHeterReactor.modelEquationM2
# and of the solid-phase particle residual vs modelEquationM3, plus an
# end-to-end rmtExe({"model": "M13"}) run.

import io
from contextlib import redirect_stdout

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import hetero_dyn

GA_DII = np.array([6.61512999110972e-06, 2.12995183554984e-06, 1.39108654241678e-06,
                   2.20809430865725e-06, 9.64429037148681e-07, 8.74374373632434e-07])


def _m13_model_input():
    mi = make_model_input(model="M13", op_period=5.0)
    mi["operating-conditions"]["numerical-method"] = "fdm"
    mi["feed"]["concentration"] = np.asarray(mi["feed"]["concentration"]) / 1e3
    mi["feed"]["superficial-velocity"] = 0.2
    mi["feed"]["diffusivity"] = GA_DII
    mi["feed"]["viscosity"] = np.full(6, 2.51e-5)
    mi["feed"]["mixture-viscosity"] = 2.51e-5
    mi["feed"]["thermal-conductivity"] = np.full(6, 0.125)
    mi["feed"]["mixture-thermal-conductivity"] = 0.125
    mi["reactor"].update({"CaPo": 0.45, "CaTo": 2.0, "CaThCo": 12.6})
    mi["solver-config"].update({"root": "fsolve", "mesh": "normal"})
    return mi


def _reference_m13_args(mi, z_no, r_no):
    """FunParam/DimensionlessAnalysisParams exactly as runM2 builds them
    (pbHeterReactor.py:512-959, normal mesh)."""
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.rmtThermo import (
        calStandardEnthalpyOfReaction,
        calMeanHeatCapacityAtConstantPressure,
        calMixtureHeatCapacityAtConstantPressure,
        calDensityIG,
    )
    from PyREMOT.docs.fluidFilm import (
        calReNoEq1, calScNoEq1, calShNoEq1, calPrNoEq1, calNuNoEq1,
        calMassTransferCoefficientEq1, calHeatTransferCoefficientEq1,
    )
    from PyREMOT.core.eqConstants import CONST_EQ_Sh
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
    from PyREMOT.solvers.solSetting import solverSetting
    import PyREMOT.core.constants as CONST

    comp_list = mi["feed"]["components"]["shell"]
    comp_no = len(comp_list)
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)

    T = mi["operating-conditions"]["temperature"]
    P = mi["operating-conditions"]["pressure"]
    ReSpec = mi["reactor"]
    SpCoi0 = np.asarray(mi["feed"]["concentration"])
    SpCo0 = float(np.sum(SpCoi0))
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    MoWei = np.array([it["MW"] for it in internal])
    MoFri0 = np.array(rmtUtil.moleFractionFromConcentrationSpecies(SpCoi0))
    MiMoWe0 = rmtUtil.mixtureMolecularWeight(MoFri0, MoWei, "kg/mol")
    GaDe0 = calDensityIG(MiMoWe0, SpCo0 * 1000)
    GaCpMeanList0 = calMeanHeatCapacityAtConstantPressure(comp_list, T)
    GaCpMeanMix0 = calMixtureHeatCapacityAtConstantPressure(MoFri0, GaCpMeanList0)

    vf = mi["feed"]["superficial-velocity"]
    zf = ReSpec["ReLe"]
    rf = ReSpec["PaDi"] / 2
    GaDii0 = np.asarray(mi["feed"]["diffusivity"])
    GaVii0 = np.asarray(mi["feed"]["viscosity"])
    GaViMix0 = mi["feed"]["mixture-viscosity"]
    GaThCoi0 = np.asarray(mi["feed"]["thermal-conductivity"])
    GaThCoMix0 = mi["feed"]["mixture-thermal-conductivity"]
    PaDi = ReSpec["PaDi"]

    Cif = np.copy(SpCoi0)
    _Cif = np.repeat(np.max(Cif), comp_no)       # MAX normalization mode
    GaMaCoTe0 = (vf / zf) * _Cif
    GaMaDiTe0 = (1 / zf**2) * (_Cif * GaDii0)
    GaHeCoTe0 = (GaDe0 * vf * T * (GaCpMeanMix0 / MiMoWe0) / zf) * 1e-3
    GaHeDiTe0 = (T * GaThCoMix0 / zf**2) * 1e-3
    SoMaDiTe0 = (GaDii0 * _Cif) / rf**2
    SoHeDiTe0 = (GaThCoMix0 * T / rf**2) * 1e-3

    ReNu0 = calReNoEq1(GaDe0, vf, PaDi, GaViMix0)
    ScNu0 = calScNoEq1(GaDe0, GaViMix0, GaDii0)
    ShNu0 = calShNoEq1(ScNu0, ReNu0, CONST_EQ_Sh["Frossling"])
    PrNu0 = calPrNoEq1(GaCpMeanMix0, GaViMix0, GaThCoMix0, MiMoWe0)
    NuNu0 = calNuNoEq1(PrNu0, ReNu0)
    PeNuMa0 = (vf * zf) / GaDii0
    PeNuHe0 = (zf * GaDe0 * (GaCpMeanMix0 / MiMoWe0) * vf) / GaThCoMix0
    MaTrCo = calMassTransferCoefficientEq1(ShNu0, GaDii0, PaDi)
    HeTrCo = calHeatTransferCoefficientEq1(NuNu0, GaThCoMix0, PaDi)

    dz = 1.0 / (z_no - 1)
    var_no = comp_no + 1
    FunParam = {
        "compList": comp_list,
        "const": {
            "CrSeAr": CONST.PI_CONST * ReSpec["ReInDi"] ** 2 / 4,
            "MoWei": MoWei,
            "StHeRe25": np.array(list(map(calStandardEnthalpyOfReaction, reaction_list))),
            "GaMiVi": GaViMix0,
            "varNo": var_no,
            "varNoT": var_no * z_no,
            "reactionListNo": len(reaction_list),
        },
        "ReSpec": ReSpec,
        "ExHe": mi["external-heat"],
        "constBC1": {
            "VoFlRa0": mi["feed"]["volumetric-flowrate"],
            "SpCoi0": SpCoi0,
            "SpCo0": SpCo0,
            "P0": P,
            "T0": T,
            "SuGaVe0": vf,
            "GaDii0": GaDii0,
            "GaThCoi0": GaThCoi0,
            "GaVii0": GaVii0,
            "GaDe0": GaDe0,
            "GaCpMeanMix0": GaCpMeanMix0,
            "GaThCoMix0": GaThCoMix0,
        },
        "meshSetting": {
            "solverMesh": "normal",
            "solverMeshSet": True,
            "noLayer": comp_no + 1,
            "varNoLayer": z_no * (r_no + 1),
            "varNoLayerT": (comp_no + 1) * z_no * (r_no + 1),
            "varNoRows": r_no + 1,
            "varNoColumns": z_no,
            "rNo": r_no,
            "zNo": z_no,
            "dz": dz,
            "dzs": [],
            "zR": [],
            "zNoNo": solverSetting["T1"]["zMesh"]["zNoNo"],
        },
        "solverSetting": {
            "dFdz": solverSetting["T1"]["dFdz"],
            "d2Fdz2": solverSetting["T1"]["d2Fdz2"],
            "dTdz": solverSetting["T1"]["dTdz"],
            "d2Tdz2": solverSetting["T1"]["d2Tdz2"],
        },
        "reactionRateExpr": mi["reaction-rates"],
    }
    DimensionlessAnalysisParams = {
        "Cif": Cif, "Tf": T, "vf": vf, "zf": zf, "rf": rf, "Dif": GaDii0,
        "Cpif": GaCpMeanList0, "Cpf": GaCpMeanMix0,
        "GaMaCoTe0": GaMaCoTe0, "GaMaDiTe0": GaMaDiTe0,
        "GaHeCoTe0": GaHeCoTe0, "GaHeDiTe0": GaHeDiTe0,
        "SoMaDiTe0": SoMaDiTe0, "SoHeDiTe0": SoHeDiTe0,
        "ReNu0": ReNu0, "ScNu0": ScNu0, "ShNu0": ShNu0, "PrNu0": PrNu0,
        "PeNuMa0": PeNuMa0, "PeNuHe0": PeNuHe0,
        "MaTrCo": MaTrCo, "HeTrCo": HeTrCo,
    }
    return sorted_, coeff, FunParam, DimensionlessAnalysisParams


def _setup(z_no=10, r_no=7):
    mi = _m13_model_input()
    spec = hetero_dyn.m13_build_spec(mi, z_no=z_no, r_no=r_no)
    p = hetero_dyn.m13_params(mi)
    d = hetero_dyn.m13_feed(spec, p)
    return mi, spec, p, d


@pytest.mark.reference
def test_m13_gas_rhs_matches_reference_pointwise():
    from PyREMOT.docs.pbHeterReactor import PackedBedHeteroReactorClass

    z_no = 10
    mi, spec, p, d = _setup(z_no=z_no)
    rhs = hetero_dyn.make_m13_gas_rhs(spec)
    sorted_, coeff, fun_param, dl_params = _reference_m13_args(mi, z_no, spec.r_no)

    c_in = np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"])))
    rng = np.random.default_rng(5)
    for trial in range(3):
        # gas state: perturbed inlet profile + small theta
        c = c_in[:, None] * rng.uniform(0.3, 1.1, (spec.n_comp, z_no))
        theta = rng.uniform(-0.02, 0.08, (1, z_no))
        y = np.concatenate([c, theta], axis=0).reshape(-1)
        # interface values from the previous solid solve
        cs_surf = c * rng.uniform(0.7, 1.0, c.shape)
        ts_surf = theta[0] + rng.uniform(0.0, 0.05, z_no)
        interface = {"SpCosi_zi": cs_surf, "Ts_zi": ts_surf}
        params_set = (sorted_, coeff, fun_param, dl_params, interface)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                PackedBedHeteroReactorClass.modelEquationM2(0.1, y, params_set)
            )
        ours = np.asarray(
            rhs(0.1, jnp.asarray(y), p, d, jnp.asarray(cs_surf), jnp.asarray(ts_surf))
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


@pytest.mark.reference
def test_m13_solid_residual_matches_reference_pointwise():
    from PyREMOT.docs.pbHeterReactor import PackedBedHeteroReactorClass

    z_no = 5          # solid residual cost scales with zNo*rNo; keep small
    mi, spec, p, d = _setup(z_no=z_no)
    res_fn = hetero_dyn.make_m13_solid_residual(spec)
    sorted_, coeff, fun_param, dl_params = _reference_m13_args(mi, z_no, spec.r_no)

    c_in = np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"])))
    rng = np.random.default_rng(7)
    for trial in range(2):
        y3 = (
            c_in[:, None, None]
            * rng.uniform(0.3, 1.1, (spec.n_comp, spec.r_no, z_no))
        )
        ts = rng.uniform(-0.02, 0.08, (1, spec.r_no, z_no))
        y3 = np.concatenate([y3, ts], axis=0)
        c_bulk = c_in[:, None] * rng.uniform(0.8, 1.2, (spec.n_comp, z_no))
        t_bulk = rng.uniform(-0.01, 0.05, z_no)
        bulk = {"SpCoi_zb": c_bulk, "T_zb": t_bulk}
        params_set = (sorted_, coeff, fun_param, dl_params, bulk)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                PackedBedHeteroReactorClass.modelEquationM3(
                    y3.reshape(-1), params_set
                )
            )
        ours = np.asarray(
            res_fn(jnp.asarray(y3), jnp.asarray(c_bulk), jnp.asarray(t_bulk), p, d)
        ).reshape(-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m13_api_end_to_end():
    from rmt_tpu.api import rmt

    mi = _m13_model_input()
    mi["solver-config"].update({"zNo": 10, "rNo": 7, "tNo": 5})
    res = rmt.rmtExe(mi)
    packs = res["resModel"]["dataPack"]
    assert len(packs) == 5
    for pack in packs:
        assert pack["successStatus"]
        assert np.all(np.isfinite(pack["dataYs"]))
    last = packs[-1]
    # gas fills toward the feed composition over the transient
    mo_fri = last["dataYs"][: len(mi["feed"]["components"]["shell"])]
    assert np.all(mo_fri >= 0) and np.all(mo_fri <= 1 + 1e-9)
    np.testing.assert_allclose(np.sum(mo_fri, axis=0), 1.0, rtol=1e-6)
    # solid interface concentrations are physical
    assert np.all(np.isfinite(last["dataYCons"]))
    assert np.all(last["dataYTemps"] > 400.0)


def test_m13_checkpoint_resume_matches_single_run():
    """M13's split gas+solid state is a first-class checkpoint: two
    chained 2.5 s runs (save -> resume) land on the same state as one
    5 s run. The reference only re-seeds interval state in memory
    (pbHeterReactor.py:1134-1148); since every interval restarts the gas
    integrator and solid Newton from the carried state alone, the
    chained continuation is exact."""
    from rmt_tpu.api import rmt

    grid = {"zNo": 8, "rNo": 5, "tNo": 2}

    mi_full = _m13_model_input()
    mi_full["operating-conditions"]["period"] = 5.0
    mi_full["solver-config"].update(dict(grid, tNo=4))
    full = rmt.rmtExe(mi_full)["resModel"]

    mi_a = _m13_model_input()
    mi_a["operating-conditions"]["period"] = 2.5
    mi_a["solver-config"].update(grid)
    res_a = rmt.rmtExe(mi_a)["resModel"]
    ck = res_a["checkpoint"]
    assert ck["model"] == "M13" and abs(ck["t"] - 2.5) < 1e-12

    mi_b = _m13_model_input()
    mi_b["operating-conditions"]["period"] = 2.5
    mi_b["solver-config"].update(grid)
    mi_b["resume-state"] = ck
    res_b = rmt.rmtExe(mi_b)["resModel"]

    # times continue from the checkpoint
    assert abs(res_b["dataPack"][-1]["dataTime"] - 5.0) < 1e-9
    ck_chained, ck_full = res_b["checkpoint"], full["checkpoint"]
    np.testing.assert_allclose(
        ck_chained["gas"], ck_full["gas"], rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        ck_chained["solid"], ck_full["solid"], rtol=1e-6, atol=1e-10
    )
