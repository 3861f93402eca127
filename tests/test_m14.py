# M14: steady heterogeneous packed bed (gas + lumped catalyst phase, axial
# dispersion), ramped root problem. Residual parity vs reference
# pbReactor.modelEquationM9, plus an end-to-end continuation solve.

import io
from contextlib import redirect_stdout

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import hetero
from rmt_tpu.solvers import newton, radau

GA_DII = np.array([6.61512999110972e-06, 2.12995183554984e-06, 1.39108654241678e-06,
                   2.20809430865725e-06, 9.64429037148681e-07, 8.74374373632434e-07])


def _m14_model_input():
    mi = make_model_input(model="M14")
    mi["feed"]["concentration"] = np.asarray(mi["feed"]["concentration"]) / 1e3
    mi["feed"]["superficial-velocity"] = 0.2
    mi["feed"]["diffusivity"] = GA_DII
    mi["feed"]["mixture-thermal-conductivity"] = 0.125
    mi["feed"]["mixture-viscosity"] = 2.51e-5
    mi["reactor"].update({"CaPo": 0.45, "CaTo": 2.0, "CaThCo": 12.6})
    mi["solver-config"].update({"root": "fsolve", "mesh": "normal"})
    return mi


def _reference_m14_args(mi, z_no):
    """FunParam/DimensionlessAnalysisParams exactly as runM9 builds them
    (pbReactor.py:7325-7540, normal mesh, rNo=1)."""
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
    from PyREMOT.solvers.solOrCo import OrCoClass
    import PyREMOT.core.constants as CONST

    comp_list = mi["feed"]["components"]["shell"]
    comp_no = len(comp_list)
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)

    T = mi["operating-conditions"]["temperature"]
    P = mi["operating-conditions"]["pressure"]
    ReSpec = mi["reactor"]
    SpCoi0 = np.asarray(mi["feed"]["concentration"])
    SpCo0 = float(np.sum(SpCoi0))
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
    GaViMix0 = mi["feed"]["mixture-viscosity"]
    GaThCoMix0 = mi["feed"]["mixture-thermal-conductivity"]
    PaDi = ReSpec["PaDi"]

    Cif = np.copy(SpCoi0)
    _Cif = np.repeat(np.max(Cif), comp_no)
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

    r_no = 1
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
            "GaThCoi0": np.full(comp_no, GaThCoMix0),
            "GaVii0": np.full(comp_no, GaViMix0),
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
            "zNoNo": [15, 10],
        },
        "solverSetting": {
            "dFdz": -1,
            "d2Fdz2": {"BC1": 0, "BC2": 0, "G": 0},
            "dTdz": -1,
            "d2Tdz2": {"BC1": 0, "BC2": 0, "G": 0},
            "OrCoClassSetRes": OrCoClass().buildMatrix(),
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


@pytest.mark.reference
@pytest.mark.parametrize("ramp", [1.0, 0.25])
def test_m14_residual_matches_reference_pointwise(ramp):
    from PyREMOT.docs.pbReactor import PackedBedReactorClass

    mi = _m14_model_input()
    z_no = 10
    spec = hetero.m14_build_spec(mi, z_no=z_no)
    p = hetero.m14_params(mi)
    d = hetero.m14_feed(spec, p)
    res_fn = hetero.make_m14_residual(spec)
    sorted_, coeff, fun_param, dl_params = _reference_m14_args(mi, z_no)
    params_set = (sorted_, coeff, fun_param, dl_params, "non-iso-thermal")

    c_in = np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"])))
    base = np.concatenate(
        [np.tile(c_in[:, None, None], (1, 2, z_no)),
         np.full((1, 2, z_no), 0.05)], axis=0
    ).reshape(-1)
    rng = np.random.default_rng(11)
    for _ in range(3):
        y = base * rng.uniform(0.85, 1.15, base.shape)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                PackedBedReactorClass.modelEquationM9(y, params_set, ramp)
            )
        ours = np.asarray(res_fn(jnp.asarray(y), p, d, ramp))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m14_end_to_end_solves():
    """Ramped continuation: PTC at a small ramp, then Newton while raising
    the ramp to 1 (the reference's rampList continuation with the M7-based
    initial guess)."""
    mi = _m14_model_input()
    spec = hetero.m14_build_spec(mi, z_no=10)
    p = hetero.m14_params(mi)
    d = hetero.m14_feed(spec, p)
    res_fn = hetero.make_m14_residual(spec)

    S = hetero.m14_row_scales(spec, p, d)
    res_s = lambda yy, ramp: res_fn(yy, p, d, ramp) / S

    c_in = jnp.asarray(np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"]))))
    y = jnp.concatenate(
        [jnp.tile(c_in[:, None, None], (1, 2, spec.z_no)),
         jnp.zeros((1, 2, spec.z_no))], axis=0
    ).reshape(-1)
    # pseudo-transient continuation on the row-scaled system, then Newton
    ys, _ = radau.odeint(lambda t, yy: res_s(yy, 1.0), y,
                         jnp.asarray([0.0, 20.0], y.dtype), rtol=1e-7, atol=1e-10)
    sol = newton.root(lambda yy: res_s(yy, 1.0), ys[-1], max_iter=60, tol=1e-8)
    y = sol.x
    assert bool(sol.converged), float(sol.residual_norm)
    Y = np.asarray(y).reshape(spec.n_comp + 1, 2, spec.z_no)
    assert np.all(np.isfinite(Y))
    Tg = (1 + Y[-1, 0]) * 523.0
    Ts = (1 + Y[-1, 1]) * 523.0
    # catalyst runs hotter than the gas for this exothermic chemistry
    assert Ts.max() >= Tg.max() - 1e-6
    assert 523.0 < Ts.max() < 900.0
    # gas-solid concentration gap is small but nonzero
    gap = np.abs(Y[:-1, 0] - Y[:-1, 1])
    assert gap.max() < 0.2


def test_m14_api_end_to_end():
    from rmt_tpu.api import rmt

    mi = _m14_model_input()
    mi["solver-config"]["zNo"] = 10
    res = rmt.rmtExe(mi)
    pack = res["resModel"]["dataPack"][0]
    Tg, Ts = pack["dataYTempGas"], pack["dataYTempSolid"]
    assert np.all(np.isfinite(res["resModel"]["dataYs"]))
    assert Ts.max() >= Tg.max() - 1e-6
    assert 523.0 < Ts.max() < 900.0


def test_m14_ramp_list_continuation_matches_direct():
    """rampList kinetics continuation (reference pbReactor.py:7615-7643):
    climbing 0.25 -> 0.5 -> 1.0 must land on the same steady state as the
    direct full-kinetics solve."""
    from rmt_tpu.api import rmt

    mi = _m14_model_input()
    mi["solver-config"]["zNo"] = 10
    direct = rmt.rmtExe(mi)["resModel"]["dataYs"]

    mi2 = _m14_model_input()
    mi2["solver-config"]["zNo"] = 10
    mi2["solver-config"]["rampList"] = [0.25, 0.5, 1.0]
    ramped = rmt.rmtExe(mi2)["resModel"]["dataYs"]

    np.testing.assert_allclose(ramped, direct, rtol=1e-6, atol=1e-8)
