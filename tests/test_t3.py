# T3: steady axial-dispersion pseudo-homogeneous model.
# Residual parity vs reference homoModels.modelEquationT1 (the reference
# registers T3Init but never routes it; the equation is still the oracle),
# plus an end-to-end damped-Newton solve.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import homo
from rmt_tpu.solvers import newton

GA_DII = np.array([6.61512999110972e-06, 2.12995183554984e-06, 1.39108654241678e-06,
                   2.20809430865725e-06, 9.64429037148681e-07, 8.74374373632434e-07])


def _t3_model_input():
    mi = make_model_input(model="T3")
    # T3 feed concentrations are kmol/m^3 (homoModels.py:109)
    mi["feed"]["concentration"] = np.asarray(mi["feed"]["concentration"]) / 1e3
    mi["feed"]["superficial-velocity"] = 0.2
    mi["feed"]["diffusivity"] = GA_DII
    mi["feed"]["mixture-thermal-conductivity"] = 0.125
    mi["feed"]["mixture-viscosity"] = 2.51e-5
    mi["reactor"].update({"CaPo": 0.45, "CaTo": 2.0, "CaThCo": 12.6})
    mi["solver-config"].update({"root": "fsolve", "mesh": "normal"})
    return mi


def _reference_t3_args(mi, z_no):
    """FunParam/DimensionlessAnalysisParams exactly as runT1 builds them
    (homoModels.py:105-415, normal-mesh branch)."""
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
            "GaThCoi0": np.full(comp_no, GaThCoMix0),
            "GaVii0": np.full(comp_no, GaViMix0),
            "GaDe0": GaDe0,
            "GaCpMeanMix0": GaCpMeanMix0,
            "GaThCoMix0": GaThCoMix0,
        },
        "meshSetting": {
            "solverMesh": "normal",
            "solverMeshSet": True,
            "noLayerC": comp_no,
            "noLayerT": 1,
            "noLayer": comp_no + 1,
            "varNoLayer": z_no,
            "varNoLayerT": (comp_no + 1) * z_no,
            "varNoRows": 1,
            "varNoColumns": z_no,
            "rNo": 7,
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
        },
        "reactionRateExpr": mi["reaction-rates"],
    }
    DimensionlessAnalysisParams = {
        "Cif": Cif, "Tf": T, "vf": vf, "zf": zf, "Dif": GaDii0,
        "Cpif": GaCpMeanList0, "GaMaCoTe0": GaMaCoTe0, "GaMaDiTe0": GaMaDiTe0,
        "GaHeCoTe0": GaHeCoTe0, "GaHeDiTe0": GaHeDiTe0, "ReNu0": ReNu0,
        "ScNu0": ScNu0, "ShNu0": ShNu0, "PrNu0": PrNu0, "PeNuMa0": PeNuMa0,
        "PeNuHe0": PeNuHe0, "MaTrCo": MaTrCo, "HeTrCo": HeTrCo,
    }
    return sorted_, coeff, FunParam, DimensionlessAnalysisParams


@pytest.mark.reference
def test_t3_residual_matches_reference_pointwise():
    from PyREMOT.examples.homoModels import HomoModelClass

    mi = _t3_model_input()
    z_no = 10
    spec = homo.build_spec(mi, z_no=z_no)
    p = homo.t3_params(mi)
    d = homo.t3_feed(spec, p)
    res_fn = homo.make_t3_residual(spec)
    sorted_, coeff, fun_param, dl_params = _reference_t3_args(mi, z_no)

    y0 = np.asarray(homo.t3_initial_guess(spec))
    rng = np.random.default_rng(7)
    for _ in range(3):
        y = y0 * rng.uniform(0.8, 1.2, y0.shape)
        ref = np.asarray(
            HomoModelClass.modelEquationT1(
                y, sorted_, coeff, fun_param, dl_params, "non-iso-thermal"
            )
        )
        ours = np.asarray(res_fn(jnp.asarray(y), p, d))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_t3_end_to_end_solves():
    """Through the public API: pseudo-transient continuation + Newton."""
    from rmt_tpu.api import rmt

    mi = _t3_model_input()
    res = rmt.rmtExe(mi)
    data_y = np.asarray(res["resModel"]["dataYs"])
    mo_fri, T_re = data_y[:-1], data_y[-1]
    assert np.all(np.isfinite(data_y))
    # mole fractions sum to 1 and temperature rises above the feed for
    # this exothermic DME case
    np.testing.assert_allclose(mo_fri.sum(axis=0), 1.0, atol=1e-8)
    assert T_re.max() > 523.0 + 20
    assert T_re.min() > 400.0 and T_re.max() < 900.0
