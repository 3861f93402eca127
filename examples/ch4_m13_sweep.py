# Example 2: methane coupling (2CH4 <=> C2H4 + 2H2) -- the reference's
# second published chemistry (PyREMOT/tests/test_rmt_N2_CH4.py,
# test_rmt_CH4_6.py) -- showing that the kinetics DSL is
# chemistry-agnostic, plus the TPU-side extras:
#
# 1. Dynamic homogeneous run (N2) with checkpoint/resume: two chained
#    5 s runs land exactly where one 10 s run does.
# 2. Dynamic heterogeneous operator-splitting model (M13) and a vmapped
#    feed-temperature design sweep over it (rmt_tpu.parallel).
# 3. Script-level plotting through the reference-compatible plotClass.
#
# Run: python examples/ch4_m13_sweep.py  (CPU works; TPU is much faster)

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rmt_tpu import rmtExe  # noqa: E402
from rmt_tpu.data import defaults as data

BED_POR = data.REACTOR["bed_por"]
CAT_D = data.CATALYST["cat_d"]
CAT_RHO = data.CATALYST["cat_rho"]
BULK_RHO = CAT_RHO * (1 - BED_POR)
COMP_LIST = ["CH4", "C2H4", "H2"]
REACTIONS = {"R1": "2CH4 <=> C2H4 + 2H2"}


def n2_model_input(T=973.0, P=3e5, period=10.0):
    """Homogeneous dynamic CH4-coupling configuration (mirrors the
    reference's test_rmt_N2_CH4.py: 7 mm tube, adiabatic via the
    MeTe == 0 quirk, second-order concentration-based rate)."""
    mo_fri0 = [0.90, 0.05, 0.05]
    ct0 = 1e3 * data.calConcentration(mo_fri0, P, T, "kmol/m^3")
    rea_dia = 0.007
    vo_fl_ra = (0.01 / BED_POR) * BED_POR * (math.pi * rea_dia**2 / 4)
    return {
        "model": "N2",
        "operating-conditions": {
            "pressure": P, "temperature": T, "period": period,
            "process-type": "non-iso-thermal",
        },
        "feed": {
            "volumetric-flowrate": vo_fl_ra,
            "concentration": ct0,
            "mixture-viscosity": 1e-5,
            "components": {"shell": list(COMP_LIST)},
        },
        "reactions": dict(REACTIONS),
        "reaction-rates": {
            "VARS": {
                "k0": 0.0072 * 1e-1,                      # m^3/(mol*s)
                "C_CH4": lambda x: x["SpCoi"][0],
            },
            "RATES": {"r1": lambda x: x["k0"] * x["C_CH4"] ** 2},
        },
        "external-heat": {"OvHeTrCo": 50.0, "EfHeTrAr": 4 / rea_dia,
                          "MeTe": 0.0},
        "reactor": {
            "ReInDi": rea_dia, "ReLe": 1.0, "PaDi": CAT_D,
            "BeVoFr": BED_POR, "CaBeDe": BULK_RHO, "CaDe": CAT_RHO,
            "CaSpHeCa": data.CATALYST["cat_Cp"] / 1000.0,
        },
        "solver-config": {"ivp": "default", "display-result": "False"},
    }


def m13_model_input(T=973.0, P=3e5, period=10.0):
    """Heterogeneous dynamic CH4-coupling configuration for the
    operator-splitting M13 model (gas MoL + per-node solid particle BVP;
    feed fields as in the reference's hetero drivers,
    pbHeterReactor.py:573-599, concentrations in kmol/m^3)."""
    mo_fri0 = [0.90, 0.05, 0.05]
    ct0 = data.calConcentration(mo_fri0, P, T, "kmol/m^3")
    rea_d = data.REACTOR["rea_D"]
    su_ga_ve = 0.2
    vo_fl_ra = (su_ga_ve / BED_POR) * BED_POR * (math.pi * rea_d**2 / 4)
    ga_dii = np.array([6.6151e-06, 2.1300e-06, 1.3911e-06])
    ga_th_coi = np.array([0.27886, 0.035373, 0.037870])
    return {
        "model": "M13",
        "operating-conditions": {
            "pressure": P, "temperature": T, "period": period,
            "process-type": "non-iso-thermal", "numerical-method": "fdm",
        },
        "feed": {
            "volumetric-flowrate": vo_fl_ra,
            "concentration": ct0,
            "superficial-velocity": su_ga_ve,
            "diffusivity": ga_dii,
            "viscosity": np.full(3, 1e-5),
            "mixture-viscosity": 1e-5,
            "thermal-conductivity": ga_th_coi,
            "mixture-thermal-conductivity": 0.125,
            "components": {"shell": list(COMP_LIST)},
        },
        "reactions": dict(REACTIONS),
        "reaction-rates": {
            "VARS": {
                "k0": 0.0072 * 1e3,                       # m^3/(kmol*s)
                "C_CH4": lambda x: x["SpCoi"][0],
            },
            "RATES": {"r1": lambda x: x["k0"] * x["C_CH4"] ** 2},
        },
        "external-heat": {"OvHeTrCo": 50.0, "EfHeTrAr": 4 / rea_d,
                          "MeTe": 0.0},
        "reactor": {
            "ReInDi": rea_d, "ReLe": 1.0, "PaDi": CAT_D,
            "BeVoFr": BED_POR, "CaBeDe": BULK_RHO, "CaDe": CAT_RHO,
            "CaSpHeCa": data.CATALYST["cat_Cp"] / 1000.0,
            "CaPo": data.CATALYST["cat_por"],
            "CaTo": data.CATALYST["cat_tor"],
            "CaThCo": data.CATALYST["therCop"],
        },
        "solver-config": {"ivp": "default", "root": "fsolve",
                          "mesh": "normal", "zNo": 8, "rNo": 5, "tNo": 4,
                          "display-result": "False"},
    }


def main():
    # --- 1. dynamic homogeneous run + checkpoint/resume -------------------
    full = rmtExe(n2_model_input(period=10.0))["resModel"]
    print("N2 CH4 coupling, one 10 s run:")
    last = full["dataPack"][-1]
    print("  outlet mole fractions:", dict(zip(COMP_LIST,
          np.asarray(last["dataYs"])[:3, -1].round(4))))

    half_a = rmtExe(n2_model_input(period=5.0))["resModel"]
    mi_b = n2_model_input(period=5.0)
    mi_b["resume-state"] = half_a["checkpoint"]
    half_b = rmtExe(mi_b)["resModel"]
    drift = np.max(np.abs(np.asarray(half_b["checkpoint"]["state"])
                          - np.asarray(full["checkpoint"]["state"])))
    print(f"  checkpoint/resume drift vs single run: {drift:.3e}")

    # --- 2. heterogeneous M13 run + vmapped design sweep -------------------
    res13 = rmtExe(m13_model_input())["resModel"]
    last13 = res13["dataPack"][-1]
    print("M13 CH4 coupling (gas/solid operator splitting):")
    print("  gas CH4 conc profile [kmol/m^3] at t = 10 s:",
          np.asarray(last13["dataYCon"])[0].round(5))

    from rmt_tpu.parallel import run_m13_sweep

    mi = m13_model_input()
    T0 = float(mi["operating-conditions"]["temperature"])
    sweep = {"T0": np.asarray([T0 - 10.0, T0, T0 + 10.0])}
    out = run_m13_sweep(mi, sweep)      # gas: (B, tNo, layers, zNo)
    theta_max = np.asarray(out["gas"])[:, -1, len(COMP_LIST), :].max(axis=1)
    print("  sweep max gas theta=(T-T0)/T0 per member:", theta_max.round(5))

    # --- 3. script-level plotting (reference plotClass surface) -----------
    if os.environ.get("RMT_TPU_EXAMPLE_PLOT"):
        from rmt_tpu.io.plot import plotClass

        xs = np.asarray(last["dataXs"])
        ys = np.asarray(last["dataYs"])
        xy = plotClass.plots2DSetXYList(xs, list(ys[:3]))
        items = plotClass.plots2DSetDataList(
            xy, plotClass.makeLabels(COMP_LIST))
        plotClass.plots2D(items, "dimensionless length", "mole fraction",
                          title="CH4 coupling, t = 10 s")


if __name__ == "__main__":
    main()
