# Example: the canonical DME packed-bed case end-to-end.
#
# 1. Build the reference-format modelInput from the package data layer
#    (geometry defaults + feed helpers -- no external files needed).
# 2. Run one dynamic N2 simulation through the rmtExe compatibility API.
# 3. Sweep feed temperature over a lockstep TPU ensemble.
#
# Run: python examples/dme_n2_ensemble.py  (CPU works; TPU is ~100x faster)

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rmt_tpu import rmtExe  # noqa: E402
from rmt_tpu.data import defaults as data  # noqa: E402


def make_model_input(T=523.0, P=5e6, period=0.5):
    """The README DME configuration, built from the installed package
    alone (reference: PyREMOT/tests/test_rmt_N1_DME.py)."""
    comp_list = ["H2", "CO2", "H2O", "CO", "CH3OH", "DME"]
    mo_fri = data.setFeedMoleFraction(1.0, 0.5)
    ct0 = 1e3 * data.calConcentration(mo_fri, P, T)       # mol/m^3

    rea_d = data.REACTOR["rea_D"]
    bed_por = data.REACTOR["bed_por"]
    su_ga_ve = 0.2
    vo_fl_ra = (su_ga_ve / bed_por) * bed_por * (math.pi * rea_d**2 / 4)

    varis0 = {
        "CaBeDe": data.CATALYST["bulk_rho"],
        "RT": lambda x: x["R_CONST"] * x["T"],
        "K1": lambda x: 35.45 * math.exp(-1.7069e4 / x["RT"]),
        "K2": lambda x: 7.3976 * math.exp(-2.0436e4 / x["RT"]),
        "K3": lambda x: 8.2894e4 * math.exp(-5.2940e4 / x["RT"]),
        "KH2": lambda x: 0.249 * math.exp(3.4394e4 / x["RT"]),
        "KCO2": lambda x: 1.02e-7 * math.exp(6.74e4 / x["RT"]),
        "KCO": lambda x: 7.99e-7 * math.exp(5.81e4 / x["RT"]),
        "Ln_KP1": lambda x: 4213 / x["T"] - 5.752 * math.log(x["T"])
        - 1.707e-3 * x["T"] + 2.682e-6 * x["T"] ** 2
        - 7.232e-10 * x["T"] ** 3 + 17.6,
        "KP1": lambda x: math.exp(x["Ln_KP1"]),
        "log_KP2": lambda x: 2167 / x["T"] - 0.5194 * math.log10(x["T"])
        + 1.037e-3 * x["T"] - 2.331e-7 * x["T"] ** 2 - 1.2777,
        "KP2": lambda x: math.pow(10, x["log_KP2"]),
        "Ln_KP3": lambda x: 4019 / x["T"] + 3.707 * math.log(x["T"])
        - 2.783e-3 * x["T"] + 3.8e-7 * x["T"] ** 2
        - 6.56e-4 / x["T"] ** 3 - 26.64,
        "KP3": lambda x: math.exp(x["Ln_KP3"]),
        "yi_H2": lambda x: x["MoFri"][0],
        "yi_CO2": lambda x: x["MoFri"][1],
        "yi_H2O": lambda x: x["MoFri"][2],
        "yi_CO": lambda x: x["MoFri"][3],
        "yi_CH3OH": lambda x: x["MoFri"][4],
        "yi_DME": lambda x: x["MoFri"][5],
        "PH2": lambda x: x["P"] * x["yi_H2"] * 1e-5,
        "PCO2": lambda x: x["P"] * x["yi_CO2"] * 1e-5,
        "PH2O": lambda x: x["P"] * x["yi_H2O"] * 1e-5,
        "PCO": lambda x: x["P"] * x["yi_CO"] * 1e-5,
        "PCH3OH": lambda x: x["P"] * x["yi_CH3OH"] * 1e-5,
        "PCH3OCH3": lambda x: x["P"] * x["yi_DME"] * 1e-5,
        "ra1": lambda x: x["PCO2"] * x["PH2"],
        "ra2": lambda x: 1 + x["KCO2"] * x["PCO2"] + x["KCO"] * x["PCO"]
        + math.sqrt(x["KH2"] * x["PH2"]),
        "ra3": lambda x: (1 / x["KP1"]) * (
            (x["PH2O"] * x["PCH3OH"]) / (x["PCO2"] * x["PH2"] ** 3)
        ),
        "ra4": lambda x: x["PH2O"]
        - (1 / x["KP2"]) * ((x["PCO2"] * x["PH2"]) / x["PCO"]),
        "ra5": lambda x: (x["PCH3OH"] ** 2 / x["PH2O"])
        - (x["PCH3OCH3"] / x["KP3"]),
    }
    rates0 = {
        "r1": lambda x: 1000 * x["K1"] * (x["ra1"] / x["ra2"] ** 3)
        * (1 - x["ra3"]) * x["CaBeDe"],
        "r2": lambda x: 1000 * x["K2"] * (1 / x["ra2"]) * x["ra4"] * x["CaBeDe"],
        "r3": lambda x: 1000 * x["K3"] * x["ra5"] * x["CaBeDe"],
    }

    return {
        "model": "N2",
        "operating-conditions": {
            "pressure": P, "temperature": T, "period": period,
            "process-type": "non-iso-thermal",
        },
        "feed": {
            "volumetric-flowrate": vo_fl_ra,
            "concentration": ct0,
            "components": {"shell": comp_list},
        },
        "reactions": {
            "R1": "CO2 + 3H2 <=> CH3OH + H2O",
            "R2": "CO + H2O <=> H2 + CO2",
            "R3": "2CH3OH <=> DME + H2O",
        },
        "reaction-rates": {"VARS": varis0, "RATES": rates0},
        "external-heat": {
            "OvHeTrCo": 100.0, "EfHeTrAr": 4 / rea_d, "MeTe": T - 1,
        },
        "reactor": {
            "ReInDi": rea_d,
            "ReLe": data.REACTOR["rea_L"],
            "PaDi": data.CATALYST["cat_d"],
            "BeVoFr": bed_por,
            "CaBeDe": data.CATALYST["bulk_rho"],
            "CaDe": data.CATALYST["cat_rho"],
            "CaSpHeCa": data.CATALYST["cat_Cp"] / 1000.0,
        },
        "solver-config": {"ivp": "default", "display-result": "False"},
    }


def main():
    mi = make_model_input()

    # --- single run through the compatibility API ---
    res = rmtExe(mi)["resModel"]
    final = np.asarray(res["dataPack"][-1]["dataYs"])
    print("single N2 run: outlet mole fractions",
          dict(zip(["H2", "CO2", "H2O", "CO", "CH3OH", "DME"],
                   np.round(final[:6, -1], 4))))
    print("outlet temperature [K]:", round(float(final[6, -1]), 2))

    # --- ensemble sweep over feed temperature (TPU payoff) ---
    import jax.numpy as jnp

    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    offsets = np.linspace(-5.0, 5.0, B)
    ys, stats = run_n2_ensemble_lockstep(
        mi, {"T0": jnp.asarray(523.0 + offsets)}, rtol=1e-5, atol=1e-7
    )
    # dimensionless outlet CO2 of every member at the final time
    c_max = float(np.max(np.asarray(mi["feed"]["concentration"])))
    co2_out = np.asarray(ys[-1]).reshape(B, 7, 20)[:, 1, -1] * c_max
    print(f"{B}-member T0 sweep: outlet CO2 [mol/m^3] per member:",
          np.round(co2_out, 2))


if __name__ == "__main__":
    main()
