# Heterogeneous packed-bed models (reference ids M5, and the M13/M14 stack
# in later build steps).
#
# M5 (reference PackedBedHeteroReactorClass.runM1/modelEquationM1,
# PyREMOT/docs/pbHeterReactor.py:70-506): steady "plug-flow heterogenous
# reactor" in molar-flow variables. Reproduced quirks:
#   * kinetics are HARD-CODED first order in species 0 with
#     k = 8.2e14*exp(-284.5e3/RT)*1e7 -- the reference ignores the DSL here
#     (pbHeterReactor.py:428-437);
#   * formation rates are scaled by the catalyst bed density inside the
#     stoichiometry loop (pbHeterReactor.py:449);
#   * the reference's runM1 driver itself crashes (`for i in len(opTSpan)-1`
#     iterates an int, pbHeterReactor.py:204), so this implements the
#     intended single integration over z.

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ..constants import PI_CONST, R_CONST, Tref
from ..data import species as DB
from ..kinetics.stoich import Stoichiometry
from ..props import thermo


@dataclass(frozen=True)
class HeteroSpec:
    comp_list: tuple[str, ...]
    stoich: Stoichiometry = field(hash=False, compare=False)
    z_out: int = 25

    @property
    def n_comp(self) -> int:
        return len(self.comp_list)

    @property
    def comp_idx(self) -> np.ndarray:
        return DB.species_indices(self.comp_list)


def build_spec(model_input: Mapping[str, Any], **overrides) -> HeteroSpec:
    comp_list = tuple(model_input["feed"]["components"]["shell"])
    return HeteroSpec(
        comp_list=comp_list,
        stoich=Stoichiometry(model_input["reactions"], comp_list),
        **overrides,
    )


def build_params(model_input: Mapping[str, Any]) -> dict[str, Any]:
    oc = model_input["operating-conditions"]
    feed = model_input["feed"]
    re_spec = model_input["reactor"]
    ex_he = model_input.get("external-heat", {"OvHeTrCo": 0.0, "EfHeTrAr": 0.0, "MeTe": 0.0})
    f = lambda x: jnp.asarray(x, dtype=jnp.result_type(float))
    return {
        "P0": f(oc["pressure"]),
        "T0": f(oc["temperature"]),
        "MoFri0": f(np.asarray(feed["mole-fraction"], dtype=np.float64)),
        "MoFlRa0": f(feed["molar-flowrate"]),
        "GaMiVi": f(feed["mixture-viscosity"]),
        "U": f(ex_he["OvHeTrCo"]),
        "EfHeTrAr": f(ex_he["EfHeTrAr"]),
        "Tm": f(ex_he["MeTe"]),
        "ReInDi": f(re_spec["ReInDi"]),
        "ReLe": f(re_spec["ReLe"]),
        "PaDi": f(re_spec["PaDi"]),
        "BeVoFr": f(re_spec["BeVoFr"]),
        "CaBeDe": f(re_spec["CaBeDe"]),
    }


def m5_initial_state(spec: HeteroSpec, p):
    cr_se_ar = PI_CONST * p["ReInDi"] ** 2 / 4
    fi0 = p["MoFlRa0"] * p["MoFri0"]
    flux0 = p["MoFlRa0"] / cr_se_ar
    return jnp.concatenate([fi0, flux0[None], p["T0"][None], p["P0"][None]])


def make_m5_rhs(spec: HeteroSpec):
    idx = spec.comp_idx
    n_comp = spec.n_comp
    # stoichiometry of the FIRST reaction only (hard-coded kinetics)
    nu0 = jnp.asarray(spec.stoich.nu_comp[0])
    mw = jnp.asarray(DB.MW[idx])
    eq_idx = spec.stoich.eq_idx
    eq_nu = jnp.asarray(spec.stoich.eq_nu[0])
    dh25 = jnp.asarray(spec.stoich.dh_rxn_25[0])

    def rhs(z, y, p):
        cr_se_ar = PI_CONST * p["ReInDi"] ** 2 / 4
        fi = y[:n_comp]
        flux = y[n_comp]
        T = y[n_comp + 1]
        P = y[n_comp + 2]

        vo_fl = thermo.volumetric_flowrate_ig(P, T, fi)
        conc = fi / vo_fl
        conc_tot = jnp.sum(conc)
        mo_fri = conc / conc_tot
        su_ga_ve = flux * T * R_CONST / P

        mi_mo_we = thermo.mixture_molecular_weight(mo_fri, mw, "kg/mol")
        ga_de = thermo.density_ig(mi_mo_we, conc_tot)
        eps = p["BeVoFr"]
        erg_a = 150 * p["GaMiVi"] * su_ga_ve / p["PaDi"] ** 2
        erg_b = (1 - eps) ** 2 / eps**3
        erg_c = 1.75 * ga_de * su_ga_ve**2 / p["PaDi"]
        erg_d = (1 - eps) / eps**3
        dP = -(erg_a * erg_b + erg_c * erg_d)

        # hard-coded first-order kinetics (reference quirk)
        k1 = 8.2e14 * jnp.exp(-284.5e3 / (R_CONST * T)) * 1e7
        r0 = k1 * conc[0]
        ri = nu0 * r0 * p["CaBeDe"]
        ov_r = jnp.sum(ri)

        cp_mix = thermo.cp_mix(mo_fri, thermo.cp_mean(T, idx))
        en_ch = jnp.dot(thermo.cp_mean(T, eq_idx), eq_nu) * (T - Tref)
        ov_he_re_t = r0 * (en_ch + dh25)
        qm = p["U"] * p["EfHeTrAr"] * (p["Tm"] - T)

        dF = (cr_se_ar / eps) * ri
        dFlux = ov_r
        dT = (-ov_he_re_t + qm) / (flux * cp_mix)
        return jnp.concatenate([dF, dFlux[None], dT[None], dP[None]])

    return rhs
