# Plug-flow reactor model (reference model ids M0/M4).
#
# State: component molar flowrates Fi [mol/s] + temperature T [K],
# integrated along the reactor length [m]; no pressure drop.
# (reference: PyREMOT/docs/pfReactor.py:54-390. Note the reference RHS
# reads const['reactionListNo'] and const['dz'] that runM1 never supplies,
# so model M0/M4 crashes with KeyError in PyREMOT v1.0.17; this
# implementation reproduces the *intended* equations.)

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ..constants import PI_CONST, Tref
from ..data import species as DB
from ..kinetics.dsl import RateProgram
from ..kinetics.stoich import Stoichiometry
from ..props import thermo


@dataclass(frozen=True)
class PFSpec:
    comp_list: tuple[str, ...]
    stoich: Stoichiometry = field(hash=False, compare=False)
    rates: RateProgram = field(hash=False, compare=False)
    z_out: int = 100

    @property
    def n_comp(self) -> int:
        return len(self.comp_list)

    @property
    def comp_idx(self) -> np.ndarray:
        return DB.species_indices(self.comp_list)


def build_spec(model_input: Mapping[str, Any], **overrides) -> PFSpec:
    comp_list = tuple(model_input["feed"]["components"]["shell"])
    return PFSpec(
        comp_list=comp_list,
        stoich=Stoichiometry(model_input["reactions"], comp_list),
        rates=RateProgram(
            model_input["reaction-rates"]["VARS"],
            model_input["reaction-rates"]["RATES"],
        ),
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
        "U": f(ex_he["OvHeTrCo"]),
        "Tm": f(ex_he["MeTe"]),
        "ReInDi": f(re_spec["ReInDi"]),
        "ReLe": f(re_spec["ReLe"]),
        "kinetic_overrides": {
            k: f(v) for k, v in model_input.get("kinetic-overrides", {}).items()
        },
    }


def initial_state(spec: PFSpec, p):
    return jnp.concatenate([p["MoFlRa0"] * p["MoFri0"], p["T0"][None]])


def make_rhs(spec: PFSpec):
    """RHS over reactor length z [m] (reference: pfReactor.py:219-390)."""
    idx = spec.comp_idx
    n_comp = spec.n_comp
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    mw = jnp.asarray(DB.MW[idx])
    eq_idx = spec.stoich.eq_idx
    eq_nu = jnp.asarray(spec.stoich.eq_nu)
    dh25 = jnp.asarray(spec.stoich.dh_rxn_25)

    def rhs(z, y, p):
        cr_se_ar = PI_CONST * p["ReInDi"] ** 2 / 4
        fi = y[:n_comp]
        T = y[n_comp]
        P = p["P0"]                            # no pressure drop

        f_tot = jnp.sum(fi)
        vo_fl = thermo.volumetric_flowrate_ig(P, T, fi)
        conc = fi / vo_fl
        mo_fri = conc / jnp.sum(conc)

        r0 = spec.rates(T, P, mo_fri, conc, p["kinetic_overrides"])
        ri = r0 @ nu_comp

        cp_mean_i = thermo.cp_mean(T, idx)
        cp_mix = thermo.cp_mix(mo_fri, cp_mean_i)
        en_ch = (thermo.cp_mean(T, eq_idx) @ eq_nu.T) * (T - Tref)
        he_re_t = en_ch + dh25
        ov_he_re_t = jnp.dot(r0, he_re_t)
        qm = p["U"] * (4 / p["ReInDi"]) * (p["Tm"] - T)

        dF = cr_se_ar * ri
        dT = (cr_se_ar / (f_tot * cp_mix)) * (-ov_he_re_t + qm)
        return jnp.concatenate([dF, dT[None]])

    return rhs
