# Batch reactor model (reference id M3).
#
# The reference's batchReactorClass.runM3 is a non-functional stub
# (``sol = 1`` placeholder, PyREMOT/docs/batchReactor.py:57), so there is
# no oracle; this implements the standard well-mixed batch balance the stub
# advertises: dCi/dt = ri(C, T), dT/dt = (-dHr*R + Qm)/(Ct*Cp) at constant
# volume, using the same kinetics DSL and property engine as the other
# models.

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ..constants import Tref
from ..data import species as DB
from ..kinetics.dsl import RateProgram
from ..kinetics.stoich import Stoichiometry
from ..props import thermo


@dataclass(frozen=True)
class BatchSpec:
    comp_list: tuple[str, ...]
    iso_thermal: bool
    stoich: Stoichiometry = field(hash=False, compare=False)
    rates: RateProgram = field(hash=False, compare=False)
    t_out: int = 101

    @property
    def n_comp(self) -> int:
        return len(self.comp_list)

    @property
    def comp_idx(self) -> np.ndarray:
        return DB.species_indices(self.comp_list)


def build_spec(model_input: Mapping[str, Any], **overrides) -> BatchSpec:
    comp_list = tuple(model_input["feed"]["components"]["shell"])
    process_type = model_input["operating-conditions"].get("process-type", "iso-thermal")
    return BatchSpec(
        comp_list=comp_list,
        iso_thermal=(process_type == "iso-thermal"),
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
    ex_he = model_input.get("external-heat", {"OvHeTrCo": 0.0, "EfHeTrAr": 0.0, "MeTe": 0.0})
    f = lambda x: jnp.asarray(x, dtype=jnp.result_type(float))
    return {
        "P0": f(oc["pressure"]),
        "T0": f(oc["temperature"]),
        "opT": f(oc.get("period", 1.0)),
        "SpCoi0": f(np.asarray(feed["concentration"], dtype=np.float64)),
        "U": f(ex_he["OvHeTrCo"]),
        "EfHeTrAr": f(ex_he["EfHeTrAr"]),
        "Tm": f(ex_he["MeTe"]),
        "kinetic_overrides": {
            k: f(v) for k, v in model_input.get("kinetic-overrides", {}).items()
        },
    }


def initial_state(spec: BatchSpec, p):
    if spec.iso_thermal:
        return p["SpCoi0"]
    return jnp.concatenate([p["SpCoi0"], p["T0"][None]])


def make_rhs(spec: BatchSpec):
    idx = spec.comp_idx
    n_comp = spec.n_comp
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    eq_idx = spec.stoich.eq_idx
    eq_nu = jnp.asarray(spec.stoich.eq_nu)
    dh25 = jnp.asarray(spec.stoich.dh_rxn_25)

    def rhs(t, y, p):
        conc = y[:n_comp]
        T = y[n_comp] if not spec.iso_thermal else p["T0"]
        co_sp = jnp.sum(conc)
        mo_fri = conc / co_sp
        # ideal-gas pressure follows temperature/composition at constant V
        from ..constants import R_CONST

        P = co_sp * R_CONST * T

        r0 = spec.rates(T, P, mo_fri, conc, p["kinetic_overrides"])
        ri = r0 @ nu_comp
        out = [ri]
        if not spec.iso_thermal:
            cp_mix = thermo.cp_mix(mo_fri, thermo.cp_mean(T, idx))
            en_ch = (thermo.cp_mean(T, eq_idx) @ eq_nu.T) * (T - Tref)
            ov_he_re_t = jnp.dot(r0, en_ch + dh25)
            qm = jnp.where(p["Tm"] == 0, 0.0, p["U"] * p["EfHeTrAr"] * (p["Tm"] - T))
            dT = (-ov_he_re_t + qm) / (co_sp * cp_mix)
            out.append(dT[None])
        return jnp.concatenate(out)

    return rhs
