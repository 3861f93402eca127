# M13: dynamic heterogeneous packed bed solved by operator splitting --
# a gas-phase PDE (method of lines with axial dispersion and Danckwerts
# inlet BC) coupled to a per-node steady catalyst-particle BVP through
# film mass/heat transfer at the gas-solid interface.
#
# Reference: PackedBedHeteroReactorClass.runM2 (PyREMOT/docs/
# pbHeterReactor.py:512-1220), gas RHS modelEquationM2 (:1222-2165), solid
# residual modelEquationM3 (:2167-2816). The reference alternates
# scipy.solve_ivp on the gas phase with scipy.optimize.fsolve on ONE big
# flattened solid system per time interval; here the gas phase is a
# vectorized-stencil RHS under the jittable Radau integrator and the solid
# BVP is a damped Newton vmapped over the axial nodes (each node's particle
# is independent -- a (varNo*rNo)^2 block per node instead of one
# (varNo*rNo*zNo)^2 system, and all nodes solve in parallel on the MXU).
#
# Reproduced reference semantics (quirk-for-quirk):
#   * dimensionless state: Ci* = Ci/max(Ci0) ("MAX" normalization mode),
#     theta = (T - Tf)/Tf; gas state (noLayer, 1, zNo), solid state
#     (noLayer, rNo, zNo) with radial index 0 = gas-solid interface;
#   * stencils act on the RAW state; EPS clamping only guards the mole
#     fractions / density / kinetics inputs (pbHeterReactor.py:1575,1791);
#   * the interphase mass flux enters the gas balance with a POSITIVE sign
#     (pbHeterReactor.py:1798,1997-2005) -- reproduced as written under
#     flux_sign=+1.0 for parity; the sign is anti-dissipative and makes the
#     gas phase unintegrable, so the driver runs with flux_sign=-1.0
#     (see make_m13_gas_rhs);
#   * v* = 1 (frozen velocity, :1599,1837) and the Ergun pressure march
#     feeds nothing downstream (P only reaches an unused volumetric
#     flowrate, :1629) -- so the march is omitted; solid kinetics use P0
#     (:2568 keeps P_z at P0 for every node);
#   * transport properties are FIX-mode feed values (modelSetting.py);
#     MaTrCo/HeTrCo are the fixed feed-state film coefficients;
#   * solid kinetics/energetics are evaluated in radial STORAGE order and
#     flipped center-first for the FD builders, whose mode="default" output
#     is flipped back (solFiDi.py:397-400) -- net effect: residual rows
#     align with the state layout, matching the reference bit-for-bit;
#   * the solid energy row is scaled by the REAL effective heat capacity
#     CosSp*Cp*CaPo + (1-CaPo)*CaDe*CaSpHeCa per radial node (:2688-2805).
#
# Driver-level deviation (documented, like M5): the reference's time loop
# re-integrates the gas phase from the SAME 1e-6 initial state every
# interval because the re-seed assigns to a dead variable
# (pbHeterReactor.py:1148 sets `IV`, never `IVGas`); the comment there says
# "update initial values". We implement the intended continuation (carry
# the gas state across intervals) and keep the reference's staggered
# exchange order: gas(i) sees the solid surface from interval i-1, solid(i)
# sees the gas bulk from interval i-1.

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPS_CONST, PI_CONST, Tref
from ..data import species as DB
from ..kinetics.dsl import RateProgram
from ..kinetics.stoich import Stoichiometry
from ..ops import particle_fd
from ..props import film, thermo


@dataclass(frozen=True)
class M13Spec:
    comp_list: tuple[str, ...]
    stoich: Stoichiometry = field(hash=False, compare=False)
    rates: RateProgram = field(hash=False, compare=False)
    z_no: int = 10        # solverSetting['T1']['zNo']
    r_no: int = 7         # solverSetting['T1']['rNo']['fdm']
    t_no: int = 5         # solverSetting['T1']['tNo']
    times_no: int = 5

    @property
    def n_comp(self) -> int:
        return len(self.comp_list)

    @property
    def n_layer(self) -> int:
        return self.n_comp + 1   # M13 always carries the temperature layer

    @property
    def comp_idx(self) -> np.ndarray:
        return DB.species_indices(self.comp_list)


def m13_build_spec(model_input: Mapping[str, Any], **overrides) -> M13Spec:
    comp_list = tuple(model_input["feed"]["components"]["shell"])
    rr = model_input["reaction-rates"]
    return M13Spec(
        comp_list=comp_list,
        stoich=Stoichiometry(model_input["reactions"], comp_list),
        rates=RateProgram(rr["VARS"], rr["RATES"]),
        **overrides,
    )


def m13_params(model_input: Mapping[str, Any]) -> dict[str, Any]:
    oc = model_input["operating-conditions"]
    feed = model_input["feed"]
    re_spec = model_input["reactor"]
    ex_he = model_input.get(
        "external-heat", {"OvHeTrCo": 0.0, "EfHeTrAr": 0.0, "MeTe": 0.0}
    )
    f = lambda x: jnp.asarray(x, dtype=jnp.result_type(float))
    return {
        "P0": f(oc["pressure"]),
        "T0": f(oc["temperature"]),
        "opT": f(oc.get("period", 1.0)),
        "VoFlRa0": f(feed["volumetric-flowrate"]),
        "SpCoi0": f(np.asarray(feed["concentration"], dtype=np.float64)),
        "vf": f(feed["superficial-velocity"]),
        "GaDii0": f(np.asarray(feed["diffusivity"], dtype=np.float64)),
        "GaViMix0": f(feed["mixture-viscosity"]),
        "GaThCoMix0": f(feed["mixture-thermal-conductivity"]),
        "U": f(ex_he["OvHeTrCo"]),
        "EfHeTrAr": f(ex_he["EfHeTrAr"]),
        "Tm": f(ex_he["MeTe"]),
        "ReInDi": f(re_spec["ReInDi"]),
        "ReLe": f(re_spec["ReLe"]),
        "PaDi": f(re_spec["PaDi"]),
        "BeVoFr": f(re_spec["BeVoFr"]),
        "CaBeDe": f(re_spec["CaBeDe"]),
        "CaDe": f(re_spec["CaDe"]),
        "CaSpHeCa": f(re_spec["CaSpHeCa"]),
        "CaPo": f(re_spec["CaPo"]),
        "CaTo": f(re_spec["CaTo"]),
        "kinetic_overrides": {
            k: f(v) for k, v in model_input.get("kinetic-overrides", {}).items()
        },
    }


def m13_feed(spec: M13Spec, p: Mapping[str, Any]) -> dict[str, Any]:
    """Feed-state scales, dimensionless groups, and FIX-mode transfer
    coefficients (pbHeterReactor.py:647-958)."""
    idx = spec.comp_idx
    mw = jnp.asarray(DB.MW[idx])
    cr_se_ar = PI_CONST * p["ReInDi"] ** 2 / 4
    sp_coi0 = p["SpCoi0"]
    sp_co0 = jnp.sum(sp_coi0)
    mo_fri0 = sp_coi0 / sp_co0
    mi_mo_we0 = thermo.mixture_molecular_weight(mo_fri0, mw, "kg/mol")
    ga_de0 = thermo.density_ig(mi_mo_we0, sp_co0 * 1000.0)
    cp_mean0 = thermo.cp_mean(p["T0"], idx)
    cp_mix0 = thermo.cp_mix(mo_fri0, cp_mean0)

    c_max = jnp.max(sp_coi0)
    vf = p["vf"]
    zf = p["ReLe"]
    rf = p["PaDi"] / 2

    # MAX normalization mode (modelSetting.py GaMaCoTe0 == "MAX")
    ga_ma_co_te0 = (vf / zf) * c_max                       # scalar, all comps
    ga_he_co_te0 = (ga_de0 * vf * p["T0"] * (cp_mix0 / mi_mo_we0) / zf) * 1e-3
    so_ma_di_te0 = (p["GaDii0"] * c_max) / rf**2           # (n_comp,)
    so_he_di_te0 = (p["GaThCoMix0"] * p["T0"] / rf**2) * 1e-3
    pe_ma0 = vf * zf / p["GaDii0"]
    pe_he0 = zf * ga_de0 * (cp_mix0 / mi_mo_we0) * vf / p["GaThCoMix0"]

    re0 = film.reynolds(ga_de0, vf, p["PaDi"], p["GaViMix0"])
    sc0 = film.schmidt(ga_de0, p["GaViMix0"], p["GaDii0"])
    sh0 = film.sherwood(sc0, re0, film.FROSSLING)
    pr0 = film.prandtl(cp_mix0, p["GaViMix0"], p["GaThCoMix0"], mi_mo_we0)
    nu0 = film.nusselt(pr0, re0)
    ma_tr_co = film.mass_transfer_coefficient(sh0, p["GaDii0"], p["PaDi"])
    he_tr_co = film.heat_transfer_coefficient(nu0, p["GaThCoMix0"], p["PaDi"])

    sp_su_ar = (3 / rf) * (1 - p["BeVoFr"])
    # the RHS recomputes the velocity scale from the volumetric flowrate
    # (pbHeterReactor.py:1482-1484), which need not equal the user's vf
    su_ga_ve0 = p["VoFlRa0"] / cr_se_ar
    return {
        "mw": mw,
        "Cmax": c_max,
        "MiMoWe0": mi_mo_we0,
        "GaDe0": ga_de0,
        "GaCpMeanMix0": cp_mix0,
        "GaMaCoTe0": ga_ma_co_te0,
        "GaHeCoTe0": ga_he_co_te0,
        "SoMaDiTe0": so_ma_di_te0,
        "SoHeDiTe0": so_he_di_te0,
        "PeNuMa0": pe_ma0,
        "PeNuHe0": pe_he0,
        "MaTrCo": ma_tr_co,
        "HeTrCo": he_tr_co,
        "SpSuAr": sp_su_ar,
        "vDl": su_ga_ve0 / vf,
    }


def _energetics(spec: M13Spec, T_real):
    """Heat of reaction [kJ/kmol] at T_real (rows of T)."""
    eq_cp_mean = thermo.cp_mean(T_real, spec.stoich.eq_idx)
    en_ch = (eq_cp_mean @ spec.stoich.eq_nu.T) * (
        jnp.asarray(T_real)[..., None] - Tref
    )
    return en_ch + jnp.asarray(spec.stoich.dh_rxn_25)


def m13_gas_initial_state(spec: M13Spec, p):
    """Gas IV: 1e-6 dimensionless concentrations, theta = 0
    (pbHeterReactor.py:745-753)."""
    c0 = jnp.full((spec.n_comp, spec.z_no), 1e-6, p["P0"].dtype)
    return jnp.concatenate([c0, jnp.zeros((1, spec.z_no), c0.dtype)]).reshape(-1)


def m13_solid_initial_state(spec: M13Spec, p):
    """Solid IV: 1e-6 everywhere incl. the temperature layer's
    concentration-style seed (pbHeterReactor.py:755-765 sets 1e-6 for ALL
    layers first, then overwrites the temperature layer with 0)."""
    y = jnp.full((spec.n_comp, spec.r_no, spec.z_no), 1e-6, p["P0"].dtype)
    t = jnp.zeros((1, spec.r_no, spec.z_no), y.dtype)
    return jnp.concatenate([y, t], axis=0)


def make_m13_gas_rhs(spec: M13Spec, flux_sign: float = 1.0):
    """Gas-phase MoL RHS, vectorized over z (reference modelEquationM2).

    y: flat (n_comp+1, zNo) dimensionless gas state; cs_surf (n_comp, zNo)
    and ts_surf (zNo,) are the dimensionless solid-surface interface values
    (InterfaceParams).

    flux_sign: +1.0 reproduces the reference's interphase-flux sign in the
    species balance (pbHeterReactor.py:1798,2004). That sign makes the gas
    phase linearly UNSTABLE -- d(dCi/dt)/dCi gains +MaTrCo*SpSuAr/BeVoFr
    (~ +40 1/s for the DME case), so any operation period beyond
    milliseconds diverges under every integrator (the reference ships no
    M13 test that would have caught this). The sister model
    pbReactor.modelEquationM7:5268 subtracts the same flux. The driver
    integrates with flux_sign=-1.0 (documented salvage, like M5); parity
    tests pin the quirk with +1.0."""
    idx = spec.comp_idx
    n_comp = spec.n_comp
    z_no = spec.z_no
    dz = 1.0 / (z_no - 1)

    def rhs(t, y, p, d, cs_surf, ts_surf):
        eps = p["BeVoFr"]
        Y = y.reshape(n_comp + 1, z_no)
        c_raw = Y[:n_comp]
        T_dl = Y[n_comp]

        c_cl = jnp.maximum(c_raw, EPS_CONST)
        c_re = c_cl * d["Cmax"]
        co_sp_re = jnp.sum(c_re, axis=0)
        T_re = T_dl * p["T0"] + p["T0"]
        mo_fri = c_re / co_sp_re                       # (n_comp, zNo)

        mi_mo_we = thermo.mixture_molecular_weight(mo_fri.T, d["mw"], "kg/mol")
        ga_de = thermo.density_ig(mi_mo_we, co_sp_re * 1000.0)
        ga_de_dl = ga_de / d["GaDe0"]

        cp_mean = thermo.cp_mean(T_re, idx)            # (zNo, n_comp)
        cp_mix = jnp.sum(mo_fri.T * cp_mean, axis=-1)
        cp_dl = cp_mix / d["GaCpMeanMix0"]

        # Qm in kJ/m^3.s; Tm == 0 means adiabatic (rmtUtility.py:437-444)
        qm = jnp.where(
            p["Tm"] == 0, 0.0, p["U"] * p["EfHeTrAr"] * (p["Tm"] - T_re)
        ) * 1e-3

        # interphase film flux on the RAW gas state (pbHeterReactor.py:1798)
        mo_fli = d["MaTrCo"][:, None] * d["Cmax"] * (c_raw - cs_surf)

        # --- species balances (BD convection, CD dispersion, Danckwerts BC1,
        # zero-gradient BC2; stencils on the raw state) ---
        inv_m = 1.0 / (d["PeNuMa0"] * dz)              # (n_comp,)
        c_in = p["SpCoi0"] / d["Cmax"]                 # Ci_0 in MAX mode
        c_ghost = (c_in + inv_m * c_raw[:, 1]) / (inv_m + 1.0)
        c_back = jnp.concatenate([c_ghost[:, None], c_raw[:, :-1]], axis=1)
        c_fwd = jnp.concatenate([c_raw[:, 1:], c_raw[:, -2:-1]], axis=1)
        dcdz = (c_raw - c_back) / dz
        d2c = (c_fwd - 2 * c_raw + c_back) / dz**2

        conv_c = -d["vDl"] * dcdz
        disp_c = (eps / d["PeNuMa0"])[:, None] * d2c   # GaDii_DiLeVa = 1
        flux_c = (1.0 / d["GaMaCoTe0"]) * mo_fli * d["SpSuAr"]
        dcdt = (p["vf"] / (eps * p["ReLe"])) * (
            conv_c + disp_c + flux_sign * flux_c
        )

        # --- energy balance ---
        inv_h = 1.0 / (d["PeNuHe0"] * dz)
        t_ghost = (inv_h * T_dl[1]) / (inv_h + 1.0)    # T*(inlet) = 0
        t_back = jnp.concatenate([t_ghost[None], T_dl[:-1]])
        t_fwd = jnp.concatenate([T_dl[1:], T_dl[-2:-1]])
        dtdz = (T_dl - t_back) / dz
        d2t = (t_fwd - 2 * T_dl + t_back) / dz**2

        conv_t = -d["vDl"] * ga_de_dl * cp_dl * dtdz
        disp_t = (1.0 / d["PeNuHe0"]) * (eps * 1.0) * d2t
        flux_t = (
            d["HeTrCo"] * d["SpSuAr"] * p["T0"] * (ts_surf - T_dl) * 1e-3
        ) / d["GaHeCoTe0"]
        exch_t = qm / d["GaHeCoTe0"]
        dtdt = (conv_t + disp_t + flux_t + exch_t) / (
            ga_de_dl * cp_dl * eps * (p["ReLe"] / p["vf"])
        )

        return jnp.concatenate([dcdt, dtdt[None]], axis=0).reshape(-1)

    return rhs


def make_m13_solid_node_residual(spec: M13Spec):
    """Per-axial-node steady particle residual (reference modelEquationM3
    for one z column). y_node: (n_layer, rNo) in the reference's radial
    STORAGE order (index 0 = gas-solid interface, rNo-1 = center);
    c_bulk (n_comp,), t_bulk scalars are the dimensionless gas bulk values
    (BulkParams). Returns the residual in the same layout."""
    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    nu_comp = jnp.asarray(spec.stoich.nu_comp)

    def residual(y_node, c_bulk, t_bulk, p, d):
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]

        cs_store = jnp.maximum(y_node[:n_comp], EPS_CONST)  # (n_comp, rNo)
        ts_store = y_node[n_comp]                            # (rNo,)
        cs_re = cs_store * d["Cmax"]
        ts_re = ts_store * p["T0"] + p["T0"]
        cos_sp_re = jnp.sum(cs_re, axis=0)                   # (rNo,)
        mo_frsi = (cs_re / cos_sp_re).T                      # (rNo, n_comp)

        # kinetics at each radial point; P stays at P0 for every node
        # (the reference's P_z march is the identity, pbHeterReactor.py:2568)
        rate_fn = lambda T_, mf_, sc_: spec.rates(
            T_, p["P0"], mf_, sc_, p["kinetic_overrides"]
        )
        r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(
            ts_re, mo_frsi, cs_re
        )                                                    # (n_rxn, rNo)
        ri_r = jnp.einsum("mk,mr->kr", nu_comp, r0)          # (n_comp, rNo)

        cp_mean_i = thermo.cp_mean(ts_re, idx)               # (rNo, n_comp)
        so_cp_mix = jnp.sum(mo_frsi * cp_mean_i, axis=-1)
        so_cp_eff_re = (
            cos_sp_re * so_cp_mix * ca_po
            + (1 - ca_po) * p["CaDe"] * p["CaSpHeCa"]
        )                                                    # (rNo,) storage

        he_re_t = _energetics(spec, ts_re)                   # (rNo, n_rxn)
        ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1)        # (rNo,) storage

        # flip storage -> center-first for the FD builders; the reference's
        # mode="default" flips the output back (solFiDi.py:397-400)
        cs_cf = cs_store[:, ::-1]
        ri_cf = ri_r[:, ::-1]
        ts_cf = ts_store[::-1]

        ri_term = (1.0 / d["SoMaDiTe0"])[:, None] * (1 - ca_po) * ri_cf

        def per_species(cs_i, ri_i, ma_i, cb_i, gdii0_i):
            a = particle_fd.build_c_residual(
                cs_i, ri_i, 1.0, ma_i, cb_i, gdii0_i, rf, flux_dir="rl"
            )
            return a[::-1] / (ca_po * rf**2 / gdii0_i)

        fc = jax.vmap(per_species)(
            cs_cf, ri_term, d["MaTrCo"], c_bulk, p["GaDii0"]
        )                                                    # (n_comp, rNo)

        dh_term = (1.0 / d["SoHeDiTe0"]) * (1 - ca_po) * (-ov_he_re_t[::-1])
        so_th_eff_conv = ca_po * p["GaThCoMix0"] / 1000.0
        a_t = particle_fd.build_t_residual(
            ts_cf, dh_term, ca_po * 1.0, d["HeTrCo"] / 1000.0,
            t_bulk, so_th_eff_conv, rf,
        )
        ft = a_t[::-1] / (so_cp_eff_re * p["T0"] / d["SoHeDiTe0"])

        return jnp.concatenate([fc, ft[None]], axis=0)

    return residual


def m11_initial_state(spec: M13Spec, p):
    """M11 IV (pbReactor.py:3991-4026): gas rows get the dimensionless feed
    profile, solid rows 1e-6, all temperatures 0. Layout
    (n_layer, rNo+1, zNo) with row 0 = gas, rows 1.. = particle (storage
    order, row 1 = gas-solid interface)."""
    c_in = p["SpCoi0"] / jnp.max(p["SpCoi0"])
    c_gas = jnp.tile(c_in[:, None, None], (1, 1, spec.z_no))
    c_sol = jnp.full((spec.n_comp, spec.r_no, spec.z_no), 1e-6, c_gas.dtype)
    t_all = jnp.zeros((1, spec.r_no + 1, spec.z_no), c_gas.dtype)
    return jnp.concatenate(
        [jnp.concatenate([c_gas, c_sol], axis=1), t_all], axis=0
    ).reshape(-1)


def make_m11_rhs(spec: M13Spec):
    """Coupled dynamic heterogeneous MoL RHS (reference modelEquationM7,
    pbReactor.py:4389-5491): one ODE system over (n_layer, rNo+1, zNo) --
    row 0 is the gas phase (axial dispersion + Danckwerts BC1, exactly the
    M13 gas phase), rows 1..rNo are the particle interior (dynamic version
    of the M13 solid residual). Quirk-for-quirk differences vs the M13
    pieces, as the reference writes them:
      * the interphase mass flux uses the CLAMPED solid surface
        concentration (pbReactor.py:4774,5062) and enters the gas balance
        with a NEGATIVE sign (:5268) -- the opposite sign convention of
        pbHeterReactor.modelEquationM2;
      * the particle reaction/enthalpy source terms are passed to the FD
        builders UNSCALED (:5288,5468 vs pbHeterReactor.py:2752,2790 --
        the (1/SoMaDiTe0)*(1-CaPo) factor is commented out inside the
        builders, solFiDi.py:377,502);
      * the particle's bulk values are the local RAW gas state at the same
        z node (:5288 Ci_c, :5468 T_c), not staggered interface params."""
    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    z_no = spec.z_no
    dz = 1.0 / (z_no - 1)
    nu_comp = jnp.asarray(spec.stoich.nu_comp)

    def rhs(t, y, p, d):
        eps = p["BeVoFr"]
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]
        Y = y.reshape(n_comp + 1, r_no + 1, z_no)
        c_raw = Y[:n_comp, 0, :]
        T_dl = Y[n_comp, 0, :]
        cs_store = Y[:n_comp, 1:, :]              # (n_comp, rNo, zNo)
        ts_store = Y[n_comp, 1:, :]               # (rNo, zNo)

        # ---------- gas phase ----------
        c_cl = jnp.maximum(c_raw, EPS_CONST)
        c_re = c_cl * d["Cmax"]
        co_sp_re = jnp.sum(c_re, axis=0)
        T_re = T_dl * p["T0"] + p["T0"]
        mo_fri = c_re / co_sp_re

        mi_mo_we = thermo.mixture_molecular_weight(mo_fri.T, d["mw"], "kg/mol")
        ga_de = thermo.density_ig(mi_mo_we, co_sp_re * 1000.0)
        ga_de_dl = ga_de / d["GaDe0"]

        cp_mean = thermo.cp_mean(T_re, idx)
        cp_mix = jnp.sum(mo_fri.T * cp_mean, axis=-1)
        cp_dl = cp_mix / d["GaCpMeanMix0"]

        qm = jnp.where(
            p["Tm"] == 0, 0.0, p["U"] * p["EfHeTrAr"] * (p["Tm"] - T_re)
        ) * 1e-3

        # interphase film flux: raw gas state vs CLAMPED solid surface
        cs_surf_cl = jnp.maximum(cs_store[:, 0, :], EPS_CONST)
        mo_fli = d["MaTrCo"][:, None] * d["Cmax"] * (c_raw - cs_surf_cl)
        ts_surf = ts_store[0, :]                   # raw

        inv_m = 1.0 / (d["PeNuMa0"] * dz)
        c_in = p["SpCoi0"] / d["Cmax"]
        c_ghost = (c_in + inv_m * c_raw[:, 1]) / (inv_m + 1.0)
        c_back = jnp.concatenate([c_ghost[:, None], c_raw[:, :-1]], axis=1)
        c_fwd = jnp.concatenate([c_raw[:, 1:], c_raw[:, -2:-1]], axis=1)
        dcdz = (c_raw - c_back) / dz
        d2c = (c_fwd - 2 * c_raw + c_back) / dz**2

        conv_c = -d["vDl"] * dcdz
        disp_c = (eps / d["PeNuMa0"])[:, None] * d2c
        # NEGATIVE interphase-flux sign (pbReactor.py:5268)
        flux_c = (1.0 / d["GaMaCoTe0"]) * mo_fli * d["SpSuAr"]
        dcdt_gas = (p["vf"] / (eps * p["ReLe"])) * (conv_c + disp_c - flux_c)

        inv_h = 1.0 / (d["PeNuHe0"] * dz)
        t_ghost = (inv_h * T_dl[1]) / (inv_h + 1.0)
        t_back = jnp.concatenate([t_ghost[None], T_dl[:-1]])
        t_fwd = jnp.concatenate([T_dl[1:], T_dl[-2:-1]])
        dtdz = (T_dl - t_back) / dz
        d2t = (t_fwd - 2 * T_dl + t_back) / dz**2

        conv_t = -d["vDl"] * ga_de_dl * cp_dl * dtdz
        disp_t = (1.0 / d["PeNuHe0"]) * (eps * 1.0) * d2t
        flux_t = (
            d["HeTrCo"] * d["SpSuAr"] * p["T0"] * (ts_surf - T_dl) * 1e-3
        ) / d["GaHeCoTe0"]
        exch_t = qm / d["GaHeCoTe0"]
        dtdt_gas = (conv_t + disp_t + flux_t + exch_t) / (
            ga_de_dl * cp_dl * eps * (p["ReLe"] / p["vf"])
        )

        # ---------- solid phase (per z node) ----------
        def solid_node(cs_node, ts_node, cb_node, tb_node):
            # cs_node (n_comp, rNo) storage order, ts_node (rNo,)
            cs_cl = jnp.maximum(cs_node, EPS_CONST)
            cs_re = cs_cl * d["Cmax"]
            ts_re = ts_node * p["T0"] + p["T0"]
            cos_sp_re = jnp.sum(cs_re, axis=0)
            mo_frsi = (cs_re / cos_sp_re).T

            rate_fn = lambda T_, mf_, sc_: spec.rates(
                T_, p["P0"], mf_, sc_, p["kinetic_overrides"]
            )
            r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(
                ts_re, mo_frsi, cs_re
            )
            ri_r = jnp.einsum("mk,mr->kr", nu_comp, r0)   # (n_comp, rNo)

            cp_mean_i = thermo.cp_mean(ts_re, idx)
            so_cp_mix = jnp.sum(mo_frsi * cp_mean_i, axis=-1)
            so_cp_eff_re = (
                cos_sp_re * so_cp_mix * ca_po
                + (1 - ca_po) * p["CaDe"] * p["CaSpHeCa"]
            )

            he_re_t = _energetics(spec, ts_re)
            ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1)

            cs_cf = cs_cl[:, ::-1]
            ri_cf = ri_r[:, ::-1]          # raw, unscaled (quirk)
            ts_cf = ts_node[::-1]

            def per_species(cs_i, ri_i, ma_i, cb_i, gdii0_i):
                a = particle_fd.build_c_residual(
                    cs_i, ri_i, 1.0, ma_i, cb_i, gdii0_i, rf, flux_dir="rl"
                )
                return a[::-1] / (ca_po * rf**2 / gdii0_i)

            dcs = jax.vmap(per_species)(
                cs_cf, ri_cf, d["MaTrCo"], cb_node, p["GaDii0"]
            )                                              # (n_comp, rNo)

            dh_raw = -ov_he_re_t[::-1]                     # raw (quirk)
            so_th_eff_conv = ca_po * p["GaThCoMix0"] / 1000.0
            a_t = particle_fd.build_t_residual(
                ts_cf, dh_raw, ca_po * 1.0, d["HeTrCo"] / 1000.0,
                tb_node, so_th_eff_conv, rf,
            )
            dts = a_t[::-1] / (so_cp_eff_re * p["T0"] / d["SoHeDiTe0"])
            return dcs, dts

        dcs_sol, dts_sol = jax.vmap(
            solid_node, in_axes=(2, 1, 1, 0), out_axes=(2, 2)
        )(cs_store, ts_store, c_raw, T_dl)

        dc = jnp.concatenate([dcdt_gas[:, None, :], dcs_sol], axis=1)
        dt = jnp.concatenate([dtdt_gas[None, :], dts_sol], axis=0)
        return jnp.concatenate([dc, dt[None]], axis=0).reshape(-1)

    return rhs


def make_m13_solid_residual(spec: M13Spec):
    """Full solid residual, vmapped over z: y (n_layer, rNo, zNo) ->
    residual of the same shape (exactly the reference's one flattened
    fsolve system, pbHeterReactor.py:2167-2816)."""
    node = make_m13_solid_node_residual(spec)

    def residual(y, c_bulk, t_bulk, p, d):
        return jax.vmap(node, in_axes=(2, 1, 0, None, None), out_axes=2)(
            y, c_bulk, t_bulk, p, d
        )

    return residual
