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


def make_m13_gas_rhs(spec: M13Spec, flux_sign: float = 1.0, mesh=None,
                     clamp_width: float = 0.0):
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
    tests pin the quirk with +1.0.

    mesh: a two_zone_mesh(...) result for solver-config mesh != "normal"
    (the reference's refined stencil branches,
    pbHeterReactor.py:1884-1945); None = uniform grid.

    clamp_width: 0.0 reproduces the reference's hard max(Ci, EPS) clamp
    (pbHeterReactor.py:1575). On refined meshes the inlet front
    undershoots (central-difference Gibbs oscillation, ~-8e-4 measured)
    and Radau stage values straddle the clamp boundary, where the hard
    clamp's Jacobian discontinuity (density/cp/mole-fraction branch flip)
    makes the modified Newton diverge for any h > ~3e-5 -- the step
    controller then thrashes at ~50% rejection and never finishes. A
    smooth C^1 clamp  0.5*(c + EPS + sqrt((c-EPS)^2 + w^2))  of width
    w ~ 1e-3 keeps the Jacobian continuous (changes c_cl by < w^2/(4c)
    ~ 1e-5 relative at feed-scale concentrations); the driver enables it
    for refined meshes only."""
    from ..ops import stencils as _st

    idx = spec.comp_idx
    n_comp = spec.n_comp
    z_no = spec.z_no
    dz = 1.0 / (z_no - 1)
    ws = _st.axial_stencil_weights(z_no, mesh)
    W1, W2, dz_bc1 = ws["W1"], ws["W2"], ws["dz_bc1"]

    def rhs(t, y, p, d, cs_surf, ts_surf):
        eps = p["BeVoFr"]
        Y = y.reshape(n_comp + 1, z_no)
        c_raw = Y[:n_comp]
        T_dl = Y[n_comp]

        if clamp_width > 0.0:
            c_cl = 0.5 * (
                c_raw + EPS_CONST
                + jnp.sqrt((c_raw - EPS_CONST) ** 2 + clamp_width**2)
            )
        else:
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
        inv_m = 1.0 / (d["PeNuMa0"] * dz_bc1)          # (n_comp,)
        c_in = p["SpCoi0"] / d["Cmax"]                 # Ci_0 in MAX mode
        c_ghost = (c_in + inv_m * c_raw[:, 1]) / (inv_m + 1.0)
        dcdz = _st.apply_axial_weights(W1, c_raw, c_ghost[:, None])
        d2c = _st.apply_axial_weights(W2, c_raw, c_ghost[:, None])

        conv_c = -d["vDl"] * dcdz
        disp_c = (eps / d["PeNuMa0"])[:, None] * d2c   # GaDii_DiLeVa = 1
        flux_c = (1.0 / d["GaMaCoTe0"]) * mo_fli * d["SpSuAr"]
        dcdt = (p["vf"] / (eps * p["ReLe"])) * (
            conv_c + disp_c + flux_sign * flux_c
        )

        # --- energy balance ---
        inv_h = 1.0 / (d["PeNuHe0"] * dz_bc1)
        t_ghost = (inv_h * T_dl[1]) / (inv_h + 1.0)    # T*(inlet) = 0
        dtdz = _st.apply_axial_weights(W1, T_dl, t_ghost)
        d2t = _st.apply_axial_weights(W2, T_dl, t_ghost)

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


def _gas_phase(spec: M13Spec, p, d, c_raw, T_dl, cs_surf, ts_surf, ws=None):
    """Shared gas-phase balance of the coupled dynamic hetero models
    (modelEquationM7 gas rows, pbReactor.py:5119-5451; modelEquationM8
    gas rows, :6846-7065): BD convection + CD dispersion with Danckwerts
    BC1, film exchange against the given solid-surface values, NEGATIVE
    interphase-flux sign. Returns (dcdt_gas, dtdt_gas, ga_de).

    ws: axial_stencil_weights(...) result for solver-config mesh !=
    "normal" (the reference's refined-mesh stencil branches,
    pbReactor.py:5148-5364); None = uniform grid."""
    from ..ops import stencils as _st

    idx = spec.comp_idx
    z_no = spec.z_no
    if ws is None:
        ws = _st.axial_stencil_weights(z_no)
    W1, W2, dz_bc1 = ws["W1"], ws["W2"], ws["dz_bc1"]
    eps = p["BeVoFr"]

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

    mo_fli = d["MaTrCo"][:, None] * d["Cmax"] * (c_raw - cs_surf)

    inv_m = 1.0 / (d["PeNuMa0"] * dz_bc1)
    c_in = p["SpCoi0"] / d["Cmax"]
    c_ghost = (c_in + inv_m * c_raw[:, 1]) / (inv_m + 1.0)
    dcdz = _st.apply_axial_weights(W1, c_raw, c_ghost[:, None])
    d2c = _st.apply_axial_weights(W2, c_raw, c_ghost[:, None])

    conv_c = -d["vDl"] * dcdz
    disp_c = (eps / d["PeNuMa0"])[:, None] * d2c
    flux_c = (1.0 / d["GaMaCoTe0"]) * mo_fli * d["SpSuAr"]
    dcdt_gas = (p["vf"] / (eps * p["ReLe"])) * (conv_c + disp_c - flux_c)

    inv_h = 1.0 / (d["PeNuHe0"] * dz_bc1)
    t_ghost = (inv_h * T_dl[1]) / (inv_h + 1.0)
    dtdz = _st.apply_axial_weights(W1, T_dl, t_ghost)
    d2t = _st.apply_axial_weights(W2, T_dl, t_ghost)

    conv_t = -d["vDl"] * ga_de_dl * cp_dl * dtdz
    disp_t = (1.0 / d["PeNuHe0"]) * (eps * 1.0) * d2t
    flux_t = (
        d["HeTrCo"] * d["SpSuAr"] * p["T0"] * (ts_surf - T_dl) * 1e-3
    ) / d["GaHeCoTe0"]
    exch_t = qm / d["GaHeCoTe0"]
    dtdt_gas = (conv_t + disp_t + flux_t + exch_t) / (
        ga_de_dl * cp_dl * eps * (p["ReLe"] / p["vf"])
    )
    return dcdt_gas, dtdt_gas, ga_de


def _ergun_march(p, d, ga_de, dz):
    """Explicit Ergun pressure march on the real gas density: node z sees
    P0 + dz*sum_{k<z} RHS_ergun(GaDe_k) (pbReactor.py:4856-4865). Frozen
    for differentiation so the MoL Jacobian keeps the tridiagonal-gas/
    local-solid sparsity the two-phase coloring assumes (the march couples
    every upstream gas node into the solid kinetics, a ~1% effect)."""
    eps = p["BeVoFr"]
    su_ga_ve_re = d["vDl"] * p["vf"]
    erg_a = 150.0 * p["GaViMix0"] * su_ga_ve_re / p["PaDi"] ** 2
    erg_b = (1 - eps) ** 2 / eps**3
    erg_c = 1.75 * ga_de * su_ga_ve_re**2 / p["PaDi"]
    erg_d = (1 - eps) / eps**3
    rhs_erg = -(erg_a * erg_b + erg_c * erg_d)
    p_march = p["P0"] + dz * jnp.concatenate(
        [jnp.zeros((1,), rhs_erg.dtype), jnp.cumsum(rhs_erg)[:-1]]
    )
    return jax.lax.stop_gradient(p_march)


def make_m11_rhs(spec: M13Spec, scaled_sources: bool = True, mesh=None):
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
      * the particle's bulk values are the local RAW gas state at the same
        z node (:5288 Ci_c, :5468 T_c), not staggered interface params;
      * the Ergun pressure march is LIVE here: the solid kinetics at node z
        use P_z[z] = P0 + dz*sum_{k<z} RHS_ergun(GaDe_k) (:4856-4865,4953),
        unlike modelEquationM3 whose march is the identity.

    scaled_sources: the reference passes the particle reaction/enthalpy
    sources to the FD builders UNSCALED (:5288,5468), omitting the
    (1/SoMaDiTe0)*(1-CaPo) factor that its own builders document as the
    call-site's job (commented out inside them, solFiDi.py:377,502) and
    that BOTH sibling models apply (modelEquationM3,
    pbHeterReactor.py:2752,2790; modelEquationM8, pbReactor.py:6779,7022).
    The omission makes the solid rows ~1e8x too fast -- the Jacobian
    reaches Re(lambda) = -5e13 and NO integrator advances past ~1e-8 s
    (the reference ships no test that runs this model). The driver
    integrates the dimensionally consistent scaled form (default); parity
    tests pin the raw quirk with scaled_sources=False."""
    from ..ops import stencils as _st

    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    z_no = spec.z_no
    # refined-mesh quirk: the reference's Ergun march steps by the
    # NORMAL-zone dz at every interval, dense nodes included
    # (FiDiMeshGenerator data5, solFiDi.py:812; pbReactor.py:4865)
    dz = float(mesh["dz_uniform"]) if mesh is not None else 1.0 / (z_no - 1)
    ws = _st.axial_stencil_weights(z_no, mesh)
    nu_comp = jnp.asarray(spec.stoich.nu_comp)

    def rhs(t, y, p, d):
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]
        Y = y.reshape(n_comp + 1, r_no + 1, z_no)
        c_raw = Y[:n_comp, 0, :]
        T_dl = Y[n_comp, 0, :]
        cs_store = Y[:n_comp, 1:, :]              # (n_comp, rNo, zNo)
        ts_store = Y[n_comp, 1:, :]               # (rNo, zNo)

        # gas phase: film exchange against the CLAMPED solid surface row
        # (pbReactor.py:4774,5062) and the raw surface temperature
        cs_surf_cl = jnp.maximum(cs_store[:, 0, :], EPS_CONST)
        ts_surf = ts_store[0, :]
        dcdt_gas, dtdt_gas, ga_de = _gas_phase(
            spec, p, d, c_raw, T_dl, cs_surf_cl, ts_surf, ws=ws
        )
        p_march = _ergun_march(p, d, ga_de, dz)

        # ---------- solid phase (per z node) ----------
        def solid_node(cs_node, ts_node, cb_node, tb_node, p_node):
            # cs_node (n_comp, rNo) storage order, ts_node (rNo,)
            cs_cl = jnp.maximum(cs_node, EPS_CONST)
            cs_re = cs_cl * d["Cmax"]
            ts_re = ts_node * p["T0"] + p["T0"]
            cos_sp_re = jnp.sum(cs_re, axis=0)
            mo_frsi = (cs_re / cos_sp_re).T

            rate_fn = lambda T_, mf_, sc_: spec.rates(
                T_, p_node, mf_, sc_, p["kinetic_overrides"]
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
            if scaled_sources:
                ri_cf = (
                    (1.0 / d["SoMaDiTe0"])[:, None] * (1 - ca_po) * ri_r
                )[:, ::-1]
            else:
                ri_cf = ri_r[:, ::-1]      # raw (reference quirk)
            ts_cf = ts_node[::-1]

            def per_species(cs_i, ri_i, ma_i, cb_i, gdii0_i):
                a = particle_fd.build_c_residual(
                    cs_i, ri_i, 1.0, ma_i, cb_i, gdii0_i, rf, flux_dir="rl"
                )
                return a[::-1] / (ca_po * rf**2 / gdii0_i)

            dcs = jax.vmap(per_species)(
                cs_cf, ri_cf, d["MaTrCo"], cb_node, p["GaDii0"]
            )                                              # (n_comp, rNo)

            dh = -ov_he_re_t[::-1]
            if scaled_sources:
                dh = (1.0 / d["SoHeDiTe0"]) * (1 - ca_po) * dh
            so_th_eff_conv = ca_po * p["GaThCoMix0"] / 1000.0
            a_t = particle_fd.build_t_residual(
                ts_cf, dh, ca_po * 1.0, d["HeTrCo"] / 1000.0,
                tb_node, so_th_eff_conv, rf,
            )
            dts = a_t[::-1] / (so_cp_eff_re * p["T0"] / d["SoHeDiTe0"])
            return dcs, dts

        dcs_sol, dts_sol = jax.vmap(
            solid_node, in_axes=(2, 1, 1, 0, 0), out_axes=(2, 1)
        )(cs_store, ts_store, c_raw, T_dl, p_march)

        dc = jnp.concatenate([dcdt_gas[:, None, :], dcs_sol], axis=1)
        dt = jnp.concatenate([dtdt_gas[None, :], dts_sol], axis=0)
        return jnp.concatenate([dc, dt[None]], axis=0).reshape(-1)

    return rhs


def make_m12_rhs(spec: M13Spec, cp_at_real_temperature: bool = True,
                 clamp_interface: bool = False, mesh=None):
    """Coupled dynamic heterogeneous MoL RHS with an orthogonal-collocation
    particle and an algebraically-updated (static) gas-solid interface
    (reference modelEquationM8, pbReactor.py:6050-7181). Gas rows are the
    shared _gas_phase balance; solid rows 1..rNo are the OC points of
    ops.collocation (center-first, row rNo = surface x=1).

    Documented salvage -- the reference's own M8 path cannot run:
      * every buildOrCoMatrix call passes const3=() and crashes in
        buildLhsMatrix (constCT2[1], solCatParticle.py:150); the intended
        Robin row is reconstructed in ops.oc_particle;
      * the (N,1)-shaped interface vector broadcasts RY+f into an (N,N)
        matrix (solCatParticle.py:229-232), and the mode="default" output
        flip permutes the radial rows; both fixed by the aligned
        oc_residual;
      * per the runM8 docstring the interface is STATIC: its state row is
        dead storage (derivative 0 -- the Robin row of the residual is
        exactly zero after the update); physics and outputs use the
        algebraically-updated surface value;
      * cp_at_real_temperature=False reproduces the reference's unit bug
        of evaluating solid Cp and reaction enthalpy at the DIMENSIONLESS
        temperature theta ~ 0.05 K (pbReactor.py:6665,6684 use Ts_r[r]
        where modelEquationM7:4994,5007 use Ts_r_ReVa[r]); the default
        uses the real temperature.

    Retained quirks (as the reference computes them where it runs):
      * scaled particle sources _Ri = (1/SoMaDiTe0)*(1-CaPo)*ri and
        _H = (1/SoHeDiTe0)*(1-CaPo)*(-OvHeReT) (:6779,7022) -- unlike
        modelEquationM7's raw terms;
      * kinetics evaluate the STORED (clamped) particle state incl. the
        dead surface row (:6659-6670) with the live Ergun pressure march;
      * interface transfer numbers betaC = (rf/GaDii0)*MaTrCo,
        betaT = -(rf/(CaPo*GaThCoMix0/1000))*(HeTrCo/1000)/CaPo
        (:6771-6775,7015-7019)."""
    from ..ops import oc_particle

    from ..ops import stencils as _st

    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    z_no = spec.z_no
    # same refined-mesh Ergun-march quirk as M11 (normal-zone dz)
    dz = float(mesh["dz_uniform"]) if mesh is not None else 1.0 / (z_no - 1)
    ws = _st.axial_stencil_weights(z_no, mesh)
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    ops = oc_particle.oc_operator()
    assert ops["N"] == r_no, (
        f"M12 uses the {ops['N']}-point OC basis; got rNo={r_no}"
    )

    def rhs(t, y, p, d):
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]
        Y = y.reshape(n_comp + 1, r_no + 1, z_no)
        c_raw = Y[:n_comp, 0, :]
        T_dl = Y[n_comp, 0, :]
        cs_store = Y[:n_comp, 1:, :]              # (n_comp, rNo, zNo) OC order
        ts_store = Y[n_comp, 1:, :]               # (rNo, zNo)

        # --- algebraic interface update (vectorized over species x z) ---
        cs_cl = jnp.maximum(cs_store, EPS_CONST)
        beta_c = (rf / p["GaDii0"]) * d["MaTrCo"]                # (n_comp,)
        cs_hat = oc_particle.interface_update(
            jnp.moveaxis(cs_cl, 1, 2),                           # (n_comp, zNo, rNo)
            c_raw, beta_c[:, None], ops["A"],
        )
        cs_hat = jnp.moveaxis(cs_hat, 2, 1)                      # back to (n_comp, rNo, zNo)
        if clamp_interface:
            # non-negative interface projection: the OC surface
            # extrapolation row has large alternating coefficients
            # (A[-1] ~ [0.5, -2, 5, -11, 24, -67, 51]) and the eliminated
            # surface value swings negative during transients, kicking the
            # EPS-clamped kinetics and collapsing the step size; the
            # driver projects it onto the physical region (parity tests
            # pin the raw elimination)
            cs_hat = jnp.maximum(cs_hat, EPS_CONST)

        so_th_eff_conv = ca_po * p["GaThCoMix0"] / 1000.0
        beta_t = (rf / so_th_eff_conv) * (-(d["HeTrCo"] / 1000.0) / ca_po)
        ts_hat = oc_particle.interface_update(
            ts_store.T, T_dl, beta_t, ops["A"]
        ).T                                                      # (rNo, zNo)

        # --- gas phase against the updated surface values ---
        dcdt_gas, dtdt_gas, ga_de = _gas_phase(
            spec, p, d, c_raw, T_dl, cs_hat[:, -1, :], ts_hat[-1, :], ws=ws
        )
        p_march = _ergun_march(p, d, ga_de, dz)

        # --- solid phase (per z node) ---
        def solid_node(cs_node_cl, cs_node_hat, ts_node, ts_node_hat, p_node):
            # kinetics/energetics on the STORED clamped state (quirk)
            cs_re = cs_node_cl * d["Cmax"]
            ts_re = ts_node * p["T0"] + p["T0"]
            cos_sp_re = jnp.sum(cs_re, axis=0)
            mo_frsi = (cs_re / cos_sp_re).T

            rate_fn = lambda T_, mf_, sc_: spec.rates(
                T_, p_node, mf_, sc_, p["kinetic_overrides"]
            )
            r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(
                ts_re, mo_frsi, cs_re
            )
            ri_r = jnp.einsum("mk,mr->kr", nu_comp, r0)          # (n_comp, rNo)

            t_for_cp = ts_re if cp_at_real_temperature else ts_node
            cp_mean_i = thermo.cp_mean(t_for_cp, idx)
            so_cp_mix = jnp.sum(mo_frsi * cp_mean_i, axis=-1)
            so_cp_eff_re = (
                cos_sp_re * so_cp_mix * ca_po
                + (1 - ca_po) * p["CaDe"] * p["CaSpHeCa"]
            )
            he_re_t = _energetics(spec, t_for_cp)
            ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1)        # (rNo,)

            ri_term = (1.0 / d["SoMaDiTe0"])[:, None] * (1 - ca_po) * ri_r
            k_c = (ca_po / p["CaTo"]) * 1.0                      # SoDiiEff_DiLe
            res_c = jax.vmap(
                lambda ys, src, b, cb: oc_particle.oc_residual(
                    ys, k_c, src, b, cb, ops
                )
            )(cs_node_hat, ri_term, beta_c, jnp.zeros_like(beta_c))
            dcs = res_c * (p["GaDii0"] / (ca_po * rf**2))[:, None]

            dh_term = (1.0 / d["SoHeDiTe0"]) * (1 - ca_po) * (-ov_he_re_t)
            res_t = oc_particle.oc_residual(
                ts_node_hat, ca_po * 1.0, dh_term, beta_t, 0.0, ops
            )
            dts = res_t / (so_cp_eff_re * p["T0"] / d["SoHeDiTe0"])
            # the surface (Robin) row is exactly zero after the algebraic
            # update for any bulk value -- pin it so the dead storage row
            # carries no roundoff drift
            dcs = dcs.at[:, -1].set(0.0)
            dts = dts.at[-1].set(0.0)
            return dcs, dts

        dcs_sol, dts_sol = jax.vmap(
            solid_node, in_axes=(2, 2, 1, 1, 0), out_axes=(2, 1)
        )(cs_cl, cs_hat, ts_store, ts_hat, p_march)

        dc = jnp.concatenate([dcdt_gas[:, None, :], dcs_sol], axis=1)
        dt = jnp.concatenate([dtdt_gas[None, :], dts_sol], axis=0)
        return jnp.concatenate([dc, dt[None]], axis=0).reshape(-1)

    return rhs


def m12_surface_values(spec: M13Spec, p, d, y):
    """Recompute the algebraic gas-solid interface values for output
    post-processing (the state's surface row is dead storage)."""
    from ..ops import oc_particle

    n_comp, r_no, z_no = spec.n_comp, spec.r_no, spec.z_no
    rf = p["PaDi"] / 2
    ops = oc_particle.oc_operator()
    Y = y.reshape(n_comp + 1, r_no + 1, z_no)
    cs_cl = jnp.maximum(Y[:n_comp, 1:, :], EPS_CONST)
    beta_c = (rf / p["GaDii0"]) * d["MaTrCo"]
    cs_hat = jnp.moveaxis(
        oc_particle.interface_update(
            jnp.moveaxis(cs_cl, 1, 2), Y[:n_comp, 0, :], beta_c[:, None],
            ops["A"],
        ), 2, 1,
    )
    so_th_eff_conv = p["CaPo"] * p["GaThCoMix0"] / 1000.0
    beta_t = (rf / so_th_eff_conv) * (-(d["HeTrCo"] / 1000.0) / p["CaPo"])
    ts_hat = oc_particle.interface_update(
        Y[n_comp, 1:, :].T, Y[n_comp, 0, :], beta_t, ops["A"]
    ).T
    return cs_hat, ts_hat


# hard-coded film-property constants of the reference's M6 RHS
# (pbReactor.py:3398 GaViMix = 2.5e-5, :3415 GaThCoMix = 0.125)
_M10_GA_VI_MIX = 2.5e-5
_M10_GA_TH_CO_MIX = 0.125


def m10_params(model_input: Mapping[str, Any]) -> dict[str, Any]:
    """M10 inputs (reference runM6, pbReactor.py:2668-2860). The reference
    RHS hard-codes the DME transport vectors (GaDii :3432, GaThCoi :3411);
    we read the diffusivities from the feed -- passing the reference's
    values reproduces it exactly."""
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
        "GaDii": f(np.asarray(feed["diffusivity"], dtype=np.float64)),
        "GaMiVi": f(feed["mixture-viscosity"]),
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
        "CaThCo": f(re_spec["CaThCo"]),
        "kinetic_overrides": {
            k: f(v) for k, v in model_input.get("kinetic-overrides", {}).items()
        },
    }


def m10_initial_state(spec: M13Spec, p):
    """M10 IV (pbReactor.py:2786-2813): feed concentrations and feed
    temperature EVERYWHERE (gas and particle), real units."""
    c = jnp.tile(p["SpCoi0"][:, None, None], (1, spec.r_no + 1, spec.z_no))
    t = jnp.full((1, spec.r_no + 1, spec.z_no), p["T0"], c.dtype)
    return jnp.concatenate([c, t], axis=0).reshape(-1)


def make_m10_rhs(spec: M13Spec, clamp_interface: bool = False):
    """Dynamic heterogeneous packed bed in REAL units with an OC particle
    and live velocity/pressure marches (reference modelEquationM6,
    pbReactor.py:3053-3801). State (n_layer, rNo+1, zNo): row 0 gas
    [kmol/m^3, K], rows 1..rNo the OC points center-first.

    Documented salvage (the reference M6 RHS cannot run -- same
    solCatParticle crash bugs as M8, see make_m12_rhs): the OC rows are
    kept aligned with their collocation points and the static surface row
    carries zero derivative.

    Retained quirks, as the reference computes them:
      * gas-solid film fluxes use the STORED innermost OC row as the
        "catalyst surface" (CosSpi_cat = CosSpi_r[0] :3326,3584; _Ts_r[0]
        :3768) -- not the algebraically-updated surface;
      * film coefficients recomputed per node from Re/Sc/Sh/Pr/Nu with the
        hard-coded GaViMix=2.5e-5 / GaThCoMix=0.125 (:3398,3415,3440-3448,
        3537-3542) while the Ergun equation uses the feed viscosity;
      * BC2 sets the FORWARD neighbor to 0 (not zero-gradient) for both
        species and temperature stencils (:3679,3750), and interior
        backward neighbors are EPS-clamped (:3681,3686);
      * axial heat dispersion is multiplied by zero (:3764);
      * the velocity march integrates dv/dz from the EOS/flux balance
        (:3619-3627) and the gas balance carries the -Ci*dv/dz term;
      * solid heat capacity uses the GAS mixture Cp at the gas temperature,
        one value per z (:3510).

    The (P, v) march and the film coefficients derived from it are frozen
    for differentiation (stop_gradient) so the Jacobian keeps the
    tridiagonal-gas/local-solid sparsity of the two-phase coloring; the
    film-flux terms themselves are recomputed with live states."""
    from ..constants import R_CONST
    from ..ops import oc_particle

    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    z_no = spec.z_no
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    ops = oc_particle.oc_operator()
    assert ops["N"] == r_no, (
        f"M10 uses the {ops['N']}-point OC basis; got rNo={r_no}"
    )
    mw = jnp.asarray(DB.MW[idx])

    def rhs(t, y, p, d=None):
        eps = p["BeVoFr"]
        pa_ra = p["PaDi"] / 2
        ca_po = p["CaPo"]
        dz = p["ReLe"] / (z_no - 1)
        cr_se_ar = PI_CONST * p["ReInDi"] ** 2 / 4
        sp_su_ar = (3 / pa_ra) * (1 - eps)
        so_dii_eff = (ca_po / p["CaTo"]) * p["GaDii"]
        so_th_co_eff = p["CaThCo"] * (1 - ca_po) / p["CaTo"]

        Y = y.reshape(n_comp + 1, r_no + 1, z_no)
        c_raw = Y[:n_comp, 0, :]
        T_z = Y[n_comp, 0, :]
        cs_store = Y[:n_comp, 1:, :]
        ts_store = Y[n_comp, 1:, :]

        # --- per-node gas state (vectorized) ---
        c_cl = jnp.maximum(c_raw, EPS_CONST)
        co_sp = jnp.sum(c_cl, axis=0)
        mo_fri = c_cl / co_sp
        mi_mo_we = thermo.mixture_molecular_weight(mo_fri.T, mw, "kg/mol")
        ga_de = thermo.density_ig(mi_mo_we, co_sp * 1000.0)
        cp_mean = thermo.cp_mean(T_z, idx)
        ga_cp_mix = jnp.sum(mo_fri.T * cp_mean, axis=-1)

        v0 = p["VoFlRa0"] / cr_se_ar                 # SuGaVe0 (:3205-3207)
        ga_th_co_eff = eps * _M10_GA_TH_CO_MIX

        # dT/dz for the dv/dz balance; BC1 ghost via the /1000 constant
        # (:3602), BC2/interior use the backward state value
        mo_fl0 = co_sp[0] * v0
        c1_v = ga_th_co_eff / (mo_fl0 * ga_cp_mix[0] / 1000.0)
        t_b0_v = (p["T0"] * dz + c1_v * T_z[1]) / (dz + c1_v)
        t_back_v = jnp.concatenate([t_b0_v[None], T_z[:-1]])
        dxdt_v_T = (T_z - t_back_v) / dz

        # clamped stored "surface" rows for the film fluxes (:3320,3326)
        cs_surf_st = jnp.maximum(cs_store[:, 0, :], EPS_CONST)
        ts_surf_st = ts_store[0, :]

        # --- (P, v) march with film coefficients (sequential in z) ---
        def march(carry, inp):
            P, v = carry
            ga_de_z, co_sp_z, T_c, dvT, cp_z, mimo_z, c_z, cs_z = inp
            erg_a = 150.0 * p["GaMiVi"] * v / p["PaDi"] ** 2
            erg_b = (1 - eps) ** 2 / eps**3
            erg_c = 1.75 * ga_de_z * v**2 / p["PaDi"]
            erg_d = (1 - eps) / eps**3
            dxdt_p = -(erg_a * erg_b + erg_c * erg_d)

            re_nu = film.reynolds(ga_de_z, v, p["PaDi"], _M10_GA_VI_MIX)
            sc_nu = film.schmidt(ga_de_z, _M10_GA_VI_MIX, p["GaDii"])
            sh_nu = film.sherwood(sc_nu, re_nu, film.FROSSLING)
            ma_tr = film.mass_transfer_coefficient(sh_nu, p["GaDii"], p["PaDi"])
            pr_nu = film.prandtl(cp_z, _M10_GA_VI_MIX, _M10_GA_TH_CO_MIX, mimo_z)
            nu_nu = film.nusselt(pr_nu, re_nu)
            he_tr = film.heat_transfer_coefficient(
                nu_nu, _M10_GA_TH_CO_MIX, p["PaDi"]
            )

            mo_fli = ma_tr * (c_z - cs_z)
            to_ma_tr = jnp.sum(mo_fli) * sp_su_ar
            dxdt_v = (1.0 / (co_sp_z * 1000.0)) * (
                (-v / R_CONST) * ((1.0 / T_c) * dxdt_p - (P / T_c**2) * dvT)
                - to_ma_tr * 1000.0
            )
            out = (P, v, dxdt_v, ma_tr, he_tr)
            # velocity floor (driver salvage): the dv/dz balance drains the
            # superficial velocity via interphase absorption and crosses
            # zero within one dz once gas-solid gaps grow; Re < 0 then
            # NaNs the film correlations (Re^0.6) in the reference and
            # here alike. Floor at 5% of the inlet velocity.
            v_next = jnp.maximum(v + dz * dxdt_v, 0.05 * v0)
            return (P + dz * dxdt_p, v_next), out

        (_, _), (P_z, v_z, dxdt_v, ma_tr_z, he_tr_z) = jax.lax.scan(
            march, (p["P0"], v0),
            (ga_de, co_sp, T_z, dxdt_v_T, ga_cp_mix, mi_mo_we,
             c_raw.T, cs_surf_st.T),
        )
        P_z = jax.lax.stop_gradient(P_z)
        v_z = jax.lax.stop_gradient(v_z)
        dxdt_v = jax.lax.stop_gradient(dxdt_v)
        ma_tr_z = jax.lax.stop_gradient(ma_tr_z).T   # (n_comp, zNo)
        he_tr_z = jax.lax.stop_gradient(he_tr_z)     # (zNo,)

        # live film fluxes with the frozen coefficients
        mo_fli = ma_tr_z * (c_raw - cs_surf_st)      # (n_comp, zNo)

        # --- gas species balance ---
        c_bc1 = (
            p["SpCoi0"][:, None] * dz
            + (p["GaDii"] * eps / v_z[0])[:, None] * c_raw[:, 1:2]
        ) / ((p["GaDii"] * eps / v_z[0])[:, None] + dz)
        c_back = jnp.concatenate(
            [c_bc1, jnp.maximum(c_raw[:, :-1], EPS_CONST)], axis=1
        )
        c_fwd = jnp.concatenate(
            [c_raw[:, 1:], jnp.zeros((n_comp, 1), c_raw.dtype)], axis=1
        )
        dcdz = (c_raw - c_back) / dz
        d2c = (c_back - 2 * c_raw + c_fwd) / dz**2
        dcdt_gas = (1.0 / eps) * (
            -v_z[None, :] * dcdz
            - c_raw * dxdt_v[None, :]
            + p["GaDii"][:, None] * eps * d2c
            - mo_fli * sp_su_ar
        )

        # --- gas energy balance (dispersion zeroed, :3764) ---
        mo_fl = co_sp * v_z
        c1_t = ga_th_co_eff / (mo_fl[0] * ga_cp_mix[0] * 1000.0)
        t_b0 = (p["T0"] * dz + c1_t * T_z[1]) / (dz + c1_t)
        t_back = jnp.concatenate([t_b0[None], T_z[:-1]])
        dtdz = (T_z - t_back) / dz
        qm = jnp.where(
            p["Tm"] == 0, 0.0, p["U"] * p["EfHeTrAr"] * (p["Tm"] - T_z)
        ) * 1e-3
        in_fl_t = he_tr_z * (ts_surf_st - T_z) * 1e-3
        dtdt_gas = (1.0 / (co_sp * ga_cp_mix * eps)) * (
            -(mo_fl * ga_cp_mix) * dtdz + in_fl_t * sp_su_ar + qm
        )

        # --- solid phase (per z node) ---
        def solid_node(cs_node, ts_node, c_z, T_c, co_sp_z, cp_z,
                       p_node, ma_tr, he_tr):
            # cs_node (n_comp, rNo) OC order center-first, ts_node (rNo,) [K]
            cs_cl = jnp.maximum(cs_node, EPS_CONST)
            cos_sp = jnp.sum(cs_cl, axis=0)
            mo_frsi = (cs_cl / cos_sp).T             # (rNo, n_comp)

            rate_fn = lambda T_, mf_, sc_: spec.rates(
                T_, p_node, mf_, sc_, p["kinetic_overrides"]
            )
            r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(
                ts_node, mo_frsi, cs_cl
            )                                        # (n_rxn, rNo)
            ri_r = jnp.einsum("mk,mr->kr", nu_comp, r0)

            he_re_t = _energetics(spec, ts_node)     # (rNo, n_rxn)
            ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1)

            # solid heat capacity: GAS mixture Cp at the gas temperature,
            # one value per z (:3510)
            so_cp_eff = co_sp_z * cp_z * ca_po + (1 - ca_po) * p["CaDe"] * p["CaSpHeCa"]

            beta_c = pa_ra * (ma_tr / so_dii_eff)    # (n_comp,)
            beta_t = -1.0 * he_tr * pa_ra / so_th_co_eff

            cs_hat = oc_particle.interface_update(
                cs_cl, c_z, beta_c, ops["A"]
            )                                        # (n_comp, rNo)
            if clamp_interface:
                cs_hat = jnp.maximum(cs_hat, EPS_CONST)
            ts_hat = oc_particle.interface_update(ts_node, T_c, beta_t, ops["A"])

            src_c = pa_ra**2 * ri_r                  # (:3722) source x PaRa^2
            res_c = jax.vmap(
                lambda ys, k, src: oc_particle.oc_residual(
                    ys, k, src, 0.0, 0.0, ops
                )
            )(cs_hat, so_dii_eff, src_c)
            dcs = res_c / (ca_po * pa_ra**2)

            src_t = pa_ra**2 * (-ov_he_re_t)         # (:3790)
            res_t = oc_particle.oc_residual(
                ts_hat, so_th_co_eff / 1000.0, src_t, 0.0, 0.0, ops
            )
            dts = res_t / (so_cp_eff * pa_ra**2)
            # static surface row (Robin residual is exactly zero after the
            # algebraic update; pin against roundoff)
            dcs = dcs.at[:, -1].set(0.0)
            dts = dts.at[-1].set(0.0)
            return dcs, dts

        dcs_sol, dts_sol = jax.vmap(
            solid_node, in_axes=(2, 1, 1, 0, 0, 0, 0, 0, 0), out_axes=(2, 1)
        )(cs_store, ts_store, c_raw, T_z, co_sp, ga_cp_mix, P_z,
          ma_tr_z.T, he_tr_z)

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


def make_m13_driver(spec: M13Spec, mesh=None, rtol=1e-5, atol=1e-7):
    """Operator-splitting M13 driver as ONE pure jitted/vmappable function
    (reference time loop pbHeterReactor.py:995-1148). Per interval: gas MoL
    phase under Radau with the previous interval's solid-surface values,
    then the per-node particle BVP by PTC + damped Newton with the previous
    interval's gas bulk values (the reference's staggered exchange order).

    Driver-level salvages (each documented at its source):
      * interphase-flux sign corrected to the sister model's
        (pbReactor.modelEquationM7:5268) -- the reference's sign is
        linearly unstable (make_m13_gas_rhs docstring);
      * gas state carried across intervals (the reference re-seeds a dead
        variable, pbHeterReactor.py:1148);
      * refined meshes use the smooth C^1 EPS clamp in both phases (hard
        clamp breaks the stage Newton / stalls the particle solve on the
        singular LHHW regime -- see _run_m13 history in STATUS.md).

    Returns run(p, y_gas0=None, y_solid0=None, t_start=0.0) ->
    (gas_t, solid_t, conv_t, unr_t, ts_grid):
    gas_t (tNo, n_layer*zNo), solid_t (tNo, n_layer, rNo, zNo),
    conv_t/unr_t per-interval solid-Newton and gas-budget flags. Pure in
    p, so design sweeps are jax.vmap(run) (parallel.run_m13_sweep).

    y_gas0/y_solid0/t_start seed a RESUMED run (checkpoint/resume: the
    reference's in-memory interval re-seed, pbHeterReactor.py:1134-1148,
    formalized -- api/rmt._run_m13 round-trips them as the "checkpoint"
    result field / "resume-state" input). Because every interval restarts
    the gas integrator and the solid Newton from the carried state alone,
    chained runs reproduce a single run exactly.
    """
    from ..solvers import newton, radau

    gas_rhs = make_m13_gas_rhs(
        spec, flux_sign=-1.0, mesh=mesh,
        clamp_width=1e-3 if mesh is not None else 0.0,
    )
    node_res = make_m13_solid_node_residual(spec)
    n_comp, n_layer, r_no, z_no = (
        spec.n_comp, spec.n_layer, spec.r_no, spec.z_no
    )

    def run(pp, y_gas0=None, y_solid0=None, t_start=0.0):
        d = m13_feed(spec, pp)
        y_gas = m13_gas_initial_state(spec, pp) if y_gas0 is None else y_gas0
        y_solid = (m13_solid_initial_state(spec, pp) if y_solid0 is None
                   else y_solid0)
        # initial interface = solid surface row; initial bulk = gas state
        # (on resume these ARE the previous run's staggered-exchange
        # values, so the continuation is exact)
        cs_surf = y_solid[:n_comp, 0, :]
        ts_surf = y_solid[n_comp, 0, :]
        g0 = y_gas.reshape(n_layer, z_no)
        c_bulk, t_bulk = g0[:n_comp], g0[n_comp]
        ts_grid = (
            t_start + pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)
        ).astype(y_gas.dtype)

        def solve_node(y_node, cb, tb):
            # clamp the gas bulk before it enters the particle Robin BC:
            # a negative bulk (refined-mesh inlet Gibbs undershoot) drives
            # the particle Newton into unphysical states; the reference
            # clamps every state with max(EPS) before use
            # (pbHeterReactor.py:1575,1791). Refined meshes use the smooth
            # clamp (hard 1e-30 pinning stalls the particle solve on the
            # singular LHHW reverse-rate regime).
            if mesh is not None:
                cb = 0.5 * (
                    cb + EPS_CONST + jnp.sqrt((cb - EPS_CONST) ** 2 + 1e-6)
                )
            else:
                cb = jnp.maximum(cb, EPS_CONST)
            # plain Newton diverges from far-off iterates (the LHHW
            # reverse rates explode away from equilibrium): pseudo-
            # transient continuation to the attractor, then damped-Newton
            # polish -- same recipe as T3/M14
            res = lambda yn: node_res(
                yn.reshape(n_layer, r_no), cb, tb, pp, d
            ).reshape(-1)
            ysn, _ = radau.odeint(
                lambda t, yn: res(yn), y_node.reshape(-1),
                jnp.asarray([0.0, 1.0], y_node.dtype),
                rtol=1e-6, atol=1e-9, max_steps=4000,
            )
            sol = newton.root(res, ysn[-1], max_iter=40, tol=1e-9)
            return sol.x.reshape(n_layer, r_no), sol.converged

        def interval(carry, tpair):
            y_gas, y_solid, cs_surf, ts_surf, c_bulk, t_bulk, nunr = carry
            ys, stats = radau.odeint(
                lambda t, y: gas_rhs(t, y, pp, d, cs_surf, ts_surf),
                y_gas, tpair, rtol=rtol, atol=atol,
            )
            y_gas = ys[-1]
            y_solid, conv = jax.vmap(
                solve_node, in_axes=(2, 1, 0), out_axes=(2, 0)
            )(y_solid, c_bulk, t_bulk)
            cs_surf = y_solid[:n_comp, 0, :]
            ts_surf = y_solid[n_comp, 0, :]
            Yg = y_gas.reshape(n_layer, z_no)
            c_bulk, t_bulk = Yg[:n_comp], Yg[n_comp]
            nunr = nunr + stats.n_unreached
            carry = (y_gas, y_solid, cs_surf, ts_surf, c_bulk, t_bulk, nunr)
            return carry, (y_gas, y_solid, jnp.all(conv), stats.n_unreached)

        zero = jnp.asarray(0, jnp.int32)
        carry, (gas_t, solid_t, conv_t, unr_t) = jax.lax.scan(
            interval,
            (y_gas, y_solid, cs_surf, ts_surf, c_bulk, t_bulk, zero),
            jnp.stack([ts_grid[:-1], ts_grid[1:]], axis=1),
        )
        return gas_t, solid_t, conv_t, unr_t, ts_grid

    return run
