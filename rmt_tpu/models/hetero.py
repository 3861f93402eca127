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

import jax
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


# ---------------------------------------------------------------------------
# M14: steady heterogeneous packed bed with axial dispersion and a lumped
# (rNo = 1) catalyst phase, solved as a nonlinear root problem with ramped
# kinetics continuation.
#
# Reference: PackedBedReactorClass.runM9/modelEquationM9
# (PyREMOT/docs/pbReactor.py:7188-8850), dispatched as M14 via
# rmtCore.py:377-388 which first runs runM3 (our M7) to build the initial
# guess. State layout (noLayer = compNo+1, rows = rNo+1, zNo): row 0 holds
# the gas phase, row 1 the catalyst surface values.
# Reproduced quirks:
#   * gas/solid concentrations are NOT EPS-clamped (pbReactor.py:8126,8146);
#   * the solid-phase heat of reaction is evaluated at the DIMENSIONLESS
#     temperature Ts* rather than the real one (pbReactor.py:8391-8395);
#   * the Ergun march uses VoFlRa0/CrSeAr while convection is normalized by
#     the user's superficial velocity (pbReactor.py:8236,8479);
#   * rNo is fixed at 1 -- the reference's indexed assignment
#     dxdtMat[i][1][z] = ri_r[:, i] crashes for rNo > 1.
# ---------------------------------------------------------------------------

from ..kinetics.dsl import RateProgram          # noqa: E402
from ..props import film                         # noqa: E402
from ..constants import EPS_CONST               # noqa: E402


@dataclass(frozen=True)
class M14Spec:
    comp_list: tuple[str, ...]
    iso_thermal: bool
    stoich: Stoichiometry = field(hash=False, compare=False)
    rates: RateProgram = field(hash=False, compare=False)
    z_no: int = 30                  # solverSetting['M9']['zNo']

    @property
    def n_comp(self) -> int:
        return len(self.comp_list)

    @property
    def comp_idx(self) -> np.ndarray:
        return DB.species_indices(self.comp_list)


def m14_build_spec(model_input: Mapping[str, Any], **overrides) -> M14Spec:
    comp_list = tuple(model_input["feed"]["components"]["shell"])
    process_type = model_input["operating-conditions"].get("process-type", "")
    rr = model_input["reaction-rates"]
    return M14Spec(
        comp_list=comp_list,
        iso_thermal=(process_type == "iso-thermal"),
        stoich=Stoichiometry(model_input["reactions"], comp_list),
        rates=RateProgram(rr["VARS"], rr["RATES"]),
        **overrides,
    )


def m14_params(model_input: Mapping[str, Any]) -> dict[str, Any]:
    oc = model_input["operating-conditions"]
    feed = model_input["feed"]
    re_spec = model_input["reactor"]
    ex_he = model_input.get("external-heat", {"OvHeTrCo": 0.0, "EfHeTrAr": 0.0, "MeTe": 0.0})
    f = lambda x: jnp.asarray(x, dtype=jnp.result_type(float))
    return {
        "P0": f(oc["pressure"]),
        "T0": f(oc["temperature"]),
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
        "CaPo": f(re_spec["CaPo"]),
        "CaTo": f(re_spec["CaTo"]),
        "kinetic_overrides": {
            k: f(v) for k, v in model_input.get("kinetic-overrides", {}).items()
        },
    }


def m14_feed(spec: M14Spec, p: Mapping[str, Any]) -> dict[str, Any]:
    """Feed scales + FIXED transfer coefficients (pbReactor.py:7325-7460)."""
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
    ga_ma_co_te0 = (vf / zf) * c_max
    ga_he_co_te0 = (ga_de0 * vf * p["T0"] * (cp_mix0 / mi_mo_we0) / zf) * 1e-3
    pe_ma0 = vf * zf / p["GaDii0"]
    pe_he0 = zf * ga_de0 * (cp_mix0 / mi_mo_we0) * vf / p["GaThCoMix0"]

    # fixed gas/solid transfer coefficients from the feed state
    # (MODEL_SETTING MaTrCo/HeTrCo == "FIX", pbReactor.py:7448-7452)
    re0 = film.reynolds(ga_de0, vf, p["PaDi"], p["GaViMix0"])
    sc0 = film.schmidt(ga_de0, p["GaViMix0"], p["GaDii0"])
    sh0 = film.sherwood(sc0, re0, film.FROSSLING)
    pr0 = film.prandtl(cp_mix0, p["GaViMix0"], p["GaThCoMix0"], mi_mo_we0)
    nu0 = film.nusselt(pr0, re0)
    ma_tr_co = film.mass_transfer_coefficient(sh0, p["GaDii0"], p["PaDi"])
    he_tr_co = film.heat_transfer_coefficient(nu0, p["GaThCoMix0"], p["PaDi"])

    pa_ra = p["PaDi"] / 2
    sp_su_ar = (3 / pa_ra) * (1 - p["BeVoFr"])
    su_ga_ve0 = p["VoFlRa0"] / cr_se_ar
    return {
        "mw": mw,
        "Cmax": c_max,
        "MiMoWe0": mi_mo_we0,
        "GaDe0": ga_de0,
        "GaCpMeanMix0": cp_mix0,
        "GaMaCoTe0": ga_ma_co_te0,
        "GaHeCoTe0": ga_he_co_te0,
        "PeNuMa0": pe_ma0,
        "PeNuHe0": pe_he0,
        "MaTrCo": ma_tr_co,
        "HeTrCo": he_tr_co,
        "SpSuAr": sp_su_ar,
        "SuGaVe0eq": su_ga_ve0,
        "vDl": su_ga_ve0 / vf,
    }


def _m14_energetics(spec: M14Spec, T_eval):
    """Heat of reaction evaluated at T_eval (which the reference feeds the
    DIMENSIONLESS solid temperature, pbReactor.py:8391-8395)."""
    eq_cp_mean = thermo.cp_mean(T_eval, spec.stoich.eq_idx)
    en_ch = (eq_cp_mean @ spec.stoich.eq_nu.T) * (jnp.asarray(T_eval)[..., None] - Tref)
    return en_ch + jnp.asarray(spec.stoich.dh_rxn_25)


def make_m14_residual(spec: M14Spec, mesh=None):
    """Steady residual of the gas/solid system, vectorized over z nodes
    (mirrors modelEquationM9, pbReactor.py:7748-8850, rNo = 1). ramp
    scales the kinetic source (the reference's rampList continuation,
    pbReactor.py:7609-7643). mesh: a two_zone_mesh(...) result for
    solver-config mesh != "normal" (the reference's refined branches,
    pbReactor.py:8532-8565); the axial stencils become the per-node
    weight rows of ops.stencils.axial_stencil_weights, and the Ergun
    march keeps the uniform-zone dz as the reference does."""
    from ..ops import stencils as _st

    idx = spec.comp_idx
    n_comp = spec.n_comp
    z_no = spec.z_no
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    dz = float(mesh["dz_uniform"]) if mesh is not None else 1.0 / (z_no - 1)
    ws = _st.axial_stencil_weights(z_no, mesh)
    W1, W2, dz_bc1 = ws["W1"], ws["W2"], ws["dz_bc1"]

    def residual(y, p, d, ramp=1.0):
        Y = y.reshape(n_comp + 1, 2, z_no)
        c_g = Y[:n_comp, 0]                     # gas, dimensionless (raw)
        c_s = Y[:n_comp, 1]                     # solid surface
        T_g = Y[n_comp, 0]
        T_s = Y[n_comp, 1]

        co_g_re = c_g * d["Cmax"]               # NOT clamped (quirk)
        co_s_re = c_s * d["Cmax"]
        co_g_sum = jnp.sum(co_g_re, axis=0)
        co_s_sum = jnp.sum(co_s_re, axis=0)
        Tg_re = T_g * p["T0"] + p["T0"]
        Ts_re = T_s * p["T0"] + p["T0"]
        mo_fri_g = co_g_re / co_g_sum
        mo_fri_s = co_s_re / co_s_sum
        mi_mo_we = thermo.mixture_molecular_weight(mo_fri_g.T, d["mw"], "kg/mol")
        ga_de = thermo.density_ig(mi_mo_we, co_g_sum * 1000.0)
        ga_de_dl = ga_de / d["GaDe0"]

        # Ergun march, prefix sum (pbReactor.py:8231-8240)
        eps = p["BeVoFr"]
        su0 = d["SuGaVe0eq"]
        erg_a = 150 * p["GaViMix0"] * su0 / p["PaDi"] ** 2
        erg_b = (1 - eps) ** 2 / eps**3
        erg_c = 1.75 * ga_de * su0**2 / p["PaDi"]
        erg_d = (1 - eps) / eps**3
        rhs_erg = -(erg_a * erg_b + erg_c * erg_d)
        P_z = p["P0"] + dz * jnp.concatenate(
            [jnp.zeros((1,), rhs_erg.dtype), jnp.cumsum(rhs_erg[:-1])]
        )

        # kinetics at the SOLID state, ramped (pbReactor.py:8330-8345)
        rate_fn = lambda T_, P_, mf_, sc_: spec.rates(
            T_, P_, mf_, sc_, p["kinetic_overrides"]
        )
        r0 = ramp * jax.vmap(rate_fn, in_axes=(0, 0, 1, 1), out_axes=1)(
            Ts_re, P_z, mo_fri_s, co_s_re
        )                                       # (n_rxn, zNo)
        ri_s = jnp.einsum("mk,mz->kz", nu_comp, r0)

        cp_mean_g = thermo.cp_mean(Tg_re, idx)
        cp_mix_g = jnp.sum(mo_fri_g.T * cp_mean_g, axis=-1)
        cp_mix_dl = cp_mix_g / d["GaCpMeanMix0"]
        # QUIRK: enthalpy of reaction at the dimensionless Ts
        he_re_t = _m14_energetics(spec, T_s)    # (zNo, n_rxn)
        ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1)
        qm = jnp.where(p["Tm"] == 0, 0.0,
                       p["U"] * p["EfHeTrAr"] * (p["Tm"] - Tg_re)) * 1e-3

        v_dl = d["vDl"]

        # film fluxes between phases (dimensionless concentrations x Cmax)
        mo_fli = d["MaTrCo"][:, None] * d["Cmax"] * (c_g - c_s)  # (n_comp, zNo)
        in_flux_T = d["HeTrCo"] * d["SpSuAr"] * p["T0"] * (T_s - T_g) * 1e-3

        # gas mass: per-node weight rows (backward d1 / central d2,
        # Danckwerts inlet ghost; non-uniform in a refined dense zone)
        inv_m = 1.0 / (d["PeNuMa0"] * dz_bc1)
        c_in = p["SpCoi0"] / d["Cmax"]
        c_ghost = (c_in + inv_m * c_g[:, 1]) / (inv_m + 1.0)
        dcdz = _st.apply_axial_weights(W1, c_g, c_ghost[:, None])
        d2c = _st.apply_axial_weights(W2, c_g, c_ghost[:, None])
        res_cg = (
            -v_dl * dcdz
            + (eps / d["PeNuMa0"])[:, None] * d2c
            - (d["SpSuAr"] / d["GaMaCoTe0"]) * mo_fli
        )
        # solid mass: film inflow balances the ramped reaction source
        res_cs = mo_fli * d["SpSuAr"] + ri_s

        # gas heat (GaThCoEff_DiLeVa = BeVoFr here, pbReactor.py:8282)
        inv_h = 1.0 / (d["PeNuHe0"] * dz_bc1)
        t_ghost = (inv_h * T_g[1]) / (inv_h + 1.0)
        dtdz = _st.apply_axial_weights(W1, T_g, t_ghost)
        d2t = _st.apply_axial_weights(W2, T_g, t_ghost)
        res_tg = (
            -v_dl * ga_de_dl * cp_mix_dl * dtdz
            + (eps / d["PeNuHe0"]) * d2t
            + (in_flux_T + qm) / d["GaHeCoTe0"]
        )
        # solid heat: reaction exotherm balances the film outflow
        res_ts = (1 - eps) * (-ov_he_re_t) - in_flux_T

        out = jnp.concatenate(
            [
                jnp.stack([res_cg, res_cs], axis=1).reshape(n_comp, 2, z_no),
                jnp.stack([res_tg, res_ts], axis=0)[None],
            ],
            axis=0,
        )
        return out.reshape(-1)

    return residual


def m14_row_scales(spec: M14Spec, p, d) -> jnp.ndarray:
    """Diagonal row scaling for the M14 solve (flat, same layout as the
    residual). The raw residual mixes O(1) dimensionless gas rows with
    O(1e3) dimensional solid rows (kmol/m^3.s and kJ/m^3.s), which stalls
    both Newton and pseudo-transient continuation; dividing the solid rows
    by their film-transfer scale makes the system O(1) without moving the
    root."""
    s_cm = d["MaTrCo"] * d["Cmax"] * d["SpSuAr"]          # (n_comp,)
    s_T = d["HeTrCo"] * d["SpSuAr"] * p["T0"] * 1e-3
    ones = jnp.ones((spec.z_no,), s_T.dtype)
    rows = [jnp.stack([ones, s_cm[i] * ones]) for i in range(spec.n_comp)]
    rows.append(jnp.stack([ones, s_T * ones]))
    return jnp.stack(rows, axis=0).reshape(-1)


def make_m14_runner(spec: M14Spec, mesh=None, ramp_list=(1.0,)):
    """Pure steady-state M14 solve: pp -> (x, converged, res_norm).

    Pseudo-transient continuation from the feed profile on the row-scaled
    residual, then a damped-Newton polish per rampList entry (reference
    runM9 continuation, pbReactor.py:7615-7643). Pure in the parameter
    pytree, so it jits AND vmaps -- the design-space sweep API
    (parallel.ensemble.run_m14_sweep) maps it over batched operating
    conditions and kinetic overrides."""
    from ..solvers import newton, radau

    res_fn = make_m14_residual(spec, mesh=mesh)
    ramp_list = tuple(float(r) for r in ramp_list)

    def run(pp):
        d = m14_feed(spec, pp)
        S = m14_row_scales(spec, pp, d)
        c_in = (pp["SpCoi0"] / d["Cmax"])[:, None, None] * jnp.ones(
            (1, 2, spec.z_no)
        )
        y0 = jnp.concatenate(
            [c_in, jnp.zeros((1, 2, spec.z_no), c_in.dtype)], axis=0
        ).reshape(-1)
        res_s0 = lambda yy: res_fn(yy, pp, d, ramp_list[0]) / S
        ys, _ = radau.odeint(
            lambda t, yy: res_s0(yy), y0,
            jnp.asarray([0.0, 20.0], y0.dtype), rtol=1e-7, atol=1e-10,
        )
        x = ys[-1]
        converged = jnp.asarray(True)
        res_norm = jnp.asarray(0.0, x.dtype)
        for ramp in ramp_list:
            res_s = lambda yy, r=ramp: res_fn(yy, pp, d, r) / S
            sol = newton.root(res_s, x, max_iter=60, tol=1e-8)
            x = sol.x
            converged = converged & sol.converged
            res_norm = jnp.maximum(res_norm, sol.residual_norm)
        return x, converged, res_norm

    return run
