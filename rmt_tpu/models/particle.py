# Single catalyst-particle diffusion-reaction models (reference ids T1, T2).
#
# T1: dynamic dimensionless particle (Cs_i, Ts over the radial grid),
# spherical FDM with a Robin gas-solid interface BC
# (reference: PyREMOT/examples/particleModels.py:59-1103).
# T2: the steady version solved as a root problem on the same residuals
# (reference: particleModels.py:1108-2212).
#
# Note: the reference's orthogonal-collocation branch crashes upstream
# (buildOrCoMatrix indexes an empty const3 tuple,
# solvers/solCatParticle.py:150,198), so only the FDM path has an oracle;
# the OC infrastructure lives in rmt_tpu/ops/collocation.py.

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
from ..props import thermo

ISO_THERMAL = "iso-thermal"


@dataclass(frozen=True)
class ParticleSpec:
    comp_list: tuple[str, ...]
    iso_thermal: bool
    stoich: Stoichiometry = field(hash=False, compare=False)
    rates: RateProgram = field(hash=False, compare=False)
    r_no: int = 7            # solverSetting['ParticleModel']['rNo']['fdm']
    t_no: int = 10           # outer time intervals
    times_no: int = 5

    @property
    def n_comp(self) -> int:
        return len(self.comp_list)

    @property
    def comp_idx(self) -> np.ndarray:
        return DB.species_indices(self.comp_list)

    @property
    def n_layer(self) -> int:
        return self.n_comp + (0 if self.iso_thermal else 1)


def build_spec(model_input: Mapping[str, Any], **overrides) -> ParticleSpec:
    comp_list = tuple(model_input["feed"]["components"]["shell"])
    process_type = model_input["operating-conditions"].get("process-type", ISO_THERMAL)
    return ParticleSpec(
        comp_list=comp_list,
        iso_thermal=(process_type == ISO_THERMAL),
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
    tc = model_input.get("test-const", {})
    f = lambda x: jnp.asarray(x, dtype=jnp.result_type(float))
    return {
        "P0": f(oc["pressure"]),
        "T0": f(oc["temperature"]),
        "opT": f(oc.get("period", 1.0)),
        "SpCoi0": f(np.asarray(feed["concentration"], dtype=np.float64)),
        "SuGaVe0": f(feed.get("superficial-velocity", 0.0)),
        "GaDii0": f(np.asarray(feed.get("diffusivity", np.zeros(1)), dtype=np.float64)),
        "GaThCoMix0": f(feed.get("mixture-thermal-conductivity", 0.0)),
        "PaDi": f(re_spec["PaDi"]),
        "CaPo": f(re_spec["CaPo"]),
        "CaTo": f(re_spec["CaTo"]),
        "CaDe": f(re_spec["CaDe"]),
        "CaSpHeCa": f(re_spec["CaSpHeCa"]),
        "CaThCo": f(re_spec.get("CaThCo", 0.0)),
        "BeVoFr": f(re_spec["BeVoFr"]),
        # frozen transport/bulk oracle values (T1; reference tests)
        "MaTrCo": f(np.asarray(tc.get("MaTrCo0", np.zeros(1)), dtype=np.float64)),
        "HeTrCo": f(tc.get("HeTrCo0", 0.0)),
        "Cbi": f(np.asarray(tc.get("Cbi", np.zeros(1)), dtype=np.float64)),
        "Tb": f(tc.get("Tb", 0.0)),
        "kinetic_overrides": {
            k: f(v) for k, v in model_input.get("kinetic-overrides", {}).items()
        },
    }


def t1_initial_state(spec: ParticleSpec, p):
    """1e-6 dimensionless concentrations, theta=0 (particleModels.py:224-244)."""
    c0 = jnp.full((spec.n_comp, spec.r_no), 1e-6, p["P0"].dtype)
    rows = [c0]
    if not spec.iso_thermal:
        rows.append(jnp.zeros((1, spec.r_no), c0.dtype))
    return jnp.concatenate(rows, axis=0).reshape(-1)


def make_t1_rhs(spec: ParticleSpec):
    """Dynamic particle RHS (reference modelEquationT1,
    particleModels.py:605-1103), FDM path, vectorized over radial nodes."""
    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    n_layer = spec.n_layer
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    eq_idx = spec.stoich.eq_idx
    eq_nu = jnp.asarray(spec.stoich.eq_nu)
    dh25 = jnp.asarray(spec.stoich.dh_rxn_25)

    def rhs(t, y, p):
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]

        Y = y.reshape(n_layer, r_no)
        cs_raw = Y[:n_comp]
        cs = jnp.maximum(cs_raw, EPS_CONST)          # (n_comp, rNo) dimensionless
        c_max = jnp.max(p["SpCoi0"])
        cs_re = cs * c_max                           # [kmol/m^3]
        ts = Y[n_comp] if not spec.iso_thermal else jnp.zeros((r_no,), y.dtype)
        ts_re = ts * p["T0"] + p["T0"]

        cos_sp_re = jnp.sum(cs_re, axis=0)           # (rNo,)
        mo_fri = (cs_re / cos_sp_re).T               # (rNo, n_comp)

        # kinetics at each radial point, bulk pressure
        rate_fn = lambda T_, mf_, sc_: spec.rates(
            T_, p["P0"], mf_, sc_, p["kinetic_overrides"]
        )
        r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(
            ts_re, mo_fri, cs_re
        )                                            # (n_rxn, rNo)
        ri_r = jnp.einsum("mk,mz->kz", nu_comp, r0)  # (n_comp, rNo)

        cp_mean_i = thermo.cp_mean(ts_re, idx)       # (rNo, n_comp)
        so_cp_mix = jnp.sum(mo_fri * cp_mean_i, axis=-1)
        so_cp_eff_re = cos_sp_re * so_cp_mix * ca_po + (1 - ca_po) * p["CaDe"] * p["CaSpHeCa"]

        en_ch = (thermo.cp_mean(ts_re, eq_idx) @ eq_nu.T) * (ts_re[:, None] - Tref)
        he_re_t = en_ch + dh25
        ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1)  # [kJ/m^3.s]

        # dimensionless reference scales (particleModels.py:338-345;
        # MAX mode for the mass scale)
        so_ma_di_te0 = (p["GaDii0"] * c_max) / rf**2
        so_he_di_te0 = (p["GaThCoMix0"] * p["T0"] / rf**2) * 1e-3

        # diffusivities (FIX setting -> feed values)
        ga_dii_dile = p["GaDii0"] / p["GaDii0"]      # ones
        so_dii_eff = (ca_po / p["CaTo"]) * p["GaDii0"]
        so_dii_eff_dile = ga_dii_dile

        c_b = p["Cbi"] / jnp.max(p["Cbi"])           # dimensionless bulk

        def per_species(cs_i, ri_i, d_dile, ma_i, cb_i, so_eff_i, gdii0_i):
            a = particle_fd.build_c_residual(
                cs_i, ri_i, d_dile, ma_i, cb_i, so_eff_i, rf, flux_dir="lr"
            )
            return a / (ca_po * rf**2 / gdii0_i)

        dcs = jax.vmap(per_species)(
            cs, ri_r, so_dii_eff_dile, p["MaTrCo"], c_b, so_dii_eff, p["GaDii0"]
        )

        rows = [dcs]
        if not spec.iso_thermal:
            so_th_co_mix0 = p["GaThCoMix0"]
            so_th_eff_dile = ca_po * 1.0             # SoThCoMix/SoThCoMix0 = 1
            k_ref = so_th_co_mix0 / 1000.0
            he_conv = p["HeTrCo"] / 1000.0
            tb_dile = (p["Tb"] - p["T0"]) / p["T0"]
            a_t = particle_fd.build_t_residual(
                ts, -ov_he_re_t, so_th_eff_dile, he_conv, tb_dile, k_ref, rf
            )
            dts = a_t / (so_cp_eff_re * p["T0"] / so_he_di_te0)
            rows.append(dts[None])

        return jnp.concatenate(rows, axis=0).reshape(-1)

    return rhs




def make_t1_rhs_oc(spec: ParticleSpec, scaled_sources: bool = True,
                   clamp_interface: bool = False):
    """Dynamic particle RHS on the 7-point orthogonal-collocation basis
    (reference modelEquationT1 OC branch, particleModels.py:1016-1030 mass
    and :1070-1090 heat -- which crashes inside solCatParticle before one
    evaluation, see ops/oc_particle.py, so the intended semantics are
    reconstructed on the aligned assembler).

    Layout: radial index in OC order, 0 = innermost point, rNo-1 = the
    gas-solid surface (the FDM branch stores interface-first; the
    reference feeds the same storage to both, which cannot be consistent
    -- documented deviation). The surface value is updated algebraically
    from the Robin row each call (static row, zero derivative), matching
    the reference's CalUpdateYnSolidGasInterface + buildOrCoMatrix flow.
    scaled_sources=True reproduces the OC branch's scaled _Ri/_H sources
    (:1023,1079) -- which are NOT the FDM branch's equations (the FDM path
    passes the raw terms, :1010); under the scaled dynamics the DME
    trajectory collapses into the clamped near-zero kinetics regime
    (measured Re(lambda) spans +7e10 to -4e30) and no integrator leaves
    it. The driver therefore integrates scaled_sources=False: the SAME
    equations as the proven FDM branch on the OC basis, which also makes
    OC-vs-FDM cross-consistency meaningful. The heat transfer number
    keeps the branch's positive sign (:1077, the physical Robin
    orientation -- the FDM builders carry the negated one)."""
    from ..ops import oc_particle

    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    n_layer = spec.n_layer
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    eq_idx = spec.stoich.eq_idx
    eq_nu = jnp.asarray(spec.stoich.eq_nu)
    dh25 = jnp.asarray(spec.stoich.dh_rxn_25)
    ops = oc_particle.oc_operator()
    assert ops["N"] == r_no, (
        f"the OC branch uses the {ops['N']}-point basis; got rNo={r_no}"
    )

    def rhs(t, y, p):
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]

        Y = y.reshape(n_layer, r_no)
        cs = jnp.maximum(Y[:n_comp], EPS_CONST)
        c_max = jnp.max(p["SpCoi0"])
        ts = Y[n_comp] if not spec.iso_thermal else jnp.zeros((r_no,), y.dtype)

        # algebraic gas-solid interface
        c_b = p["Cbi"] / jnp.max(p["Cbi"])
        beta_c = (rf / p["GaDii0"]) * p["MaTrCo"]       # (n_comp,)
        cs_hat = oc_particle.interface_update(cs, c_b, beta_c, ops["A"])
        if clamp_interface:
            # non-negative interface projection (see make_m12_rhs): the OC
            # surface extrapolation swings negative during transients and
            # the EPS-clamped kinetics then collapse the step size
            cs_hat = jnp.maximum(cs_hat, EPS_CONST)
        so_th_conv = p["GaThCoMix0"] / 1000.0           # SoThCoEff_Conv (:1073)
        beta_t = (rf / so_th_conv) * (p["HeTrCo"] / 1000.0) / ca_po
        tb_dile = (p["Tb"] - p["T0"]) / p["T0"]
        ts_hat = oc_particle.interface_update(ts, tb_dile, beta_t, ops["A"])

        # kinetics/energetics on the stored clamped state (as the FDM
        # branch and the reference OC branch both do)
        cs_re = cs * c_max
        ts_re = ts * p["T0"] + p["T0"]
        cos_sp_re = jnp.sum(cs_re, axis=0)
        mo_fri = (cs_re / cos_sp_re).T
        rate_fn = lambda T_, mf_, sc_: spec.rates(
            T_, p["P0"], mf_, sc_, p["kinetic_overrides"]
        )
        r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(
            ts_re, mo_fri, cs_re
        )
        ri_r = jnp.einsum("mk,mz->kz", nu_comp, r0)

        so_ma_di_te0 = (p["GaDii0"] * c_max) / rf**2
        so_he_di_te0 = (p["GaThCoMix0"] * p["T0"] / rf**2) * 1e-3

        if scaled_sources:
            ri_term = (1.0 / so_ma_di_te0)[:, None] * (1 - ca_po) * ri_r
        else:
            ri_term = ri_r                      # raw, as the FDM branch
        res_c = jax.vmap(
            lambda ys, src, b, cb: oc_particle.oc_residual(
                ys, 1.0, src, b, cb, ops      # SoDiiEff_DiLe = 1 (:943)
            )
        )(cs_hat, ri_term, beta_c, c_b)
        dcs = res_c * (p["GaDii0"] / (ca_po * rf**2))[:, None]
        dcs = dcs.at[:, -1].set(0.0)                    # static surface row

        rows = [dcs]
        if not spec.iso_thermal:
            cp_mean_i = thermo.cp_mean(ts_re, idx)
            so_cp_mix = jnp.sum(mo_fri * cp_mean_i, axis=-1)
            so_cp_eff_re = (
                cos_sp_re * so_cp_mix * ca_po
                + (1 - ca_po) * p["CaDe"] * p["CaSpHeCa"]
            )
            en_ch = (thermo.cp_mean(ts_re, eq_idx) @ eq_nu.T) * (
                ts_re[:, None] - Tref
            )
            ov_he_re_t = jnp.sum(r0.T * (en_ch + dh25), axis=-1)
            dh_term = -ov_he_re_t
            if scaled_sources:
                dh_term = (1.0 / so_he_di_te0) * (1 - ca_po) * dh_term
            res_t = oc_particle.oc_residual(
                ts_hat, ca_po * 1.0, dh_term, beta_t, tb_dile, ops
            )
            dts = res_t / (so_cp_eff_re * p["T0"] / so_he_di_te0)
            dts = dts.at[-1].set(0.0)
            rows.append(dts[None])

        return jnp.concatenate(rows, axis=0).reshape(-1)

    return rhs


def t1_oc_surface_values(spec: ParticleSpec, p, y):
    """Recomputed algebraic interface values for post-processing."""
    from ..ops import oc_particle

    ops = oc_particle.oc_operator()
    rf = p["PaDi"] / 2
    Y = y.reshape(spec.n_layer, spec.r_no)
    cs = jnp.maximum(Y[: spec.n_comp], EPS_CONST)
    c_b = p["Cbi"] / jnp.max(p["Cbi"])
    beta_c = (rf / p["GaDii0"]) * p["MaTrCo"]
    cs_hat = oc_particle.interface_update(cs, c_b, beta_c, ops["A"])
    out = [cs_hat]
    if not spec.iso_thermal:
        so_th_conv = p["GaThCoMix0"] / 1000.0
        beta_t = (rf / so_th_conv) * (p["HeTrCo"] / 1000.0) / p["CaPo"]
        tb_dile = (p["Tb"] - p["T0"]) / p["T0"]
        ts_hat = oc_particle.interface_update(
            Y[spec.n_comp], tb_dile, beta_t, ops["A"]
        )
        out.append(ts_hat[None])
    return jnp.concatenate(out, axis=0)


def make_t2_residual_oc(spec: ParticleSpec):
    """Steady particle residual on the 7-point OC basis (the intended
    `numerical-method: "oc"` form of runT2 -- the reference's OC machinery
    cannot run, see ops/oc_particle.py). Discretizes the SAME equations as
    make_t2_residual_fn: interior rows CaPo-free mass Laplacian + scaled
    reaction source, an active Robin surface row (no algebraic
    elimination -- the steady system is Newton-friendly with the BC as an
    equation), transfer numbers matched to the FDM ghost construction
    (beta_c = rf*MaTrCo/SoDiiEff; the reference's crashing OC branch used
    rf*MaTrCo/GaDii0, one more branch inconsistency)."""
    from ..ops import oc_particle

    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    n_layer = spec.n_layer
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    eq_idx = spec.stoich.eq_idx
    eq_nu = jnp.asarray(spec.stoich.eq_nu)
    dh25 = jnp.asarray(spec.stoich.dh_rxn_25)
    ops = oc_particle.oc_operator()
    assert ops["N"] == r_no

    def residual(y, p, d):
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]

        Y = y.reshape(n_layer, r_no)
        cs = jnp.maximum(Y[:n_comp], EPS_CONST)
        c_max = jnp.max(p["SpCoi0"])
        cs_re = cs * c_max
        ts = Y[n_comp] if not spec.iso_thermal else jnp.zeros((r_no,), y.dtype)
        ts_re = ts * p["T0"] + p["T0"]

        cos_sp_re = jnp.sum(cs_re, axis=0)
        mo_fri = (cs_re / cos_sp_re).T

        rate_fn = lambda T_, mf_, sc_: spec.rates(
            T_, p["P0"], mf_, sc_, p["kinetic_overrides"]
        )
        r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(ts_re, mo_fri, cs_re)
        ri_r = jnp.einsum("mk,mz->kz", nu_comp, r0)

        so_dii_eff = (ca_po / p["CaTo"]) * d["GaDii0"]
        ri_scaled = (1 / d["SoMaDiTe0"])[:, None] * (1 - ca_po) * ri_r
        beta_c = rf * d["MaTrCo"] / so_dii_eff

        fc = jax.vmap(
            lambda ys, src, b, cb: oc_particle.oc_residual(
                ys, 1.0, src, b, cb, ops
            )
        )(cs, ri_scaled, beta_c, d["Cb_DiLe"])
        rows = [fc]
        if not spec.iso_thermal:
            en_ch = (thermo.cp_mean(ts_re, eq_idx) @ eq_nu.T) * (
                ts_re[:, None] - Tref
            )
            ov_he_re_t = jnp.sum(r0.T * (en_ch + dh25), axis=-1)
            dh_scaled = (1 / d["SoHeDiTe0"]) * (1 - ca_po) * (-ov_he_re_t)
            beta_t = rf * d["HeTrCo"] / (d["GaThCoMix0"] * ca_po)
            ft = oc_particle.oc_residual(
                ts, ca_po * 1.0, dh_scaled, beta_t, d["Tb_DiLe"], ops
            )
            rows.append(ft[None])
        return jnp.concatenate(rows, axis=0).reshape(-1)

    return residual


def make_t2_residual_ocfe(spec: ParticleSpec, nu_el: int = 6):
    """Steady particle residual on the OCFE basis (nu_el 4-point Lobatto
    elements) -- the reference's `numerical-method: "fem"` route of runT2
    (particleModels.py:1126,1270-1282 grid; modelEquationT2 fem branches
    :2112-2124 mass and :2180-2196 heat, which call the unrunnable
    solCatParticle2 assembler -- see ops/ocfe.py for its defects).
    Same equations as make_t2_residual_oc on the multi-element grid:
    interior collocation rows with the scaled reaction/heat sources, value
    + flux continuity at element interfaces, center symmetry, and an
    active Robin surface row with the FDM-matched transfer numbers
    (beta_c = rf*MaTrCo/SoDiiEff; the reference's fem branch folds an
    hi[-1] metric into _DiLeNu because its Robin row forgets the 1/h --
    our assembled surface row keeps the metric, so beta stays global)."""
    from ..ops import ocfe

    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    n_layer = spec.n_layer
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    eq_idx = spec.stoich.eq_idx
    eq_nu = jnp.asarray(spec.stoich.eq_nu)
    dh25 = jnp.asarray(spec.stoich.dh_rxn_25)
    ops = ocfe.ocfe_operator(nu_el)
    assert ops["NuToCoPo"] == r_no, (
        f"the OCFE branch with NuEl={nu_el} has {ops['NuToCoPo']} radial "
        f"points; got rNo={r_no}"
    )

    def residual(y, p, d):
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]

        Y = y.reshape(n_layer, r_no)
        cs = jnp.maximum(Y[:n_comp], EPS_CONST)
        c_max = jnp.max(p["SpCoi0"])
        cs_re = cs * c_max
        ts = Y[n_comp] if not spec.iso_thermal else jnp.zeros((r_no,), y.dtype)
        ts_re = ts * p["T0"] + p["T0"]

        cos_sp_re = jnp.sum(cs_re, axis=0)
        mo_fri = (cs_re / cos_sp_re).T

        rate_fn = lambda T_, mf_, sc_: spec.rates(
            T_, p["P0"], mf_, sc_, p["kinetic_overrides"]
        )
        r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(ts_re, mo_fri, cs_re)
        ri_r = jnp.einsum("mk,mz->kz", nu_comp, r0)

        so_dii_eff = (ca_po / p["CaTo"]) * d["GaDii0"]
        ri_scaled = (1 / d["SoMaDiTe0"])[:, None] * (1 - ca_po) * ri_r
        beta_c = rf * d["MaTrCo"] / so_dii_eff

        fc = jax.vmap(
            lambda ys, src, b, cb: ocfe.ocfe_residual(ys, 1.0, src, b, cb, ops)
        )(cs, ri_scaled, beta_c, d["Cb_DiLe"])
        rows = [fc]
        if not spec.iso_thermal:
            en_ch = (thermo.cp_mean(ts_re, eq_idx) @ eq_nu.T) * (
                ts_re[:, None] - Tref
            )
            ov_he_re_t = jnp.sum(r0.T * (en_ch + dh25), axis=-1)
            dh_scaled = (1 / d["SoHeDiTe0"]) * (1 - ca_po) * (-ov_he_re_t)
            beta_t = rf * d["HeTrCo"] / (d["GaThCoMix0"] * ca_po)
            ft = ocfe.ocfe_residual(
                ts, ca_po * 1.0, dh_scaled, beta_t, d["Tb_DiLe"], ops
            )
            rows.append(ft[None])
        return jnp.concatenate(rows, axis=0).reshape(-1)

    return residual


def t2_derived(spec: ParticleSpec, p):
    """Computed transport/bulk state for the steady model (reference
    runT2, particleModels.py:1200-1470): Chapman-Enskog diffusivities,
    viscosity/conductivity + Wilke mixtures, Re/Sc/Sh/Pr/Nu, and the
    gas-solid transfer coefficients."""
    from ..props import film, transport

    idx = spec.comp_idx
    mw = jnp.asarray(DB.MW[idx])
    sp_coi0 = p["SpCoi0"]                   # [mol/m^3] for T2
    sp_co0 = jnp.sum(sp_coi0)
    mo_fri0 = sp_coi0 / sp_co0

    ga_dii0 = transport.diffusivity_chapman_enskog(p["T0"], p["P0"], mo_fri0, idx)
    ga_vii0 = transport.viscosity(p["T0"], idx)
    ga_mi_vi = transport.wilke_mixture(ga_vii0, mo_fri0, mw)
    ga_th_coi0 = transport.thermal_conductivity(p["T0"], idx)
    ga_th_co_mix0 = transport.wilke_mixture(ga_th_coi0, mo_fri0, mw)

    mi_mo_we0 = thermo.mixture_molecular_weight(mo_fri0, mw, "kg/mol")
    ga_de0 = thermo.density_ig(mi_mo_we0, sp_co0)
    cp0 = thermo.cp_mean(p["T0"], idx)
    cp_mix0 = thermo.cp_mix(mo_fri0, cp0)

    su_ga_ve0 = p["SuGaVe0"]
    re0 = film.reynolds(ga_de0, su_ga_ve0, p["PaDi"], ga_mi_vi)
    sc0 = film.schmidt(ga_de0, ga_mi_vi, ga_dii0)
    sh0 = film.sherwood(sc0, re0, film.FROSSLING)
    pr0 = film.prandtl(cp_mix0, ga_mi_vi, ga_th_co_mix0, mi_mo_we0)
    nu0 = film.nusselt(pr0, re0)
    ma_tr_co0 = film.mass_transfer_coefficient(sh0, ga_dii0, p["PaDi"])
    he_tr_co0 = film.heat_transfer_coefficient(nu0, ga_th_co_mix0, p["PaDi"])

    rf = p["PaDi"] / 2
    c_max = jnp.max(sp_coi0)
    so_ma_di_te0 = (ga_dii0 * c_max) / rf**2
    so_he_di_te0 = ga_th_co_mix0 * p["T0"] / rf**2   # [J/m^3.s] (no 1e-3)
    return {
        "GaDii0": ga_dii0,
        "GaThCoMix0": ga_th_co_mix0,
        "MaTrCo": ma_tr_co0,
        "HeTrCo": he_tr_co0,
        "SoMaDiTe0": so_ma_di_te0,
        "SoHeDiTe0": so_he_di_te0,
        "Cb_DiLe": sp_coi0 / c_max,
        "Tb_DiLe": jnp.asarray(0.0, sp_coi0.dtype),  # Tb = T0
    }


def t2_initial_state(spec: ParticleSpec, p):
    """Uniform dimensionless concentration at the bulk value, theta = 0
    (reference particleModels.py:1330-1350)."""
    c_max = jnp.max(p["SpCoi0"])
    c0 = (p["SpCoi0"] / c_max)[:, None] * jnp.ones((1, spec.r_no))
    rows = [c0]
    if not spec.iso_thermal:
        rows.append(jnp.zeros((1, spec.r_no), c0.dtype))
    return jnp.concatenate(rows, axis=0).reshape(-1)


def make_t2_residual_fn(spec: ParticleSpec):
    """Steady particle residual F(y) (reference modelEquationT2,
    particleModels.py:1669-2212). Unlike T1 the reaction/heat terms enter
    pre-scaled by the diffusive reference terms and all heat quantities
    stay in J units."""
    idx = spec.comp_idx
    n_comp = spec.n_comp
    r_no = spec.r_no
    n_layer = spec.n_layer
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    eq_idx = spec.stoich.eq_idx
    eq_nu = jnp.asarray(spec.stoich.eq_nu)
    dh25 = jnp.asarray(spec.stoich.dh_rxn_25)

    def residual(y, p, d):
        rf = p["PaDi"] / 2
        ca_po = p["CaPo"]

        Y = y.reshape(n_layer, r_no)
        cs = jnp.maximum(Y[:n_comp], EPS_CONST)
        c_max = jnp.max(p["SpCoi0"])
        cs_re = cs * c_max                           # [mol/m^3]
        ts = Y[n_comp] if not spec.iso_thermal else jnp.zeros((r_no,), y.dtype)
        ts_re = ts * p["T0"] + p["T0"]

        cos_sp_re = jnp.sum(cs_re, axis=0)
        mo_fri = (cs_re / cos_sp_re).T

        rate_fn = lambda T_, mf_, sc_: spec.rates(
            T_, p["P0"], mf_, sc_, p["kinetic_overrides"]
        )
        r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1), out_axes=1)(ts_re, mo_fri, cs_re)
        ri_r = jnp.einsum("mk,mz->kz", nu_comp, r0)

        en_ch = (thermo.cp_mean(ts_re, eq_idx) @ eq_nu.T) * (ts_re[:, None] - Tref)
        he_re_t = en_ch + dh25
        ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1)

        so_dii_eff = (ca_po / p["CaTo"]) * d["GaDii0"]
        ga_dii_dile = jnp.ones_like(d["GaDii0"])

        ri_scaled = (1 / d["SoMaDiTe0"])[:, None] * (1 - ca_po) * ri_r

        def per_species(cs_i, ri_i, d_dile, ma_i, cb_i, so_eff_i, gdii0_i):
            a = particle_fd.build_c_residual(
                cs_i, ri_i, d_dile, ma_i, cb_i, so_eff_i, rf, flux_dir="lr"
            )
            return a / (ca_po * rf**2 / gdii0_i)

        fc = jax.vmap(per_species)(
            cs, ri_scaled, ga_dii_dile, d["MaTrCo"], d["Cb_DiLe"], so_dii_eff, d["GaDii0"]
        )
        rows = [fc]
        if not spec.iso_thermal:
            cp_mean_i = thermo.cp_mean(ts_re, idx)
            so_cp_mix = jnp.sum(mo_fri * cp_mean_i, axis=-1)
            so_cp_eff_re = cos_sp_re * so_cp_mix * ca_po + (1 - ca_po) * p["CaDe"] * p["CaSpHeCa"]
            dh_scaled = (1 / d["SoHeDiTe0"]) * (1 - ca_po) * (-ov_he_re_t)
            so_th_eff_dile = ca_po * 1.0
            a_t = particle_fd.build_t_residual(
                ts, dh_scaled, so_th_eff_dile, d["HeTrCo"], d["Tb_DiLe"],
                d["GaThCoMix0"], rf,
            )
            ft = a_t / (so_cp_eff_re * p["T0"] / d["SoHeDiTe0"])
            rows.append(ft[None])
        return jnp.concatenate(rows, axis=0).reshape(-1)

    return residual
