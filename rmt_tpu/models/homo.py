# Pseudo-homogeneous packed-bed reactor models (N1 steady / N2 dynamic),
# dimensionless formulation, as pure jittable functions.
#
# The reference implements these as ~1400-line python methods with a per-node
# loop in the dynamic RHS (reference: PyREMOT/docs/pbHomoReactor.py:2694-3314
# for N1 runN1/modelEquationN1 and 3319-4134 for N2 runN2/modelEquationN2).
# Here the same math is expressed as
#   * a feed-state block computed in jnp from the raw operating parameters
#     (so inlet T/P/composition are vmap-able ensemble axes),
#   * a vectorized RHS: the N2 z-loop becomes stencil shifts + one lax.scan
#     for the explicit axial pressure march,
#   * a kinetics call that evaluates the user's DSL program batched over all
#     axial nodes at once.
# Deliberate quirk-for-quirk reproductions are marked QUIRK with the
# reference line they mirror.

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..constants import EPS_CONST, PI_CONST, R_CONST, Tref
from ..data import species as DB
from ..kinetics.dsl import RateProgram
from ..kinetics.stoich import Stoichiometry
from ..ops import df32 as _df32
from ..props import thermo, transport

ISO_THERMAL = "iso-thermal"


@dataclass(frozen=True)
class HomoSpec:
    """Static (trace-time) description of a homogeneous reactor model."""

    comp_list: tuple[str, ...]
    iso_thermal: bool
    stoich: Stoichiometry = field(hash=False, compare=False)
    rates: RateProgram = field(hash=False, compare=False)
    z_no: int = 20          # N2 axial nodes
    t_no: int = 5           # N2 outer time intervals
    times_no: int = 5       # N2 saved points per interval
    z_out: int = 100        # N1 output points (zNo in solverSetting['N1'])

    @property
    def n_comp(self) -> int:
        return len(self.comp_list)

    @property
    def comp_idx(self) -> np.ndarray:
        return DB.species_indices(self.comp_list)

    @property
    def var_no_n1(self) -> int:
        return self.n_comp + (1 if self.iso_thermal else 2)

    @property
    def var_no_n2(self) -> int:
        return self.n_comp + (0 if self.iso_thermal else 1)


def build_spec(model_input: Mapping[str, Any], **solver_overrides) -> HomoSpec:
    comp_list = tuple(model_input["feed"]["components"]["shell"])
    process_type = model_input["operating-conditions"].get("process-type", ISO_THERMAL)
    stoich = Stoichiometry(model_input["reactions"], comp_list)
    rates = RateProgram(
        model_input["reaction-rates"]["VARS"], model_input["reaction-rates"]["RATES"]
    )
    return HomoSpec(
        comp_list=comp_list,
        iso_thermal=(process_type == ISO_THERMAL),
        stoich=stoich,
        rates=rates,
        **solver_overrides,
    )


def build_params(model_input: Mapping[str, Any]) -> dict[str, Any]:
    """Numeric parameter pytree (every leaf is vmap-able / differentiable)."""
    oc = model_input["operating-conditions"]
    feed = model_input["feed"]
    re_spec = model_input["reactor"]
    ex_he = model_input.get("external-heat", {"OvHeTrCo": 0.0, "EfHeTrAr": 0.0, "MeTe": 0.0})
    f = lambda x: jnp.asarray(x, dtype=jnp.result_type(float))
    return {
        "P0": f(oc["pressure"]),
        "T0": f(oc["temperature"]),
        "opT": f(oc.get("period", 1.0)),
        "VoFlRa0": f(feed["volumetric-flowrate"]),
        "SpCoi0": f(np.asarray(feed["concentration"], dtype=np.float64)),
        "U": f(ex_he["OvHeTrCo"]),
        "Tm": f(ex_he["MeTe"]),
        "ReInDi": f(re_spec["ReInDi"]),
        "ReLe": f(re_spec["ReLe"]),
        "PaDi": f(re_spec["PaDi"]),
        "BeVoFr": f(re_spec["BeVoFr"]),
        "CaBeDe": f(re_spec["CaBeDe"]),
        "kinetic_overrides": {
            k: f(v) for k, v in model_input.get("kinetic-overrides", {}).items()
        },
    }


def feed_state(spec: HomoSpec, p: Mapping[str, Any]) -> dict[str, Any]:
    """Inlet/feed-derived reference scales (pbHomoReactor.py:2744-2827)."""
    idx = spec.comp_idx
    mw = jnp.asarray(DB.MW[idx])

    cr_se_ar = PI_CONST * p["ReInDi"] ** 2 / 4
    sp_coi0 = p["SpCoi0"]
    sp_co0 = jnp.sum(sp_coi0)
    su_ga_ve0 = p["VoFlRa0"] / cr_se_ar
    in_ga_ve0 = p["VoFlRa0"] / (cr_se_ar * p["BeVoFr"])
    mo_fri0 = sp_coi0 / sp_co0

    ga_vii0 = transport.viscosity(p["T0"], idx)
    ga_mi_vi = transport.wilke_mixture(ga_vii0, mo_fri0, mw)

    cp_mean0 = thermo.cp_mean(p["T0"], idx)            # [kJ/kmol.K]
    cp_mix0 = thermo.cp_mix(mo_fri0, cp_mean0)
    mi_mo_we0 = thermo.mixture_molecular_weight(mo_fri0, mw, "kg/mol")
    ga_de0 = thermo.density_ig(mi_mo_we0, sp_co0)

    # QUIRK: MODEL_SETTING['GaMaCoTe0'] == "MAX" -- the mass convective
    # reference scale uses max(Cif) for every species, and dimensionless
    # concentrations are y_i = C_i / max(C_f) (modelSetting.py:17,
    # pbHomoReactor.py:2819-2821,2833)
    c_max = jnp.max(sp_coi0)
    vf = su_ga_ve0
    zf = p["ReLe"]
    ga_ma_co_te0 = (vf / zf) * c_max                    # scalar (MAX mode)
    ga_he_co_te0 = ga_de0 * vf * p["T0"] * (cp_mix0 / mi_mo_we0) / zf

    # QUIRK: the heat-exchange area term is always 4/ReInDi, the user's
    # EfHeTrAr input is ignored (pbHomoReactor.py:2778,3411)
    a_eff = 4 / p["ReInDi"]

    return {
        "mw": mw,
        "CrSeAr": cr_se_ar,
        "SpCo0": sp_co0,
        "SuGaVe0": su_ga_ve0,
        "InGaVe0": in_ga_ve0,
        "MoFri0": mo_fri0,
        "GaMiVi": ga_mi_vi,
        "GaCpMeanMix0": cp_mix0,
        "MiMoWe0": mi_mo_we0,
        "GaDe0": ga_de0,
        "Cmax": c_max,
        "vf": vf,
        "zf": zf,
        "GaMaCoTe0": ga_ma_co_te0,
        "GaHeCoTe0": ga_he_co_te0,
        "aEff": a_eff,
    }


def _heat_exchange(Tm, T, U, a):
    """Qm [J/m^3.s]; Tm == 0 means adiabatic (rmtUtility.py:437-444)."""
    return jnp.where(Tm == 0, 0.0, U * a * (Tm - T))


def _reaction_energetics(spec: HomoSpec, T_real):
    """Heat of reaction at T [kJ/kmol] per reaction (rmtThermo.py:258-312).

    T_real may be scalar (N1) or (zNo,) (N2); returns (..., n_rxn).
    """
    eq_cp_mean = thermo.cp_mean(T_real, spec.stoich.eq_idx)     # (..., n_eq)
    en_ch = (eq_cp_mean @ spec.stoich.eq_nu.T) * (jnp.asarray(T_real)[..., None] - Tref)
    return en_ch + jnp.asarray(spec.stoich.dh_rxn_25)


# ---------------------------------------------------------------------------
# N1: steady-state dimensionless model (z is the integration variable)
# ---------------------------------------------------------------------------

def n1_initial_state(spec: HomoSpec, p, d):
    iv_c = p["SpCoi0"] / d["Cmax"]                     # pbHomoReactor.py:2833
    iv = [iv_c, jnp.ones((1,), iv_c.dtype)]            # P/Pf = 1
    if not spec.iso_thermal:
        iv.append(jnp.zeros((1,), iv_c.dtype))         # theta = (T-Tf)/Tf = 0
    return jnp.concatenate(iv)


def make_n1_rhs(spec: HomoSpec):
    """RHS of the steady model (mirrors modelEquationN1,
    pbHomoReactor.py:3017-3314)."""
    idx = spec.comp_idx
    n_comp = spec.n_comp
    nu_comp = jnp.asarray(spec.stoich.nu_comp)

    def rhs(z, y, p, d):
        co_spi = y[:n_comp]
        P_dl = y[n_comp]
        T_dl = y[n_comp + 1] if not spec.iso_thermal else jnp.asarray(0.0, y.dtype)

        co_spi_re = co_spi * d["Cmax"]
        co_sp_re = jnp.sum(co_spi_re)
        T_re = T_dl * p["T0"] + p["T0"]
        P_re = P_dl * p["P0"]
        mo_fri = co_spi_re / co_sp_re

        # velocity from EOS (rmtUtility.py:405-421)
        in_ga_ve = d["InGaVe0"] * (co_sp_re / d["SpCo0"]) * (p["P0"] / P_re)
        in_ga_ve_dl = in_ga_ve / d["InGaVe0"]
        su_ga_ve = in_ga_ve * p["BeVoFr"]
        su_ga_ve_dl = su_ga_ve / d["SuGaVe0"]

        mi_mo_we = thermo.mixture_molecular_weight(mo_fri, d["mw"], "kg/mol")
        ga_de_eos = thermo.density_ig_eos(P_re, T_re, mi_mo_we)
        ga_de_dl = ga_de_eos / d["GaDe0"]

        # Ergun momentum balance (pbHomoReactor.py:3214-3220)
        eps = p["BeVoFr"]
        erg_a = 150 * d["GaMiVi"] * su_ga_ve / p["PaDi"] ** 2
        erg_b = (1 - eps) ** 2 / eps**3
        erg_c = 1.75 * ga_de_eos * su_ga_ve**2 / p["PaDi"]
        erg_d = (1 - eps) / eps**3
        dxdt_p = -(erg_a * erg_b + erg_c * erg_d) / (p["P0"] / d["zf"])

        # kinetics: DSL program -> reaction rates -> formation rates
        r0 = spec.rates(T_re, P_re, mo_fri, co_spi_re, p["kinetic_overrides"])
        ri = r0 @ nu_comp                               # (n_comp,)

        # energy balance pieces
        cp_mean_i = thermo.cp_mean(T_re, idx)
        cp_mix = thermo.cp_mix(mo_fri, cp_mean_i)
        cp_mix_dl = cp_mix / d["GaCpMeanMix0"]
        cp_mix_eff_dl = cp_mix_dl * eps
        he_re_t = _reaction_energetics(spec, T_re)
        ov_he_re_t = jnp.dot(r0, he_re_t)
        qm = _heat_exchange(p["Tm"], T_re, p["U"], d["aEff"])

        dxdt_c = (1 / su_ga_ve_dl) * (ri / d["GaMaCoTe0"])
        out = [dxdt_c, dxdt_p[None]]
        if not spec.iso_thermal:
            const_t1 = 1 / (ga_de_dl * cp_mix_eff_dl * in_ga_ve_dl)
            dxdt_t = const_t1 * ((-ov_he_re_t + qm) / d["GaHeCoTe0"])
            out.append(dxdt_t[None])
        return jnp.concatenate(out)

    return rhs


# ---------------------------------------------------------------------------
# N2: dynamic dimensionless model (method of lines in z, time integration)
# ---------------------------------------------------------------------------

def n2_initial_state(spec: HomoSpec, p, d):
    c0 = (p["SpCoi0"] / d["Cmax"])[:, None] * jnp.ones((1, spec.z_no))
    rows = [c0]
    if not spec.iso_thermal:
        rows.append(jnp.zeros((1, spec.z_no), c0.dtype))
    return jnp.concatenate(rows, axis=0).reshape(-1)


def make_n2_rhs(spec: HomoSpec, frozen_pressure_jac: bool = False,
                accurate_rates: bool = False):
    """RHS of the dynamic model (mirrors modelEquationN2,
    pbHomoReactor.py:3706-4134) with the per-node python loop replaced by
    array stencils + one lax.scan for the explicit axial pressure march.

    frozen_pressure_jac=True stops gradients through the axial pressure
    march, making the Jacobian exactly block-bidiagonal in z. Use that
    variant ONLY to build preconditioner Jacobians (the march couples every
    node to all upstream nodes, but the coupling is weak); residual
    evaluations must use the exact RHS.

    accurate_rates=True evaluates the kinetics chain, the stoichiometric
    sum nu@R, and the reaction energetics in float64 inside an otherwise
    float32 evaluation (requires an x64-enabled process). Motivation
    (measured, scripts/rhs_noise.py): near chemical equilibrium the net
    formation rate is a small difference of large opposing rates, so the
    f32 rounding of the individual rates is amplified ~10^3x by the
    cancellation -- the dominant term of the f32 whole-run accuracy
    floor. Resolving just this chain in (TPU-emulated) f64 is cheap: it
    is a per-node elementwise scalar program plus a (n_rxn x n_comp)
    matvec, a tiny fraction of the RHS flops.

    accurate_rates="df32" resolves the same cancellation in compensated
    double-float32 pairs (ops/df32.py) instead of float64: pure f32
    VPU arithmetic, so it needs NO x64 process and none of the RHS runs
    in TPU-emulated float64. Rates agree with the f64 chain to ~5e-12
    relative (tests/test_df32.py); the only piece left at plain-f32
    quality is the reaction energetics (benign cp polynomials).
    """
    idx = spec.comp_idx
    n_comp = spec.n_comp
    z_no = spec.z_no
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    var_no = spec.var_no_n2
    dz = 1.0 / (z_no - 1)
    df32_mode = accurate_rates == "df32"
    if accurate_rates and not df32_mode and not config.x64_enabled():
        raise ValueError(
            "accurate_rates needs an x64-enabled process (RMT_TPU_X64=1) "
            "so float64 exists for the kinetics chain; accurate_rates="
            "'df32' provides the compensated chain without x64"
        )

    def rhs(t, y, p, d):
        Y = y.reshape(var_no, z_no)
        c_raw = Y[:n_comp]                              # (n_comp, zNo)
        # QUIRK: concentrations are clamped at EPS for the source/kinetics
        # path but the *raw* center value feeds the convection stencil
        # (pbHomoReactor.py:3899 vs 4086)
        c_clamped = jnp.maximum(c_raw, EPS_CONST)
        T_dl = Y[n_comp] if not spec.iso_thermal else jnp.zeros((z_no,), y.dtype)

        co_spi_re = c_clamped * d["Cmax"]
        T_re = T_dl * p["T0"] + p["T0"]
        mo_fri = co_spi_re / jnp.sum(co_spi_re, axis=0, keepdims=True)
        mi_mo_we = thermo.mixture_molecular_weight(mo_fri.T, d["mw"], "kg/mol")

        # frozen-velocity assumption: v_z[z+1] = v_z[z] = SuGaVe0
        # (QUIRK, pbHomoReactor.py:4066)
        su_ga_ve = d["SuGaVe0"]
        v_dl = su_ga_ve / d["vf"]
        in_ga_ve_dl = (su_ga_ve / p["BeVoFr"]) / d["InGaVe0"]

        # explicit axial pressure march (QUIRK: the momentum balance is an
        # algebraic forward-Euler update inside the RHS, not an ODE state;
        # pbHomoReactor.py:3970-3979)
        eps = p["BeVoFr"]
        erg_a = 150 * d["GaMiVi"] * su_ga_ve / p["PaDi"] ** 2
        erg_b = (1 - eps) ** 2 / eps**3
        erg_c_coef = 1.75 * su_ga_ve**2 / p["PaDi"]
        erg_d = (1 - eps) / eps**3
        rg_t = (R_CONST / mi_mo_we) * T_re              # (zNo,)
        if frozen_pressure_jac:
            rg_t = jax.lax.stop_gradient(rg_t)

        # the explicit march P_{z+1} = P_z + dz*(-(ergA*ergB) -
        # (ergC*ergD/rgt_z)*P_z) is an AFFINE recurrence
        # P_{z+1} = a_z*P_z + b -- solved in closed form with cumprod/cumsum
        # instead of a lax.scan (an inner scan nested under the integrator's
        # scans costs ~10x on the TPU runtime)
        a_co = 1.0 - (erg_c_coef * erg_d / rg_t) * dz   # (zNo,)
        b_co = -(erg_a * erg_b) * dz
        A_cum = jnp.concatenate(
            [jnp.ones((1,), a_co.dtype), jnp.cumprod(a_co[:-1])]
        )                                               # prod(a[0:k])
        D = b_co / (A_cum * a_co)                       # b_i / prod(a[0:i+1])
        S = jnp.concatenate(
            [jnp.zeros((1,), a_co.dtype), jnp.cumsum(D[:-1])]
        )                                               # sum_{i<k}
        P_z = A_cum * (p["P0"] + S)                     # node values P_z[z]

        ga_de_eos = P_z / rg_t
        ga_de_dl = ga_de_eos / d["GaDe0"]

        # kinetics batched over the axial nodes. Under accurate_rates the
        # chain resolves the nu@R cancellation (which amplifies rate
        # rounding ~10^3x near equilibrium, see the docstring) before the
        # single final rounding -- in float64 (accurate_rates=True, x64
        # process) or in compensated double-float32 pairs
        # (accurate_rates="df32", pure-f32 ops; ops/df32.py).
        if df32_mode:
            r0_df = spec.rates(
                _df32.DF32.from_value(T_re), _df32.DF32.from_value(P_z),
                _df32.DF32.from_value(mo_fri),
                _df32.DF32.from_value(co_spi_re), p["kinetic_overrides"]
            )                                           # DF32 (n_rxn, zNo)
            nu32 = nu_comp.astype(jnp.float32)
            ri_df = None                                # nu^T @ r0, pairs
            for m in range(nu32.shape[0]):
                term = r0_df[m] * nu32[m][:, None]      # DF32 (n_comp, zNo)
                ri_df = term if ri_df is None else ri_df + term
            ri = ri_df.value(y.dtype)
            r0 = None                                   # pairs consumed below
        else:
            hi = jnp.float64 if accurate_rates else T_re.dtype
            rate_fn = lambda T_, P_, mf_, sc_: spec.rates(
                T_, P_, mf_, sc_, p["kinetic_overrides"]
            )
            r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1, 1), out_axes=1)(
                T_re.astype(hi), P_z.astype(hi), mo_fri.astype(hi),
                co_spi_re.astype(hi)
            )                                           # (n_rxn, zNo)
            ri = jnp.einsum(
                "mk,mz->kz", nu_comp.astype(hi), r0
            ).astype(y.dtype)                           # (n_comp, zNo)

        cp_mean_i = thermo.cp_mean(T_re, idx)           # (zNo, n_comp)
        cp_mix = jnp.sum(mo_fri.T * cp_mean_i, axis=-1)
        cp_mix_dl = cp_mix / d["GaCpMeanMix0"]
        cp_mix_eff_dl = cp_mix_dl * eps
        if df32_mode:
            # energetics stay plain f32 (benign polynomials); the r0-
            # weighted sum keeps the rate pairs so no re-rounding enters
            he_re_t = _reaction_energetics(spec, T_re)  # (zNo, n_rxn)
            he32 = he_re_t.astype(jnp.float32)
            ov_df = None
            for m in range(nu32.shape[0]):
                term = r0_df[m] * he32[:, m]            # DF32 (zNo,)
                ov_df = term if ov_df is None else ov_df + term
            ov_he_re_t = ov_df.value(y.dtype)
        else:
            he_re_t = _reaction_energetics(spec, T_re.astype(hi))
            ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1).astype(y.dtype)
        qm = _heat_exchange(p["Tm"], T_re, p["U"], d["aEff"])

        const_f1 = 1 / (eps * (d["zf"] / d["vf"]))
        const_t2 = 1 / (ga_de_dl * cp_mix_dl * eps * (d["zf"] / d["vf"]))

        # backward-difference convection with inlet BC1 (pbHomoReactor.py:4082-4099)
        c_in = (p["SpCoi0"] / d["Cmax"])[:, None]
        c_back = jnp.concatenate([c_in, c_clamped[:, :-1]], axis=1)
        dcdz = (c_raw - c_back) / dz
        dxdt_c = const_f1 * (-v_dl * dcdz + ri / d["GaMaCoTe0"])

        rows = [dxdt_c]
        if not spec.iso_thermal:
            t_back = jnp.concatenate([jnp.zeros((1,), T_dl.dtype), T_dl[:-1]])
            dtdz = (T_dl - t_back) / dz
            convective = -in_ga_ve_dl * ga_de_dl * cp_mix_eff_dl * dtdz
            formation = -ov_he_re_t / d["GaHeCoTe0"]
            exchange = qm / d["GaHeCoTe0"]
            dxdt_t = const_t2 * (convective + formation + exchange)
            rows.append(dxdt_t[None])

        return jnp.concatenate(rows, axis=0).reshape(-1)

    return rhs


def make_n2_colored_jacobian(spec: HomoSpec):
    """Sparse (colored) Jacobian of the N2 RHS for preconditioning.

    The MoL stencil couples node z only to nodes {z, z-1} (backward
    difference), so with the pressure march frozen the Jacobian is block
    bidiagonal with (varNo x varNo) blocks. Curtis-Powell-Reid coloring
    gives 2*varNo JVP directions instead of varNo*zNo dense tangents --
    a ~zNo/2 reduction in the dominant stiff-solver cost.
    """
    from ..ops.jacobian import colored_jacobian

    return colored_jacobian(
        make_n2_rhs(spec, frozen_pressure_jac=True), spec.var_no_n2, spec.z_no
    )


def make_n2_bidiag_blocks(spec: HomoSpec):
    """Per-member (Jd, Jl) block Jacobian of the N2 RHS, gathered
    directly from the colored JVP products (ops.jacobian.
    colored_bidiag_blocks) -- never forms the dense (n, n) matrix. Same
    values as extract_bidiag_blocks(make_n2_colored_jacobian(...))."""
    from ..ops.jacobian import colored_bidiag_blocks

    return colored_bidiag_blocks(
        make_n2_rhs(spec, frozen_pressure_jac=True), spec.var_no_n2,
        spec.z_no
    )


def make_n2_rhs_b(spec: HomoSpec, frozen_pressure_jac: bool = False,
                  accurate_rates=False):
    """Natively BATCHED N2 RHS with a member-LAST internal layout.

    Same math as make_n2_rhs (modelEquationN2 semantics, quirks
    included), but rhs_b(t (B,), y (B, n), p, d) takes p/d leaves
    pre-broadcast to a leading member axis and computes everything on
    member-last arrays: Y (var, z, B), kinetics on (z, B) / (nc, z, B).

    Motivation (measured on the tunneled v5e, scripts/
    attempt_cost_matrix.py): under vmap the per-node arrays are
    (B, zNo) = (512, 20), whose TPU tiling uses 20 of 128 lanes -- every
    elementwise op in the long kinetics chain (and every op of the df32
    compensated chain, ~3000 f32 primitives) pays a ~6x tile-padding
    penalty. Member-last puts B on the lane axis, so the same chain runs
    at full VPU width; per-member parameters broadcast naturally against
    the trailing axis. Only accurate_rates in (False, "df32") is
    supported (the x64-hybrid legs keep the vmapped path).
    """
    if accurate_rates not in (False, "df32"):
        raise ValueError(
            "make_n2_rhs_b supports accurate_rates False or 'df32' only"
        )
    idx = spec.comp_idx
    n_comp = spec.n_comp
    z_no = spec.z_no
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    var_no = spec.var_no_n2
    dz = 1.0 / (z_no - 1)
    df32_mode = accurate_rates == "df32"

    def rhs(t, y, p, d):
        Bsz = y.shape[0]
        Y = y.reshape(Bsz, var_no, z_no).transpose(1, 2, 0)  # (var, z, B)
        c_raw = Y[:n_comp]                              # (nc, z, B)
        c_clamped = jnp.maximum(c_raw, EPS_CONST)
        T_dl = (Y[n_comp] if not spec.iso_thermal
                else jnp.zeros((z_no, Bsz), y.dtype))   # (z, B)

        co_spi_re = c_clamped * d["Cmax"]               # (nc, z, B)*(B,)
        T_re = T_dl * p["T0"] + p["T0"]                 # (z, B)
        mo_fri = co_spi_re / jnp.sum(co_spi_re, axis=0, keepdims=True)
        mw_t = d["mw"].T                                # (nc, B)
        mi_mo_we = jnp.sum(mo_fri * mw_t[:, None, :], axis=0) * 1e-3

        su_ga_ve = d["SuGaVe0"]                         # (B,)
        v_dl = su_ga_ve / d["vf"]
        in_ga_ve_dl = (su_ga_ve / p["BeVoFr"]) / d["InGaVe0"]

        eps = p["BeVoFr"]
        erg_a = 150 * d["GaMiVi"] * su_ga_ve / p["PaDi"] ** 2
        erg_b = (1 - eps) ** 2 / eps**3
        erg_c_coef = 1.75 * su_ga_ve**2 / p["PaDi"]
        erg_d = (1 - eps) / eps**3
        rg_t = (R_CONST / mi_mo_we) * T_re              # (z, B)
        if frozen_pressure_jac:
            rg_t = jax.lax.stop_gradient(rg_t)

        # closed-form affine pressure march (see make_n2_rhs), z axis 0
        a_co = 1.0 - (erg_c_coef * erg_d / rg_t) * dz   # (z, B)
        b_co = -(erg_a * erg_b) * dz                    # (B,)
        A_cum = jnp.concatenate(
            [jnp.ones((1, Bsz), a_co.dtype), jnp.cumprod(a_co[:-1], axis=0)]
        )
        D = b_co / (A_cum * a_co)
        S = jnp.concatenate(
            [jnp.zeros((1, Bsz), a_co.dtype), jnp.cumsum(D[:-1], axis=0)]
        )
        P_z = A_cum * (p["P0"] + S)                     # (z, B)

        ga_de_eos = P_z / rg_t
        ga_de_dl = ga_de_eos / d["GaDe0"]

        if df32_mode:
            r0_df = spec.rates(
                _df32.DF32.from_value(T_re), _df32.DF32.from_value(P_z),
                _df32.DF32.from_value(mo_fri),
                _df32.DF32.from_value(co_spi_re), p["kinetic_overrides"]
            )                                           # DF32 (n_rxn, z, B)
            nu32 = nu_comp.astype(jnp.float32)
            ri_df = None
            for m in range(nu32.shape[0]):
                term = r0_df[m] * nu32[m][:, None, None]
                ri_df = term if ri_df is None else ri_df + term
            ri = ri_df.value(y.dtype)                   # (nc, z, B)
        else:
            r0 = spec.rates(
                T_re, P_z, mo_fri, co_spi_re, p["kinetic_overrides"]
            )                                           # (n_rxn, z, B)
            ri = jnp.sum(
                nu_comp[:, :, None, None] * r0[:, None], axis=0
            ).astype(y.dtype)                           # (nc, z, B)

        cp_mean_i = thermo.cp_mean(T_re, idx)           # (z, B, nc)
        cp_i_t = jnp.moveaxis(cp_mean_i, -1, 0)         # (nc, z, B)
        cp_mix = jnp.sum(mo_fri * cp_i_t, axis=0)       # (z, B)
        cp_mix_dl = cp_mix / d["GaCpMeanMix0"]
        cp_mix_eff_dl = cp_mix_dl * eps
        he_re_t = _reaction_energetics(spec, T_re)      # (z, B, n_rxn)
        he_t = jnp.moveaxis(he_re_t, -1, 0)             # (n_rxn, z, B)
        if df32_mode:
            he32 = he_t.astype(jnp.float32)
            ov_df = None
            for m in range(nu32.shape[0]):
                term = r0_df[m] * he32[m]
                ov_df = term if ov_df is None else ov_df + term
            ov_he_re_t = ov_df.value(y.dtype)           # (z, B)
        else:
            ov_he_re_t = jnp.sum(r0 * he_t, axis=0).astype(y.dtype)
        qm = _heat_exchange(p["Tm"], T_re, p["U"], d["aEff"])

        const_f1 = 1 / (eps * (d["zf"] / d["vf"]))      # (B,)
        const_t2 = 1 / (ga_de_dl * cp_mix_dl * eps * (d["zf"] / d["vf"]))

        c_in = (p["SpCoi0"] / d["Cmax"][:, None]).T[:, None, :]  # (nc,1,B)
        c_back = jnp.concatenate([c_in, c_clamped[:, :-1]], axis=1)
        dcdz = (c_raw - c_back) / dz
        dxdt_c = const_f1 * (-v_dl * dcdz + ri / d["GaMaCoTe0"])

        rows = [dxdt_c]
        if not spec.iso_thermal:
            t_back = jnp.concatenate(
                [jnp.zeros((1, Bsz), T_dl.dtype), T_dl[:-1]], axis=0
            )
            dtdz = (T_dl - t_back) / dz
            convective = -in_ga_ve_dl * ga_de_dl * cp_mix_eff_dl * dtdz
            formation = -ov_he_re_t / d["GaHeCoTe0"]
            exchange = qm / d["GaHeCoTe0"]
            dxdt_t = const_t2 * (convective + formation + exchange)
            rows.append(dxdt_t[None])

        out = jnp.concatenate(rows, axis=0)             # (var, z, B)
        return out.transpose(2, 0, 1).reshape(Bsz, -1)

    return rhs


def make_n2_colored_jacobian_b(spec: HomoSpec):
    """Batched colored Jacobian (B, n, n) through the member-last RHS:
    2*varNo JVP tangents tiled across the batch (members never mix)."""
    from ..ops.jacobian import banded_coloring, batched_colored_jacobian

    rhs_b = make_n2_rhs_b(spec, frozen_pressure_jac=True)
    coloring = banded_coloring(spec.var_no_n2, spec.z_no)

    def jac(t, y, p, d):
        fB = lambda yy: rhs_b(t, yy, p, d)
        return batched_colored_jacobian(fB, coloring)(y)

    return jac


# ---------------------------------------------------------------------------
# T3: steady axial-dispersion pseudo-homogeneous model, posed as a nonlinear
# root problem F(y) = 0 and solved by damped Newton.
#
# Reference: PyREMOT/examples/homoModels.py:49-539 (runT1 driver) and
# :540-1421 (modelEquationT1). The reference registers it as T3Init
# (rmtCore.py:440-449) but the model dispatcher never routes "T3", so the
# code path is unreachable there; here it is a first-class model. Both mesh
# branches are wired: uniform (solver-config mesh == "normal") and the
# two-zone refined mesh (api/rmt.py routes mesh != "normal" through
# ops/stencils.two_zone_mesh; parity + e2e in tests/test_mesh.py).
# ---------------------------------------------------------------------------

def t3_params(model_input: Mapping[str, Any]) -> dict[str, Any]:
    """build_params + the transport feed fields T3 needs
    (homoModels.py:105-134)."""
    p = build_params(model_input)
    feed = model_input["feed"]
    ex_he = model_input.get("external-heat", {"OvHeTrCo": 0.0, "EfHeTrAr": 0.0, "MeTe": 0.0})
    f = lambda x: jnp.asarray(x, dtype=jnp.result_type(float))
    p.update(
        {
            # vf: the user-given superficial velocity (homoModels.py:113,294)
            "vf": f(feed["superficial-velocity"]),
            "GaDii0": f(np.asarray(feed["diffusivity"], dtype=np.float64)),
            "GaThCoMix0": f(feed["mixture-thermal-conductivity"]),
            "GaViMix0": f(feed["mixture-viscosity"]),
            # T3 uses the user's heat-transfer area as given -- unlike
            # N1/N2's 4/ReInDi quirk (homoModels.py:1099-1104)
            "EfHeTrAr": f(ex_he["EfHeTrAr"]),
        }
    )
    return p


def t3_feed(spec: HomoSpec, p: Mapping[str, Any]) -> dict[str, Any]:
    """Feed scales for T3 (homoModels.py:280-340).

    Differences vs feed_state (the N-models): SpCoi0 is taken in kmol/m^3
    and density uses SpCo0*1000; the heat convective scale carries a 1e-3
    (kJ) factor; Peclet numbers appear because of the dispersion terms.
    """
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
    # MAX-mode scalar mass scale (homoModels.py:304-307)
    ga_ma_co_te0 = (vf / zf) * c_max
    # heat convective scale in kJ (homoModels.py:310)
    ga_he_co_te0 = (ga_de0 * vf * p["T0"] * (cp_mix0 / mi_mo_we0) / zf) * 1e-3
    pe_ma0 = vf * zf / p["GaDii0"]                     # (n_comp,)
    pe_he0 = zf * ga_de0 * (cp_mix0 / mi_mo_we0) * vf / p["GaThCoMix0"]
    # the momentum/velocity quirk pair (homoModels.py:928,1141): the Ergun
    # equation uses VoFlRa0/CrSeAr while convection uses its ratio to the
    # user's vf
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
        "SuGaVe0eq": su_ga_ve0,
        "vDl": su_ga_ve0 / vf,
    }


def t3_initial_guess(spec: HomoSpec) -> jnp.ndarray:
    """Flat initial iterate: C* = 0.5, theta = 0.25 (homoModels.py:235-258)."""
    n_layer = spec.n_comp + (0 if spec.iso_thermal else 1)
    g = jnp.full((n_layer, spec.z_no), 0.5, jnp.result_type(float))
    if not spec.iso_thermal:
        g = g.at[-1].set(0.25)
    return g.reshape(-1)


def make_t3_residual(spec: HomoSpec, mesh=None):
    """Steady residual F(y) of the axial-dispersion model, vectorized over
    the z nodes (mirrors modelEquationT1, homoModels.py:540-1421).

    Stencils (solverSetting['T1']: dFdz=BD, d2Fdz2=CD), built as per-node
    weight rows by ops.stencils.axial_stencil_weights:
      * first derivative: backward difference (non-uniform in the dense
        zone of a refined mesh, homoModels.py:1214-1237);
      * second derivative: central, with a Danckwerts ghost node at the
        inlet (homoModels.py:1158-1213) and a zero-gradient mirror at the
        outlet (homoModels.py:1240-1256);
      * the raw (unclamped) state feeds the stencils while kinetics and
        properties see EPS-clamped concentrations (homoModels.py:885-894).
    The Ergun pressure march has no P feedback (unlike N2), so it is a pure
    prefix sum -- and it keeps the UNIFORM dz even on a refined mesh, as
    the reference does (homoModels.py:963).

    mesh: a two_zone_mesh(...) result for solver-config mesh != "normal"
    (reference FiDiMeshGenerator path, homoModels.py:149-161); None for
    the uniform grid.
    """
    from ..ops import stencils as _st

    idx = spec.comp_idx
    n_comp = spec.n_comp
    z_no = spec.z_no
    nu_comp = jnp.asarray(spec.stoich.nu_comp)
    n_layer = n_comp + (0 if spec.iso_thermal else 1)
    # the Ergun march steps with the UNIFORM-zone dz even on a refined
    # mesh (the reference keeps meshSetting dz = data5 there,
    # homoModels.py:963)
    dz = float(mesh["dz_uniform"]) if mesh is not None else 1.0 / (z_no - 1)
    ws = _st.axial_stencil_weights(z_no, mesh)
    W1, W2, dz_bc1 = ws["W1"], ws["W2"], ws["dz_bc1"]

    def residual(y, p, d):
        Y = y.reshape(n_layer, z_no)
        c_raw = Y[:n_comp]
        T_dl = Y[n_comp] if not spec.iso_thermal else jnp.zeros((z_no,), y.dtype)

        c_cl = jnp.maximum(c_raw, EPS_CONST)
        co_spi_re = c_cl * d["Cmax"]                    # (n_comp, zNo) kmol/m^3
        co_sp_re = jnp.sum(co_spi_re, axis=0)
        T_re = T_dl * p["T0"] + p["T0"]
        mo_fri = co_spi_re / co_sp_re
        mi_mo_we = thermo.mixture_molecular_weight(mo_fri.T, d["mw"], "kg/mol")
        ga_de = thermo.density_ig(mi_mo_we, co_sp_re * 1000.0)
        ga_de_dl = ga_de / d["GaDe0"]

        # Ergun march, no P feedback -> prefix sum (homoModels.py:950-966)
        eps = p["BeVoFr"]
        su0 = d["SuGaVe0eq"]
        erg_a = 150 * p["GaViMix0"] * su0 / p["PaDi"] ** 2
        erg_b = (1 - eps) ** 2 / eps**3
        erg_c = 1.75 * ga_de * su0**2 / p["PaDi"]       # (zNo,)
        erg_d = (1 - eps) / eps**3
        rhs_erg = -(erg_a * erg_b + erg_c * erg_d)
        P_z = p["P0"] + dz * jnp.concatenate(
            [jnp.zeros((1,), rhs_erg.dtype), jnp.cumsum(rhs_erg[:-1])]
        )

        # kinetics batched over nodes (homoModels.py:1023-1037)
        rate_fn = lambda T_, P_, mf_, sc_: spec.rates(
            T_, P_, mf_, sc_, p["kinetic_overrides"]
        )
        r0 = jax.vmap(rate_fn, in_axes=(0, 0, 1, 1), out_axes=1)(
            T_re, P_z, mo_fri, co_spi_re
        )                                               # (n_rxn, zNo)
        ri = jnp.einsum("mk,mz->kz", nu_comp, r0)

        cp_mean_i = thermo.cp_mean(T_re, idx)
        cp_mix = jnp.sum(mo_fri.T * cp_mean_i, axis=-1)
        cp_mix_dl = cp_mix / d["GaCpMeanMix0"]
        he_re_t = _reaction_energetics(spec, T_re)
        ov_he_re_t = jnp.sum(r0.T * he_re_t, axis=-1)
        # Qm in kJ/m^3.s with the user's EfHeTrAr (homoModels.py:1099-1112)
        qm = _heat_exchange(p["Tm"], T_re, p["U"], p["EfHeTrAr"]) * 1e-3

        v_dl = d["vDl"]

        # mass stencils: per-node weight rows, Danckwerts inlet ghost
        inv_m = 1.0 / (d["PeNuMa0"] * dz_bc1)           # (n_comp,)
        c_in = p["SpCoi0"] / d["Cmax"]
        c_ghost = (c_in + inv_m * c_raw[:, 1]) / (inv_m + 1.0)
        dcdz = _st.apply_axial_weights(W1, c_raw, c_ghost[:, None])
        d2c = _st.apply_axial_weights(W2, c_raw, c_ghost[:, None])
        res_c = (
            -v_dl * dcdz
            + (eps / d["PeNuMa0"])[:, None] * d2c
            + ri / d["GaMaCoTe0"]
        )

        rows = [res_c]
        if not spec.iso_thermal:
            inv_h = 1.0 / (d["PeNuHe0"] * dz_bc1)
            t_ghost = (inv_h * T_dl[1]) / (inv_h + 1.0)  # T*_in = 0
            dtdz = _st.apply_axial_weights(W1, T_dl, t_ghost)
            d2t = _st.apply_axial_weights(W2, T_dl, t_ghost)
            res_t = (
                -v_dl * ga_de_dl * cp_mix_dl * dtdz
                + (1.0 / d["PeNuHe0"]) * d2t
                + (-ov_he_re_t + qm) / d["GaHeCoTe0"]
            )
            rows.append(res_t[None])

        return jnp.concatenate(rows, axis=0).reshape(-1)

    return residual
