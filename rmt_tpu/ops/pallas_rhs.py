# Fused Pallas kernel for the N2 dynamic RHS (whole-RHS fusion).
#
# WHY (measured, STATUS.md round-4 attempt-cost attribution): the tunneled
# TPU runtime's per-attempt cost is program-size/op-count-bound, not
# arithmetic-bound -- a single df32 RHS eval costs 0.4 ms at B=512 while
# the df32 leg's measured premium is +312 ms/attempt, and the compiled
# df32 RHS is ~12.5k HLO ops vs ~1.5k plain (the compensated-pair EFTs
# expand every arithmetic op ~8x). Fusing the WHOLE RHS -- stencils,
# pressure march, kinetics DSL chain, energetics -- into one Pallas kernel
# collapses those thousands of ops into a single kernel launch per eval.
#
# Layout: member-last. The kernel works on (z, BT) tiles with the member
# batch on the LANE axis (full VPU width for the long elementwise kinetics
# chain) and species/reactions as unrolled Python loops over 2D arrays --
# no 3D relayouts, no cumsum/cumprod (Hillis-Steele shifts instead), no
# frexp/ldexp (ops/floatbits.py bit forms), no stacked rate tensors
# (kinetics/dsl.py call_list). Same math as models/homo.make_n2_rhs_b
# (modelEquationN2 semantics, QUIRKs included -- see make_n2_rhs's
# docstring for the reference file:line map, pbHomoReactor.py:3706-4134);
# summation ORDER differs only in benign plain-f32 reductions (tree-form
# prefix scans, zero-coefficient skipping), bounded by the parity test.
#
# The DSL kinetics run UNCHANGED inside the kernel: user lambdas are traced
# with (z, BT) arrays / DF32 pairs exactly as on the XLA path; MoFri/SpCoi
# are seeded as per-species LISTS, so programs that only index them (every
# reference chemistry) work verbatim. A program doing whole-vector math on
# MoFri/SpCoi fails at trace time -- callers catch and fall back to the
# XLA path.

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS_CONST, R_CONST, Tref
from ..data import species as DB
from . import df32 as _df32

_f32 = jnp.float32

# parameter leaves the N2 core reads, in fixed operand order
_P_1D = ("T0", "BeVoFr", "PaDi", "P0", "Tm", "U")
_P_2D = ("SpCoi0",)
_D_1D = ("Cmax", "SuGaVe0", "vf", "zf", "InGaVe0", "GaMiVi", "GaDe0",
         "GaCpMeanMix0", "GaMaCoTe0", "GaHeCoTe0", "aEff")
_D_2D = ("mw",)


def _shift_down(x, s, top):
    """(z, B) rows shifted down by s; the top s rows come from ``top``
    (scalar fill or an (s, B) block). Static-slice + concat form -- the
    only z-axis data movement the kernel uses."""
    if isinstance(top, (int, float)):
        top = jnp.full((s,) + x.shape[1:], top, x.dtype)
    return jnp.concatenate([top, x[:-s]], axis=0)


def _prefix_prod_excl(a):
    """A[k] = prod_{i<k} a[i] along axis 0 (A[0] = 1), Hillis-Steele
    doubling (ceil(log2 z) rounds of shift+mul) -- replaces jnp.cumprod,
    which has no Mosaic lowering. Tree order differs from the sequential
    cumprod by ~f32 eps (covered by the parity test)."""
    z = a.shape[0]
    x = _shift_down(a, 1, 1.0)
    s = 1
    while s < z:
        x = x * _shift_down(x, s, 1.0)
        s *= 2
    return x


def _prefix_sum_excl(a):
    """S[k] = sum_{i<k} a[i] along axis 0 (S[0] = 0)."""
    z = a.shape[0]
    x = _shift_down(a, 1, 0.0)
    s = 1
    while s < z:
        x = x + _shift_down(x, s, 0.0)
        s *= 2
    return x


def _n2_core_ml(spec, df32_mode: bool, Y, p, d):
    """Member-last N2 RHS core: Y (var, z, B) -> dY/dt (var, z, B).

    p/d leaves are member-last: (B,) scalars, (n_comp, B) vectors. All
    internal values are 2D (z, B) or (B,) f32 -- species and reactions are
    unrolled Python loops (n_comp/n_rxn are tiny), which is both the
    Mosaic-safest profile and fewer ops than dense (nc, z, B) broadcasts.
    """
    n_comp = spec.n_comp
    z_no = spec.z_no
    dz = np.float32(1.0 / (z_no - 1))
    eps_c = np.float32(EPS_CONST)
    nu = np.asarray(spec.stoich.nu_comp, dtype=np.float64)  # (n_rxn, nc)
    cp_coeff = np.asarray(DB.CP_COEFF[spec.comp_idx], dtype=np.float32)
    eq_idx = np.asarray(spec.stoich.eq_idx)
    cp_coeff_eq = np.asarray(DB.CP_COEFF[eq_idx], dtype=np.float32)
    eq_nu = np.asarray(spec.stoich.eq_nu, dtype=np.float64)  # (n_rxn, n_eq)
    dh25 = np.asarray(spec.stoich.dh_rxn_25, dtype=np.float32)
    tref = np.float32(Tref)

    def cp_poly(c, T):
        # c0 + c1*T + c2*T^2 + c3*T^3, Horner-free to match cp_mol's form
        return (np.float32(c[0]) + np.float32(c[1]) * T
                + np.float32(c[2]) * T * T + np.float32(c[3]) * T * T * T)

    c_raw = [Y[s] for s in range(n_comp)]                 # (z, B) each
    # QUIRK: clamped for kinetics/sources, raw for convection
    # (pbHomoReactor.py:3899 vs 4086)
    c_cl = [jnp.maximum(c, eps_c) for c in c_raw]
    T_dl = (Y[n_comp] if not spec.iso_thermal
            else jnp.zeros(Y.shape[1:], Y.dtype))          # (z, B)

    co_re = [c * d["Cmax"] for c in c_cl]                  # (z, B)*(B,)
    T_re = T_dl * p["T0"] + p["T0"]
    ctot = functools.reduce(jnp.add, co_re)
    mo_fri = [c / ctot for c in co_re]
    mi_mo_we = functools.reduce(
        jnp.add, [mo_fri[s] * d["mw"][s] for s in range(n_comp)]
    ) * np.float32(1e-3)                                   # (z, B), kg/mol

    # frozen-velocity assumption (QUIRK, pbHomoReactor.py:4066)
    su_ga_ve = d["SuGaVe0"]                                # (B,)
    v_dl = su_ga_ve / d["vf"]
    in_ga_ve_dl = (su_ga_ve / p["BeVoFr"]) / d["InGaVe0"]

    eps = p["BeVoFr"]
    erg_a = np.float32(150.0) * d["GaMiVi"] * su_ga_ve / (p["PaDi"] * p["PaDi"])
    one = np.float32(1.0)
    erg_b = (one - eps) * (one - eps) / (eps * eps * eps)
    erg_c_coef = np.float32(1.75) * su_ga_ve * su_ga_ve / p["PaDi"]
    erg_d = (one - eps) / (eps * eps * eps)
    rg_t = (np.float32(R_CONST) / mi_mo_we) * T_re         # (z, B)

    # explicit axial pressure march as a closed-form affine recurrence
    # (QUIRK, pbHomoReactor.py:3970-3979; see make_n2_rhs)
    a_co = one - (erg_c_coef * erg_d / rg_t) * dz          # (z, B)
    b_co = -(erg_a * erg_b) * dz                           # (B,)
    A_cum = _prefix_prod_excl(a_co)
    Dq = b_co / (A_cum * a_co)
    Sq = _prefix_sum_excl(Dq)
    P_z = A_cum * (p["P0"] + Sq)                           # (z, B)

    ga_de_dl = (P_z / rg_t) / d["GaDe0"]

    # kinetics: the DSL dict-program traced in-kernel; list-seeded
    # MoFri/SpCoi (index-only access). df32 keeps the compensated pairs
    # through the nu@R cancellation (ops/df32.py rationale).
    ko = p["kinetic_overrides"]
    if df32_mode:
        DF = _df32.DF32.from_value
        r_list = spec.rates.call_list(
            DF(T_re), DF(P_z), [DF(m) for m in mo_fri],
            [DF(c) for c in co_re], ko,
        )
        r_list = [_df32.DF32.from_value(r) for r in r_list]
    else:
        r_list = spec.rates.call_list(T_re, P_z, mo_fri, co_re, ko)
        r_list = [jnp.asarray(r, dtype=Y.dtype) for r in r_list]

    ri = []                                                # (z, B) per comp
    for s in range(n_comp):
        acc = None
        for m, r_m in enumerate(r_list):
            cmk = float(nu[m, s])
            if cmk == 0.0:
                continue
            term = r_m * (np.float32(cmk) if not df32_mode else cmk)
            acc = term if acc is None else acc + term
        if acc is None:
            ri.append(jnp.zeros_like(T_re))
        elif df32_mode:
            ri.append(acc.value(Y.dtype))
        else:
            ri.append(acc)

    # mixture heat capacity (plain f32 -- benign polynomials)
    cp_mean_i = [
        np.float32(0.5) * (cp_poly(cp_coeff[s], tref)
                           + cp_poly(cp_coeff[s], T_re))
        for s in range(n_comp)
    ]
    cp_mix = functools.reduce(
        jnp.add, [mo_fri[s] * cp_mean_i[s] for s in range(n_comp)]
    )
    cp_mix_dl = cp_mix / d["GaCpMeanMix0"]
    cp_mix_eff_dl = cp_mix_dl * eps

    if not spec.iso_thermal:
        # heat of reaction at T (rmtThermo.py:258-312 semantics): the
        # r0-weighted sum keeps df32 pairs so no re-rounding enters
        cp_mean_eq = [
            np.float32(0.5) * (cp_poly(cp_coeff_eq[e], tref)
                               + cp_poly(cp_coeff_eq[e], T_re))
            for e in range(len(eq_idx))
        ]
        dT = T_re - tref
        ov = None
        for m, r_m in enumerate(r_list):
            en = None
            for e in range(len(eq_idx)):
                cme = float(eq_nu[m, e])
                if cme == 0.0:
                    continue
                t_ = np.float32(cme) * cp_mean_eq[e]
                en = t_ if en is None else en + t_
            he_m = (en * dT if en is not None else jnp.zeros_like(dT)) + dh25[m]
            term = r_m * he_m
            ov = term if ov is None else ov + term
        ov_he_re_t = (ov.value(Y.dtype) if df32_mode else ov)
        # Qm with the Tm == 0 => adiabatic rule (rmtUtility.py:437-444)
        qm = jnp.where(p["Tm"] == np.float32(0.0), np.float32(0.0),
                       p["U"] * d["aEff"] * (p["Tm"] - T_re))

    const_f1 = one / (eps * (d["zf"] / d["vf"]))           # (B,)

    # backward-difference convection, inlet BC1 (pbHomoReactor.py:4082-4099)
    inv_dz = one / dz
    rows = []
    inv_gmc = one / d["GaMaCoTe0"]
    for s in range(n_comp):
        c_in = (p["SpCoi0"][s] / d["Cmax"])[None, :]       # (1, B)
        c_back = _shift_down(c_cl[s], 1, c_in)
        dcdz = (c_raw[s] - c_back) * inv_dz
        rows.append(const_f1 * (-v_dl * dcdz + ri[s] * inv_gmc))

    if not spec.iso_thermal:
        t_back = _shift_down(T_dl, 1, 0.0)
        dtdz = (T_dl - t_back) * inv_dz
        const_t2 = one / (ga_de_dl * cp_mix_dl * eps * (d["zf"] / d["vf"]))
        inv_ghc = one / d["GaHeCoTe0"]
        convective = -in_ga_ve_dl * ga_de_dl * cp_mix_eff_dl * dtdz
        rows.append(const_t2 * (convective + (-ov_he_re_t + qm) * inv_ghc))

    return jnp.stack(rows, axis=0)                         # (var, z, B)


def _pick_bt(M: int, block_b: int | None) -> int:
    if block_b is not None:
        if M % block_b:
            raise ValueError(f"batch {M} not a multiple of block_b {block_b}")
        return block_b
    if M % 128 == 0:
        return 128
    if M <= 512:
        return M
    raise ValueError(
        f"fused RHS needs batch % 128 == 0 or batch <= 512; got {M} "
        "(pass block_b explicitly)"
    )


def build_n2_fused(spec, accurate_rates=False, block_b: int | None = None,
                   interpret: bool | None = None):
    """Fused-RHS builder. Returns ``rhs_f(t, y, p, d) -> (M, n)`` where

      * y is (M, n) with M = s*B for integer s >= 1 (stage-stacked
        evaluations pass s = 3, stage-major: member = index % B),
      * p/d carry (B, ...) pre-broadcast leaves (parallel/ensemble's
        _broadcast_params / vmapped feed_state layout); they are tiled to
        M internally,
      * t is ignored (the N2 RHS is autonomous).

    Everything is computed in f32 inside one Pallas kernel per (grid
    slice); accuracy = the XLA rhs_b path up to benign f32 reorderings
    (tests/test_fused_rhs.py), with the df32 compensated chain preserved
    EXACTLY (same EFT code, same order).
    """
    if accurate_rates not in (False, "df32"):
        raise ValueError("fused RHS supports accurate_rates False or 'df32'")
    df32_mode = accurate_rates == "df32"
    n_comp = spec.n_comp
    var_no = spec.var_no_n2
    z_no = spec.z_no
    n = var_no * z_no
    ko_keys = None  # fixed at first call (static per jit trace anyway)

    def rhs_f(t, y, p, d):
        del t
        nonlocal ko_keys
        if ko_keys is None:
            ko_keys = tuple(sorted(p["kinetic_overrides"].keys()))
        M = y.shape[0]
        bt = _pick_bt(M, block_b)
        interp = (jax.default_backend() != "tpu"
                  if interpret is None else bool(interpret))

        leaves_1d = [jnp.asarray(p[k], _f32) for k in _P_1D]
        leaves_1d += [jnp.asarray(d[k], _f32) for k in _D_1D]
        leaves_1d += [jnp.asarray(p["kinetic_overrides"][k], _f32)
                      for k in ko_keys]
        leaves_2d = [jnp.asarray(p[k], _f32) for k in _P_2D]
        leaves_2d += [jnp.asarray(d[k], _f32) for k in _D_2D]

        B = leaves_1d[0].shape[0]
        if M % B:
            raise ValueError(f"batch {M} not a multiple of member count {B}")
        s_rep = M // B

        def tile(leaf):
            return leaf if s_rep == 1 else jnp.tile(
                leaf, (s_rep,) + (1,) * (leaf.ndim - 1))

        ops_1d = [tile(v).reshape(1, M) for v in leaves_1d]
        ops_2d = [tile(v).T for v in leaves_2d]             # (k, M)

        y3 = y.astype(_f32).reshape(M, var_no, z_no).transpose(1, 2, 0)

        n1 = len(ops_1d)

        def kernel(y_ref, *refs):
            out_ref = refs[-1]
            vals_1d = [r[0] for r in refs[:n1]]
            vals_2d = [r[...] for r in refs[n1:-1]]
            it = iter(vals_1d)
            pp = {k: next(it) for k in _P_1D}
            dd = {k: next(it) for k in _D_1D}
            pp["kinetic_overrides"] = {k: next(it) for k in ko_keys}
            it2 = iter(vals_2d)
            for k in _P_2D:
                pp[k] = next(it2)
            for k in _D_2D:
                dd[k] = next(it2)
            out_ref[...] = _n2_core_ml(spec, df32_mode, y_ref[...], pp, dd)

        grid = (M // bt,)
        in_specs = [pl.BlockSpec((var_no, z_no, bt), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec((1, bt), lambda i: (0, i),
                                  memory_space=pltpu.VMEM) for _ in ops_1d]
        in_specs += [pl.BlockSpec((v.shape[0], bt), lambda i: (0, i),
                                  memory_space=pltpu.VMEM) for v in ops_2d]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((var_no, z_no, bt), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((var_no, z_no, M), _f32),
            interpret=interp,
        )(y3, *ops_1d, *ops_2d)
        return out.transpose(2, 0, 1).reshape(M, n)

    return rhs_f
