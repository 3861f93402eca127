# Thermodynamic property functions (pure jnp, jit/vmap/grad-safe).
#
# Replaces the reference's string-eval property engine
# (reference: PyREMOT/docs/rmtThermo.py:16-127,258-388) with coefficient-array
# polynomial evaluation. Species are selected by static index arrays so every
# function traces to a fixed-shape XLA computation.

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import R_CONST, Tref
from ..data import species as DB


def cp_mol(T, idx: np.ndarray):
    """Ideal-gas heat capacity Cp(T) [kJ/kmol.K] for species rows ``idx``.

    T may be scalar or batched; returns shape ``T.shape + (len(idx),)``.
    """
    c = jnp.asarray(DB.CP_COEFF[idx])  # (S, 4)
    T = jnp.asarray(T)[..., None]
    return c[..., 0] + c[..., 1] * T + c[..., 2] * T**2 + c[..., 3] * T**3


def cp_mean(T2, idx: np.ndarray, T1=Tref):
    """Mean Cp between T1 and T2 [kJ/kmol.K]: 0.5*(Cp(T1)+Cp(T2))."""
    return 0.5 * (cp_mol(T1, idx) + cp_mol(T2, idx))


def cp_mix(mole_frac, cp_i):
    """Mixture Cp [kJ/kmol.K] as mole-fraction weighted dot product."""
    return jnp.sum(mole_frac * cp_i, axis=-1)


def enthalpy_change(T2, idx: np.ndarray, T1=Tref):
    """Enthalpy change Cp_mean*(T2-T1) [kJ/kmol] per species."""
    return cp_mean(T2, idx, T1) * (jnp.asarray(T2)[..., None] - T1)


def volumetric_flowrate_ig(P, T, molar_flows):
    """Total volumetric flowrate of an ideal gas [m^3/s]."""
    return (R_CONST * T / P) * jnp.sum(molar_flows, axis=-1)


def concentration_ig(molar_flows, vol_flow):
    """Species concentration [mol/m^3] from molar flow / volumetric flow."""
    return molar_flows / vol_flow


def density_ig(mw_mix, conc_total):
    """Ideal-gas density [kg/m^3] = MW [kg/mol] * total concentration."""
    return mw_mix * conc_total


def density_ig_eos(P, T, mw_mix):
    """Ideal-gas density from the EOS [kg/m^3]."""
    return P / ((R_CONST / mw_mix) * T)


def mixture_molecular_weight(mole_frac, mw, unit: str = "g/mol"):
    """Mixture molecular weight; unit in {g/mol, kg/mol, kg/kmol}."""
    m = jnp.sum(mole_frac * mw, axis=-1)
    if unit == "kg/mol":
        return m * 1e-3
    return m


def mole_fraction_from_concentration(conc):
    return conc / jnp.sum(conc, axis=-1, keepdims=True)
