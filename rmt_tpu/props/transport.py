# Gas transport properties (viscosity, thermal conductivity, diffusivity)
# and mixture rules, fully vectorized in jnp.
#
# Replaces the per-species python dispatch + eval() path of the reference
# (reference: PyREMOT/docs/gasTransPor.py:28-358) with masked closed forms
# over dense parameter arrays; the pairwise Wilke / Chapman-Enskog loops
# become broadcasted (S, S) tensor expressions.

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..data import species as DB


def viscosity(T, idx: np.ndarray):
    """Pure-species low-pressure vapor viscosity [Pa.s].

    eq1: A*1e-6*T^B/(1 + C/T + D/T^2); DME uses its dedicated closed form
    (reference: gasTransPor.py:137-168, data/dataGasViscosity.py:131-135).
    """
    p = jnp.asarray(DB.VISC_PARAMS[idx])
    is_eq2 = jnp.asarray(DB.VISC_EQ[idx] == 2)
    T = jnp.asarray(T)[..., None]
    eq1 = p[..., 0] * 1e-6 * T ** p[..., 1] / (
        1 + p[..., 2] * (1 / T) + p[..., 3] * T**-2
    )
    eq2 = 2.68e-7 * T**0.3975 / (1 + (534 / T))
    return jnp.where(is_eq2, eq2, eq1)


def thermal_conductivity(T, idx: np.ndarray):
    """Pure-species gas thermal conductivity [W/m.K].

    k = C1*T^C2/(1 + C3/T + C4/T^2) (reference: gasTransPor.py:335-354).
    """
    p = jnp.asarray(DB.THCOND_PARAMS[idx])
    T = jnp.asarray(T)[..., None]
    return (p[..., 0] * T ** p[..., 1]) / (1 + p[..., 2] / T + p[..., 3] / T**2)


def wilke_mixture(prop_i, mole_frac, mw):
    """Wilke mixture rule for viscosity/conductivity.

    Vectorized form of the reference's pairwise loop
    (reference: gasTransPor.py:229-274). For i<j
      phi_ij = (1 + sqrt(x_i/x_j) (MW_j/MW_i)^(1/4))^2 / sqrt(8 (1+MW_i/MW_j))
    and the lower triangle follows from the reference's recurrence
      phi_ji = (x_j/x_i) (MW_i/MW_j) phi_ij.
    """
    x = jnp.asarray(prop_i)
    mw = jnp.asarray(mw)
    n = x.shape[-1]
    xi = x[..., :, None]
    xj = x[..., None, :]
    mi = mw[:, None]
    mj = mw[None, :]
    upper = (1 + jnp.sqrt(xi / xj) * (mj / mi) ** 0.25) ** 2 / jnp.sqrt(
        8 * (1 + mi / mj)
    )
    lower = (xi / xj) * (mj / mi) * jnp.swapaxes(upper, -1, -2)
    i_idx = jnp.arange(n)[:, None]
    j_idx = jnp.arange(n)[None, :]
    phi = jnp.where(i_idx == j_idx, 1.0, jnp.where(i_idx < j_idx, upper, lower))
    num = x * mole_frac
    den = jnp.sum(mole_frac[..., None, :] * phi, axis=-1)
    return jnp.sum(num / den, axis=-1)


def diffusivity_chapman_enskog(T, P, mole_frac, idx: np.ndarray):
    """Mixture diffusion coefficients [m^2/s]: Chapman-Enskog binary pairs
    combined with Blanc's law (reference: gasTransPor.py:42-131).
    """
    mw = jnp.asarray(DB.MW[idx])
    tc = jnp.asarray(DB.TC[idx])
    pc = jnp.asarray(DB.PC[idx])
    n = len(idx)

    ek = 0.75 * tc  # e/K per species
    sigma = 2.44 * (tc / pc) ** (1.0 / 3.0)

    eij = jnp.sqrt(ek[:, None] * ek[None, :])
    sigij = 0.5 * (sigma[:, None] + sigma[None, :])

    off = ~jnp.eye(n, dtype=bool)
    # avoid nan on the (unused) diagonal
    eij_safe = jnp.where(off, eij, 1.0)
    Ts = T / eij_safe
    omega = (44.54 * Ts**-4.909 + 1.911 * Ts**-1.575) ** 0.10

    dij = (
        1e-4
        * 0.0018583
        * jnp.sqrt(T**3 * (1 / mw[:, None] + 1 / mw[None, :]))
        / ((P * 9.86923e-6) * sigij**2 * omega)
    )
    dij = jnp.where(off, dij, 0.0)
    # reference fills only the upper triangle then symmetrizes by D + D^T
    dij_new = jnp.triu(dij) + jnp.triu(dij).T
    dij_safe = jnp.where(off, dij_new, 1.0)
    terms = jnp.where(off, mole_frac[None, :] / dij_safe, 0.0)
    return 1.0 / jnp.sum(terms, axis=-1)
