# Spherical-particle finite-difference residual builders (dimensionless),
# vectorized over the radial nodes.
#
# Direct jnp ports of the reference's per-node loops
# (reference: PyREMOT/solvers/solFiDi.py:319-529,
#  FiDiBuildCMatrix_DiLe / FiDiBuildTMatrix_DiLe with mode="test").
# Node layout: index 0 = particle center (symmetry BC via the 3x trick),
# index rNo-1 = gas-solid interface (Robin BC via a ghost point).
# The reference's quirks are reproduced deliberately:
#   * the radial coordinate in the first-derivative metric uses ri = i*dr
#     for both flux directions (solFiDi.py:370,412);
#   * the reaction term enters *unscaled* (the dimensionless scaling is
#     commented out upstream, solFiDi.py:377-378).

from __future__ import annotations

import jax.numpy as jnp


def build_c_residual(y, ri_term, di_dile, ma_tr_co, c_bulk, ga_dii0, rf, flux_dir="lr"):
    """Concentration residual A[r] over the radial profile y (rNo,).

    di_dile: dimensionless diffusivity; ma_tr_co: mass transfer coefficient;
    c_bulk: bulk concentration (dimensionless); ga_dii0: reference
    diffusivity scale (SoDiiEff upstream); rf: particle radius.
    """
    r_no = y.shape[-1]
    dr = 1.0 / (r_no - 1)
    idx = jnp.arange(r_no)
    ri = jnp.where(idx == 0, 1.0, idx * dr)

    const1 = di_dile / dr**2
    const2 = 2 * di_dile / (ri * 2 * dr)

    y_m = jnp.concatenate([y[:1], y[:-1]])     # y[i-1] (padded)
    y_p = jnp.concatenate([y[1:], y[-1:]])     # y[i+1] (padded)

    # ghost point at the interface
    alpha = rf / ga_dii0
    beta = ma_tr_co / di_dile
    dile_no = alpha * beta
    if flux_dir == "rl":
        y_ghost = y[-2] + (2 * dr) * dile_no * (c_bulk - y[-1])
    else:
        y_ghost = y[-2] - (2 * dr) * dile_no * (y[-1] - c_bulk)

    center = 3 * const1 * (2 * y_p - 2 * y)
    interior = const1 * (y_m - 2 * y + y_p) + const2 * (y_p - y_m)
    surface = const1 * (y[-2] - 2 * y[-1] + y_ghost) + const2[-1] * (y_ghost - y[-2])

    a = jnp.where(idx == 0, center, interior)
    a = a.at[-1].set(surface)
    return a + ri_term


def build_t_residual(y, dh_term, k_dile, he_tr_co, t_bulk, k_ref, rf):
    """Temperature residual over the radial profile y (rNo,).

    k_dile: dimensionless effective conductivity; he_tr_co: heat transfer
    coefficient [kJ/m^2.s.K]; k_ref: conductivity scale [kJ/s.m.K].
    """
    r_no = y.shape[-1]
    dr = 1.0 / (r_no - 1)
    idx = jnp.arange(r_no)
    ri = jnp.where(idx == 0, 1.0, idx * dr)

    const1 = k_dile / dr**2
    const2 = 2 * k_dile / (ri * 2 * dr)

    y_m = jnp.concatenate([y[:1], y[:-1]])
    y_p = jnp.concatenate([y[1:], y[-1:]])

    alpha = rf / k_ref
    beta = -he_tr_co / k_dile
    dile_no = alpha * beta
    y_ghost = (2 * dr) * dile_no * (y[-1] - t_bulk) + y[-2]

    center = 3 * const1 * (2 * y_p - 2 * y)
    interior = const1 * (y_m - 2 * y + y_p) + const2 * (y_p - y_m)
    surface = const1 * (y[-2] - 2 * y[-1] + y_ghost) + const2[-1] * (y_ghost - y[-2])

    a = jnp.where(idx == 0, center, interior)
    a = a.at[-1].set(surface)
    return a + dh_term
