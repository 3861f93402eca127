# Finite-difference stencils (uniform and non-uniform) as vectorized jnp
# helpers, plus the two-zone refined mesh generator.
#
# (reference: PyREMOT/solvers/solFiDi.py:574-695 for the pointwise stencil
# formulas, :698-836 for the mesh generator; here the stencils act on whole
# axial profiles via shifts instead of per-node python calls.)

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BD, CD, FD = -1, 0, 1


def d1(F, dz, mode: int):
    """First derivative of a 3-point window [F_b, F_c, F_f]."""
    F_b, F_c, F_f = F
    if mode == BD:
        return (F_c - F_b) / dz
    if mode == CD:
        return (F_f - F_b) / (2 * dz)
    return (F_f - F_c) / dz


def d2(F, dz, mode: int):
    """Second derivative of a 5-point window [F_bb, F_b, F_c, F_f, F_ff]."""
    F_bb, F_b, F_c, F_f, F_ff = F
    if mode == BD:
        return (F_c - 2 * F_b + F_bb) / dz**2
    if mode == CD:
        return (F_f - 2 * F_c + F_b) / dz**2
    return (F_ff - 2 * F_f + F_c) / dz**2


def d1_nonuniform(F, dz, mode: int, R):
    """First derivative on a non-uniform grid with ratio R = dz_next/dz
    (reference solFiDi.py:634-662)."""
    F_bb, F_b, F_c, F_f, F_ff = F
    if mode == BD:
        return (F_bb - (1 + R) ** 2 * F_b + R * (R + 2) * F_c) / (R * (R + 1) * dz)
    if mode == CD:
        return (F_f + (R**2 - 1) * F_c - R**2 * F_b) / (R * (R + 1) * dz)
    return (-F_ff + (R + 1) ** 2 * F_f - R * (R + 2) * F_c) / (R * (R + 1) * dz)


def d2_nonuniform(F, dz, mode: int, R):
    """Second derivative, non-uniform grid (reference solFiDi.py:665-695)."""
    F_bb, F_b, F_c, F_f, F_ff = F
    if mode == CD:
        return (F_f - (R + 1) * F_c + R * F_b) / (R * (R + 1) * dz**2 / 2)
    return (F_ff - (R + 1) * F_f + R * F_c) / (R * (R + 1) * dz**2 / 2)


def backward_diff_profile(F, dz, inlet):
    """Backward difference along the last axis with an inlet boundary value.

    F: (..., z); returns (F - shift(F))/dz with F[..., -1-shift] replaced by
    ``inlet`` at the first node.
    """
    F_b = jnp.concatenate([jnp.broadcast_to(inlet, F[..., :1].shape), F[..., :-1]], axis=-1)
    return (F - F_b) / dz


def central_diff2_profile(F, dz, left, right):
    """Central second derivative along the last axis with ghost boundary
    values ``left`` and ``right``."""
    F_pad = jnp.concatenate(
        [jnp.broadcast_to(left, F[..., :1].shape), F, jnp.broadcast_to(right, F[..., :1].shape)],
        axis=-1,
    )
    return (F_pad[..., 2:] - 2 * F_pad[..., 1:-1] + F_pad[..., :-2]) / dz**2


def two_zone_mesh(n_nodes, length, dense_fraction_pct, refine_exponent):
    """Two-zone 1-D mesh: a power-law refined dense section followed by a
    uniform section (reference FiDiMeshGenerator, solFiDi.py:698-836).

    n_nodes: (n_dense, n_normal); returns dict with node positions, element
    sizes, node count, backward-ratio list, uniform dz.
    """
    n_dense, n_normal = n_nodes
    dome = (dense_fraction_pct / 100.0) * length
    xs_dense = np.array([((i / (n_dense - 1)) ** refine_exponent) * dome for i in range(n_dense)])
    dz_dense = np.diff(xs_dense)
    xs_normal = np.linspace(dome, length, n_normal)
    dz_uniform = (length - dome) / (n_normal - 1)
    dzs = np.concatenate([dz_dense, np.repeat(dz_uniform, n_normal)])
    xs = np.concatenate([xs_dense, xs_normal[1:]])
    n_total = n_dense + n_normal - 1

    # backward ratio per element (reference :777-805)
    n_el_dense = n_dense - 1
    rs = np.zeros(n_total)
    for i in range(n_total):
        if 2 <= i <= n_el_dense:
            rs[i] = dzs[i - 2] / dzs[i - 1]
        elif i > n_el_dense:
            rs[i] = 1.0
    return {
        "xs": xs,
        "dzs": dzs[: n_total - 1 + 1],
        "n_nodes": n_total,
        "rs": rs,
        "dz_uniform": dz_uniform,
    }
