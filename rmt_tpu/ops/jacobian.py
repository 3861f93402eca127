# Colored (sparse) Jacobians for method-of-lines RHS functions.
#
# Backward-difference MoL couplings are block-bidiagonal in the axial node
# index: output (v, z) depends on inputs (v', z) and (v', z-1). A
# Curtis-Powell-Reid coloring over (variable, node-parity) gives 2*var_no
# JVP directions instead of var_no*z_no dense tangents. The Jacobian is
# reconstructed exactly on the sparsity pattern.

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def banded_coloring(var_no: int, z_no: int):
    """Colors + sparsity mask for a (var_no, z_no) row-major MoL state."""
    n = var_no * z_no
    idx = np.arange(n)
    v_of = idx // z_no
    z_of = idx % z_no
    colors = v_of * 2 + (z_of % 2)
    n_colors = 2 * var_no
    V = np.zeros((n_colors, n))
    V[colors, idx] = 1.0
    mask = (z_of[:, None] == z_of[None, :]) | (z_of[:, None] == z_of[None, :] + 1)
    return colors, V, mask.astype(np.float64)


def tridiag_coloring(var_no: int, z_no: int):
    """Colors + sparsity mask for a (var_no, z_no) row-major MoL state
    whose axial coupling is TRIdiagonal (central-difference dispersion:
    output (v, z) depends on inputs (v', z-1..z+1); the M13 gas phase,
    pbHeterReactor.py:1857-2160). 3*var_no JVP directions (columns 3
    nodes apart never hit a common output row)."""
    n = var_no * z_no
    idx = np.arange(n)
    v_of = idx // z_no
    z_of = idx % z_no
    colors = v_of * 3 + (z_of % 3)
    n_colors = 3 * var_no
    V = np.zeros((n_colors, n))
    V[colors, idx] = 1.0
    mask = np.abs(z_of[:, None] - z_of[None, :]) <= 1
    return colors, V, mask.astype(np.float64)


def two_phase_coloring(n_layer: int, r_rows: int, z_no: int):
    """Colors + sparsity mask for a (n_layer, r_rows, z_no) row-major state
    of the coupled dynamic heterogeneous models (M10-M12): radial row 0 is
    the gas phase (tridiagonal z-coupling: BD convection + CD dispersion +
    Danckwerts ghost), rows >= 1 are the particle interior (no z-coupling;
    full local coupling within a node through kinetics/energetics and to
    the local gas bulk).

    Column color classes: each gas (layer,) variable needs 3 colors
    (z mod 3 -- tridiagonal reach means columns 3 apart never hit a common
    output row); each solid (layer, r) variable needs ONE color (its
    columns touch only same-z rows, disjoint across z). Total
    3*n_layer + n_layer*(r_rows-1) colors instead of
    n_layer*r_rows*z_no dense tangents."""
    n = n_layer * r_rows * z_no
    idx = np.arange(n)
    l_of = idx // (r_rows * z_no)
    r_of = (idx // z_no) % r_rows
    z_of = idx % z_no

    gas = r_of == 0
    n_gas_colors = 3 * n_layer
    colors = np.where(
        gas,
        l_of * 3 + (z_of % 3),
        n_gas_colors + l_of * (r_rows - 1) + (r_of - 1),
    )
    n_colors = n_gas_colors + n_layer * (r_rows - 1)
    V = np.zeros((n_colors, n))
    V[colors, idx] = 1.0
    dzc = z_of[:, None] - z_of[None, :]
    mask = (dzc == 0) | (gas[None, :] & (np.abs(dzc) <= 1))
    return colors, V, mask.astype(np.float64)


def colored_jacobian_from(rhs_flat, coloring):
    """Build jac(t, y, *args) -> (n, n) from an explicit
    (colors, V, mask) coloring (see banded_coloring / two_phase_coloring)."""
    colors, V, mask = coloring
    V_j = jnp.asarray(V)
    mask_j = jnp.asarray(mask)
    colors_j = jnp.asarray(colors)

    def jac(t, y, *args):
        fun = lambda yy: rhs_flat(t, yy, *args)
        jv = jax.vmap(lambda tangent: jax.jvp(fun, (y,), (tangent,))[1])(
            V_j.astype(y.dtype)
        )
        return jv[colors_j, :].T * mask_j.astype(y.dtype)

    return jac


def batched_colored_jacobian(fB, coloring):
    """jac(x (B, n)) -> (B, n, n) for a BATCHED function of independent
    members fB(x (B, n)) -> (B, n), from n_colors JVPs with tangents
    broadcast across the batch (members never mix, so one tangent per
    color serves every member)."""
    colors, V, mask = coloring
    V_j = jnp.asarray(V)
    mask_j = jnp.asarray(mask)
    colors_j = jnp.asarray(colors)

    def jac(x):
        Bsz = x.shape[0]
        jv = jax.vmap(
            lambda tangent: jax.jvp(
                fB, (x,), (jnp.tile(tangent[None], (Bsz, 1)),)
            )[1]
        )(V_j.astype(x.dtype))                  # (n_colors, B, n_out)
        # J[b, out, in] = jv[colors[in], b, out] on the sparsity mask
        return jv[colors_j].transpose(1, 2, 0) * mask_j.astype(x.dtype)

    return jac


def colored_bidiag_blocks(rhs_flat, var_no: int, z_no: int):
    """jac_blocks(t, y, *args) -> (Jd, Jl), each (z_no, var_no, var_no),
    gathered DIRECTLY from the 2*var_no colored JVP products.

    Skips the dense (n, n) reconstruction entirely: on the TPU runtime
    the dense build (gather -> (n, B, n) transpose -> mask multiply)
    plus the block re-extraction dominated the block-mode Jacobian
    refresh (measured ~0.6-0.8 s per refresh at B=512 under vmap).
    Jd[z] couples node z to itself, Jl[z] couples node z to z-1
    (Jl[0] = 0) -- identical values to
    block_solve.extract_bidiag_blocks(dense colored J)."""
    colors, V, _ = banded_coloring(var_no, z_no)
    V_j = jnp.asarray(V)
    z = np.arange(z_no)
    v = np.arange(var_no)
    # jv[c, r] = J[r, any column of color c hitting row r]
    # row index of output (vi, z); color of input column (vj, z) / (vj, z-1)
    row_d = (v[None, :, None] * z_no + z[:, None, None])     # (z, m, 1)
    col_d = (v[None, None, :] * 2 + (z[:, None, None] % 2))  # (z, 1, m)
    col_l = (v[None, None, :] * 2 + ((z[:, None, None] - 1) % 2))
    row_d, col_d, col_l = (
        np.broadcast_to(a, (z_no, var_no, var_no)).copy()
        for a in (row_d, col_d, col_l)
    )
    zero_first = np.ones((z_no, 1, 1))
    zero_first[0] = 0.0

    def jac_blocks(t, y, *args):
        fun = lambda yy: rhs_flat(t, yy, *args)
        jv = jax.vmap(lambda tangent: jax.jvp(fun, (y,), (tangent,))[1])(
            V_j.astype(y.dtype)
        )                                           # (n_colors, n)
        Jd = jv[col_d, row_d]                       # (z, m, m)
        Jl = jv[col_l, row_d] * jnp.asarray(zero_first, y.dtype)
        return Jd, Jl

    return jac_blocks


def colored_jacobian(rhs_flat, var_no: int, z_no: int):
    """Build jac(t, y, *args) -> (n, n) from 2*var_no JVPs of rhs_flat.

    rhs_flat(t, y, *args) must have the block-bidiagonal MoL sparsity
    (use a stop_gradient'ed variant if the physical RHS has weak global
    couplings such as an axial pressure march).
    """
    return colored_jacobian_from(rhs_flat, banded_coloring(var_no, z_no))
