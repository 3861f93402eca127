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


def colored_jacobian(rhs_flat, var_no: int, z_no: int):
    """Build jac(t, y, *args) -> (n, n) from 2*var_no JVPs of rhs_flat.

    rhs_flat(t, y, *args) must have the block-bidiagonal MoL sparsity
    (use a stop_gradient'ed variant if the physical RHS has weak global
    couplings such as an axial pressure march).
    """
    colors, V, mask = banded_coloring(var_no, z_no)
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
