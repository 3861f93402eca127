# Exact solves for block-bidiagonal MoL systems (I - h*w*J) x = r.
#
# The backward-difference MoL Jacobian couples node z only to {z, z-1}
# (ops/jacobian.banded_coloring), so M = I - h*w*J is block lower
# bidiagonal with (m x m) blocks, m = var_no. Its exact solve is a linear
# recurrence x_z = Minv_z (r_z + h*w*Jl_z x_{z-1}) -- prefix-composable,
# so the whole solve is:
#   * z_no batched (m x m) inversions (Gauss-Jordan with partial
#     pivoting, unrolled over m columns -- elementwise work, which this
#     runtime executes essentially for free), then
#   * one jax.lax.associative_scan over z (log2(z_no) levels of tiny
#     batched matmuls).
# Total ~ B*z*m^3 flops per solve -- about 2000x fewer than maintaining
# dense (n x n) Newton-Schulz approximate inverses for n = m*z, and the
# solve is EXACT, so the stiff ensemble integrator needs no residual
# certificates and fewer Newton sweeps (see solvers/stiff_ensemble.py's
# block mode).
#
# Complex shifts (the Radau eigenvalue mu) are handled in the 2m x 2m
# real embedding [[Mr, -Mi], [Mi, Mr]] so one real routine serves both.
#
# State layout convention matches ops/jacobian.banded_coloring: the flat
# index is v * z_no + z (variables are the SLOW axis).

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


def extract_bidiag_blocks(J, var_no: int, z_no: int):
    """Extract diagonal and subdiagonal (var_no x var_no) blocks.

    J: (B, n, n) with n = var_no*z_no, flat index v*z_no + z.
    Returns (Jd, Jl): (B, z_no, var_no, var_no); Jd[b,z] couples node z to
    itself, Jl[b,z] couples node z to node z-1 (Jl[b,0] = 0).
    """
    B, n, _ = J.shape
    J5 = J.reshape(B, var_no, z_no, var_no, z_no)
    Jd = jnp.diagonal(J5, axis1=2, axis2=4)          # (B, v, v', z)
    Jd = jnp.moveaxis(Jd, -1, 1)                     # (B, z, v, v')
    Jl_sub = jnp.diagonal(J5, offset=-1, axis1=2, axis2=4)  # (B,v,v',z-1)
    Jl_sub = jnp.moveaxis(Jl_sub, -1, 1)             # (B, z-1, v, v')
    Jl = jnp.concatenate(
        [jnp.zeros_like(Jl_sub[:, :1]), Jl_sub], axis=1
    )
    return Jd, Jl


def batched_inv(M):
    """Inverses of a batch of small matrices by unrolled Gauss-Jordan
    with partial pivoting. M: (K, m, m), m static and small (<= ~16).

    All work is elementwise/select over the batch -- no lax.linalg (TPU
    lowers batched LU to sequential scalar loops, measured ~170 ms for a
    batched 420x420; here the unrolled form is pure VPU work).
    """
    K, m, _ = M.shape
    A = jnp.concatenate(
        [M, jnp.broadcast_to(jnp.eye(m, dtype=M.dtype), (K, m, m))],
        axis=-1,
    )                                                # (K, m, 2m)
    r = jnp.arange(m)
    for col in range(m):
        # partial pivot among rows col..m-1 on |A[:, :, col]|
        mag = jnp.abs(A[:, :, col])
        mag = jnp.where(r[None, :] >= col, mag, -jnp.inf)
        p = jnp.argmax(mag, axis=-1)                 # (K,)
        # permutation swapping rows col <-> p
        perm = jnp.where(
            r[None, :] == col, p[:, None],
            jnp.where(r[None, :] == p[:, None], col, r[None, :]),
        )                                            # (K, m)
        A = jnp.take_along_axis(A, perm[:, :, None], axis=1)
        piv_row = A[:, col, :] / A[:, col, col][:, None]   # (K, 2m)
        fac = jnp.where(r[None, :] == col, 0.0, A[:, :, col])  # (K, m)
        A = A - fac[:, :, None] * piv_row[:, None, :]
        A = jnp.where((r == col)[None, :, None], piv_row[:, None, :], A)
    return A[:, :, m:]


def solve_bidiag(Minv, C, r, precision=_HI):
    """Solve the block recurrence x_z = Minv_z r_z + C_z x_{z-1}.

    Minv, C: (B, z, m, m); r: (B, z, m). C[:, 0] must be zero.
    Returns x: (B, z, m). Uses an associative scan over z: element
    (A, b) composes as (A2 A1, A2 b1 + b2).
    """
    b0 = jnp.einsum("bzij,bzj->bzi", Minv, r, precision=precision)

    def combine(e1, e2):
        A1, v1 = e1
        A2, v2 = e2
        return (
            jnp.einsum("bzij,bzjk->bzik", A2, A1, precision=precision),
            jnp.einsum("bzij,bzj->bzi", A2, v1, precision=precision) + v2,
        )

    _, x = lax.associative_scan(combine, (C, b0), axis=1)
    return x


def make_shifted_solvers(Jd, Jl, h, gamma, mu_r, mu_i, dtype=jnp.float32):
    """Build exact solvers for (I - h*gamma*J) and (I - h*mu*J).

    Jd, Jl: (B, z, m, m) float32 blocks of J; h: (B,) step sizes.
    Returns (solve_real, solve_cplx):
      solve_real(r)            r (B, z, m)       -> x (B, z, m)
      solve_cplx(rr, ri)       real/imag parts   -> (xr, xi)
    The complex solve runs in the 2m x 2m real embedding.
    """
    B, z_no, m, _ = Jd.shape
    h32 = h.astype(dtype)[:, None, None, None]
    eye = jnp.eye(m, dtype=dtype)

    # real shift
    Mr = eye - (gamma * h32) * Jd
    Minv_r = batched_inv(Mr.reshape(-1, m, m)).reshape(B, z_no, m, m)
    Cr = jnp.einsum(
        "bzij,bzjk->bzik", Minv_r, (gamma * h32) * Jl, precision=_HI
    )

    def solve_real(r):
        return solve_bidiag(Minv_r, Cr, r.astype(dtype))

    # complex shift in the real embedding
    Mc_r = eye - (mu_r * h32) * Jd
    Mc_i = -(mu_i * h32) * Jd
    M2 = jnp.concatenate(
        [
            jnp.concatenate([Mc_r, -Mc_i], axis=-1),
            jnp.concatenate([Mc_i, Mc_r], axis=-1),
        ],
        axis=-2,
    )                                                # (B, z, 2m, 2m)
    Minv_c = batched_inv(M2.reshape(-1, 2 * m, 2 * m)).reshape(
        B, z_no, 2 * m, 2 * m
    )
    L_r = (mu_r * h32) * Jl
    L_i = (mu_i * h32) * Jl
    L2 = jnp.concatenate(
        [
            jnp.concatenate([L_r, -L_i], axis=-1),
            jnp.concatenate([L_i, L_r], axis=-1),
        ],
        axis=-2,
    )
    Cc = jnp.einsum("bzij,bzjk->bzik", Minv_c, L2, precision=_HI)

    def solve_cplx(rr, ri):
        r2 = jnp.concatenate(
            [rr.astype(dtype), ri.astype(dtype)], axis=-1
        )                                            # (B, z, 2m)
        x2 = solve_bidiag(Minv_c, Cc, r2)
        return x2[..., :m], x2[..., m:]

    return solve_real, solve_cplx
