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


def extract_tridiag_blocks(J, var_no: int, z_no: int):
    """Extract diagonal, subdiagonal and superdiagonal blocks.

    J: (B, n, n) with n = var_no*z_no, flat index v*z_no + z.
    Returns (Jd, Jl, Ju): (B, z_no, var_no, var_no); Jd[b,z] couples node z
    to itself, Jl[b,z] to node z-1 (Jl[b,0] = 0), Ju[b,z] to node z+1
    (Ju[b,-1] = 0). This is the sparsity of MoL RHS functions with
    central-difference axial dispersion (ops.jacobian.two_phase_coloring's
    gas rows; the M13 gas phase, pbHeterReactor.py:1857-2160).
    """
    Jd, Jl = extract_bidiag_blocks(J, var_no, z_no)
    B = J.shape[0]
    J5 = J.reshape(B, var_no, z_no, var_no, z_no)
    Ju_sup = jnp.diagonal(J5, offset=1, axis1=2, axis2=4)   # (B,v,v',z-1)
    Ju_sup = jnp.moveaxis(Ju_sup, -1, 1)                    # (B, z-1, v, v')
    Ju = jnp.concatenate([Ju_sup, jnp.zeros_like(Ju_sup[:, :1])], axis=1)
    return Jd, Jl, Ju


def _mm(a, b):
    return jnp.einsum("bzij,bzjk->bzik", a, b, precision=_HI)


def _mv(a, v):
    return jnp.einsum("bzij,bzj->bzi", a, v, precision=_HI)


def _shift_down(X):
    """[0, X_0, ..., X_{n-2}] along axis 1 (slot j holds old slot j-1)."""
    return jnp.concatenate([jnp.zeros_like(X[:, :1]), X[:, :-1]], axis=1)


def tridiag_factor(D, L, U):
    """Block cyclic-reduction factorization of the block-tridiagonal
    system L_z x_{z-1} + D_z x_z + U_z x_{z+1} = r_z.

    D, L, U: (B, z, m, m); L[:, 0] and U[:, -1] must be zero. Returns an
    opaque factorization for tridiag_solve. ceil(log2 z) elimination
    levels, each level batched (m x m) Gauss-Jordan inversions + ~8
    batched small matmuls -- no sequential z recursion, so the whole
    factorization is log-depth on the device.
    """
    B, N0, m, _ = D.shape
    N = 1 << max(int(N0 - 1).bit_length(), 0)   # next power of two >= N0
    if N != N0:
        pad = N - N0
        eye = jnp.broadcast_to(
            jnp.eye(m, dtype=D.dtype), (B, pad, m, m)
        )
        zer = jnp.zeros((B, pad, m, m), D.dtype)
        # padded rows are decoupled identity equations with zero rhs
        D = jnp.concatenate([D, eye], axis=1)
        L = jnp.concatenate([L, zer], axis=1)
        U = jnp.concatenate([U, zer], axis=1)

    levels = []
    while D.shape[1] > 1:
        half = D.shape[1] // 2
        De, Le, Ue = D[:, 0::2], L[:, 0::2], U[:, 0::2]
        Do, Lo, Uo = D[:, 1::2], L[:, 1::2], U[:, 1::2]
        Dinv_o = batched_inv(Do.reshape(-1, m, m)).reshape(B, half, m, m)
        # even row 2j eliminates odd neighbors 2j-1 (odd slot j-1, absent
        # for j=0 where Le[0]=L_0=0) and 2j+1 (odd slot j):
        Gl = _mm(Le, _shift_down(Dinv_o))
        Gr = _mm(Ue, Dinv_o)
        levels.append((Gl, Gr, Dinv_o, Lo, Uo))
        D = De - _mm(Gl, _shift_down(Uo)) - _mm(Gr, Lo)
        L = -_mm(Gl, _shift_down(Lo))
        U = -_mm(Gr, Uo)
    Dinv_top = batched_inv(D[:, 0])               # (B, m, m)
    return (N0, N, Dinv_top, tuple(levels))


def tridiag_solve(fac, r, precision=_HI):
    """Solve with a tridiag_factor factorization. r: (B, z, m) -> x."""
    N0, N, Dinv_top, levels = fac
    B, _, m = r.shape
    if N != N0:
        r = jnp.concatenate(
            [r, jnp.zeros((B, N - N0, m), r.dtype)], axis=1
        )
    # forward: reduce the rhs level by level (even rows absorb odd rows)
    rs = []
    for Gl, Gr, _, _, _ in levels:
        re, ro = r[:, 0::2], r[:, 1::2]
        rs.append(ro)
        r = re - _mv(Gl, _shift_down(ro)) - _mv(Gr, ro)
    x = jnp.einsum(
        "bij,bj->bi", Dinv_top, r[:, 0], precision=precision
    )[:, None]                                    # (B, 1, m)
    # backward: recover odd rows, interleave with the even solution
    for (Gl, Gr, Dinv_o, Lo, Uo), ro in zip(reversed(levels), reversed(rs)):
        x_e = x
        x_next = jnp.concatenate(
            [x_e[:, 1:], jnp.zeros_like(x_e[:, :1])], axis=1
        )
        x_o = _mv(Dinv_o, ro - _mv(Lo, x_e) - _mv(Uo, x_next))
        half = x_e.shape[1]
        x = jnp.stack([x_e, x_o], axis=2).reshape(B, 2 * half, m)
    return x[:, :N0]


def make_shifted_solvers_tridiag(
    Jd, Jl, Ju, h, gamma, mu_r, mu_i, dtype=jnp.float32
):
    """Tridiagonal twin of make_shifted_solvers: exact solvers for
    (I - h*gamma*J) and (I - h*mu*J) when J is block TRIdiagonal
    (axial-dispersion MoL coupling z-1, z, z+1).

    Jd, Jl, Ju: (B, z, m, m) blocks of J; h: (B,). Returns
    (solve_real, solve_cplx) with the same calling convention as the
    bidiagonal version; the complex shift runs in the 2m x 2m real
    embedding.
    """
    B, z_no, m, _ = Jd.shape
    hw = h.astype(dtype)[:, None, None, None]
    eye = jnp.eye(m, dtype=dtype)

    fac_r = tridiag_factor(
        eye - (gamma * hw) * Jd.astype(dtype),
        -(gamma * hw) * Jl.astype(dtype),
        -(gamma * hw) * Ju.astype(dtype),
    )

    def solve_real(r):
        return tridiag_solve(fac_r, r.astype(dtype))

    def embed(Br_, Bi_):
        return jnp.concatenate(
            [
                jnp.concatenate([Br_, -Bi_], axis=-1),
                jnp.concatenate([Bi_, Br_], axis=-1),
            ],
            axis=-2,
        )

    def shifted2(Jx):
        Jx = Jx.astype(dtype)
        return embed(-(mu_r * hw) * Jx, -(mu_i * hw) * Jx)

    D2 = jnp.broadcast_to(
        jnp.eye(2 * m, dtype=dtype), (B, z_no, 2 * m, 2 * m)
    ) + shifted2(Jd)
    fac_c = tridiag_factor(D2, shifted2(Jl), shifted2(Ju))

    def solve_cplx(rr, ri):
        r2 = jnp.concatenate(
            [rr.astype(dtype), ri.astype(dtype)], axis=-1
        )
        x2 = tridiag_solve(fac_c, r2)
        return x2[..., :m], x2[..., m:]

    return solve_real, solve_cplx


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
