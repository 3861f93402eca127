# Fused Pallas TPU kernels for the exact block-bidiagonal stage solves.
#
# ops/block_solve.py solves the Radau stage systems (I - h*w*J) x = r
# exactly via batched (m x m) Gauss-Jordan inversions + an associative
# scan over the axial nodes. That XLA formulation is hundreds of TINY
# ops per attempt (7x7 einsums, take_along_axis gathers, log2(z) scan
# levels), and on the TPU runtime the per-op overhead dwarfs the ~2000x
# FLOP advantage over dense Newton-Schulz: measured f32 B=512 on-chip,
# block attempts cost ~3x an NS attempt (block 6.8 vs NS 8.3 members/s
# DESPITE fewer attempts -- round-2 STATUS A/B).
#
# These kernels fuse the whole stage-solve path with the ENSEMBLE MEMBER
# on the lane axis (layout (z, m, m, B): every elementwise op processes
# 128 members per vector lane-group, so the 7x7 block algebra runs at
# full VPU width instead of wasting 121/128 lanes):
#   * block_factor -- per attempt: Gauss-Jordan inversion (masked
#     partial pivoting, unrolled over the m columns) of the shifted
#     diagonal blocks I - h*gamma*Jd and the 2m x 2m real embedding of
#     I - h*mu*Jd, entirely in VMEM.
#   * block_apply -- per Newton sweep: the Radau eigen-transform
#     W = T^-1 R, the real + complex block-bidiagonal recurrences
#     x_z = Minv_z (w_z + h*w*Jl_z x_{z-1}) unrolled over z, and the
#     recombination dK = Re(T Z), in ONE kernel -- R is read from HBM
#     once and nothing else round-trips.
#   * block_apply_real -- the embedded-error smoothing solve
#     (real shift only).
#
# The subdiagonal term is applied as Minv_z (r_z + h*w*Jl_z x_{z-1})
# rather than precomputing C = Minv (h*w*Jl) as block_solve.py does:
# same op count in the recurrence, but the factorization stores (and
# the apply re-reads) HALF the matrices.
#
# Numerics match ops/block_solve.py up to f32 reassociation and pivot
# tie-breaking; tests assert parity on random stiff systems and through
# a full lockstep integration (interpreter mode off-TPU).

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane-axis chunk: 128 members per kernel instance fills the (8, 128)
# VPU tile's lane dimension exactly; the factor kernel's largest value
# (the (z, 2m, 4m, 128) complex Gauss-Jordan working array) stays well
# under the 16 MB VMEM budget for the N2 geometry (z=20, m=7: 4 MB)
_BC = 128

_z32 = np.int32(0)


def _gj_inverse(M, m: int):
    """Invert a batch of small matrices by Gauss-Jordan with masked
    partial pivoting, unrolled over the m columns.

    M: (..., m, m, BC) values inside a kernel. All operations are
    elementwise/select over the leading and lane axes -- the pivot row
    index differs per (batch, lane) element, so row swaps are built
    from first-max one-hot masks instead of gathers (take_along_axis
    does not vectorize on the VPU).
    """
    lead = M.shape[:-3]
    f32 = M.dtype
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(f32)[..., None]                         # (m, m, 1)
    A = jnp.concatenate(
        [M, jnp.broadcast_to(eye, lead + (m, m, M.shape[-1]))],
        axis=-2,
    )                                                # (..., m, 2m, BC)
    rowf = jax.lax.broadcasted_iota(
        jnp.int32, lead + (m, 1), len(lead)
    ).astype(f32)                                    # (..., m, 1)
    # all masks are 0/1 FLOATS blended arithmetically: Mosaic cannot
    # concatenate/bitcast i1 vector registers ("Invalid vector register
    # cast" on a (8x128xi1) -> i32 bitcast, observed on v5e)
    for col in range(m):
        ge = (rowf >= col).astype(f32)               # (..., m, 1)
        mag = jnp.abs(A[..., :, col, :])             # (..., m, BC)
        mag = mag * ge + (ge - 1.0) * 3.0e38
        mx = jnp.max(mag, axis=-2, keepdims=True)    # (..., 1, BC)
        is_max = (mag == mx).astype(f32) * ge
        # first-max one-hot (ties resolved to the lowest row index):
        # sel_r = is_max_r while nothing was selected yet; `seen`
        # saturates at 1 because at most one row is ever selected
        seen = jnp.zeros_like(is_max[..., :1, :])
        sels = []
        for r in range(m):
            sel = is_max[..., r : r + 1, :] * (1.0 - seen)
            seen = seen + sel
            sels.append(sel)
        onehot = jnp.concatenate(sels, axis=-2)      # (..., m, BC)
        oh = onehot[..., :, None, :]                 # (..., m, 1, BC)
        # pivot row by masked sum (exactly one mask element is set)
        piv_row = jnp.sum(oh * A, axis=-3)           # (..., 2m, BC)
        old_col_row = A[..., col, :, :]              # (..., 2m, BC)
        # swap: the pivot row's old position receives row `col`
        A = A + oh * (old_col_row[..., None, :, :] - A)
        piv = piv_row[..., col : col + 1, :]         # (..., 1, BC)
        piv_row = piv_row / piv
        colm = (rowf == col).astype(f32)             # (..., m, 1)
        fac = A[..., :, col, :] * (1.0 - colm)
        A = A - fac[..., :, None, :] * piv_row[..., None, :, :]
        A = A + colm[..., None] * (piv_row[..., None, :, :] - A)
    return A[..., :, m:, :]                          # (..., m, m, BC)


def _matmat(M1, M2, m: int):
    """(z, m, m, BC) @ (z, m, m, BC) block product, unrolled."""
    rows = []
    for i in range(m):
        cols = []
        for k in range(m):
            acc = M1[:, i, 0, :] * M2[:, 0, k, :]
            for j in range(1, m):
                acc = acc + M1[:, i, j, :] * M2[:, j, k, :]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=1))         # (z, m, BC)
    return jnp.stack(rows, axis=1)                   # (z, m, m, BC)


def _factor_kernel(jd_ref, h_ref, minv_r_ref, minv_cr_ref, minv_ci_ref,
                   *, gamma, mu_r, mu_i, z_no, m):
    h = h_ref[0]                                     # (BC,)
    g = gamma * h                                    # per-lane shifts
    mr = mu_r * h
    mi = mu_i * h
    Jd = jd_ref[...]                                 # (z, m, m, BC)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(jnp.float32)[None, :, :, None]          # (1, m, m, 1)

    minv_r_ref[...] = _gj_inverse(eye - g * Jd, m)

    # complex shift (A + iB)^-1, A = I - h*mu_r*Jd, B = -h*mu_i*Jd, via
    # two REAL m x m inversions instead of the 2m x 2m real embedding:
    #   Y = (A + B A^-1 B)^-1,   (A + iB)^-1 = Y - i A^-1 B Y.
    # Half the storage (and apply-kernel HBM traffic) and 4x less live
    # VMEM than the embedding's unrolled 2m Gauss-Jordan, which blew the
    # 16 MB scoped-vmem budget at 128 lanes (26 MB measured).
    Am = eye - mr * Jd
    Bm = (0.0 - mi) * Jd
    X = _gj_inverse(Am, m)                           # A^-1
    XB = _matmat(X, Bm, m)                           # A^-1 B
    S = Am + _matmat(Bm, XB, m)                      # A + B A^-1 B
    Y = _gj_inverse(S, m)
    minv_cr_ref[...] = Y
    minv_ci_ref[...] = -_matmat(XB, Y, m)


def _matvec(Mz, x):
    """(m, k, BC) block times (k, BC) vector -> (m, BC), unrolled
    fused multiply-adds over the contraction index."""
    k = Mz.shape[-2]
    acc = Mz[:, 0, :] * x[0][None, :]
    for j in range(1, k):
        acc = acc + Mz[:, j, :] * x[j][None, :]
    return acc                                       # (m, BC)


def _apply_kernel(r_ref, minv_r_ref, minv_cr_ref, minv_ci_ref, jl_ref,
                  h_ref, dk_ref,
                  *, gamma, mu_r, mu_i, z_no, m, tir, tii, tr, ti):
    """Fused triple-stage solve for one lane-chunk of members.

    r_ref: (3, m, z, BC) stage residuals; dk_ref: same shape, output.
    tir/tii/tr/ti: static 3x3 tuples (Radau eigenvector matrices).
    """
    h = h_ref[0]                                     # (BC,)
    g = (gamma * h)[None, :]                         # (1, BC)
    mr = (mu_r * h)[None, :]
    mi = (mu_i * h)[None, :]

    R = [r_ref[s] for s in range(3)]                 # each (m, z, BC)
    # W = T^-1 R; row 0 is the real stage, row 1 the complex one
    w0 = sum(tir[0][j] * R[j] for j in range(3))     # (m, z, BC)
    w1r = sum(tir[1][j] * R[j] for j in range(3))
    w1i = sum(tii[1][j] * R[j] for j in range(3))

    x0_p = jnp.zeros((m, h.shape[0]), jnp.float32)
    x1r_p = jnp.zeros_like(x0_p)
    x1i_p = jnp.zeros_like(x0_p)
    z0s, z1rs, z1is = [], [], []
    for z in range(z_no):
        Mr_inv = minv_r_ref[z]                       # (m, m, BC)
        Mc_r = minv_cr_ref[z]                        # (m, m, BC)
        Mc_i = minv_ci_ref[z]
        Jl_z = jl_ref[z]                             # (m, m, BC)
        # real recurrence: x_z = Minv_z (w_z + h*gamma*Jl_z x_{z-1})
        t_r = _matvec(Jl_z, x0_p)
        x0 = _matvec(Mr_inv, w0[:, z, :] + g * t_r)
        # complex recurrence: the subdiagonal term is h*mu*(Jl x) with
        # Jl real and mu complex; the solve is the complex matvec
        # (Mc_r + i Mc_i)(rhs_r + i rhs_i)
        u_r = _matvec(Jl_z, x1r_p)
        u_i = _matvec(Jl_z, x1i_p)
        rhs_r = w1r[:, z, :] + mr * u_r - mi * u_i
        rhs_i = w1i[:, z, :] + mr * u_i + mi * u_r
        x1r = _matvec(Mc_r, rhs_r) - _matvec(Mc_i, rhs_i)
        x1i = _matvec(Mc_r, rhs_i) + _matvec(Mc_i, rhs_r)
        z0s.append(x0)
        z1rs.append(x1r)
        z1is.append(x1i)
        x0_p, x1r_p, x1i_p = x0, x1r, x1i

    z0 = jnp.stack(z0s, axis=1)                      # (m, z, BC)
    z1r = jnp.stack(z1rs, axis=1)
    z1i = jnp.stack(z1is, axis=1)
    # dK = Re(T Z) with Z = [z0, z1, conj(z1)]:
    # dK_i = Tr[i,0] z0 + (Tr[i,1]+Tr[i,2]) Re(z1) - (Ti[i,1]-Ti[i,2]) Im(z1)
    for i in range(3):
        dk = tr[i][0] * z0 + (tr[i][1] + tr[i][2]) * z1r
        dk = dk - (ti[i][1] - ti[i][2]) * z1i
        dk_ref[i] = dk


def _real_kernel(e_ref, minv_r_ref, jl_ref, h_ref, x_ref,
                 *, gamma, z_no, m):
    """Real-shift solve only: (I - h*gamma*J) x = e (error smoothing)."""
    h = h_ref[0]
    g = (gamma * h)[None, :]
    x_p = jnp.zeros((m, h.shape[0]), jnp.float32)
    for z in range(z_no):
        t_r = _matvec(jl_ref[z], x_p)
        x_p = _matvec(minv_r_ref[z], e_ref[:, z, :] + g * t_r)
        x_ref[:, z, :] = x_p


def _pad_members(arrs, b):
    pad = (-b) % _BC
    if pad == 0:
        return arrs, b
    out = []
    for a in arrs:
        width = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        out.append(jnp.pad(a, width))
    return out, b + pad


def _mat_spec(shape):
    nd = len(shape)
    zeros = (_z32,) * (nd - 1)
    return pl.BlockSpec(
        shape[:-1] + (_BC,),
        lambda b, *, _zeros=zeros: _zeros + (b,),
        memory_space=pltpu.VMEM,
    )


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "mu_r", "mu_i", "interpret"),
)
def block_factor(Jd_t, h32, *, gamma, mu_r, mu_i, interpret=False):
    """Factor the shifted block-diagonal systems for one attempt.

    Jd_t: (z, m, m, B) float32 diagonal Jacobian blocks (member-last
    layout); h32: (B,) float32 step sizes. Returns
    (Minv_r_t, Minv_cr_t, Minv_ci_t), each (z, m, m, B): the real-shift
    inverse and the real/imag parts of the complex-shift inverse.
    """
    z_no, m, _, B = Jd_t.shape
    (Jd_t, h32), Bp = _pad_members((Jd_t, h32), B)
    h2 = h32.reshape(1, Bp)
    grid = (Bp // _BC,)

    kern = functools.partial(
        _factor_kernel, gamma=gamma, mu_r=mu_r, mu_i=mu_i, z_no=z_no, m=m
    )
    mspec = _mat_spec((z_no, m, m, Bp))
    mshape = jax.ShapeDtypeStruct((z_no, m, m, Bp), jnp.float32)
    minv_r, minv_cr, minv_ci = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            _mat_spec((z_no, m, m, Bp)),
            _mat_spec((1, Bp)),
        ],
        out_specs=(mspec, mspec, mspec),
        out_shape=(mshape, mshape, mshape),
        interpret=interpret,
    )(Jd_t, h2)
    return minv_r[..., :B], minv_cr[..., :B], minv_ci[..., :B]


@functools.partial(
    jax.jit,
    static_argnames=(
        "gamma", "mu_r", "mu_i", "tir", "tii", "tr", "ti", "interpret"
    ),
)
def block_apply(R_t, Minv_r_t, Minv_cr_t, Minv_ci_t, Jl_t, h32, *,
                gamma, mu_r, mu_i, tir, tii, tr, ti, interpret=False):
    """Fused stage solve M dK = R for the whole ensemble.

    R_t: (3, m, z, B) float32 (stage, variable, node, member);
    tir/tii/tr/ti: static 3x3 tuples of the Radau eigen-transform.
    Returns dK_t of the same shape.
    """
    _, m, z_no, B = R_t.shape
    # coerce to Python floats: np.float64 entries would promote the
    # in-kernel f32 math (strong-typed scalars beat weak promotion)
    tir, tii, tr, ti = (
        tuple(tuple(float(v) for v in row) for row in mat)
        for mat in (tir, tii, tr, ti)
    )
    (R_t, Minv_r_t, Minv_cr_t, Minv_ci_t, Jl_t, h32), Bp = _pad_members(
        (R_t, Minv_r_t, Minv_cr_t, Minv_ci_t, Jl_t, h32), B
    )
    h2 = h32.reshape(1, Bp)
    grid = (Bp // _BC,)

    kern = functools.partial(
        _apply_kernel, gamma=gamma, mu_r=mu_r, mu_i=mu_i,
        z_no=z_no, m=m, tir=tir, tii=tii, tr=tr, ti=ti,
    )
    mspec = _mat_spec((z_no, m, m, Bp))
    dk = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            _mat_spec((3, m, z_no, Bp)),
            mspec,
            mspec,
            mspec,
            mspec,
            _mat_spec((1, Bp)),
        ],
        out_specs=_mat_spec((3, m, z_no, Bp)),
        out_shape=jax.ShapeDtypeStruct((3, m, z_no, Bp), jnp.float32),
        interpret=interpret,
    )(R_t, Minv_r_t, Minv_cr_t, Minv_ci_t, Jl_t, h2)
    return dk[..., :B]


@functools.partial(
    jax.jit, static_argnames=("gamma", "interpret")
)
def block_apply_real(e_t, Minv_r_t, Jl_t, h32, *, gamma, interpret=False):
    """Real-shift solve (I - h*gamma*J) x = e. e_t: (m, z, B) f32."""
    m, z_no, B = e_t.shape
    (e_t, Minv_r_t, Jl_t, h32), Bp = _pad_members(
        (e_t, Minv_r_t, Jl_t, h32), B
    )
    h2 = h32.reshape(1, Bp)
    grid = (Bp // _BC,)

    kern = functools.partial(_real_kernel, gamma=gamma, z_no=z_no, m=m)
    x = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            _mat_spec((m, z_no, Bp)),
            _mat_spec((z_no, m, m, Bp)),
            _mat_spec((z_no, m, m, Bp)),
            _mat_spec((1, Bp)),
        ],
        out_specs=_mat_spec((m, z_no, Bp)),
        out_shape=jax.ShapeDtypeStruct((m, z_no, Bp), jnp.float32),
        interpret=interpret,
    )(e_t, Minv_r_t, Jl_t, h2)
    return x[..., :B]
