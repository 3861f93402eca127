# Fused block-solve Pallas kernels (ops/pallas_block): interpreter-mode
# parity with the ops/block_solve XLA formulation, true-solve residual
# checks, and an end-to-end block-mode lockstep integration on the
# pallas path.

import jax.numpy as jnp
import numpy as np

from rmt_tpu.ops import block_solve as bs
from rmt_tpu.ops import pallas_block as pb
from rmt_tpu.solvers.stiff_ensemble import _transformed_tableau

_, _, _, _, _W, _T, _TINV = _transformed_tableau()
GAMMA = float(_W[0].real)
MU_R, MU_I = float(_W[1].real), float(_W[1].imag)
T4 = lambda M: tuple(map(tuple, M))


def _setup(B=7, z=20, m=7, seed=0, scale=5.0):
    """Random stiff block-bidiagonal systems; B deliberately NOT a
    multiple of the kernel lane chunk to exercise member padding."""
    rng = np.random.default_rng(seed)
    Jd = (scale * rng.standard_normal((B, z, m, m))).astype(np.float32)
    Jl = (2.0 * rng.standard_normal((B, z, m, m))).astype(np.float32)
    Jl[:, 0] = 0
    h = (10 ** rng.uniform(-3, -1.5, B)).astype(np.float32)
    return jnp.asarray(Jd), jnp.asarray(Jl), jnp.asarray(h)


def _apply_reference(Jd, Jl, h, R):
    """stiff_ensemble.apply_block's math via ops/block_solve."""
    B, z, m, _ = Jd.shape
    n = m * z
    solve_real, solve_cplx = bs.make_shifted_solvers(
        Jd, Jl, h, GAMMA, MU_R, MU_I
    )
    Tir = jnp.asarray(_TINV.real, jnp.float32)
    Tii = jnp.asarray(_TINV.imag, jnp.float32)
    Tr = jnp.asarray(_T.real, jnp.float32)
    Ti = jnp.asarray(_T.imag, jnp.float32)
    to_b = lambda x: x.reshape(B, m, z).transpose(0, 2, 1)
    from_b = lambda xb: xb.transpose(0, 2, 1).reshape(B, n)
    Wr = jnp.einsum("ij,bjn->bin", Tir, R)
    Wi = jnp.einsum("ij,bjn->bin", Tii, R)
    z0 = from_b(solve_real(to_b(Wr[:, 0])))
    z1r, z1i = solve_cplx(to_b(Wr[:, 1]), to_b(Wi[:, 1]))
    Z1r, Z1i = from_b(z1r), from_b(z1i)
    Zr = jnp.stack([z0, Z1r, Z1r], axis=1)
    Zi = jnp.stack([jnp.zeros_like(z0), Z1i, -Z1i], axis=1)
    return (jnp.einsum("ij,bjn->bin", Tr, Zr)
            - jnp.einsum("ij,bjn->bin", Ti, Zi))


def _apply_pallas(Jd, Jl, h, R):
    B, z, m, _ = Jd.shape
    n = m * z
    Jd_t = Jd.transpose(1, 2, 3, 0)
    Jl_t = Jl.transpose(1, 2, 3, 0)
    MinvR, MinvCr, MinvCi = pb.block_factor(
        Jd_t, h, gamma=GAMMA, mu_r=MU_R, mu_i=MU_I, interpret=True
    )
    R_t = R.reshape(B, 3, m, z).transpose(1, 2, 3, 0)
    dK_t = pb.block_apply(
        R_t, MinvR, MinvCr, MinvCi, Jl_t, h,
        gamma=GAMMA, mu_r=MU_R, mu_i=MU_I,
        tir=T4(_TINV.real), tii=T4(_TINV.imag),
        tr=T4(_T.real), ti=T4(_T.imag), interpret=True,
    )
    return (dK_t.transpose(3, 0, 1, 2).reshape(B, 3, n),
            (MinvR, MinvCr, MinvCi, Jl_t))


def test_apply_matches_xla_block_solve():
    Jd, Jl, h = _setup()
    B, z, m, _ = Jd.shape
    rng = np.random.default_rng(1)
    R = jnp.asarray(rng.standard_normal((B, 3, m * z)).astype(np.float32))
    want = _apply_reference(Jd, Jl, h, R)
    got, _ = _apply_pallas(Jd, Jl, h, R)
    rel = np.abs(np.asarray(got) - np.asarray(want)) / (
        np.abs(np.asarray(want)) + 1e-3
    )
    assert rel.max() < 5e-4, rel.max()


def test_apply_solves_the_kronecker_system():
    """The fused solve is EXACT: M dK = R with M = I - h A (x) J, checked
    against the dense Kronecker operator (the integrator's m_matvec)."""
    Jd, Jl, h = _setup(B=3, seed=2, scale=2.0)
    B, z, m, _ = Jd.shape
    n = m * z
    c_np, A_np, _, _, _, _, _ = _transformed_tableau()
    rng = np.random.default_rng(3)
    R = jnp.asarray(rng.standard_normal((B, 3, n)).astype(np.float32))
    dK, _ = _apply_pallas(Jd, Jl, h, R)
    # dense J per member from its blocks (flat index v*z + z_idx layout)
    for b in range(B):
        J = np.zeros((n, n), np.float64)
        for zi in range(z):
            for vi in range(m):
                for vj in range(m):
                    J[vi * z + zi, vj * z + zi] = float(Jd[b, zi, vi, vj])
                    if zi > 0:
                        J[vi * z + zi, vj * z + zi - 1] = float(
                            Jl[b, zi, vi, vj]
                        )
        M = np.eye(3 * n) - float(h[b]) * np.kron(A_np, J)
        res = M @ np.asarray(dK[b], np.float64).reshape(-1) - np.asarray(
            R[b], np.float64
        ).reshape(-1)
        denom = np.abs(np.asarray(R[b])).max() + 1.0
        assert np.abs(res).max() / denom < 5e-4, np.abs(res).max()


def test_apply_real_matches_xla():
    Jd, Jl, h = _setup(seed=4)
    B, z, m, _ = Jd.shape
    n = m * z
    rng = np.random.default_rng(5)
    e = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    solve_real, _ = bs.make_shifted_solvers(Jd, Jl, h, GAMMA, MU_R, MU_I)
    to_b = lambda x: x.reshape(B, m, z).transpose(0, 2, 1)
    from_b = lambda xb: xb.transpose(0, 2, 1).reshape(B, n)
    want = from_b(solve_real(to_b(e)))
    Jd_t = Jd.transpose(1, 2, 3, 0)
    Jl_t = Jl.transpose(1, 2, 3, 0)
    MinvR, _, _ = pb.block_factor(
        Jd_t, h, gamma=GAMMA, mu_r=MU_R, mu_i=MU_I, interpret=True
    )
    e_t = e.reshape(B, m, z).transpose(1, 2, 0)
    x_t = pb.block_apply_real(
        e_t, MinvR, Jl_t, h, gamma=GAMMA, interpret=True
    )
    got = x_t.transpose(2, 0, 1).reshape(B, n)
    rel = np.abs(np.asarray(got) - np.asarray(want)) / (
        np.abs(np.asarray(want)) + 1e-3
    )
    assert rel.max() < 5e-5, rel.max()


def test_lockstep_block_integration_on_pallas_path():
    """odeint_ensemble(block=..., use_pallas=True) reproduces the XLA
    block path on a stiff block-bidiagonal linear problem."""
    from rmt_tpu.solvers import stiff_ensemble

    m, z = 4, 8
    n = m * z
    rng = np.random.default_rng(6)
    # block lower-bidiagonal stiff operator in the v*z + z_idx layout
    J = np.zeros((n, n))
    for zi in range(z):
        Dz = -np.diag(rng.uniform(5.0, 200.0, m)) + 0.3 * rng.standard_normal((m, m))
        Lz = 0.5 * rng.standard_normal((m, m))
        for vi in range(m):
            for vj in range(m):
                J[vi * z + zi, vj * z + zi] = Dz[vi, vj]
                if zi > 0:
                    J[vi * z + zi, vj * z + zi - 1] = Lz[vi, vj]
    A = jnp.asarray(J)
    y0 = jnp.asarray(rng.uniform(0.5, 1.5, (2, n)))

    def fB(t, y):
        return y @ A.T

    ts = jnp.asarray([0.0, 0.05, 0.1])
    kw = dict(rtol=1e-6, atol=1e-9, batched=True, max_steps=512,
              block=(m, z))
    ys_ref, st_ref = stiff_ensemble.odeint_ensemble(
        fB, y0, ts, use_pallas=False, **kw
    )
    ys_pal, st_pal = stiff_ensemble.odeint_ensemble(
        fB, y0, ts, use_pallas=True, **kw
    )
    assert int(jnp.sum(st_pal.seg < 2)) == 0
    np.testing.assert_allclose(
        np.asarray(ys_pal), np.asarray(ys_ref), rtol=2e-5, atol=1e-8
    )
