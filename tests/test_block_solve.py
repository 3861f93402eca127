# Exact block-bidiagonal solves (ops/block_solve): batched small-matrix
# inversion, block extraction, and the shifted solves that replace the
# Newton-Schulz preconditioners for MoL Jacobians.

import jax
import jax.numpy as jnp
import numpy as np

from rmt_tpu.ops import block_solve as bs


def _random_bidiag_J(rng, B, var_no, z_no):
    """Dense (B, n, n) with the MoL block-bidiagonal sparsity, flat index
    v*z_no + z (banded_coloring convention)."""
    n = var_no * z_no
    J = np.zeros((B, n, n))
    Jd = rng.normal(size=(B, z_no, var_no, var_no))
    Jl = rng.normal(size=(B, z_no, var_no, var_no))
    Jl[:, 0] = 0.0
    for z in range(z_no):
        for i in range(var_no):
            for j in range(var_no):
                J[:, i * z_no + z, j * z_no + z] = Jd[:, z, i, j]
                if z > 0:
                    J[:, i * z_no + z, j * z_no + z - 1] = Jl[:, z, i, j]
    return J, Jd, Jl


def test_batched_inv_with_pivoting():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(40, 7, 7))
    M[:, 0, 0] = 1e-14          # force pivoting in the first column
    out = np.asarray(bs.batched_inv(jnp.asarray(M)))
    np.testing.assert_allclose(out, np.linalg.inv(M), rtol=1e-9, atol=1e-10)


def test_extract_bidiag_blocks():
    rng = np.random.default_rng(1)
    J, Jd, Jl = _random_bidiag_J(rng, 3, 4, 6)
    jd, jl = bs.extract_bidiag_blocks(jnp.asarray(J), 4, 6)
    np.testing.assert_allclose(np.asarray(jd), Jd, atol=1e-14)
    np.testing.assert_allclose(np.asarray(jl), Jl, atol=1e-14)


def test_shifted_solves_match_dense():
    rng = np.random.default_rng(2)
    B, var_no, z_no = 4, 5, 8
    n = var_no * z_no
    J, _, _ = _random_bidiag_J(rng, B, var_no, z_no)
    h = rng.uniform(0.05, 0.3, size=B)
    gamma, mu_r, mu_i = 0.35, 0.27, 0.31
    jd, jl = bs.extract_bidiag_blocks(jnp.asarray(J, np.float32), var_no, z_no)
    solve_real, solve_cplx = bs.make_shifted_solvers(
        jd, jl, jnp.asarray(h, np.float32), gamma, mu_r, mu_i
    )

    r = rng.normal(size=(B, n))
    # r in flat (v*z) layout -> (B, z, m) node-major blocks
    r_blocks = r.reshape(B, var_no, z_no).transpose(0, 2, 1)

    x = np.asarray(solve_real(jnp.asarray(r_blocks, np.float32)))
    for b in range(B):
        M = np.eye(n) - h[b] * gamma * J[b]
        want = np.linalg.solve(M, r[b]).reshape(var_no, z_no).T
        np.testing.assert_allclose(x[b], want, rtol=2e-4, atol=2e-4)

    ri = rng.normal(size=(B, n))
    ri_blocks = ri.reshape(B, var_no, z_no).transpose(0, 2, 1)
    xr, xi = solve_cplx(
        jnp.asarray(r_blocks, np.float32), jnp.asarray(ri_blocks, np.float32)
    )
    xr, xi = np.asarray(xr), np.asarray(xi)
    for b in range(B):
        M = np.eye(n) - h[b] * (mu_r + 1j * mu_i) * J[b]
        want = np.linalg.solve(M, r[b] + 1j * ri[b])
        want_r = want.real.reshape(var_no, z_no).T
        want_i = want.imag.reshape(var_no, z_no).T
        np.testing.assert_allclose(xr[b], want_r, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(xi[b], want_i, rtol=2e-4, atol=2e-4)
