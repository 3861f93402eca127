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


def _random_tridiag_J(rng, B, var_no, z_no):
    """Dense (B, n, n) with block-TRIdiagonal sparsity (dispersion MoL)."""
    n = var_no * z_no
    J = np.zeros((B, n, n))
    Jd = rng.normal(size=(B, z_no, var_no, var_no))
    Jl = rng.normal(size=(B, z_no, var_no, var_no))
    Ju = rng.normal(size=(B, z_no, var_no, var_no))
    Jl[:, 0] = 0.0
    Ju[:, -1] = 0.0
    for z in range(z_no):
        for i in range(var_no):
            for j in range(var_no):
                J[:, i * z_no + z, j * z_no + z] = Jd[:, z, i, j]
                if z > 0:
                    J[:, i * z_no + z, j * z_no + z - 1] = Jl[:, z, i, j]
                if z < z_no - 1:
                    J[:, i * z_no + z, j * z_no + z + 1] = Ju[:, z, i, j]
    return J, Jd, Jl, Ju


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


def test_extract_tridiag_blocks():
    rng = np.random.default_rng(3)
    J, Jd, Jl, Ju = _random_tridiag_J(rng, 3, 4, 6)
    jd, jl, ju = bs.extract_tridiag_blocks(jnp.asarray(J), 4, 6)
    np.testing.assert_allclose(np.asarray(jd), Jd, atol=1e-14)
    np.testing.assert_allclose(np.asarray(jl), Jl, atol=1e-14)
    np.testing.assert_allclose(np.asarray(ju), Ju, atol=1e-14)


def test_tridiag_solve_matches_dense_f64():
    """Cyclic reduction vs dense solve, f64, including a non-power-of-two
    node count (padding path) and z_no=1 (no levels at all)."""
    rng = np.random.default_rng(4)
    for B, m, z_no in ((3, 4, 11), (2, 5, 16), (2, 3, 1), (1, 2, 2)):
        n = m * z_no
        J, Jd, Jl, Ju = _random_tridiag_J(rng, B, m, z_no)
        # diagonally dominant blocks so the pivot-free block elimination
        # is well-conditioned (M = I - h*gamma*J territory)
        M = np.eye(n) * 6.0 + J
        Dd = Jd + 6.0 * np.eye(m)
        fac = bs.tridiag_factor(
            jnp.asarray(Dd), jnp.asarray(Jl), jnp.asarray(Ju)
        )
        r = rng.normal(size=(B, z_no, m))
        x = np.asarray(bs.tridiag_solve(fac, jnp.asarray(r)))
        for b in range(B):
            rb = r[b].T.reshape(-1)  # (z, m) -> flat v*z layout
            want = np.linalg.solve(M[b], rb).reshape(m, z_no).T
            np.testing.assert_allclose(x[b], want, rtol=1e-9, atol=1e-10)


def test_shifted_tridiag_solves_match_dense():
    rng = np.random.default_rng(5)
    B, var_no, z_no = 4, 5, 9
    n = var_no * z_no
    J, _, _, _ = _random_tridiag_J(rng, B, var_no, z_no)
    h = rng.uniform(0.02, 0.12, size=B)
    gamma, mu_r, mu_i = 0.35, 0.27, 0.31
    jd, jl, ju = bs.extract_tridiag_blocks(
        jnp.asarray(J, np.float32), var_no, z_no
    )
    solve_real, solve_cplx = bs.make_shifted_solvers_tridiag(
        jd, jl, ju, jnp.asarray(h, np.float32), gamma, mu_r, mu_i
    )

    r = rng.normal(size=(B, n))
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
        np.testing.assert_allclose(
            xr[b], want.real.reshape(var_no, z_no).T, rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            xi[b], want.imag.reshape(var_no, z_no).T, rtol=2e-4, atol=2e-4
        )


def test_tridiag_f64_blocks_survive_ill_conditioning():
    """The motivation for f64 blocks: eps32 * cond >= 1 systems (the M11
    transient measures cond ~ 6e9) still solve exactly in f64 blocks."""
    rng = np.random.default_rng(6)
    B, m, z_no = 2, 3, 5
    n = m * z_no
    J, _, _, _ = _random_tridiag_J(rng, B, m, z_no)
    J *= 1e9          # stiff: h*J >> 1, cond(I - h*gamma*J) large
    h = np.full(B, 1e-4)
    jd, jl, ju = bs.extract_tridiag_blocks(jnp.asarray(J), m, z_no)
    solve_real, _ = bs.make_shifted_solvers_tridiag(
        jd, jl, ju, jnp.asarray(h), 0.35, 0.27, 0.31, dtype=jnp.float64
    )
    r = rng.normal(size=(B, n))
    r_blocks = r.reshape(B, m, z_no).transpose(0, 2, 1)
    x = np.asarray(solve_real(jnp.asarray(r_blocks)))
    for b in range(B):
        M = np.eye(n) - h[b] * 0.35 * J[b]
        want = np.linalg.solve(M, r[b]).reshape(m, z_no).T
        np.testing.assert_allclose(x[b], want, rtol=1e-6, atol=1e-9)
