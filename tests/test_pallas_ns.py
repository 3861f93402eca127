# Fused Newton-Schulz Pallas kernel: interpreter-mode parity with the
# XLA formulation, convergence toward the true inverses, and an
# end-to-end lockstep integration on the pallas path.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmt_tpu.ops.pallas_ns import ns_fused_step
from rmt_tpu.solvers.stiff_ensemble import _transformed_tableau

_HI = jax.lax.Precision.HIGHEST


def _reference_step(J, Pr, Pcr, Pci, h32, gamma, mu_r, mu_i):
    """The stiff_ensemble.ns_update single-iteration math in plain jnp."""
    n = J.shape[-1]
    h = h32[:, None, None]
    eye = jnp.eye(n, dtype=jnp.float32)[None]
    JP = jnp.matmul(J, Pr, precision=_HI)
    JPr = jnp.matmul(J, Pcr, precision=_HI)
    JPi = jnp.matmul(J, Pci, precision=_HI)
    MPr = Pr - (gamma * h) * JP
    MPc_r = Pcr - h * (mu_r * JPr - mu_i * JPi)
    MPc_i = Pci - h * (mu_r * JPi + mu_i * JPr)
    res_r = jnp.sqrt(jnp.mean((eye - MPr) ** 2, axis=(-1, -2)) * n)
    res_c = jnp.sqrt(
        (jnp.mean((eye - MPc_r) ** 2, axis=(-1, -2))
         + jnp.mean(MPc_i**2, axis=(-1, -2))) * n
    )
    rho_pre = jnp.maximum(res_r, res_c)
    Pr2 = 2 * Pr - jnp.matmul(Pr, MPr, precision=_HI)
    Pcr2 = 2 * Pcr - (jnp.matmul(Pcr, MPc_r, precision=_HI)
                      - jnp.matmul(Pci, MPc_i, precision=_HI))
    Pci2 = 2 * Pci - (jnp.matmul(Pci, MPc_r, precision=_HI)
                      + jnp.matmul(Pcr, MPc_i, precision=_HI))
    return Pr2, Pcr2, Pci2, rho_pre


def _setup(B=3, n=24, seed=0):
    _, _, _, _, w, _, _ = _transformed_tableau()
    gamma = float(w[0].real)
    mu_r, mu_i = float(w[1].real), float(w[1].imag)
    rng = np.random.default_rng(seed)
    # moderately stiff random Jacobians with negative real parts
    J = (-np.eye(n) * rng.uniform(1.0, 50.0, (B, 1, 1))
         + 0.3 * rng.standard_normal((B, n, n))).astype(np.float32)
    h32 = rng.uniform(0.005, 0.02, B).astype(np.float32)
    # seed near the true inverses so one NS step contracts
    Pr = np.stack([np.linalg.inv(np.eye(n) - gamma * h32[b] * J[b])
                   for b in range(B)])
    Pc = np.stack([
        np.linalg.inv(np.eye(n) - (mu_r + 1j * mu_i) * h32[b] * J[b])
        for b in range(B)
    ])
    jitter = 0.01 * rng.standard_normal((B, n, n))
    return (jnp.asarray(J), jnp.asarray((Pr + jitter).astype(np.float32)),
            jnp.asarray(Pc.real.astype(np.float32) + jitter.astype(np.float32)),
            jnp.asarray(Pc.imag.astype(np.float32)),
            jnp.asarray(h32), gamma, mu_r, mu_i)


def test_kernel_matches_xla_formulation():
    J, Pr, Pcr, Pci, h32, gamma, mu_r, mu_i = _setup()
    got = ns_fused_step(J, Pr, Pcr, Pci, h32, gamma=gamma, mu_r=mu_r,
                        mu_i=mu_i, interpret=True)
    want = _reference_step(J, Pr, Pcr, Pci, h32, gamma, mu_r, mu_i)
    for g, w, name in zip(got, want, ("Pr", "Pcr", "Pci", "rho")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_kernel_iterations_converge_to_inverse():
    J, Pr, Pcr, Pci, h32, gamma, mu_r, mu_i = _setup(seed=3)
    n = J.shape[-1]
    rho_prev = None
    for _ in range(4):
        Pr, Pcr, Pci, rho = ns_fused_step(
            J, Pr, Pcr, Pci, h32, gamma=gamma, mu_r=mu_r, mu_i=mu_i,
            interpret=True,
        )
        if rho_prev is not None:
            assert float(jnp.max(rho)) <= float(jnp.max(rho_prev)) + 1e-6
        rho_prev = rho
    # verify against the true inverse of the real system
    eye = np.eye(n, dtype=np.float32)
    for b in range(J.shape[0]):
        M = eye - gamma * float(h32[b]) * np.asarray(J[b])
        err = np.abs(M @ np.asarray(Pr[b]) - eye).max()
        assert err < 1e-4, err


def test_lockstep_integration_on_pallas_path():
    """odeint_ensemble(use_pallas=True) reproduces the default path on a
    stiff linear test problem (interpreter-mode kernel on CPU)."""
    from rmt_tpu.solvers import stiff_ensemble

    n = 12
    rng = np.random.default_rng(1)
    A = (-np.diag(rng.uniform(1.0, 300.0, n))
         + 0.5 * rng.standard_normal((n, n)))
    A = jnp.asarray(A)
    y0 = jnp.asarray(rng.uniform(0.5, 1.5, (2, n)))

    def fB(t, y):
        return y @ A.T

    ts = jnp.asarray([0.0, 0.05, 0.1])
    ys_ref, st_ref = stiff_ensemble.odeint_ensemble(
        fB, y0, ts, rtol=1e-6, atol=1e-9, batched=True, max_steps=512,
        use_pallas=False,
    )
    ys_pal, st_pal = stiff_ensemble.odeint_ensemble(
        fB, y0, ts, rtol=1e-6, atol=1e-9, batched=True, max_steps=512,
        use_pallas=True,
    )
    assert int(jnp.sum(st_pal.seg < 2)) == 0
    np.testing.assert_allclose(
        np.asarray(ys_pal), np.asarray(ys_ref), rtol=1e-6, atol=1e-9
    )
