# Orthogonal collocation: basis matrices bit-for-bit vs the reference,
# Robin-interface update and OC residual parity vs OrCoCatParticleClass
# (called with const3 supplied -- the reference's production callers pass
# const3=() and crash in buildLhsMatrix, so the assembler itself is the
# only runnable oracle).

import numpy as np
import jax.numpy as jnp
import pytest

from rmt_tpu.ops import collocation, oc_particle


@pytest.mark.reference
def test_oc_basis_matrices_bit_for_bit():
    from PyREMOT.solvers.solOrCo import OrCoClass

    ref = OrCoClass().buildMatrix()
    ours = collocation.build_matrices()
    assert ours["N"] == ref["N"]
    np.testing.assert_array_equal(ours["Xc"], ref["Xc"])
    np.testing.assert_array_equal(ours["Q"], ref["Q"])
    np.testing.assert_array_equal(ours["A"], ref["A"])
    np.testing.assert_array_equal(ours["B"], ref["B"])


def _ref_particle():
    from PyREMOT.solvers.solCatParticle import OrCoCatParticleClass
    from PyREMOT.solvers.solOrCo import OrCoClass

    m = OrCoClass().buildMatrix()
    return OrCoCatParticleClass(m["Xc"], m["N"], m["Q"], m["A"], m["B"], 1), m


@pytest.mark.reference
@pytest.mark.parametrize("flux_dir", ["lr", "rl"])
def test_oc_interface_update_matches_reference(flux_dir):
    ref_cls, m = _ref_particle()
    ops = oc_particle.oc_operator()
    rng = np.random.default_rng(2)
    for _ in range(3):
        y = rng.uniform(0.1, 1.0, m["N"])
        bulk = rng.uniform(0.5, 1.5)
        beta = rng.uniform(1.0, 50.0)
        ref = ref_cls.CalUpdateYnSolidGasInterface(
            y.copy(), bulk, beta, fluxDir=flux_dir
        ).ravel()
        ours = np.asarray(
            oc_particle.interface_update(jnp.asarray(y), bulk, beta,
                                         ops["A"], flux_dir=flux_dir)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


@pytest.mark.reference
def test_oc_residual_matches_reference():
    ref_cls, m = _ref_particle()
    ops = oc_particle.oc_operator()
    rng = np.random.default_rng(4)
    for _ in range(3):
        y = rng.uniform(0.1, 1.0, m["N"])
        k_eff = rng.uniform(0.05, 1.0)
        src = rng.uniform(-2.0, 2.0, m["N"])
        bulk = rng.uniform(0.5, 1.5)
        beta = rng.uniform(1.0, 50.0)
        # mode="test": rows aligned with collocation points (the default
        # mode's flip is the radial-permutation bug documented in
        # ops/oc_particle.py). y is passed FLAT: the reference's own
        # callers hand in the (N,1) matrix from CalUpdateYnSolidGasInterface,
        # which broadcasts RY (N,1) + f (N,) into an (N,N) matrix -- one
        # more way the reference OC path cannot run
        ref = np.asarray(
            ref_cls.buildOrCoMatrix(
                y, k_eff, src, const3=(bulk, beta), mode="test"
            )
        ).ravel()
        ours = np.asarray(
            oc_particle.oc_residual(jnp.asarray(y), k_eff, jnp.asarray(src),
                                    beta, bulk, ops)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_oc_interface_update_satisfies_robin_row():
    """The updated surface value must zero the Robin residual row."""
    ops = oc_particle.oc_operator()
    rng = np.random.default_rng(6)
    y = jnp.asarray(rng.uniform(0.1, 1.0, ops["N"]))
    bulk, beta = 0.8, 12.0
    y_up = oc_particle.interface_update(y, bulk, beta, ops["A"], flux_dir="lr")
    res = oc_particle.oc_residual(y_up, 1.0, jnp.zeros(ops["N"]), beta, bulk, ops)
    assert abs(float(res[-1])) < 1e-10


def test_oc_laplacian_exact_on_quadratic():
    """L = B + (2/x) A applied to y = x^2 gives 6 (spherical Laplacian of
    r^2) at every collocation point."""
    ops = oc_particle.oc_operator()
    y = jnp.asarray(ops["Xc"] ** 2)
    out = np.asarray(jnp.asarray(ops["L"]) @ y)
    np.testing.assert_allclose(out, 6.0, rtol=1e-9)
