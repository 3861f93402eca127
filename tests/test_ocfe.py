# OCFE (orthogonal collocation on finite elements): basis bit-for-bit vs
# the reference FiElClass, and solution accuracy on the spherical
# diffusion-reaction problem with an exact solution (the reference's own
# OCFE assembler cannot produce a correct system -- see ops/ocfe.py -- so
# the analytic problem is the oracle for the assembled operator).

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rmt_tpu.ops import ocfe
from rmt_tpu.solvers import newton


@pytest.mark.reference
def test_ocfe_basis_matches_reference():
    from PyREMOT.solvers.solFiEl import FiElClass

    ref = FiElClass(6).initFiEl()
    ours = ocfe.ocfe_basis(6)
    assert ours["NuToCoPo"] == ref["NuToCoPo"]
    np.testing.assert_array_equal(ours["Xc"], ref["Xc"])
    np.testing.assert_array_equal(ours["Q"], ref["Q"])
    np.testing.assert_array_equal(ours["A"], ref["A"])
    np.testing.assert_array_equal(ours["B"], ref["B"])
    np.testing.assert_array_equal(ours["hi"], ref["hi"])
    np.testing.assert_array_equal(ours["li"], ref["li"])
    np.testing.assert_array_equal(ours["xi"], ref["xi"])


def _analytic_profile(lam, beta, bulk, xs):
    """Exact solution of y'' + (2/x) y' - lam y = 0 on the unit sphere with
    y'(0) = 0 and Robin y'(1) = beta (bulk - y(1)): y = C sinh(s x)/x."""
    s = math.sqrt(lam)
    y1 = math.sinh(s)                      # sinh(s x)/x at x=1
    dy1 = s * math.cosh(s) - math.sinh(s)  # d/dx [sinh(sx)/x] at x=1
    C = beta * bulk / (dy1 + beta * y1)
    xs = np.asarray(xs)
    out = np.where(xs > 1e-12, C * np.sinh(s * xs) / np.maximum(xs, 1e-12), C * s)
    return out


@pytest.mark.parametrize("lam,beta", [(4.0, 10.0), (25.0, 50.0)])
def test_ocfe_solves_spherical_reaction_diffusion(lam, beta):
    ops = ocfe.ocfe_operator(6)
    bulk = 1.0
    xs = ops["xi"]

    def res(y):
        src = -lam * y
        return ocfe.ocfe_residual(y, 1.0, src, beta, bulk, ops)

    sol = newton.root(res, jnp.full(ops["NuToCoPo"], 0.5), max_iter=30, tol=1e-12)
    assert bool(sol.converged)
    exact = _analytic_profile(lam, beta, bulk, xs)
    # 6 uniform elements: discretization error ~1e-4 abs for the sharper
    # (lam=25) profile; the refinement test pins convergence separately
    np.testing.assert_allclose(np.asarray(sol.x), exact, rtol=2e-3, atol=2e-4)


def test_ocfe_refines_toward_exact():
    """Element refinement reduces the error (OCFE convergence check)."""
    lam, beta, bulk = 25.0, 50.0, 1.0
    errs = []
    for nu_el in (2, 4, 8):
        ops = ocfe.ocfe_operator(nu_el)

        def res(y):
            return ocfe.ocfe_residual(y, 1.0, -lam * y, beta, bulk, ops)

        sol = newton.root(res, jnp.full(ops["NuToCoPo"], 0.5), max_iter=30, tol=1e-12)
        assert bool(sol.converged)
        exact = _analytic_profile(lam, beta, bulk, ops["xi"])
        errs.append(np.abs(np.asarray(sol.x) - exact).max())
    assert errs[2] < errs[1] < errs[0]
    assert errs[2] < 1e-4
