# Orthogonal-collocation particle assembler: Robin-interface update +
# diffusion-reaction residual on the symmetric OC basis.
#
# Port of the reference's OrCoCatParticleClass (PyREMOT/solvers/
# solCatParticle.py:28-242) in vectorized jnp form. Layout is the OC
# basis's own ordering (solOrCo.py:31-57): index 0 = innermost collocation
# point, index N-1 = the gas-solid surface (x = 1).
#
# Reference-bug notes (why some callers have no runnable oracle):
#   * buildLhsMatrix unconditionally evaluates constCT2[1]
#     (solCatParticle.py:150) while the production callers pass const3=()
#     (pbReactor.py:3259,3284 runM6; :6704,6727 runM8; particleModels.py
#     OC branch) -- every reference OC model crashes with IndexError on
#     the first RHS call. The intended Robin row is recovered here from
#     fR/ff with const3 = (bulk, beta) supplied (solCatParticle.py:102-114,
#     156-176).
#   * buildOrCoMatrix(mode="default") flips its output surface-first
#     (solCatParticle.py:234-236) while the state the callers integrate is
#     center-first -- a radial permutation bug; oc_residual keeps rows
#     aligned with their collocation points (mode="test" semantics).

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .collocation import build_matrices


def interface_update(y, bulk, beta, A, flux_dir="lr"):
    """Replace the surface value y[..., -1] by the solution of the Robin
    boundary row (reference CalUpdateYnSolidGasInterface,
    solCatParticle.py:28-85).

    The surface row of the first-derivative operator A enforces
    A[-1] . y = -beta (y_s - bulk) (flux_dir "lr") or
    A[-1] . y = +beta (bulk - y_s) with the reference's "rl" sign layout;
    both solve to the same affine form in y[:-1].

    y: (..., N) collocation values, center-first; beta: dimensionless
    transfer number (MaTrCo*rf/D-type, already scaled by the caller).
    """
    a_last = jnp.asarray(A[-1, :-1], y.dtype)
    s = jnp.tensordot(y[..., :-1], a_last, axes=(-1, 0))
    if flux_dir == "rl":
        yn = (s + beta * bulk) / (beta - A[-1, -1])
    else:
        yn = (beta * bulk - s) / (beta + A[-1, -1])
    return jnp.concatenate(
        [y[..., :-1], jnp.broadcast_to(yn, y.shape[:-1])[..., None]], axis=-1
    )


def oc_operator(xc=None):
    """L = B + (2/Xc) A -- the spherical Laplacian on collocation values
    (reference fR interior rows, solCatParticle.py:102-105) -- plus the
    matrices themselves."""
    mats = build_matrices(xc)
    xc_v = mats["Xc"]
    L = mats["B"] + (2.0 / xc_v)[:, None] * mats["A"]
    return {"L": L, **mats}


def oc_residual(y, k_eff, source, beta, bulk, ops):
    """R . y + f with the Robin surface row (reference buildOrCoMatrix
    called with const3=(bulk, beta), solCatParticle.py:205-239, unflipped
    mode="test" row order):

      interior i:  k_eff * (B + (2/Xc) A)[i] . y + source[i]
      surface:     A[-1] . y + beta * (y[-1] - bulk)

    y: (..., N) center-first; source: (..., N) (surface entry unused);
    k_eff: dimensionless effective diffusivity/conductivity; returns the
    residual aligned with the collocation points.
    """
    L = jnp.asarray(ops["L"], y.dtype)
    A = jnp.asarray(ops["A"], y.dtype)
    interior = k_eff * jnp.tensordot(y, L, axes=(-1, 1)) + source
    surface = (
        jnp.tensordot(y, A[-1], axes=(-1, 0)) + beta * (y[..., -1] - bulk)
    )
    return jnp.concatenate([interior[..., :-1], surface[..., None]], axis=-1)
