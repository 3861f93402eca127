# Orthogonal collocation on symmetric (even-power) polynomials.
#
# The catalyst-particle profiles are symmetric about r=0, so the basis is
# y(x) = sum_j d_j x^(2j) on collocation points Xc (+ the surface point
# x=1). First/second derivative operators A = C Q^-1, B = D Q^-1 are tiny
# dense matrices -- ideal MXU matmuls when applied over batched particle
# states. (reference: PyREMOT/solvers/solOrCo.py:31-199; the 7 spherical
# points are reproduced bit-for-bit.)

from __future__ import annotations

import numpy as np

# 6 interior spherical collocation points + surface (reference solOrCo.py:38-46)
SPHERICAL_POINTS_7 = np.array(
    [0.215353, 0.420638, 0.606253, 0.763519, 0.885082, 0.965245, 1.0]
)


def build_matrices(xc: np.ndarray | None = None):
    """Q, A (1st deriv), B (2nd deriv) operators on collocation values.

    y'(Xc) = A @ y(Xc), y''(Xc) = B @ y(Xc) for y in span{x^(2j)}.
    """
    xc = SPHERICAL_POINTS_7 if xc is None else np.asarray(xc)
    n = xc.size
    j = np.arange(n)

    q = xc[:, None] ** (2 * j[None, :])
    c = np.where(j[None, :] == 0, 0.0, 2 * j[None, :] * xc[:, None] ** np.maximum(2 * j[None, :] - 1, 0))
    d = np.where(
        j[None, :] == 0,
        0.0,
        np.where(
            j[None, :] == 1,
            2.0,
            2 * j[None, :] * (2 * j[None, :] - 1) * xc[:, None] ** np.maximum(2 * j[None, :] - 2, 0),
        ),
    )
    q_inv = np.linalg.inv(q)
    return {"N": n, "Xc": xc, "Q": q, "A": c @ q_inv, "B": d @ q_inv}
