# Fused Newton-Schulz preconditioner update as a single Pallas TPU kernel.
#
# The lockstep integrator (solvers/stiff_ensemble.py) refreshes its
# approximate inverses Pr ~ (I - h*gamma*J)^-1 and (Pcr + i Pci) ~
# (I - h*mu*J)^-1 once per attempt. The XLA formulation runs 8 batched
# matmuls with 6 (B,n,n) intermediates round-tripping through HBM; here
# the whole update for one ensemble member -- three J-products, the M
# assembly, the Frobenius residual, and five P@M products -- stays in
# VMEM (n=140: ~1 MB including temporaries, well under the 16 MB core
# budget), with the grid over members. Per-member step sizes ride in as
# a scalar-prefetch argument (SMEM blocks below the (8,128) tile are not
# lowerable); the rho output pads to one (8,128) VMEM tile per member
# for the same reason.
#
# Numerics are identical to the XLA path up to f32 reassociation: the
# same M P products feed both the update and the residual certificate
# (see stiff_ensemble.ns_update for the quadratic-convergence bound).
#
# Opt-in via RMT_TPU_PALLAS=1 (stiff_ensemble picks it up); tests run the
# kernel in interpreter mode on CPU against the stacked-jnp reference.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _kernel(h_ref, j_ref, pr_ref, pcr_ref, pci_ref,
            pr_out, pcr_out, pci_out, rho_out, *, gamma, mu_r, mu_i, n):
    b = pl.program_id(0)
    h = h_ref[b]
    g = gamma * h
    mr = mu_r * h
    mi = mu_i * h

    J = j_ref[0]
    Pr = pr_ref[0]
    Pcr = pcr_ref[0]
    Pci = pci_ref[0]

    JP = jnp.dot(J, Pr, precision=_HI, preferred_element_type=jnp.float32)
    JPr = jnp.dot(J, Pcr, precision=_HI, preferred_element_type=jnp.float32)
    JPi = jnp.dot(J, Pci, precision=_HI, preferred_element_type=jnp.float32)

    MPr = Pr - g * JP
    MPc_r = Pcr - (mr * JPr - mi * JPi)
    MPc_i = Pci - (mr * JPi + mi * JPr)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rows == cols).astype(jnp.float32)

    # residual of the CURRENT iterate (certificate input), matching the
    # jnp path's sqrt(mean(.^2) * n) = ||.||_F / sqrt(n) scaling
    dr = eye - MPr
    dc = eye - MPc_r
    inv_n = 1.0 / n
    res_r = jnp.sqrt(jnp.sum(dr * dr) * inv_n)
    res_c = jnp.sqrt((jnp.sum(dc * dc) + jnp.sum(MPc_i * MPc_i)) * inv_n)
    rho_out[0] = jnp.full((8, 128), jnp.maximum(res_r, res_c), jnp.float32)

    PrM = jnp.dot(Pr, MPr, precision=_HI, preferred_element_type=jnp.float32)
    Ar1 = jnp.dot(Pcr, MPc_r, precision=_HI, preferred_element_type=jnp.float32)
    Ar2 = jnp.dot(Pcr, MPc_i, precision=_HI, preferred_element_type=jnp.float32)
    Ai1 = jnp.dot(Pci, MPc_r, precision=_HI, preferred_element_type=jnp.float32)
    Ai2 = jnp.dot(Pci, MPc_i, precision=_HI, preferred_element_type=jnp.float32)

    pr_out[0] = 2.0 * Pr - PrM
    pcr_out[0] = 2.0 * Pcr - (Ar1 - Ai2)
    pci_out[0] = 2.0 * Pci - (Ai1 + Ar2)


@functools.partial(
    jax.jit, static_argnames=("gamma", "mu_r", "mu_i", "interpret")
)
def ns_fused_step(J, Pr, Pcr, Pci, h32, *, gamma, mu_r, mu_i,
                  interpret=False):
    """One fused Newton-Schulz iteration for the whole ensemble.

    J, Pr, Pcr, Pci: (B, n, n) float32; h32: (B,) float32.
    Returns (Pr', Pcr', Pci', rho_pre) matching
    stiff_ensemble.ns_update's per-iteration math (rho_pre is the
    residual of the INPUT iterate, computed from the same M P products).
    """
    B, n, _ = J.shape
    # index maps return explicit i32 zeros: under jax_enable_x64 the
    # literal 0 traces as i64 and Mosaic fails to legalize the transform
    # function ("failed to legalize operation 'func.func'", observed on
    # the f64 path)
    import numpy as _np

    _z = _np.int32(0)
    mat_spec = pl.BlockSpec((1, n, n), lambda b, h: (b, _z, _z),
                            memory_space=pltpu.VMEM)
    rho_spec = pl.BlockSpec((1, 8, 128), lambda b, h: (b, _z, _z),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[mat_spec, mat_spec, mat_spec, mat_spec],
        out_specs=(mat_spec, mat_spec, mat_spec, rho_spec),
    )

    kern = functools.partial(_kernel, gamma=gamma, mu_r=mu_r, mu_i=mu_i, n=n)
    pr2, pcr2, pci2, rho = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(h32, J, Pr, Pcr, Pci)
    return pr2, pcr2, pci2, rho[:, 0, 0]
