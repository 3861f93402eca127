# Parity of the fused Pallas N2 RHS (ops/pallas_rhs.py) against the XLA
# member-last batched RHS (models/homo.make_n2_rhs_b), in interpret mode on
# CPU. The fused kernel reorders only benign plain-f32 reductions
# (Hillis-Steele prefix scans vs cumprod/cumsum, sequential vs tree
# species sums); the df32 compensated chain is the SAME code in the same
# order, so the df32-mode outputs must track the f64 reference as closely
# as the XLA df32 path does.

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dme_case import make_model_input

from rmt_tpu.models import homo
from rmt_tpu.ops import pallas_rhs


def _setup(B, model="N2", stage_rep=1):
    mi = make_model_input(model=model)
    spec = homo.build_spec(mi, z_no=20, t_no=5)
    base = homo.build_params(mi)

    from rmt_tpu.parallel import batch_params

    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
    params, axes = batch_params(base, sweep)

    def derive(q):
        d = homo.feed_state(spec, q)
        return d, homo.n2_initial_state(spec, q, d)

    dB, y0B = jax.vmap(derive, in_axes=(axes,))(params)

    # broadcast every leaf to (B, ...) like ensemble._broadcast_params
    def bcast(val, ax):
        arr = jnp.asarray(val)
        return arr if ax == 0 else jnp.broadcast_to(arr[None], (B,) + arr.shape)

    pB = {}
    for k, v in params.items():
        if k == "kinetic_overrides":
            pB[k] = {kk: bcast(vv, axes[k][kk]) for kk, vv in v.items()}
        else:
            pB[k] = bcast(v, axes[k])

    # a state mildly off the initial value so kinetics/stencils are active
    key = jax.random.PRNGKey(0)
    pert = 1.0 + 0.05 * jax.random.uniform(key, y0B.shape)
    yB = (y0B * pert).astype(jnp.float32)
    if stage_rep > 1:
        yB = jnp.tile(yB, (stage_rep, 1))
    return spec, pB, dB, yB


@pytest.mark.parametrize("mode", [False, "df32"])
def test_fused_matches_xla_batched(mode):
    B = 8
    spec, pB, dB, yB = _setup(B)
    f32 = jnp.float32
    to32 = lambda t: jax.tree.map(lambda x: x.astype(f32) if jnp.issubdtype(
        jnp.asarray(x).dtype, jnp.floating) else x, t)
    pB32, dB32 = to32(pB), to32(dB)

    rhs_b = homo.make_n2_rhs_b(spec, accurate_rates=mode)
    ref = np.asarray(rhs_b(jnp.zeros((B,)), yB, pB32, dB32).astype(f32))

    rhs_f = pallas_rhs.build_n2_fused(spec, accurate_rates=mode,
                                      interpret=True)
    got = np.asarray(rhs_f(None, yB, pB32, dB32))

    assert got.shape == ref.shape
    scale = np.maximum(np.abs(ref), 1e-3 * np.max(np.abs(ref)))
    rel = np.max(np.abs(got - ref) / scale)
    # benign f32 reorderings only (prefix-scan tree order, species-sum
    # order): a few ulps through the ~1e3-amplifying kinetics chain
    assert rel < 5e-5, rel


def test_fused_stage_stacked_consistent():
    """M = 3B stage-major stacking must equal three B-sized calls."""
    B = 8
    spec, pB, dB, yB = _setup(B)
    rhs_f = pallas_rhs.build_n2_fused(spec, interpret=True)
    y3 = jnp.concatenate([yB, yB * 1.01, yB * 0.99], axis=0)
    out3 = np.asarray(rhs_f(None, y3, pB, dB))
    for s in range(3):
        one = np.asarray(rhs_f(None, y3[s * B:(s + 1) * B], pB, dB))
        # ulp-level tolerance: XLA:CPU contracts fma differently for the
        # M=24 vs M=8 programs (same math, 1-ulp f32 nondeterminism)
        np.testing.assert_allclose(
            out3[s * B:(s + 1) * B], one, rtol=5e-7, atol=1e-6
        )


def test_fused_df32_tracks_f64_reference():
    """The fused df32 chain must stay as close to the f64 rates chain as
    the XLA df32 path does (same compensated code, same order)."""
    B = 8
    spec, pB, dB, yB = _setup(B)
    f32 = jnp.float32
    to32 = lambda t: jax.tree.map(lambda x: x.astype(f32) if jnp.issubdtype(
        jnp.asarray(x).dtype, jnp.floating) else x, t)
    pB32, dB32 = to32(pB), to32(dB)

    # f64 reference through the vmapped exact RHS
    rhs64 = homo.make_n2_rhs(spec)
    p64 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), pB)
    d64 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), dB)
    y64 = jnp.asarray(yB, jnp.float64)
    ref64 = np.asarray(jax.vmap(
        lambda y, p_, d_: rhs64(0.0, y, p_, d_), in_axes=(0, 0, 0)
    )(y64, p64, d64))

    rhs_f = pallas_rhs.build_n2_fused(spec, accurate_rates="df32",
                                      interpret=True)
    got = np.asarray(rhs_f(None, yB, pB32, dB32), dtype=np.float64)

    rhs_bx = homo.make_n2_rhs_b(spec, accurate_rates="df32")
    xla = np.asarray(
        rhs_bx(jnp.zeros((B,)), yB, pB32, dB32).astype(f32), dtype=np.float64
    )

    scale = np.maximum(np.abs(ref64), 1e-3 * np.max(np.abs(ref64)))
    err_fused = np.max(np.abs(got - ref64) / scale)
    err_xla = np.max(np.abs(xla - ref64) / scale)
    # the fused path may differ in benign f32 terms but must stay within
    # ~2x of the XLA df32 path's deviation from the f64 chain
    assert err_fused < max(2.0 * err_xla, 2e-6), (err_fused, err_xla)


@pytest.mark.parametrize("mode", [False, "df32"])
def test_lockstep_fused_end_to_end(mode):
    """A short N2 lockstep integration through the fused-RHS path
    (interpret-mode kernels) must match the vmapped-XLA path closely:
    same integrator, same Jacobians, only residual evals differ by
    benign f32 reorderings."""
    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    mi = make_model_input(model="N2", op_period=0.02)
    B = 4
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-2.0, 2.0, B))}
    kw = dict(rtol=1e-4, atol=1e-6, max_steps=96, newton_iters=5,
              j_every=8, accurate_rates=mode)
    if mode == "df32":
        kw.update(exact_solve=True, cheap_sweeps=2)
    ys_ref, st_ref = run_n2_ensemble_lockstep(
        mi, sweep, fused_rhs=False, **kw)
    ys_f, st_f = run_n2_ensemble_lockstep(mi, sweep, fused_rhs=True, **kw)
    assert np.all(np.isfinite(np.asarray(ys_f)))
    # all members must finish within budget on both paths
    assert int(jnp.sum(st_f.seg < ys_f.shape[0] - 1)) == 0
    rel = np.max(np.abs(np.asarray(ys_f[-1]) - np.asarray(ys_ref[-1]))
                 / np.maximum(np.abs(np.asarray(ys_ref[-1])), 1e-3))
    assert rel < 5e-3, rel
