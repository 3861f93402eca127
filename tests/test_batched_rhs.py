# Member-last batched N2 RHS (homo.make_n2_rhs_b): bit-parity with the
# vmapped single-member RHS for the plain-f32 and df32 kinetics modes,
# Jacobian parity, and end-to-end lockstep agreement through
# run_n2_ensemble_lockstep(batched_rhs=True).

import numpy as np

import jax
import jax.numpy as jnp

from dme_case import make_model_input
from rmt_tpu.models import homo
from rmt_tpu.parallel.ensemble import batch_params, run_n2_ensemble_lockstep

B = 5


def _setup():
    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi)
    base = homo.build_params(mi)
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5, 5, B))}
    params, axes = batch_params(base, sweep)

    def derive(q):
        d = homo.feed_state(spec, q)
        return d, homo.n2_initial_state(spec, q, d)

    dB, y0B = jax.vmap(derive, in_axes=(axes,))(params)
    rng = np.random.default_rng(0)
    y = jnp.asarray(y0B) * (1.0 + 0.05 * rng.standard_normal(y0B.shape))
    t = jnp.zeros((B,), y.dtype)

    def bcast(params):
        out = {}
        for key, val in params.items():
            if key == "kinetic_overrides":
                out[key] = {
                    kk: (vv if axes[key][kk] == 0 else jnp.broadcast_to(
                        jnp.asarray(vv)[None],
                        (B,) + jnp.asarray(vv).shape))
                    for kk, vv in val.items()
                }
            elif axes[key] == 0:
                out[key] = val
            else:
                arr = jnp.asarray(val)
                out[key] = jnp.broadcast_to(arr[None], (B,) + arr.shape)
        return out

    return mi, spec, params, axes, bcast(params), dB, t, y


def test_rhs_b_matches_vmapped_rhs():
    _, spec, params, axes, pB, dB, t, y = _setup()
    for mode in (False, "df32"):
        rhs = homo.make_n2_rhs(spec, accurate_rates=mode)
        want = jax.vmap(rhs, in_axes=(0, 0, axes, 0))(t, y, params, dB)
        got = homo.make_n2_rhs_b(spec, accurate_rates=mode)(t, y, pB, dB)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-12, atol=0,
            err_msg=f"accurate_rates={mode}",
        )


def test_jacobian_b_matches_vmapped():
    _, spec, params, axes, pB, dB, t, y = _setup()
    jac_v = jax.vmap(
        homo.make_n2_colored_jacobian(spec), in_axes=(0, 0, axes, 0)
    )
    want = np.asarray(jac_v(t, y, params, dB))
    got = np.asarray(homo.make_n2_colored_jacobian_b(spec)(t, y, pB, dB))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-12)


def test_bidiag_blocks_match_dense_extraction():
    """colored_bidiag_blocks gathers (Jd, Jl) straight from the colored
    JVP products; values must be BIT-identical to extracting the blocks
    from the dense colored Jacobian."""
    from rmt_tpu.ops import block_solve as bs

    _, spec, params, axes, _, dB, t, y = _setup()
    jac_v = jax.vmap(
        homo.make_n2_colored_jacobian(spec), in_axes=(0, 0, axes, 0)
    )
    Jd_ref, Jl_ref = bs.extract_bidiag_blocks(
        jac_v(t, y, params, dB), spec.var_no_n2, spec.z_no
    )
    jbl = jax.vmap(
        homo.make_n2_bidiag_blocks(spec), in_axes=(0, 0, axes, 0)
    )
    Jd, Jl = jbl(t, y, params, dB)
    assert np.array_equal(np.asarray(Jd), np.asarray(Jd_ref))
    assert np.array_equal(np.asarray(Jl), np.asarray(Jl_ref))


def test_lockstep_end_to_end_batched_rhs():
    mi, *_ = _setup()
    sweep = {"T0": jnp.asarray([522.0, 524.0, 526.0])}
    kw = dict(rtol=1e-5, atol=1e-7, max_steps=384, newton_iters=5,
              j_every=8, accurate_rates="df32", exact_solve=True)
    ys_ref, st_ref = run_n2_ensemble_lockstep(
        mi, sweep, batched_rhs=False, **kw)
    ys_b, st_b = run_n2_ensemble_lockstep(
        mi, sweep, batched_rhs=True, **kw)
    assert int(jnp.sum(st_b.seg < ys_b.shape[0] - 1)) == 0
    # identical math evaluated in a different layout: the integrator's
    # accept/reject path may diverge only through float reassociation;
    # on CPU the trajectories track to f32 integration noise
    np.testing.assert_allclose(
        np.asarray(ys_b), np.asarray(ys_ref), rtol=5e-4, atol=1e-6
    )
