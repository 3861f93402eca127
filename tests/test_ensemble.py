# Ensemble execution: vmapped sweeps, dp-mesh sharding, the lockstep
# TPU-native stiff integrator, colored Jacobians, and parameter estimation.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import make_model_input
from rmt_tpu.models import homo
from rmt_tpu.parallel import (
    batch_params,
    make_mesh,
    run_n2_ensemble,
    run_n2_ensemble_lockstep,
)
from rmt_tpu.solvers import radau, stiff_ensemble


def _single_reference(mi, tsn):
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs = homo.make_n2_rhs(spec)
    y0 = homo.n2_initial_state(spec, p, d)
    ys, _ = radau.odeint(
        jax.jit(lambda t, y: rhs(t, y, p, d)), y0, tsn, rtol=1e-9, atol=1e-12
    )
    return ys


def test_lockstep_matches_per_member_radau():
    mi = make_model_input(model="N2")
    B = 3
    sweep = {"T0": jnp.asarray([523.0, 526.0, 530.0])}
    ys, stats = run_n2_ensemble_lockstep(mi, sweep)
    assert ys.shape == (6, B, 140)
    tsn = jnp.asarray(np.linspace(0, 0.5, 6))
    ys_ref = _single_reference(mi, tsn)
    rel = jnp.max(jnp.abs(ys[:, 0, :] - ys_ref) / jnp.maximum(jnp.abs(ys_ref), 1e-8))
    assert float(rel) < 1e-6, float(rel)
    assert int(jnp.min(stats.n_accepted)) > 0


def test_lockstep_members_differ():
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray([523.0, 543.0])}
    ys, _ = run_n2_ensemble_lockstep(mi, sweep)
    # hotter feed -> different final state
    assert float(jnp.max(jnp.abs(ys[-1, 0] - ys[-1, 1]))) > 1e-3


def test_vmapped_ensemble_with_mesh_sharding():
    mi = make_model_input(model="N2")
    mesh = make_mesh()
    B = 2 * len(jax.devices())
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(0, 4, B))}
    ys, nfev = run_n2_ensemble(mi, sweep, mesh=mesh)
    assert ys.shape[0] == B
    assert "dp" in str(ys.sharding)
    assert int(nfev[0]) > 0


def test_robertson_ensemble_accuracy():
    def rob(t, y):
        y1, y2, y3 = y
        d1 = -0.04 * y1 + 1e4 * y2 * y3
        d3 = 3e7 * y2**2
        return jnp.stack([d1, -d1 - d3, d3])

    ts = jnp.asarray([0.0, 1e-2, 1e0, 1e2, 1e4])
    y0 = jnp.asarray([1.0, 0.0, 0.0])
    ys_ref, _ = radau.odeint(rob, y0, ts, rtol=1e-8, atol=1e-12)
    ysE, _ = stiff_ensemble.odeint_ensemble(
        rob, jnp.tile(y0[None], (2, 1)), ts, rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ysE[:, 0, :]), np.asarray(ys_ref), rtol=1e-6, atol=1e-12
    )


def test_colored_jacobian_matches_dense():
    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    y0 = homo.n2_initial_state(spec, p, d)
    rng = np.random.default_rng(3)
    y = jnp.asarray(np.asarray(y0) * rng.uniform(0.7, 1.3, y0.shape))
    rhs_f = homo.make_n2_rhs(spec, frozen_pressure_jac=True)
    J_dense = jax.jacfwd(lambda yy: rhs_f(0.1, yy, p, d))(y)
    J_col = homo.make_n2_colored_jacobian(spec)(0.1, y, p, d)
    np.testing.assert_allclose(np.asarray(J_col), np.asarray(J_dense), atol=1e-12)


def test_estimation_gradient_descends():
    from rmt_tpu.parallel.estimation import make_estimation_step, outlet_mole_fractions, simulate_n2_fixed
    import math

    mi = make_model_input(model="N2", op_period=2e-5)
    spec = homo.build_spec(mi, z_no=8, t_no=1)
    base = homo.build_params(mi)
    B = 4
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(0, 3, B))}
    params, axes = batch_params(base, sweep)

    RT = 8.314472 * 523.0
    k_true = {
        "K1": 35.45 * math.exp(-1.7069e4 / RT),
        "K2": 7.3976 * math.exp(-2.0436e4 / RT),
        "K3": 8.2894e4 * math.exp(-5.294e4 / RT),
    }
    # generate target data at the true constants
    target = jax.vmap(
        lambda q: outlet_mole_fractions(
            spec, simulate_n2_fixed(spec, q, {k: jnp.asarray(v) for k, v in k_true.items()}, 8)
        ),
        in_axes=(axes,),
    )(params)

    step = make_estimation_step(spec, axes, target, n_steps=8, lr=1e-2)
    # perturbed starting point
    theta = {k: jnp.asarray(math.log(v) + 0.3) for k, v in k_true.items()}
    losses = []
    for _ in range(3):
        theta, loss = step(theta, params)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_lockstep_f32_mode_subprocess():
    """Whole-program float32 mode (RMT_TPU_X64=0): the lockstep integrator
    must finish within budget and land within ~1e-5 of the f64 solution.

    Runs in a subprocess because x64 is a process-level JAX config. Guards
    the f32 regression found on TPU v5e where default-precision f32 matmuls
    lower to bf16 and collapse the step controller (config.py forces
    jax_default_matmul_precision=highest in f32 mode)."""
    import subprocess
    import sys as _sys

    code = """
import sys, os
os.environ["RMT_TPU_X64"] = "0"
sys.path.insert(0, %r); sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import rmt_tpu
assert jax.config.jax_default_matmul_precision == "highest"
from rmt_tpu.parallel import run_n2_ensemble_lockstep
from dme_case import make_model_input
mi = make_model_input(model="N2")
sweep = {"T0": jnp.asarray([523.0, 528.0])}
# 768-attempt budget (bench parity): the Kahan-compensated state
# accumulation shifts trajectories by a few attempts (~520 for the
# 523 K member on CPU f32)
ys, st = run_n2_ensemble_lockstep(mi, sweep, max_steps=768, rtol=1e-5, atol=1e-7)
assert jnp.all(jnp.isfinite(ys)), "non-finite states"
att = np.asarray(st.n_accepted + st.n_rejected)
assert att.max() < 768, f"budget exhausted: {att}"
# T profile must have actually evolved (the bf16 bug froze it near 0)
assert float(ys[-1, 0, -1]) > 0.05, float(ys[-1, 0, -1])
print("F32_OK", float(ys[-1, 0, -1]))
"""
    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, "-c", code % (repo, _os.path.join(repo, "tests"))],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "F32_OK" in r.stdout


def test_m14_design_sweep_vmapped():
    """Steady-state design-space screening: a batch of M14 root solves in
    one vmapped program, member 0 matching the single-run rmtExe result."""
    from test_m14 import _m14_model_input

    from rmt_tpu import rmtExe
    from rmt_tpu.parallel import run_m14_sweep

    mi = _m14_model_input()
    T0 = float(mi["operating-conditions"]["temperature"])
    out = run_m14_sweep(mi, {"T0": jnp.asarray([T0, T0 + 10.0, T0 + 20.0])})
    assert out["states"].shape[0] == 3
    assert bool(jnp.all(out["converged"])), np.asarray(out["res_norm"])

    single = rmtExe(_m14_model_input())["resModel"]["dataPack"][0]
    c_max = float(np.max(np.asarray(mi["feed"]["concentration"])))
    conc_gas0 = np.asarray(out["states"][0, :6, 0]) * c_max
    np.testing.assert_allclose(
        conc_gas0, np.asarray(single["dataYCoGas"]), rtol=1e-6, atol=1e-12
    )
    # hotter feed shifts the steady state
    assert float(jnp.max(jnp.abs(out["states"][2] - out["states"][0]))) > 1e-4


def test_m14_sweep_kinetic_override():
    """Kinetic constants are sweepable leaves: zeroing the methanol rate
    constant K1 must change the converged profile."""
    from test_m14 import _m14_model_input

    from rmt_tpu.parallel import run_m14_sweep

    mi = _m14_model_input()
    out = run_m14_sweep(mi, {"K1": jnp.asarray([35.45, 1e-6])})
    assert bool(jnp.all(out["converged"]))
    assert float(jnp.max(jnp.abs(out["states"][0] - out["states"][1]))) > 1e-5


def test_m11_sweep_vmapped():
    """Dynamic-hetero ensemble: a batch of M11 gas+particle transients as
    one vmapped Radau run; member 0 must match the single-run rmtExe M11
    trajectory (same grid/tolerances), and a hotter member must differ."""
    from test_m13 import _m13_model_input

    from rmt_tpu import rmtExe
    from rmt_tpu.parallel import run_m11_sweep

    mi = _m13_model_input()
    mi["model"] = "M11"
    # small grid keeps the vmapped dense-LU Radau cheap on CPU
    mi["solver-config"] = dict(
        mi.get("solver-config", {}), zNo=5, rNo=3, tNo=3
    )
    T0 = float(mi["operating-conditions"]["temperature"])
    ys, stats = run_m11_sweep(mi, {"T0": jnp.asarray([T0, T0 + 8.0])})
    assert ys.shape[0] == 2 and ys.shape[1] == 4
    assert bool(jnp.all(jnp.isfinite(ys)))

    single = rmtExe(dict(mi))["resModel"]
    np.testing.assert_allclose(
        np.asarray(ys[0, -1]),
        np.asarray(single["checkpoint"]["state"]).reshape(-1),
        rtol=2e-5, atol=1e-9,
    )
    assert float(jnp.max(jnp.abs(ys[1] - ys[0]))) > 1e-4


def test_lockstep_early_exit_skips_budget_chunks():
    """Once every member has written its last output segment, the
    remaining Jacobian-refresh chunks are skipped at runtime (lax.cond in
    chunk_body): n_jev stops counting far below the budget's chunk count
    while all members still finish."""
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray([523.0, 526.0])}
    # generous budget: 4096 attempts = 256 chunks of 16
    ys, stats = run_n2_ensemble_lockstep(mi, sweep, max_steps=4096)
    assert int(jnp.max(stats.seg)) == ys.shape[0] - 1
    assert int(stats.n_jev) < 100, int(stats.n_jev)


def test_m13_sweep_vmapped():
    """Operator-splitting ensemble: the whole M13 split driver (gas Radau
    + per-node particle Newton + staggered exchange) vmapped over a
    design sweep; member 0 must match the single-run rmtExe M13 gas
    trajectory, and a hotter member must differ."""
    from test_m13 import _m13_model_input

    from rmt_tpu import rmtExe
    from rmt_tpu.parallel import run_m13_sweep

    mi = _m13_model_input()
    mi["solver-config"] = dict(
        mi.get("solver-config", {}), zNo=5, rNo=4, tNo=3
    )
    T0 = float(mi["operating-conditions"]["temperature"])
    out = run_m13_sweep(mi, {"T0": jnp.asarray([T0, T0 + 8.0])})
    assert bool(jnp.all(out["converged"])), np.asarray(out["converged"])
    assert int(jnp.sum(out["unreached"])) == 0

    single = rmtExe(dict(mi))["resModel"]["dataPack"]
    gas0_last = np.asarray(out["gas"][0, -1])           # (noLayer, zNo)
    np.testing.assert_allclose(
        gas0_last[:-1], np.asarray(single[-1]["dataYCon"]),
        rtol=2e-5, atol=1e-9,
    )
    assert float(jnp.max(jnp.abs(out["gas"][1] - out["gas"][0]))) > 1e-4


def test_m10_sweep_vmapped():
    """M10 design sweep: member 0 must match the single-run rmtExe M10
    trajectory (same grid/tolerances), and a hotter member must differ."""
    from test_m10 import _m10_model_input

    from rmt_tpu import rmtExe
    from rmt_tpu.parallel import run_m10_sweep

    mi = _m10_model_input()
    mi["operating-conditions"]["period"] = 0.02
    mi["solver-config"] = dict(
        mi.get("solver-config", {}), zNo=4, tNo=2
    )
    T0 = float(mi["operating-conditions"]["temperature"])
    ys, stats = run_m10_sweep(mi, {"T0": jnp.asarray([T0, T0 + 8.0])})
    assert ys.shape[0] == 2 and ys.shape[1] == 3
    assert bool(jnp.all(jnp.isfinite(ys)))

    single = rmtExe(dict(mi))["resModel"]
    np.testing.assert_allclose(
        np.asarray(ys[0, -1]),
        np.asarray(single["checkpoint"]["state"]).reshape(-1),
        rtol=2e-5, atol=1e-9,
    )
    assert float(jnp.max(jnp.abs(ys[1] - ys[0]))) > 1e-6


def test_m12_sweep_vmapped():
    """M12 design sweep from the default PHYSICAL startup state: member 0
    must match the single-run rmtExe M12 trajectory started from the same
    state via resume-state injection."""
    from test_m12 import _m12_model_input

    from rmt_tpu import rmtExe
    from rmt_tpu.models import hetero_dyn
    from rmt_tpu.parallel import run_m12_sweep

    mi = _m12_model_input()
    mi["operating-conditions"]["period"] = 4e-3
    mi["solver-config"] = dict(
        mi.get("solver-config", {}), zNo=4, tNo=2
    )
    T0 = float(mi["operating-conditions"]["temperature"])
    ys, stats = run_m12_sweep(mi, {"T0": jnp.asarray([T0, T0 + 8.0])})
    assert ys.shape[0] == 2 and ys.shape[1] == 3
    assert bool(jnp.all(jnp.isfinite(ys)))

    # the default y0 is the feed-everywhere physical state; reproduce it
    # for the single-run comparison through the public resume-state path
    spec = hetero_dyn.m13_build_spec(mi, z_no=4, r_no=7, t_no=2)
    p = hetero_dyn.m13_params(mi)
    c_in = np.asarray(p["SpCoi0"]) / np.max(np.asarray(p["SpCoi0"]))
    y0 = np.concatenate(
        [np.tile(c_in[:, None, None], (1, 8, 4)), np.zeros((1, 8, 4))],
        axis=0,
    ).reshape(-1)
    mi_single = dict(mi)
    mi_single["resume-state"] = {"model": "M12", "t": 0.0, "state": y0}
    single = rmtExe(mi_single)["resModel"]
    np.testing.assert_allclose(
        np.asarray(ys[0, -1]),
        np.asarray(single["checkpoint"]["state"]).reshape(-1),
        rtol=2e-5, atol=1e-9,
    )
    assert float(jnp.max(jnp.abs(ys[1] - ys[0]))) > 1e-6

    # explicit y0 round-trip: (n,) broadcast form
    ys2, _ = run_m12_sweep(
        mi, {"T0": jnp.asarray([T0, T0 + 8.0])}, y0=y0
    )
    np.testing.assert_allclose(
        np.asarray(ys2), np.asarray(ys), rtol=1e-12, atol=0.0
    )


def test_m13_sweep_lockstep_engine():
    """engine="lockstep" (scan-based: tridiag-block gas integrator +
    batched Newton solid phase with the bulk-homotopy rescue) reproduces
    the vmap engine's split dynamics member for member, and the node
    residual/gas Jacobian are verified block-tridiagonal (the structural
    assumption of the exact stage solves)."""
    from test_m13 import _m13_model_input

    from rmt_tpu.models import hetero_dyn
    from rmt_tpu.ops import jacobian as jac_ops
    from rmt_tpu.parallel import run_m13_sweep

    mi = _m13_model_input()
    mi["solver-config"] = dict(
        mi.get("solver-config", {}), zNo=5, rNo=4, tNo=3
    )
    T0 = float(mi["operating-conditions"]["temperature"])
    sweep = {"T0": jnp.asarray([T0, T0 + 8.0])}

    # structural check: the gas RHS Jacobian really is tridiagonal in z
    # and the solid node residual tridiagonal in r (dense jacfwd vs mask)
    spec = hetero_dyn.m13_build_spec(mi, z_no=5, r_no=4, t_no=3)
    p = hetero_dyn.m13_params(mi)
    d = hetero_dyn.m13_feed(spec, p)
    rhs = hetero_dyn.make_m13_gas_rhs(spec, flux_sign=-1.0)
    yg = hetero_dyn.m13_gas_initial_state(spec, p) + 1e-3
    ysol = hetero_dyn.m13_solid_initial_state(spec, p)
    cs, tsf = ysol[: spec.n_comp, 0, :] + 1e-4, ysol[spec.n_comp, 0, :]
    Jg = jax.jacfwd(lambda y: rhs(0.0, y, p, d, cs, tsf))(yg)
    _, _, mask_g = jac_ops.tridiag_coloring(spec.n_layer, spec.z_no)
    assert float(jnp.max(jnp.abs(Jg * (1.0 - mask_g)))) == 0.0
    node_res = hetero_dyn.make_m13_solid_node_residual(spec)
    yn = ysol[:, :, 0] + 1e-4
    Jn = jax.jacfwd(
        lambda y: node_res(
            y.reshape(spec.n_layer, spec.r_no), cs[:, 0] + 1e-3,
            tsf[0], p, d
        ).reshape(-1)
    )(yn.reshape(-1))
    _, _, mask_n = jac_ops.tridiag_coloring(spec.n_layer, spec.r_no)
    assert float(jnp.max(jnp.abs(Jn * (1.0 - mask_n)))) == 0.0

    out_v = run_m13_sweep(mi, sweep)
    out_l = run_m13_sweep(mi, sweep, engine="lockstep")
    assert bool(jnp.all(out_l["converged"]))
    assert int(jnp.sum(out_l["unreached"])) == 0
    # tolerance attribution (measured): the engines integrate the gas
    # phase with DIFFERENT integrators (per-member adaptive radau vs
    # lockstep block-tridiag Radau) at the same run rtol=1e-5, so they
    # agree only to integrator truncation error -- rerunning both at
    # rtol=1e-7 collapses the gas gap 6.4e-5 -> 3.1e-10 and the max
    # ABSOLUTE solid gap to 1.4e-9 (the residual "relative" solid gap
    # sits on near-zero concentrations; away from zero it is 2e-7).
    # Both solid Newtons reach the same root to tol=1e-9; nothing in
    # the 2e-4 is an engine approximation.
    np.testing.assert_allclose(
        np.asarray(out_l["gas"]), np.asarray(out_v["gas"]),
        rtol=2e-4, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(out_l["solid"]), np.asarray(out_v["solid"]),
        rtol=2e-4, atol=1e-8,
    )

    with pytest.raises(ValueError):
        bad = dict(mi)
        bad["solver-config"] = dict(mi["solver-config"], mesh="refined")
        run_m13_sweep(bad, sweep, engine="lockstep")


def test_lockstep_microbatch_matches_single_batch():
    """microbatch=K runs the ensemble as a lax.scan of K-member batches
    inside one compiled call (amortizes the tunneled runtime's fixed
    per-invocation cost); results and per-member stats must be identical
    to the single-batch run."""
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-4.0, 4.0, 8))}
    kw = dict(max_steps=768, rtol=1e-5, atol=1e-7, newton_iters=5)
    ys_a, st_a = run_n2_ensemble_lockstep(mi, sweep, **kw)
    ys_b, st_b = run_n2_ensemble_lockstep(mi, sweep, microbatch=4, **kw)
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
    assert bool(jnp.all(st_a.n_accepted == st_b.n_accepted))
    assert bool(jnp.all(st_a.seg == st_b.seg))


def test_lockstep_exact_block_solve_mode():
    """exact_solve=True replaces the Newton-Schulz preconditioners with
    exact block-bidiagonal stage solves (ops.block_solve); the integrated
    trajectories must agree with the NS mode within the step-control
    tolerance and finish in no more attempts."""
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray([523.0, 528.0])}
    kw = dict(max_steps=768, rtol=1e-5, atol=1e-7, newton_iters=5)
    ys_ns, st_ns = run_n2_ensemble_lockstep(mi, sweep, **kw)
    ys_bl, st_bl = run_n2_ensemble_lockstep(mi, sweep, exact_solve=True, **kw)
    assert int(jnp.max(st_bl.seg)) == ys_bl.shape[0] - 1
    rel = jnp.max(
        jnp.abs(ys_bl - ys_ns) / jnp.maximum(jnp.abs(ys_ns), 1e-7)
    )
    assert float(rel) < 5e-4, float(rel)
    assert int(jnp.max(st_bl.n_accepted + st_bl.n_rejected)) <= int(
        jnp.max(st_ns.n_accepted + st_ns.n_rejected)
    )


def test_lockstep_hybrid_accurate_rates():
    """accurate_rates runs the f32 integrator inside the (x64) process
    with the kinetics chain (True) or the whole RHS ("full") evaluated
    in f64. States must come back f32 and the trajectories must agree
    with the plain f64 run within the step-control tolerance; the f64
    kinetics also smooth Newton, so attempts must not blow up."""
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray([523.0, 528.0])}
    kw = dict(max_steps=768, rtol=1e-5, atol=1e-7, newton_iters=5)
    ys_64, st_64 = run_n2_ensemble_lockstep(mi, sweep, **kw)
    for mode in (True, "full"):
        ys_h, st_h = run_n2_ensemble_lockstep(
            mi, sweep, accurate_rates=mode, exact_solve=True, **kw)
        assert ys_h.dtype == jnp.float32, (mode, ys_h.dtype)
        assert int(jnp.min(st_h.seg)) == ys_h.shape[0] - 1
        rel = jnp.max(
            jnp.abs(ys_h.astype(jnp.float64) - ys_64)
            / jnp.maximum(jnp.abs(ys_64), 1e-7)
        )
        assert float(rel) < 5e-4, (mode, float(rel))
        assert int(jnp.max(st_h.n_accepted + st_h.n_rejected)) <= 2 * int(
            jnp.max(st_64.n_accepted + st_64.n_rejected)
        )


def test_lockstep_cheap_sweeps_hybrid_newton():
    """cheap_sweeps=k evaluates the first k simplified-Newton sweeps of
    every attempt with the plain f32 RHS and only the remaining sweeps
    with the accurate (df32) chain, re-judging convergence on accurate
    increments. Trajectories must agree with the all-accurate run within
    the step-control tolerance and attempts must not blow up."""
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray([523.0, 528.0])}
    kw = dict(max_steps=768, rtol=1e-5, atol=1e-7, newton_iters=5,
              accurate_rates="df32", exact_solve=True)
    ys_a, st_a = run_n2_ensemble_lockstep(mi, sweep, **kw)
    ys_b, st_b = run_n2_ensemble_lockstep(mi, sweep, cheap_sweeps=2, **kw)
    assert int(jnp.min(st_b.seg)) == ys_b.shape[0] - 1
    rel = jnp.max(
        jnp.abs(ys_b.astype(jnp.float64) - ys_a.astype(jnp.float64))
        / jnp.maximum(jnp.abs(ys_a.astype(jnp.float64)), 1e-7)
    )
    assert float(rel) < 5e-4, float(rel)
    assert int(jnp.max(st_b.n_accepted + st_b.n_rejected)) <= 2 * int(
        jnp.max(st_a.n_accepted + st_a.n_rejected)
    )
    with pytest.raises(ValueError, match="cheap_sweeps"):
        run_n2_ensemble_lockstep(mi, sweep, cheap_sweeps=2, max_steps=64)


def test_lockstep_progress_surface(monkeypatch, capfd):
    """RMT_TPU_PROGRESS=1 reports liveness (members finished / attempts
    used) at every attempt-chunk boundary during a lockstep invocation
    -- the jit-compatible analogue of the reference's progress bar
    (PyREMOT/solvers/solProgress.py:5)."""
    monkeypatch.setenv("RMT_TPU_PROGRESS", "1")
    mi = make_model_input(model="N2")
    # distinctive config: the env flag is read at trace time, so a shape
    # already compiled by another test would skip the callback
    sweep = {"T0": jnp.asarray([522.0, 524.0, 526.0])}
    ys, stats = run_n2_ensemble_lockstep(
        mi, sweep, max_steps=768, rtol=1e-5, atol=1e-7, j_every=24)
    assert int(jnp.min(stats.seg)) == ys.shape[0] - 1
    err = capfd.readouterr().err
    assert "[rmt_tpu] attempts" in err
    assert "members finished" in err


def test_lockstep_tridiag_block_mode():
    """block=(m, z, "tridiag") solves the stage systems of a
    central-difference reaction-diffusion MoL exactly by block cyclic
    reduction; trajectories must match the dense Newton-Schulz mode
    within the step-control tolerance (Brusselator-with-diffusion
    ensemble, tridiagonal z-coupling the bidiagonal mode cannot
    represent)."""
    var_no, z_no = 2, 12
    n = var_no * z_no
    alpha, dz = 0.02, 1.0 / (z_no - 1)
    Bp = jnp.asarray([3.0, 3.4, 2.8, 3.2])

    def f_single(t, y, bp):
        Y = y.reshape(var_no, z_no)
        u, v = Y[0], Y[1]

        def lap(w):
            wl = jnp.concatenate([w[1:2], w[:-1]])    # mirror at z=0
            wr = jnp.concatenate([w[1:], w[-2:-1]])   # mirror at z=1
            return (wl - 2.0 * w + wr) / dz**2

        du = 1.0 + u * u * v - (bp + 1.0) * u + alpha * lap(u)
        dv = bp * u - u * u * v + alpha * lap(v)
        return jnp.stack([du, dv]).reshape(-1)

    fB = jax.vmap(f_single, in_axes=(0, 0, 0))
    jB = jax.vmap(jax.jacobian(f_single, argnums=1), in_axes=(0, 0, 0))
    f_batched = lambda t, y: fB(t, y, Bp)
    jac_batched = lambda t, y: jB(t, y, Bp)

    z = jnp.linspace(0.0, 1.0, z_no)
    u0 = 1.0 + 0.1 * jnp.sin(2.0 * jnp.pi * z)
    y0_one = jnp.concatenate([u0, jnp.full((z_no,), 3.0)])
    y0 = jnp.tile(y0_one[None], (Bp.shape[0], 1))
    ts = jnp.asarray([0.0, 0.5, 1.0])
    kw = dict(
        rtol=1e-6, atol=1e-9, max_steps=512,
        jac=jac_batched, batched=True,
    )
    ys_ns, st_ns = stiff_ensemble.odeint_ensemble(f_batched, y0, ts, **kw)
    ys_tr, st_tr = stiff_ensemble.odeint_ensemble(
        f_batched, y0, ts, block=(var_no, z_no, "tridiag"), **kw
    )
    assert int(jnp.min(st_tr.seg)) == ys_tr.shape[0] - 1
    rel = jnp.max(
        jnp.abs(ys_tr - ys_ns) / jnp.maximum(jnp.abs(ys_ns), 1e-7)
    )
    assert float(rel) < 5e-4, float(rel)


def test_m13_sweep_with_mesh_sharding():
    """The M13 design sweep shards members over the dp mesh axis (8
    virtual CPU devices via conftest): the whole operator-splitting
    driver runs SPMD per member."""
    from test_m13 import _m13_model_input

    from rmt_tpu.parallel import run_m13_sweep

    mi = _m13_model_input()
    mi["solver-config"] = dict(
        mi.get("solver-config", {}), zNo=5, rNo=3, tNo=2
    )
    mesh = make_mesh()
    B = len(jax.devices())
    T0 = float(mi["operating-conditions"]["temperature"])
    out = run_m13_sweep(
        mi, {"T0": jnp.asarray(T0 + np.linspace(0.0, 4.0, B))}, mesh=mesh
    )
    assert out["gas"].shape[0] == B
    assert bool(jnp.all(out["converged"]))
    assert "dp" in str(out["gas"].sharding)


def test_lockstep_out_members_probe_rows():
    """out_members restricts the recorded trajectories to the probe rows
    (the (n_out, B, n) output buffer is the dominant HBM term at bench
    batch sizes); the selected rows, every member's final state, and the
    per-member stats must be bit-identical to the full run."""
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-4.0, 4.0, 6))}
    kw = dict(max_steps=768, rtol=1e-5, atol=1e-7, newton_iters=5)
    ys_full, st_full = run_n2_ensemble_lockstep(mi, sweep, **kw)
    idx = np.asarray([1, 4])
    ys_sel, y_fin, st_sel = run_n2_ensemble_lockstep(
        mi, sweep, out_members=idx, **kw
    )
    assert ys_sel.shape == (ys_full.shape[0], 2, ys_full.shape[2])
    np.testing.assert_array_equal(
        np.asarray(ys_sel), np.asarray(ys_full[:, idx, :])
    )
    np.testing.assert_array_equal(
        np.asarray(y_fin), np.asarray(ys_full[-1])
    )
    assert bool(jnp.all(st_sel.n_accepted == st_full.n_accepted))
    assert bool(jnp.all(st_sel.seg == st_full.seg))
    with pytest.raises(ValueError, match="out_members"):
        run_n2_ensemble_lockstep(
            mi, sweep, out_members=idx, microbatch=3, **kw
        )


def test_m13_lockstep_production_grid_converges():
    """Regression (round 5): at the production grid (rNo=7, the
    reference's T1 particle setting) the 4-stage bulk-homotopy rescue
    left every early-interval inlet node unconverged; the default is
    now homotopy_stages=8, which must converge every member."""
    from test_m13 import _m13_model_input

    from rmt_tpu.parallel import run_m13_sweep

    mi = _m13_model_input()
    mi["solver-config"] = dict(
        mi.get("solver-config", {}), zNo=10, rNo=7, tNo=3
    )
    T0 = float(mi["operating-conditions"]["temperature"])
    sweep = {"T0": jnp.asarray([T0, T0 + 8.0])}
    out = run_m13_sweep(mi, sweep, engine="lockstep")
    assert bool(jnp.all(out["converged"])), np.asarray(out["converged"])
    assert int(jnp.sum(out["unreached"])) == 0
