# Ensemble execution: vmapped reactor batches sharded over a device mesh.
#
# This is the capability the reference cannot express: its only "ensemble"
# is a python loop of sequential rmtExe calls (one CPU core each). Here a
# batch of reactors -- any pytree leaves of the parameter dict may be swept:
# inlet T/P/composition, geometry, heat-exchange, and the kinetic constants
# via kinetic-overrides -- is one vmapped jitted program, sharded over the
# `dp` axis of a jax.sharding.Mesh so XLA lays the members across chips
# (ICI collectives only appear in reductions, e.g. ensemble losses).

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import homo
from ..solvers import dopri5, fixed, radau, stiff_ensemble


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_params(base: Mapping[str, Any], sweep: Mapping[str, Any]):
    """Broadcast swept leaves into the parameter pytree.

    sweep maps a top-level parameter name (e.g. "T0", "P0", "SpCoi0") or a
    kinetic-override name (e.g. "K1") to a batched array whose leading axis
    is the ensemble axis. Returns (params, in_axes) ready for jax.vmap.
    """
    params = dict(base)
    axes = {k: None for k in base}
    axes["kinetic_overrides"] = {k: None for k in base["kinetic_overrides"]}
    ko = dict(base["kinetic_overrides"])
    for name, arr in sweep.items():
        arr = jnp.asarray(arr)
        if name in params:
            params[name] = arr
            axes[name] = 0
        else:
            ko[name] = arr
            axes["kinetic_overrides"][name] = 0
    params["kinetic_overrides"] = ko
    return params, axes


def _solver(kind: str):
    return {"radau": radau.odeint, "dopri5": dopri5.odeint}[kind]


def make_n2_ensemble(
    spec: homo.HomoSpec,
    rtol: float = 1e-7,
    atol: float = 1e-10,
    solver: str = "radau",
    mesh: Mesh | None = None,
):
    """Build a jitted f(params_batch, axes) -> ys of shape (B, tNo+1, varNoT).

    For the TPU-native lockstep integrator use run_n2_ensemble_lockstep.
    """
    rhs = homo.make_n2_rhs(spec)
    odeint = _solver(solver)

    def single(p):
        d = homo.feed_state(spec, p)
        y0 = homo.n2_initial_state(spec, p, d)
        ts = (p["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)).astype(y0.dtype)
        ys, stats = odeint(lambda t, y: rhs(t, y, p, d), y0, ts, rtol=rtol, atol=atol)
        return ys, stats.n_fev

    def build(axes):
        # members ride the dp axis when the inputs carry a dp sharding
        # (shard_batch); jit propagates it, no per-mesh variant needed
        return jax.jit(jax.vmap(single, in_axes=(axes,)))

    return single, build


def shard_batch(mesh: Mesh, params, axes):
    """Place batched leaves with a dp sharding, replicate the rest.

    (Manual walk because None-valued in_axes leaves are empty subtrees to
    jax.tree.map.)"""

    def place(leaf, ax):
        spec = P("dp") if ax == 0 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = {}
    for k, v in params.items():
        if k == "kinetic_overrides":
            out[k] = {
                kk: place(vv, axes[k][kk]) for kk, vv in v.items()
            }
        else:
            out[k] = place(v, axes[k])
    return out


def run_n2_ensemble(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    rtol: float = 1e-7,
    atol: float = 1e-10,
    solver: str = "radau",
    mesh: Mesh | None = None,
):
    """One-call ensemble sweep of the N2 dynamic model.

    Returns (ys, nfev): ys has shape (B, tNo+1, varNo*zNo) in dimensionless
    state; use rmt_tpu.api conversions for real values.
    """
    spec = homo.build_spec(model_input)
    base = homo.build_params(model_input)
    params, axes = batch_params(base, sweep)
    single, build = make_n2_ensemble(spec, rtol, atol, solver, mesh)
    fn = build(axes)
    if mesh is not None:
        params = shard_batch(mesh, params, axes)
    return fn(params)


def run_n2_ensemble_lockstep(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    rtol: float = 1e-7,
    atol: float = 1e-10,
    mesh: Mesh | None = None,
    colored_jacobian: bool = True,
    microbatch: int | None = None,
    exact_solve: bool = False,
    accurate_rates: bool | str = False,
    batched_rhs: bool | None = None,
    cheap_sweeps: int = 0,
    fused_rhs: bool | None = None,
    lower_only: bool = False,
    **solver_kwargs,
):
    """N2 dynamic ensemble on the TPU-native lockstep integrator.

    accurate_rates=True runs the float32 integrator (states, stages,
    step control, Newton-Schulz preconditioners all f32) but evaluates
    the kinetics chain + reaction energetics of the RHS in float64 --
    requires an x64-enabled process (RMT_TPU_X64=1). Motivation
    (measured, scripts/rhs_noise.py): near chemical equilibrium the net
    formation rate nu@R is a small difference of large opposing rates,
    so f32 rate rounding is amplified ~10^3x by the cancellation and
    owns the f32 whole-run accuracy floor. The f64 chain is per-node
    elementwise work plus a tiny (n_rxn x n_comp) matvec -- a small
    fraction of the RHS flops and none of the integrator matmuls.

    accurate_rates="full" goes one step further: the WHOLE RHS (and the
    preconditioner Jacobian) evaluates in float64 -- parameters and feed
    state stay f64 so dtype promotion lifts every intermediate -- while
    the integrator state, stages, step control, and stage solves remain
    f32 (outputs are cast back). The residual f32 error is then only
    state/stage quantization plus solve noise; all RHS arithmetic noise
    (stencils, pressure march, EOS, properties) is gone. All the f64
    work is elementwise (measured ~free on this runtime); every matmul
    stays f32.

    accurate_rates="df32" resolves the same kinetics cancellation in
    compensated double-float32 pairs (ops/df32.py): pure f32 VPU
    arithmetic, NO x64 process required, none of the program in
    TPU-emulated float64. This is the throughput-accuracy choice for
    the TPU north-star leg; rates match the f64 chain to ~5e-12.

    exact_solve=True solves the Radau stage systems EXACTLY via the MoL
    Jacobian's block-bidiagonal structure (ops.block_solve: batched
    (varNo x varNo) inversions + an associative scan over z) instead of
    Newton-Schulz approximate inverses -- ~2000x fewer solve flops and
    no preconditioner state. Requires colored_jacobian=True (the same
    structural assumption).

    One global adaptive loop for the whole batch: matmul-only Newton-Schulz
    preconditioners, colored (block-bidiagonal) Jacobians, per-member step
    control. The operating period may not be swept (the output grid is
    shared across members).

    batched_rhs=True evaluates the RHS (and its colored Jacobian)
    through homo.make_n2_rhs_b -- a natively batched, member-LAST
    implementation where the kinetics chain runs on (z, B) arrays with
    the member axis on the TPU lane dimension (full VPU width) instead
    of the vmapped (B, z) layout that uses 20 of 128 lanes. Same math,
    quirks included. Default None = on for the TPU backend when the
    mode supports it (plain f32 or "df32"; the x64-hybrid legs keep the
    vmapped path), off elsewhere.

    cheap_sweeps=k (accurate_rates modes only): hybrid-precision Newton.
    The first k simplified-Newton sweeps of every attempt evaluate stage
    residuals with the PLAIN f32 RHS (measured ~10x cheaper per eval
    than the df32 chain); the remaining newton_iters - k sweeps use the
    accurate RHS, with per-member convergence re-judged on accurate
    increments only (stiff_ensemble.odeint_ensemble docstring). The
    accepted step's K then satisfies the accurate stage equations to
    theta^(ni-k) * |rate error of the plain chain| -- measure the
    whole-run error before adopting a new k (bench legs pin what the
    accuracy probe verified).

    fused_rhs=True evaluates residual RHS calls (stage residuals, the
    post-accept f, the initial f0) through ONE fused Pallas kernel per
    eval (ops/pallas_rhs.py): the whole RHS -- stencils, pressure march,
    kinetics DSL chain (plain or df32), energetics -- as a single kernel
    with members on the lane axis. Motivation (measured, STATUS.md round
    4): the tunneled runtime's per-attempt cost tracks the op count of
    the scan body, and the df32 chain alone is ~12.5k HLO ops per
    inlined eval. Preconditioner Jacobians keep the XLA path (colored
    JVPs differentiate the unfused RHS). Default None = on for the TPU
    backend when the mode supports it (plain f32 or "df32", vmapped
    layout); off elsewhere (interpret-mode kernels are slow -- tests
    opt in explicitly).

    microbatch=K splits the ensemble into B/K sequential microbatches
    INSIDE one compiled call (lax.scan over reshaped sweep leaves). Two
    reasons to use it: (a) only one microbatch's integrator state is live
    at a time, so ensembles beyond the single-batch HBM ceiling run in one
    program; (b) the tunneled runtime charges a large FIXED cost per
    executable invocation (measured ~17.5 s at B=512 regardless of the
    attempt budget -- the marginal attempt costs ~4.4 ms), so one call
    with an internal scan amortizes what per-microbatch calls would pay
    B/K times. Incompatible with `mesh` (shard members across chips
    instead of microbatching).

    Returns (ys, stats): ys (tNo+1, B, varNo*zNo) dimensionless states.
    With out_members=<int index array> (forwarded to
    stiff_ensemble.odeint_ensemble; incompatible with microbatch) the
    return is (ys_sel, y_final, stats): only the selected members'
    trajectories are recorded -- the dominant (tNo, B, n) HBM buffer
    shrinks to (tNo, P, n) -- while y_final carries every member's
    final state (the reference's dataPack keeps only interval-end
    states for ordinary members, pbHomoReactor.py:3628-3685).
    """
    spec = homo.build_spec(model_input)
    base = homo.build_params(model_input)
    if "opT" in sweep:
        raise ValueError("the lockstep integrator requires a shared period")
    params, axes = batch_params(base, sweep)

    if solver_kwargs.get("out_members") is not None:
        # hashable tuple: a static argument of the jitted integrator
        solver_kwargs["out_members"] = tuple(
            int(i) for i in np.asarray(solver_kwargs["out_members"])
        )

    full_f64_rhs = accurate_rates == "full"
    df32_mode = accurate_rates == "df32"
    rhs = homo.make_n2_rhs(
        spec, accurate_rates=(
            "df32" if df32_mode
            else bool(accurate_rates) and not full_f64_rhs)
    )
    rhs_cheap = None
    if cheap_sweeps:
        if not accurate_rates:
            raise ValueError(
                "cheap_sweeps only makes sense with an accurate_rates "
                "mode (the plain RHS IS the cheap one otherwise)"
            )
        if batched_rhs:
            raise ValueError("cheap_sweeps + batched_rhs not supported")
        rhs_cheap = homo.make_n2_rhs(spec)
    jac_c = homo.make_n2_colored_jacobian(spec) if colored_jacobian else None
    jac_bl = None
    if exact_solve:
        if not colored_jacobian:
            raise ValueError("exact_solve requires colored_jacobian=True")
        solver_kwargs.setdefault("block", (spec.var_no_n2, spec.z_no))
        # block mode never needs the dense Jacobian: gather (Jd, Jl)
        # straight from the colored JVPs (measured on-chip: the dense
        # build + re-extraction owned most of the ~0.6-0.8 s refresh)
        jac_bl = homo.make_n2_bidiag_blocks(spec)

    # "df32" resolves the kinetics cancellation in compensated f32 pairs
    # (ops/df32.py) -- it needs NO x64 process; in a pure-f32 process it
    # runs like the plain leg (no casting, no clamping needed). The
    # x64-process machinery below still applies when tests/parity runs
    # invoke it from an x64 process (spec tables are f64 there).
    from .. import config as _config

    hybrid_cast = bool(accurate_rates) and _config.x64_enabled()
    if accurate_rates and not hybrid_cast and not df32_mode:
        raise ValueError(
            "accurate_rates needs an x64-enabled process "
            "(RMT_TPU_X64=1) so float64 exists for the RHS; use "
            "accurate_rates='df32' for the pure-f32 compensated chain"
        )
    if hybrid_cast:
        # hybrid mode: f32 integrator state inside an x64 process. Clamp
        # the RHS/Jacobian outputs back to f32 -- the x64 process makes
        # spec tables f64, and one uncast output would silently promote
        # the whole integrator (stages, NS matmuls) to emulated f64.
        # accurate_rates=True additionally casts parameters and feed
        # state to f32 so only the kinetics chain computes f64;
        # "full" leaves them f64 so promotion lifts the ENTIRE RHS.
        # config.setup only forces true-f32 matmuls in x64=False mode; the
        # hybrid runs f32 states inside an x64 process, where TPU would
        # lower the integrator's default-precision f32 einsums (stage
        # construction, eigen-transforms) to bf16 passes -- measured
        # on-chip: 4e-3 relative noise exceeds the Newton floor and all
        # members hit the attempt budget (the same failure config.setup
        # documents for whole-program f32). Force full-precision matmuls.
        jax.config.update("jax_default_matmul_precision", "highest")
        f32 = jnp.float32

        def _to_f32(tree):
            return jax.tree.map(
                lambda x: x.astype(f32)
                if (hasattr(x, "dtype")
                    and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating))
                else x, tree)

        if not full_f64_rhs:
            params = _to_f32(params)
        rhs_raw, jac_raw = rhs, jac_c
        rhs = lambda t, y, p, d: rhs_raw(t, y, p, d).astype(f32)
        if jac_raw is not None:
            jac_c = lambda t, y, p, d: jac_raw(t, y, p, d).astype(f32)
        if rhs_cheap is not None:
            rhs_cheap_raw = rhs_cheap
            rhs_cheap = lambda t, y, p, d: rhs_cheap_raw(
                t, y, p, d).astype(f32)

    if batched_rhs is None:
        # measured on-chip (scripts/attempt_cost_matrix.py, B=512): the
        # member-last RHS is NET SLOWER on the tunneled v5e -- the per-eval
        # boundary transposes (y (B,n) <-> (var,z,B)) cost more than the
        # lane-padding they save (block+df32 342 -> 530 ms/attempt,
        # ns+plain ~flat 43 -> 48). Default OFF everywhere; the option
        # stays for hardware where relayouts are cheap.
        use_batched = False
    else:
        use_batched = bool(batched_rhs)
        if use_batched and hybrid_cast and not df32_mode:
            raise ValueError(
                "batched_rhs supports plain f32 or accurate_rates='df32' "
                "only (the x64-hybrid legs keep the vmapped path)"
            )
    if fused_rhs is None:
        use_fused = (jax.default_backend() == "tpu"
                     and accurate_rates in (False, "df32")
                     and not use_batched)
    else:
        use_fused = bool(fused_rhs)
        if use_fused and accurate_rates not in (False, "df32"):
            raise ValueError(
                "fused_rhs supports plain f32 or accurate_rates='df32' "
                "only (the x64-hybrid legs keep the vmapped path)"
            )
        if use_fused and use_batched:
            raise ValueError("fused_rhs and batched_rhs are exclusive")
    rhs_fused = rhs_fused_cheap = None
    if use_fused:
        from ..ops import pallas_rhs

        rhs_fused = pallas_rhs.build_n2_fused(
            spec, accurate_rates="df32" if df32_mode else False
        )
        if df32_mode and cheap_sweeps:
            rhs_fused_cheap = pallas_rhs.build_n2_fused(spec)

    if use_batched:
        rhs_b_raw = homo.make_n2_rhs_b(
            spec, accurate_rates="df32" if df32_mode else False
        )
        jac_b_raw = (homo.make_n2_colored_jacobian_b(spec)
                     if colored_jacobian else None)
        if hybrid_cast:
            # df32 in an x64 process (tests/parity runs): same clamping
            # as the vmapped path -- outputs back to f32 so one f64 leaf
            # cannot promote the integrator
            rhs_b = lambda t, y, p, d: rhs_b_raw(t, y, p, d).astype(
                jnp.float32)
            jac_b = (None if jac_b_raw is None else
                     lambda t, y, p, d: jac_b_raw(t, y, p, d).astype(
                         jnp.float32))
        else:
            rhs_b, jac_b = rhs_b_raw, jac_b_raw

    def _broadcast_params(params, Bsz):
        """Give every non-swept leaf a leading member axis (member-last
        internals broadcast per-member scalars on the TRAILING axis, so
        the batched RHS wants uniformly (B, ...) parameters)."""
        out = {}
        for key, val in params.items():
            if key == "kinetic_overrides":
                out[key] = {
                    kk: (vv if axes[key][kk] == 0 else jnp.broadcast_to(
                        jnp.asarray(vv)[None],
                        (Bsz,) + jnp.asarray(vv).shape))
                    for kk, vv in val.items()
                }
            elif axes[key] == 0:
                out[key] = val
            else:
                arr = jnp.asarray(val)
                out[key] = jnp.broadcast_to(arr[None], (Bsz,) + arr.shape)
        return out

    def run(params):
        def derive(q):
            d = homo.feed_state(spec, q)
            return d, homo.n2_initial_state(spec, q, d)

        dB, y0B = jax.vmap(derive, in_axes=(axes,))(params)
        ts = params["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)
        if hybrid_cast:
            y0B, ts = _to_f32((y0B, ts))
            if not full_f64_rhs:
                dB = _to_f32(dB)

        if jac_bl is not None:
            jblB = jax.vmap(jac_bl, in_axes=(0, 0, axes, 0))
            jac_blocks_batched = lambda t, y: jblB(t, y, params, dB)
        else:
            jac_blocks_batched = None

        if use_batched:
            pB = _broadcast_params(params, y0B.shape[0])
            f_batched = lambda t, y: rhs_b(t, y, pB, dB)
            jac_batched = ((lambda t, y: jac_b(t, y, pB, dB))
                           if jac_b is not None else None)
            return stiff_ensemble.odeint_ensemble(
                f_batched, y0B, ts, rtol=rtol, atol=atol,
                jac=jac_batched, batched=True,
                jac_blocks=jac_blocks_batched, **solver_kwargs,
            )

        if use_fused:
            pBf = _broadcast_params(params, y0B.shape[0])
            b_loc, n_state = y0B.shape

            def f_batched(t, y):
                return rhs_fused(t, y, pBf, dB).astype(y0B.dtype)

            def _stages(rhs_fn):
                # one kernel over the stage-stacked 3B batch (stage-major:
                # member = index % B; the builder tiles the (B,) leaves)
                def f_stages(ts_st, Y):
                    yf = Y.transpose(1, 0, 2).reshape(3 * b_loc, n_state)
                    out = rhs_fn(None, yf, pBf, dB).astype(Y.dtype)
                    return out.reshape(3, b_loc, n_state).transpose(1, 0, 2)

                return f_stages

            kw = dict(solver_kwargs)
            kw["f_stages"] = _stages(rhs_fused)
            if rhs_fused_cheap is not None:
                kw["f_cheap"] = lambda t, y: rhs_fused_cheap(
                    t, y, pBf, dB).astype(y0B.dtype)
                kw["f_cheap_stages"] = _stages(rhs_fused_cheap)
                kw["cheap_sweeps"] = int(cheap_sweeps)

            if jac_c is not None:
                jfB = jax.vmap(jac_c, in_axes=(0, 0, axes, 0))
                jac_batched = lambda t, y: jfB(t, y, params, dB)
            else:
                jac_batched = None

            return stiff_ensemble.odeint_ensemble(
                f_batched, y0B, ts, rtol=rtol, atol=atol,
                jac=jac_batched, batched=True,
                jac_blocks=jac_blocks_batched, **kw,
            )

        fB = jax.vmap(rhs, in_axes=(0, 0, axes, 0))

        def f_batched(t, y):
            return fB(t, y, params, dB)

        if rhs_cheap is not None:
            fcB = jax.vmap(rhs_cheap, in_axes=(0, 0, axes, 0))
            solver_kwargs["f_cheap"] = lambda t, y: fcB(t, y, params, dB)
            solver_kwargs["cheap_sweeps"] = int(cheap_sweeps)

        if jac_c is not None:
            jB = jax.vmap(jac_c, in_axes=(0, 0, axes, 0))
            jac_batched = lambda t, y: jB(t, y, params, dB)
        else:
            jac_batched = None

        return stiff_ensemble.odeint_ensemble(
            f_batched, y0B, ts, rtol=rtol, atol=atol,
            jac=jac_batched, batched=True,
            jac_blocks=jac_blocks_batched, **solver_kwargs,
        )

    b_total = next(
        jnp.asarray(v).shape[0] for k, v in sweep.items()
    ) if sweep else None
    if microbatch is not None and b_total and b_total > microbatch:
        if mesh is not None:
            raise ValueError("microbatch and mesh are mutually exclusive")
        if "out_members" in solver_kwargs:
            raise ValueError(
                "out_members and microbatch are mutually exclusive "
                "(probe indices are global, microbatches are local)"
            )
        if lower_only:
            raise ValueError("lower_only supports single-batch runs only")
        if b_total % microbatch:
            raise ValueError(
                f"ensemble size {b_total} must be a multiple of "
                f"microbatch {microbatch}"
            )
        k = b_total // microbatch

        # scan xs must all carry the leading k axis: reshape the swept
        # leaves into (k, microbatch, ...) and close over the rest
        xs, const = {}, {}
        for key, val in params.items():
            if key == "kinetic_overrides":
                xs[key] = {
                    kk: vv.reshape((k, microbatch) + vv.shape[1:])
                    for kk, vv in val.items() if axes[key][kk] == 0
                }
                const[key] = {
                    kk: vv for kk, vv in val.items() if axes[key][kk] != 0
                }
            elif axes[key] == 0:
                xs[key] = val.reshape((k, microbatch) + val.shape[1:])
            else:
                const[key] = val

        def scan_microbatches(xs, const):
            def body(_, x):
                pk = dict(const, **{
                    key: v for key, v in x.items()
                    if key != "kinetic_overrides"
                })
                pk["kinetic_overrides"] = dict(
                    const["kinetic_overrides"],
                    **x.get("kinetic_overrides", {}),
                )
                return None, run(pk)

            _, (ys_k, stats_k) = jax.lax.scan(body, None, xs)
            # (k, n_out, Bm, n) -> (n_out, k*Bm, n)
            ys = jnp.moveaxis(ys_k, 0, 1).reshape(
                ys_k.shape[1], k * microbatch, -1
            )
            stats = stiff_ensemble.EnsembleStats(*[
                (v.reshape(-1) if v.ndim == 2 else jnp.sum(v))
                for v in stats_k
            ])
            return ys, stats

        return jax.jit(scan_microbatches)(xs, const)

    if mesh is not None:
        params = shard_batch(mesh, params, axes)
    if lower_only:
        # AOT hook (scripts/hbm_audit.py): lower the single-batch program
        # without executing so compile-side diagnostics (XLA
        # memory_analysis -- the only HBM surface on the axon runtime,
        # device.memory_stats() returns None) can run at batch sizes that
        # may not fit on the chip.
        return jax.jit(run).lower(params)
    return jax.jit(run)(params)


def make_n1_ensemble(
    spec: homo.HomoSpec,
    rtol: float = 1e-7,
    atol: float = 1e-10,
    solver: str = "radau",
    z_out: int | None = None,
):
    """Build single/vmapped runners for the steady model (profiles over z)."""
    rhs = homo.make_n1_rhs(spec)
    odeint = _solver(solver)
    n_out = (z_out if z_out is not None else spec.z_out) + 1

    def single(p):
        d = homo.feed_state(spec, p)
        y0 = homo.n1_initial_state(spec, p, d)
        ts = jnp.linspace(0.0, 1.0, n_out).astype(y0.dtype)
        ys, stats = odeint(lambda t, y: rhs(t, y, p, d), y0, ts, rtol=rtol, atol=atol)
        return ys, stats.n_fev

    def build(axes):
        return jax.jit(jax.vmap(single, in_axes=(axes,)))

    return single, build


def run_m11_sweep(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    rtol: float = 1e-5,
    atol: float = 1e-6,
    mesh: Mesh | None = None,
    **solver_kwargs,
):
    """Ensemble sweep of the M11 dynamic heterogeneous reactor.

    A batch of coupled gas+particle transients (state (noLayer, rNo+1,
    zNo) per member, reference pbReactor.runM7) as ONE vmapped jitted
    Radau run: every member keeps its own adaptive step control, and the
    Newton matrices use the two-phase colored Jacobian (3 colors per gas
    variable + 1 per solid (layer, r) variable). Swept leaves may be
    operating conditions ("T0", "P0", "vf", ...) or kinetic-override
    constants; the dp mesh shards members across chips. Tolerance
    defaults match the single-run M11 (api.rmt._hetero_dyn_tols).

    Why this vmaps the LU-based Radau instead of riding the lockstep
    Newton-Schulz engine: the M11 seed transient (solid phase at the
    reference's 1e-6 seed, LHHW reverse rates near-singular) measures
    |Re lambda|_max ~ 5e13 and cond(I - h*gamma*J) ~ 6e9 even at
    h = 1e-4 -- beyond ANY f32-matmul preconditioner (eps32 * cond >> 1),
    so the lockstep engine's Newton stalls at h ~ 1e-4 while f64 LU
    solves the same systems losing only ~cond*eps64 ~ 1e-6 (measured:
    1383 accepted lockstep steps cover < 3% of the span that 289 Radau
    steps finish). Batched f64 LU is slow on TPU -- prefer sharding
    members across chips via `mesh` over huge single-chip batches here.

    Returns (ys, stats): ys (B, tNo+1, noLayer*(rNo+1)*zNo) dimensionless
    states, stats per-member RadauStats.
    """
    from ..models import hetero_dyn
    from ..ops import jacobian as jac_ops
    from ..ops import stencils as _st

    sc = model_input.get("solver-config", {})
    if sc.get("mesh", "normal") != "normal":
        zmesh = _st.two_zone_mesh((15, 10), 1.0, 30, 1.001)
        z_no = int(zmesh["n_nodes"])
    else:
        zmesh = None
        z_no = int(sc.get("zNo", 10))
    spec = hetero_dyn.m13_build_spec(
        model_input,
        z_no=z_no,
        r_no=int(sc.get("rNo", 7)),
        t_no=int(sc.get("tNo", 5)),
    )
    base = hetero_dyn.m13_params(model_input)
    params, axes = batch_params(base, sweep)
    if mesh is not None:
        params = shard_batch(mesh, params, axes)

    rhs = hetero_dyn.make_m11_rhs(spec, mesh=zmesh)
    coloring = jac_ops.two_phase_coloring(spec.n_layer, spec.r_no + 1, spec.z_no)

    def single(pp):
        d = hetero_dyn.m13_feed(spec, pp)
        y0 = hetero_dyn.m11_initial_state(spec, pp)
        ts = (pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)).astype(y0.dtype)
        jac = jac_ops.colored_jacobian_from(
            lambda t, y: rhs(t, y, pp, d), coloring
        )
        ys, stats = radau.odeint(
            rhs, y0, ts, rtol=rtol, atol=atol, args=(pp, d), jac=jac,
            **solver_kwargs,
        )
        return ys, stats

    fn = jax.jit(jax.vmap(single, in_axes=(axes,)))
    return fn(params)


def run_m13_sweep(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    rtol: float = 1e-5,
    atol: float = 1e-7,
    mesh: Mesh | None = None,
    engine: str = "vmap",
    **engine_kwargs,
):
    """Ensemble sweep of the M13 operator-splitting heterogeneous reactor.

    The whole split driver -- per interval a gas MoL Radau solve, then
    zNo particle BVPs by globalized damped Newton, with the reference's
    staggered interface exchange -- is one pure function of the parameter
    pytree (models.hetero_dyn.make_m13_driver), so a design sweep is one
    jax.vmap'd jitted program; the dp mesh shards members across chips.
    The reference's only equivalent is a Python loop of rmtExe calls,
    each running scipy solve_ivp + fsolve per interval
    (pbHeterReactor.py:995-1148).

    engine="vmap" (default) vmaps the per-member split driver: adaptive
    while_loop Radau + sequential damped Newton per member -- the right
    engine on CPU. engine="lockstep" runs all members through ONE
    scan-based program (no while_loop anywhere: the tunneled TPU runtime
    executes a while_loop iteration ~100x slower than the identical scan
    body): the gas phase on the lockstep stiff integrator with exact
    block-TRIdiagonal stage solves (the dispersion MoL Jacobian couples
    z-1, z, z+1), the solid phase as lockstep damped Newton over all
    (member, z) nodes at once with block-tridiagonal (layer, r) linear
    solves, globalized by a bulk-homotopy rescue. Normal mesh only (the
    refined dense-zone stencils reach z-2, breaking the tridiagonal
    structure).

    Returns a dict: gas (B, tNo, noLayer, zNo) dimensionless gas profiles
    per interval, solid (B, tNo, noLayer, rNo, zNo), converged (B,) bool
    (solid Newton at every interval), unreached (B,) int (gas budget
    misses), ts (tNo+1,) shared output grid.
    """
    from ..models import hetero_dyn
    from ..ops import stencils as _st

    sc = model_input.get("solver-config", {})
    if sc.get("mesh", "normal") != "normal":
        zmesh = _st.two_zone_mesh((15, 10), 1.0, 30, 1.001)
        z_no = int(zmesh["n_nodes"])
    else:
        zmesh = None
        z_no = int(sc.get("zNo", 10))
    if engine == "lockstep":
        if zmesh is not None:
            raise ValueError(
                "engine='lockstep' supports the normal mesh only (the "
                "refined dense-zone stencils couple z-2, which the "
                "block-tridiagonal stage solves cannot represent)"
            )
        return _run_m13_sweep_lockstep(
            model_input, sweep, z_no, rtol, atol, mesh, **engine_kwargs
        )
    if engine != "vmap":
        raise ValueError(f"unknown engine {engine!r}")
    if engine_kwargs:
        raise TypeError(
            f"engine='vmap' takes no extra options: {sorted(engine_kwargs)}"
        )
    spec = hetero_dyn.m13_build_spec(
        model_input,
        z_no=z_no,
        r_no=int(sc.get("rNo", 7)),
        t_no=int(sc.get("tNo", 5)),
    )
    base = hetero_dyn.m13_params(model_input)
    if "opT" in sweep:
        raise ValueError("the M13 sweep requires a shared period")
    params, axes = batch_params(base, sweep)
    if mesh is not None:
        params = shard_batch(mesh, params, axes)

    run = hetero_dyn.make_m13_driver(spec, mesh=zmesh, rtol=rtol, atol=atol)
    fn = jax.jit(jax.vmap(run, in_axes=(axes,)))
    gas_t, solid_t, conv_t, unr_t, ts_grid = fn(params)
    b = gas_t.shape[0]
    return {
        "gas": gas_t.reshape(b, spec.t_no, spec.n_layer, spec.z_no),
        "solid": solid_t,
        "converged": jnp.all(conv_t, axis=1),
        "unreached": jnp.sum(unr_t, axis=1),
        "ts": ts_grid[0] if ts_grid.ndim == 2 else ts_grid,
    }


def _run_m13_sweep_lockstep(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    z_no: int,
    rtol: float,
    atol: float,
    mesh: Mesh | None,
    max_steps_gas: int = 768,
    homotopy_stages: int = 8,
    newton_iters_solid: int = 30,
    tol_solid: float | None = None,
):
    """Scan-based lockstep M13 ensemble (see run_m13_sweep docstring).

    Semantics mirror models.hetero_dyn.make_m13_driver interval for
    interval (staggered interface exchange: gas integrates with the
    PREVIOUS interval's solid surface, the solid solves against the
    PREVIOUS interval's gas bulk): gas MoL on
    stiff_ensemble.odeint_ensemble with block=(n_layer, zNo, "tridiag")
    exact stage solves, solid particle BVPs as damped Newton
    (solvers.newton.root_batched) over all B*zNo nodes at once with
    block-tridiagonal (layer, r) solves, and a bulk-homotopy rescue for
    nodes whose warm Newton diverges (see `rescue` below).

    homotopy_stages=8: at production grids (rNo=7, the reference's T1
    setting) the 4-stage rescue leaves the early-interval inlet nodes
    unconverged -- the finer r-grid sharpens the LHHW nonlinearity and
    the bulk jump per homotopy stage overshoots the Newton basin
    (measured round 5, zNo=10/rNo=7/tNo=5: hs=4 converges 0/4 members
    at newton_iters_solid 30 or 60; hs=8 converges 4/4 at 30). The
    rescue is lax.cond-gated, so the larger budget costs nothing when
    warm Newton succeeds.
    """
    from ..models import hetero_dyn
    from ..ops import jacobian as jac_ops
    from ..solvers import newton as newton_mod

    sc = model_input.get("solver-config", {})
    spec = hetero_dyn.m13_build_spec(
        model_input,
        z_no=z_no,
        r_no=int(sc.get("rNo", 7)),
        t_no=int(sc.get("tNo", 5)),
    )
    base = hetero_dyn.m13_params(model_input)
    if "opT" in sweep:
        raise ValueError("the M13 sweep requires a shared period")
    params, axes = batch_params(base, sweep)
    if mesh is not None:
        params = shard_batch(mesh, params, axes)

    from .. import config as _config

    if tol_solid is None:
        # The solid Newton judges ||f||_rms < tol*(1 + ||x||_inf); the
        # reachable residual floor is the evaluation noise of the LHHW
        # residual on the backend: CPU f64 reaches 1e-9, TPU-emulated
        # f64 transcendentals are only ~4e-8-accurate (STATUS hardware
        # findings) and plain f32 floors near ~1e-6 (measured on-chip
        # round 5: tol sweep at zNo=10/rNo=7 -- 1e-9 converges nothing,
        # 3e-6 converges every member at unchanged state values).
        if _config.x64_enabled():
            _tol_solid = 1e-7 if jax.default_backend() == "tpu" else 1e-9
        else:
            _tol_solid = 3e-6
    else:
        _tol_solid = float(tol_solid)

    gas_rhs = hetero_dyn.make_m13_gas_rhs(
        spec, flux_sign=-1.0, mesh=None, clamp_width=0.0
    )
    node_res = hetero_dyn.make_m13_solid_node_residual(spec)
    n_comp, n_layer, r_no, z_nod = (
        spec.n_comp, spec.n_layer, spec.r_no, spec.z_no
    )
    gas_coloring = jac_ops.tridiag_coloring(n_layer, z_nod)
    solid_coloring = jac_ops.tridiag_coloring(n_layer, r_no)
    eps_c = hetero_dyn.EPS_CONST

    def run(params):
        dB = jax.vmap(
            lambda pp: hetero_dyn.m13_feed(spec, pp), in_axes=(axes,)
        )(params)
        y_gas = jax.vmap(
            lambda pp: hetero_dyn.m13_gas_initial_state(spec, pp),
            in_axes=(axes,),
        )(params)
        y_solid = jax.vmap(
            lambda pp: hetero_dyn.m13_solid_initial_state(spec, pp),
            in_axes=(axes,),
        )(params)
        Bsz = y_gas.shape[0]
        cs_surf = y_solid[:, :n_comp, 0, :]
        ts_surf = y_solid[:, n_comp, 0, :]
        g0 = y_gas.reshape(Bsz, n_layer, z_nod)
        c_bulk, t_bulk = g0[:, :n_comp], g0[:, n_comp]
        ts_grid = (
            params["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)
        ).astype(y_gas.dtype)

        gas_vm = jax.vmap(gas_rhs, in_axes=(0, 0, axes, 0, 0, 0))

        def solid_residual(x, cb, tb):
            """x: (B*z, n_layer*r_no) node states; cb (B, n_comp, z),
            tb (B, z) are the gas bulk values entering the Robin BC."""
            yn = x.reshape(Bsz, z_nod, n_layer, r_no)

            def member(yn_m, cb_m, tb_m, pp, dd):
                def node(yn_z, cb_z, tb_z):
                    # hard EPS clamp of the bulk, as the normal-mesh
                    # driver (pbHeterReactor.py:1575,1791)
                    return node_res(
                        yn_z, jnp.maximum(cb_z, eps_c), tb_z, pp, dd
                    )

                return jax.vmap(node, in_axes=(0, 1, 0))(yn_m, cb_m, tb_m)

            r = jax.vmap(member, in_axes=(0, 0, 0, axes, 0))(
                yn, cb, tb, params, dB
            )
            return r.reshape(Bsz * z_nod, n_layer * r_no)

        def solve_solid(x0, cb, tb):
            res = lambda x: solid_residual(x, cb, tb)
            jac_solid = jac_ops.batched_colored_jacobian(
                res, solid_coloring
            )
            return newton_mod.root_batched(
                res, x0, max_iter=newton_iters_solid,
                jac=jac_solid, tol=_tol_solid,
                block=(n_layer, r_no, "tridiag"),
            )

        def interval(carry, tpair):
            (y_gas, y_solid, cs_surf, ts_surf,
             c_bulk, t_bulk, c_prev, t_prev, nunr) = carry

            def fB(t, y):
                return gas_vm(t, y, params, dB, cs_surf, ts_surf)

            def jac_gas(t, y):
                return jac_ops.batched_colored_jacobian(
                    lambda yy: fB(t, yy), gas_coloring
                )(y)

            ys, stats = stiff_ensemble.odeint_ensemble(
                fB, y_gas, tpair, rtol=rtol, atol=atol,
                jac=jac_gas, batched=True,
                block=(n_layer, z_nod, "tridiag"),
                max_steps=max_steps_gas,
            )
            y_gas = ys[-1]
            unreached = (stats.seg < 1).astype(jnp.int32)

            # solid phase against the PREVIOUS interval's bulk (staggered).
            # The previous interval's solid state is a warm start (the
            # BVP solution moves continuously with the bulk), so damped
            # Newton converges directly at most intervals.
            x0 = y_solid.transpose(0, 3, 1, 2).reshape(
                Bsz * z_nod, n_layer * r_no
            )
            sol = solve_solid(x0, c_bulk, t_bulk)
            need = ~sol.converged

            def rescue(args):
                # Bulk-homotopy continuation for nodes whose warm Newton
                # diverged (typically the near-inlet nodes of the early
                # intervals, where the bulk jumps from the 1e-6 seed to
                # feed levels in one interval and the warm start is far
                # outside the Newton basin of the violently nonlinear
                # LHHW kinetics): x0 solves the BVP at the PREVIOUS bulk
                # (c_prev, t_prev), and the solution is continuous in the
                # bulk, so re-solve along the segment prev->new in
                # homotopy_stages warm-started Newton solves. Convergence
                # is judged by the FINAL (w=1) stage only -- measured: an
                # INTERMEDIATE bulk can itself be Newton-pathological
                # from the current iterate while both halves of the path
                # around it converge fine, so a failed stage just carries
                # its iterate forward. Alternatives measured and
                # rejected: SER-PTC on dx/dtau = res(x) stalls (implicit
                # Euler rejects any dt > 1e-7 on this flow -- the
                # residual landscape is a narrow curved valley both
                # Newton and PTC jump off), and the lockstep stiff
                # integrator tracking that flow thrashes at 61% rejection
                # where the sequential radau needs 82 steps.
                x_sol, conv_n = args

                def stage(xk, w):
                    cbk = (1.0 - w) * c_prev + w * c_bulk
                    tbk = (1.0 - w) * t_prev + w * t_bulk
                    sk = solve_solid(xk, cbk, tbk)
                    xk = jnp.where(sk.converged[:, None], sk.x, xk)
                    return xk, sk.converged

                ws = jnp.linspace(
                    1.0 / homotopy_stages, 1.0, homotopy_stages
                ).astype(x0.dtype)
                xh, conv_stages = jax.lax.scan(stage, x0, ws)
                conv_h = conv_stages[-1]
                return (
                    jnp.where(need[:, None], xh, x_sol),
                    jnp.where(need, conv_h, conv_n),
                )

            x_sol, conv_n = jax.lax.cond(
                jnp.any(need), rescue, lambda a: a,
                (sol.x, sol.converged),
            )
            # nodes that STILL failed keep the previous interval's solid
            # state (a diverged Newton iterate would poison the carry);
            # their member is reported converged=False
            x_sol = jnp.where(conv_n[:, None], x_sol, x0)
            y_solid = x_sol.reshape(Bsz, z_nod, n_layer, r_no).transpose(
                0, 2, 3, 1
            )
            conv = jnp.all(conv_n.reshape(Bsz, z_nod), axis=1)
            cs_surf = y_solid[:, :n_comp, 0, :]
            ts_surf = y_solid[:, n_comp, 0, :]
            # the bulk the NEXT interval's warm start was solved against
            # (converged nodes only: failed nodes kept their x0, which
            # still solves the OLD bulk -- but per-node tracking isn't
            # worth it; a failed node re-enters through the homotopy)
            c_prev, t_prev = c_bulk, t_bulk
            Yg = y_gas.reshape(Bsz, n_layer, z_nod)
            c_bulk, t_bulk = Yg[:, :n_comp], Yg[:, n_comp]
            nunr = nunr + unreached
            carry = (
                y_gas, y_solid, cs_surf, ts_surf,
                c_bulk, t_bulk, c_prev, t_prev, nunr,
            )
            return carry, (y_gas, y_solid, conv, unreached)

        nunr0 = jnp.zeros(Bsz, jnp.int32)
        # interval 0 has no previous solve: c_prev = the same gas-IV bulk
        # the first solid solve targets, so its homotopy degenerates to
        # the direct Newton (which converges from the cold seed; the
        # rescue then cannot help but also cannot hurt)
        carry, (gas_t, solid_t, conv_t, unr_t) = jax.lax.scan(
            interval,
            (y_gas, y_solid, cs_surf, ts_surf, c_bulk, t_bulk,
             c_bulk, t_bulk, nunr0),
            jnp.stack([ts_grid[:-1], ts_grid[1:]], axis=1),
        )
        return gas_t, solid_t, conv_t, unr_t, ts_grid

    gas_t, solid_t, conv_t, unr_t, ts_grid = jax.jit(run)(params)
    b = gas_t.shape[1]
    return {
        "gas": jnp.moveaxis(gas_t, 0, 1).reshape(
            b, spec.t_no, spec.n_layer, spec.z_no
        ),
        "solid": jnp.moveaxis(solid_t, 0, 1),
        "converged": jnp.all(conv_t, axis=0),
        "unreached": jnp.sum(unr_t, axis=0),
        "ts": ts_grid,
    }


def _hetero_dyn_sweep(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    *,
    model_id: str,
    rtol: float,
    atol: float,
    mesh: Mesh | None,
    y0,
    solver_kwargs,
):
    """Shared body of the M10/M12 design sweeps: a batch of coupled
    gas+particle transients as one vmapped jitted Radau run with the
    two-phase colored Jacobian (the M11 pattern; see run_m11_sweep for
    why the dynamic-hetero TPU story is member-sharding over the dp mesh
    rather than the lockstep engine)."""
    from ..models import hetero_dyn
    from ..ops import jacobian as jac_ops

    sc = model_input.get("solver-config", {})
    if sc.get("mesh", "normal") != "normal":
        raise ValueError(
            f"the {model_id} sweep supports the normal mesh only; run "
            "refined-mesh cases through rmtExe"
        )
    spec = hetero_dyn.m13_build_spec(
        model_input,
        z_no=int(sc.get("zNo", 100 if model_id == "M10" else 10)),
        r_no=7,                       # both particle schemes use the
                                      # 7-point basis (S2.rNo / T1.rNo.oc)
        t_no=int(sc.get("tNo", 10 if model_id == "M10" else 5)),
    )
    if model_id == "M10":
        base = hetero_dyn.m10_params(model_input)
        rhs = hetero_dyn.make_m10_rhs(spec, clamp_interface=True)
    else:
        base = hetero_dyn.m13_params(model_input)
        rhs = hetero_dyn.make_m12_rhs(spec, clamp_interface=True)
    params, axes = batch_params(base, sweep)
    bsz = int(next(iter(sweep.values())).shape[0])
    n_state = spec.n_layer * (spec.r_no + 1) * spec.z_no

    if y0 is None:
        if model_id == "M10":
            y0B = jax.vmap(
                lambda pp: hetero_dyn.m10_initial_state(spec, pp),
                in_axes=(axes,),
            )(params)
        else:
            # M12's reference seed (1e-6 everywhere) enters the singular
            # near-zero-kinetics LHHW regime within ~1e-6 s (see
            # tests/test_m12.py::test_m12_api_end_to_end); default to the
            # physical startup state instead: feed composition at every
            # (r, z) node, theta = 0
            def physical(pp):
                c_in = pp["SpCoi0"] / jnp.max(pp["SpCoi0"])
                c = jnp.tile(
                    c_in[:, None, None],
                    (1, spec.r_no + 1, spec.z_no),
                )
                th = jnp.zeros((1, spec.r_no + 1, spec.z_no), c.dtype)
                return jnp.concatenate([c, th], axis=0).reshape(-1)

            y0B = jax.vmap(physical, in_axes=(axes,))(params)
    else:
        y0B = jnp.asarray(y0)
        if y0B.ndim == 1:
            y0B = jnp.tile(y0B[None], (bsz, 1))
        if y0B.shape != (bsz, n_state):
            raise ValueError(
                f"y0 must have shape ({bsz}, {n_state}) or ({n_state},); "
                f"got {y0B.shape}"
            )
    if mesh is not None:
        params = shard_batch(mesh, params, axes)
        y0B = jax.device_put(y0B, NamedSharding(mesh, P("dp")))

    coloring = jac_ops.two_phase_coloring(
        spec.n_layer, spec.r_no + 1, spec.z_no
    )

    def single(pp, y0_m):
        ts = (pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)).astype(
            y0_m.dtype
        )
        if model_id == "M10":
            f = lambda t, y: rhs(t, y, pp)
            args = (pp,)
        else:
            d = hetero_dyn.m13_feed(spec, pp)
            f = lambda t, y: rhs(t, y, pp, d)
            args = (pp, d)
        jac = jac_ops.colored_jacobian_from(f, coloring)
        ys, stats = radau.odeint(
            rhs, y0_m, ts, rtol=rtol, atol=atol, args=args, jac=jac,
            **solver_kwargs,
        )
        return ys, stats

    fn = jax.jit(jax.vmap(single, in_axes=(axes, 0)))
    return fn(params, y0B)


def run_m10_sweep(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    rtol: float = 1e-5,
    atol: float = 1e-6,
    mesh: Mesh | None = None,
    y0=None,
    **solver_kwargs,
):
    """Ensemble sweep of the M10 dynamic heterogeneous reactor (real
    units, OC particle, live velocity/pressure marches -- reference
    pbReactor.runM6; our salvaged RHS, models.hetero_dyn.make_m10_rhs).

    Same engine as run_m11_sweep: one vmapped jitted Radau run, two-phase
    colored Jacobians, members sharded over the dp `mesh`. y0 overrides
    the initial state ((n,) shared or (B, n) per member; default is the
    reference's seed via m10_initial_state). Returns (ys, stats): ys
    (B, tNo+1, noLayer*(rNo+1)*zNo) in real units, stats per-member
    RadauStats.
    """
    return _hetero_dyn_sweep(
        model_input, sweep, model_id="M10", rtol=rtol, atol=atol,
        mesh=mesh, y0=y0, solver_kwargs=solver_kwargs,
    )


def run_m12_sweep(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    rtol: float = 1e-5,
    atol: float = 1e-6,
    mesh: Mesh | None = None,
    y0=None,
    **solver_kwargs,
):
    """Ensemble sweep of the M12 dynamic heterogeneous reactor (OC
    particle with the static algebraic interface -- reference
    pbReactor.runM8; salvaged RHS, models.hetero_dyn.make_m12_rhs).

    Same engine as run_m11_sweep. y0 overrides the initial state ((n,)
    shared or (B, n) per member); the default is the PHYSICAL startup
    state (feed composition everywhere, theta=0), NOT the reference's
    1e-6 seed -- that seed collapses into the singular near-zero-kinetics
    regime within ~1e-6 s and no integrator leaves it (measured; see
    tests/test_m12.py). Returns (ys, stats) with dimensionless states
    (B, tNo+1, noLayer*(rNo+1)*zNo).
    """
    return _hetero_dyn_sweep(
        model_input, sweep, model_id="M12", rtol=rtol, atol=atol,
        mesh=mesh, y0=y0, solver_kwargs=solver_kwargs,
    )


def run_m14_sweep(
    model_input: Mapping[str, Any],
    sweep: Mapping[str, Any],
    mesh: Mesh | None = None,
):
    """Design-space sweep of the M14 steady heterogeneous reactor.

    Solves a batch of steady states in one vmapped program -- every member
    runs the same pseudo-transient continuation + damped-Newton polish
    (models.hetero.make_m14_runner); swept leaves may be operating
    conditions ("T0", "P0", "vf", ...) or kinetic-override constants. The
    reference's only equivalent is a Python loop of rmtExe calls, each a
    scipy fsolve (pbReactor.py:7615-7640).

    Honors solver-config mesh/zNo/rampList like rmtExe. Returns a dict:
    states (B, n_comp+1, 2, zNo) dimensionless [gas|solid] profiles,
    converged (B,) bool, res_norm (B,).
    """
    from ..models import hetero
    from ..ops import stencils as _st

    sc = model_input.get("solver-config", {})
    if sc.get("mesh", "normal") != "normal":
        zmesh = _st.two_zone_mesh((15, 10), 1.0, 30, 1.001)
        z_no = int(zmesh["n_nodes"])
    else:
        zmesh = None
        z_no = int(sc.get("zNo", 30))
    ramp_list = tuple(float(r) for r in sc.get("rampList", [1.0]))
    spec = hetero.m14_build_spec(model_input, z_no=z_no)
    base = hetero.m14_params(model_input)
    params, axes = batch_params(base, sweep)
    if mesh is not None:
        params = shard_batch(mesh, params, axes)

    run = hetero.make_m14_runner(spec, mesh=zmesh, ramp_list=ramp_list)
    fn = jax.jit(jax.vmap(run, in_axes=(axes,)))
    x, converged, res_norm = fn(params)
    b = x.shape[0]
    return {
        "states": x.reshape(b, spec.n_comp + 1, 2, spec.z_no),
        "converged": converged,
        "res_norm": res_norm,
    }
