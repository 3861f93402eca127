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
    **solver_kwargs,
):
    """N2 dynamic ensemble on the TPU-native lockstep integrator.

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
    """
    spec = homo.build_spec(model_input)
    base = homo.build_params(model_input)
    if "opT" in sweep:
        raise ValueError("the lockstep integrator requires a shared period")
    params, axes = batch_params(base, sweep)

    rhs = homo.make_n2_rhs(spec)
    jac_c = homo.make_n2_colored_jacobian(spec) if colored_jacobian else None
    if exact_solve:
        if not colored_jacobian:
            raise ValueError("exact_solve requires colored_jacobian=True")
        solver_kwargs.setdefault("block", (spec.var_no_n2, spec.z_no))

    def run(params):
        def derive(q):
            d = homo.feed_state(spec, q)
            return d, homo.n2_initial_state(spec, q, d)

        dB, y0B = jax.vmap(derive, in_axes=(axes,))(params)
        ts = params["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)

        fB = jax.vmap(rhs, in_axes=(0, 0, axes, 0))

        def f_batched(t, y):
            return fB(t, y, params, dB)

        if jac_c is not None:
            jB = jax.vmap(jac_c, in_axes=(0, 0, axes, 0))
            jac_batched = lambda t, y: jB(t, y, params, dB)
        else:
            jac_batched = None

        return stiff_ensemble.odeint_ensemble(
            f_batched, y0B, ts, rtol=rtol, atol=atol,
            jac=jac_batched, batched=True, **solver_kwargs,
        )

    b_total = next(
        jnp.asarray(v).shape[0] for k, v in sweep.items()
    ) if sweep else None
    if microbatch is not None and b_total and b_total > microbatch:
        if mesh is not None:
            raise ValueError("microbatch and mesh are mutually exclusive")
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
):
    """Ensemble sweep of the M13 operator-splitting heterogeneous reactor.

    The whole split driver -- per interval a gas MoL Radau solve, then
    zNo particle BVPs by PTC + damped Newton, with the reference's
    staggered interface exchange -- is one pure function of the parameter
    pytree (models.hetero_dyn.make_m13_driver), so a design sweep is one
    jax.vmap'd jitted program; the dp mesh shards members across chips.
    The reference's only equivalent is a Python loop of rmtExe calls,
    each running scipy solve_ivp + fsolve per interval
    (pbHeterReactor.py:995-1148).

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
