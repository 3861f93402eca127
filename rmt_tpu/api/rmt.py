# Public API: rmtExe(modelInput) / rmtCom().
#
# Same dict-in / dataPack-out contract as the reference
# (reference: PyREMOT/rmt.py:21-92, PyREMOT/docs/rmtCore.py:63-127):
# modelInput validated, model id dispatched, result wrapped as
# {"resModel": ..., "comTime": ...}. The compute path is a cached jitted
# JAX program per model structure; repeated calls with the same structure
# (e.g. parameter sweeps) reuse the compiled executable.

from __future__ import annotations

import os
import types
import warnings
from timeit import default_timer as timer
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..data.species import SPECIES, UnknownComponentError, species_index
from ..models import homo, particle, pb, pf
from ..solvers import dopri5, fixed, radau
from ..utils import roundNum

ISO = homo.ISO_THERMAL

# model ids implemented natively so far; remaining reference ids raise a
# clear NotImplementedError until their build step lands
_MODEL_IDS = {
    "M2": "dynamic packed-bed reactor, concentration variables",
    "M3": "batch reactor",
    "M9": "dynamic packed-bed reactor, concentration + velocity march",
    "M5": "plug-flow heterogenous reactor",
    "M0": "plug-flow reactor",
    "M1": "packed bed reactor, steady-state, molar-flow variables",
    "M4": "plug-flow reactor",
    "M7": "steady-state packed-bed reactor, concentration variables",
    "M8": "steady-state packed-bed reactor, concentration + velocity",
    "T1": "dynamic catalyst particle diffusion-reaction",
    "T2": "steady-state catalyst particle diffusion-reaction",
    "N1": "steady-state homogenous packed bed reactor non-isothermal plug-flow",
    "N2": "dynamic homogenous packed bed reactor non-isothermal plug-flow",
    "T3": "steady-state pseudo-homogeneous packed bed with axial dispersion",
    "M11": "dynamic heterogenous packed bed, coupled gas + FDM particle",
    "M10": "dynamic heterogenous packed bed, OC particle, real units",
    "M12": "dynamic heterogenous packed bed, OC particle, static interface",
    "M13": "dynamic heterogenous packed bed, gas/solid operator splitting",
    "M14": "steady-state heterogenous packed bed, gas + lumped catalyst phase",
}

_SOLVER_SETTING = {
    "N1": {"zNo": 100},
    "N2": {"zNo": 20, "tNo": 5, "timesNo": 5},
    "AM_n": 100,
}

_DEFAULT_RTOL = 1e-7
_DEFAULT_ATOL = 1e-10

# solver-config keys the framework honors. Unknown keys are rejected (the
# reference silently drops them; silently accepting-and-ignoring user config
# hides typos like "rtoll")
_SOLVER_CONFIG_KEYS = {
    "ivp", "root", "mesh", "display-result", "rtol", "atol",
    "zNo", "tNo", "timesNo", "rNo", "rampList", "numerical-method", "NuEl",
}
_ROOT_METHODS = {"default", "fsolve", "root", "least_squares"}
# reference configs name scipy methods (pbHomoReactor.py:2916-2932); the
# stiff ones (LSODA/BDF/Radau and the "default" placeholder) all route to
# solvers/radau.py, explicit ones to dopri5, "AM" to fixed.precorr3 --
# anything else (typos included) must raise, not silently run radau
_IVP_METHODS = {"default", "LSODA", "BDF", "Radau", "AM", "RK45", "dopri5"}

_jit_cache: dict[tuple, Any] = {}


def _stats_dict(stats):
    """Solver stats as plain ints (scalar fields) or int lists (the
    lockstep ensemble integrator reports per-member fields)."""
    out = {}
    for k, v in stats._asdict().items():
        a = np.asarray(v)
        out[k] = int(a) if a.ndim == 0 else [int(x) for x in a.reshape(-1)]
    return out


def _check_integration(stats, context: str):
    """Fail loudly when the integrator exhausted its step budget: the
    trailing output rows would hold states at the wrong times (the
    reference likewise raises on solve_ivp failure,
    pbHomoReactor.py:2944-2947)."""
    d = _stats_dict(stats)
    bad = d.get("n_unreached", 0)
    if bad:
        raise RuntimeError(
            f"{context}: integrator failed to reach {bad} output time(s) "
            f"within the step budget (stats: {d})"
        )
    return d


def _check_finite(ys, context: str, ivp: str = ""):
    """Fail loudly on non-finite states. Catches divergence the budget
    check cannot see -- the fixed steppers (ivp="AM") have no adaptive
    budget, so a blown-up fixed-step march (e.g. PreCorr3 on the stiff
    N1/N2 chemistry at AM_n steps) would otherwise return NaN silently.
    (The reference CRASHES on these inputs instead: its "AM" string
    reaches scipy solve_ivp, which rejects it, pbHomoReactor.py:2931.)"""
    if not np.all(np.isfinite(ys)):
        if ivp == "AM":
            raise RuntimeError(
                f"{context}: integration produced non-finite states. The "
                "fixed-step marcher (solver-config ivp='AM') diverged on "
                "a stiff problem -- raise AM_n or use a stiff method "
                "(default/Radau/BDF/LSODA)."
            )
        raise RuntimeError(
            f"{context}: integration produced non-finite states (the "
            "adaptive solver accepted a step into a non-finite region; "
            "check the feed/initial state and kinetics for out-of-domain "
            "values, or tighten rtol/atol)."
        )


def _code_fingerprint(code: types.CodeType) -> tuple:
    consts = tuple(
        _code_fingerprint(c) if isinstance(c, types.CodeType) else repr(c)
        for c in code.co_consts
    )
    return (code.co_code, consts, code.co_names, code.co_varnames)


def _kinetics_fingerprint(model_input: Mapping[str, Any]) -> tuple:
    """Stable content identity for the VARS/RATES dict-program. id()-based
    keys are unsound: CPython recycles ids after GC, so two different
    kinetics dicts built in a parameter-scan loop can collide and silently
    reuse the wrong compiled model."""
    rr = model_input["reaction-rates"]
    out = []
    for section in ("VARS", "RATES"):
        for name, v in rr.get(section, {}).items():
            if callable(v):
                code = getattr(v, "__code__", None)
                fp = _code_fingerprint(code) if code is not None else repr(v)
                closure = getattr(v, "__closure__", None)
                cells = (
                    tuple(repr(c.cell_contents) for c in closure)
                    if closure else ()
                )
                out.append((section, name, fp, cells))
            else:
                out.append((section, name, repr(v)))
    return tuple(out)


def rmtCom() -> str:
    """List components available in the database (reference: rmt.py:83-92)."""
    return ",".join(SPECIES)


# modelInput schema: the reference accepts the raw dict verbatim and
# silently ignores anything it doesn't read (SURVEY §5 config system);
# here unknown sections and malformed required sections fail loudly.
_TOP_LEVEL_KEYS = {
    "model", "operating-conditions", "feed", "reactions", "reaction-rates",
    "external-heat", "reactor", "solver-config",
    # reference particleModels reads numerical-method from "test-const"
    # (particleModels.py:165-184)
    "test-const",
    # rmt_tpu extensions: checkpoint/resume round-trip, differentiable
    # kinetic-constant overrides (named VARS scalars)
    "resume-state",
    "kinetic-overrides",
}
_OPERATING_CONDITION_KEYS = {
    "pressure", "temperature", "period", "process-type", "numerical-method",
}


def _validate_model_input(model_input: Mapping[str, Any]) -> None:
    """Typed-schema gate for the modelInput dict: unknown top-level keys
    and malformed required sections raise with the supported layout
    (solver-config keys are checked separately in _solver_options)."""
    if not isinstance(model_input, Mapping):
        raise TypeError("modelInput must be a dict-like mapping")
    if "model" not in model_input or not isinstance(model_input["model"], str):
        raise ValueError('modelInput["model"] must be a model-id string '
                         f"(one of {sorted(_MODEL_IDS)})")
    unknown = set(model_input) - _TOP_LEVEL_KEYS
    if unknown:
        raise ValueError(
            f"unknown modelInput key(s) {sorted(unknown)}; "
            f"supported: {sorted(_TOP_LEVEL_KEYS)}"
        )
    oc = model_input.get("operating-conditions", {})
    if not isinstance(oc, Mapping):
        raise TypeError('modelInput["operating-conditions"] must be a dict')
    unknown_oc = set(oc) - _OPERATING_CONDITION_KEYS
    if unknown_oc:
        raise ValueError(
            f"unknown operating-conditions key(s) {sorted(unknown_oc)}; "
            f"supported: {sorted(_OPERATING_CONDITION_KEYS)}"
        )
    feed = model_input.get("feed")
    if not isinstance(feed, Mapping) or not isinstance(
        feed.get("components"), Mapping
    ):
        raise ValueError(
            'modelInput["feed"]["components"] is required (a dict with a '
            '"shell" component list, reference rmt.py:52-57)'
        )
    rxn = model_input.get("reactions", {})
    if not isinstance(rxn, Mapping) or not all(
        isinstance(v, str) for v in rxn.values()
    ):
        raise ValueError(
            'modelInput["reactions"] must map reaction ids to reaction '
            'strings like "CO2 + 3H2 <=> CH3OH + H2O"'
        )
    rr = model_input.get("reaction-rates", {})
    if rr and (
        not isinstance(rr, Mapping)
        or not isinstance(rr.get("VARS", {}), Mapping)
        or not isinstance(rr.get("RATES", {}), Mapping)
    ):
        raise ValueError(
            'modelInput["reaction-rates"] must be {"VARS": {...}, '
            '"RATES": {...}} (the kinetics dict-program, '
            "reference rmtReaction.py:11-61)"
        )


def _check_components(model_input: Mapping[str, Any]) -> None:
    comps: list[str] = []
    fe_com = model_input["feed"]["components"]
    for key in ("shell", "tube", "medium"):
        if fe_com.get(key):
            comps.extend(fe_com[key])
    for c in dict.fromkeys(comps):
        species_index(c)  # raises UnknownComponentError on miss


def _solver_options(model_input: Mapping[str, Any]) -> dict[str, Any]:
    sc = model_input.get("solver-config", {})
    unknown = set(sc) - _SOLVER_CONFIG_KEYS
    if unknown:
        raise ValueError(
            f"unknown solver-config key(s) {sorted(unknown)}; "
            f"supported: {sorted(_SOLVER_CONFIG_KEYS)}"
        )
    root = sc.get("root", "default")
    if root not in _ROOT_METHODS:
        raise ValueError(
            f"unknown solver-config root {root!r}; supported: "
            f"{sorted(_ROOT_METHODS)} (all route to the damped-Newton/PTC "
            "solver -- scipy's fsolve/root/least_squares distinctions have "
            "no TPU analogue)"
        )
    ivp = sc.get("ivp", "default")
    if ivp not in _IVP_METHODS:
        raise ValueError(
            f"unknown solver-config ivp {ivp!r}; supported: "
            f"{sorted(_IVP_METHODS)} (the reference's stiff scipy methods "
            "LSODA/BDF/Radau all route to the jittable Radau IIA(5) "
            "integrator, 'RK45'/'dopri5' to the explicit Dopri5 path, "
            "'AM' to the fixed-step PreCorr3 stepper -- see MIGRATION.md)"
        )
    return {
        "ivp": ivp,
        "root": root,
        "mesh": sc.get("mesh", "normal"),
        "rtol": float(sc.get("rtol", _DEFAULT_RTOL)),
        "atol": float(sc.get("atol", _DEFAULT_ATOL)),
        "display": sc.get("display-result", "False") == "True",
    }


def _cache_key(model: str, spec: homo.HomoSpec, model_input, opts) -> tuple:
    return (
        model,
        spec.comp_list,
        spec.iso_thermal,
        tuple(model_input["reactions"].values()),
        _kinetics_fingerprint(model_input),
        tuple(sorted(model_input.get("kinetic-overrides", {}).keys())),
        spec.z_no,
        spec.t_no,
        spec.times_no,
        spec.z_out,
        opts["ivp"],
        opts["rtol"],
        opts["atol"],
        jax.config.jax_enable_x64,
    )


# ---------------------------------------------------------------------------
# N1
# ---------------------------------------------------------------------------

def _n1_runner(spec: homo.HomoSpec, opts):
    rhs = homo.make_n1_rhs(spec)
    rtol, atol = opts["rtol"], opts["atol"]

    def run(p):
        d = homo.feed_state(spec, p)
        y0 = homo.n1_initial_state(spec, p, d)
        ts = jnp.linspace(0.0, 1.0, spec.z_out + 1).astype(y0.dtype)
        if opts["ivp"] == "AM":
            ys = fixed.precorr3(
                lambda t, y: rhs(t, y, p, d), 0.0, 1.0, _SOLVER_SETTING["AM_n"], y0
            )
            stats = dopri5.Dopri5Stats(*(jnp.asarray(0, jnp.int32),) * 4)
            idxs = jnp.round(jnp.linspace(0, _SOLVER_SETTING["AM_n"], spec.z_out + 1)).astype(int)
            ys = ys[idxs]
        elif opts["ivp"] in ("RK45", "dopri5"):
            ys, stats = dopri5.odeint(
                lambda t, y: rhs(t, y, p, d), y0, ts, rtol=rtol, atol=atol
            )
        else:  # default / LSODA / BDF / Radau -> stiff Radau IIA(5)
            ys, stats = radau.odeint(
                lambda t, y: rhs(t, y, p, d), y0, ts, rtol=rtol, atol=atol
            )
        return ys.T, stats  # (varNo, z_out+1)

    return jax.jit(run)


def _run_n1(model_input, spec: homo.HomoSpec, opts):
    start = timer()
    p = homo.build_params(model_input)
    key = _cache_key("N1", spec, model_input, opts)
    runner = _jit_cache.get(key)
    if runner is None:
        runner = _n1_runner(spec, opts)
        _jit_cache[key] = runner
    ys, stats = runner(p)
    stats_d = _check_integration(stats, "N1")
    ys = np.asarray(ys)
    _check_finite(ys, "N1", opts["ivp"])

    comp_list = list(spec.comp_list)
    n_comp = spec.n_comp
    iso = spec.iso_thermal
    n_cols = spec.z_out + 1

    sp_coi0 = np.asarray(p["SpCoi0"])
    c_max = np.max(sp_coi0)
    Pf = float(p["P0"])
    Tf = float(p["T0"])

    conc_dl = ys[:n_comp]
    press_dl = ys[n_comp]
    temp_dl = ys[n_comp + 1] if not iso else np.zeros(n_cols)

    conc_re = conc_dl * c_max
    press_re = (press_dl * Pf).reshape(1, n_cols)
    temp_re = (temp_dl * Tf + Tf).reshape(1, n_cols)

    mo_fri = conc_re / np.sum(conc_re, axis=0)
    if not iso:
        data_ys_all = np.concatenate([mo_fri, press_re, temp_re], axis=0)
    else:
        data_ys_all = np.concatenate([mo_fri, press_re], axis=0)

    label_list = comp_list + ["Pressure"] + ([] if iso else ["Temperature"])
    data_xs = np.linspace(0.0, 1.0, n_cols)
    elapsed = roundNum(timer() - start)

    return [
        {
            "modelId": model_input["model"],
            "processType": ISO if iso else model_input["operating-conditions"]["process-type"],
            "successStatus": True,
            "computation-time": elapsed,
            "dataShape": data_xs.shape,
            "labelList": label_list,
            "indexList": [n_comp, n_comp, n_comp + 1],
            "dataTime": [],
            "dataXs": data_xs,
            "dataYCons1": conc_dl,
            "dataYCons2": conc_re,
            "dataYTemp1": temp_dl,
            "dataYTemp2": temp_re,
            "dataYs": data_ys_all,
            "solverStats": stats_d,
        }
    ]


# ---------------------------------------------------------------------------
# N2
# ---------------------------------------------------------------------------

def _n2_runner(spec: homo.HomoSpec, opts):
    rhs = homo.make_n2_rhs(spec)
    rtol, atol = opts["rtol"], opts["atol"]

    def run(p, y0, t_start):
        d = homo.feed_state(spec, p)
        ts = (
            t_start + p["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)
        ).astype(y0.dtype)
        if opts["ivp"] == "AM":
            n = _SOLVER_SETTING["AM_n"]

            def seg(y, tpair):
                ys = fixed.precorr3(
                    lambda t, y_: rhs(t, y_, p, d), tpair[0], tpair[1], n, y
                )
                return ys[-1], ys[-1]

            _, ys = jax.lax.scan(seg, y0, jnp.stack([ts[:-1], ts[1:]], axis=1))
            ys = jnp.concatenate([y0[None], ys], axis=0)
            stats = dopri5.Dopri5Stats(*(jnp.asarray(0, jnp.int32),) * 4)
        elif opts["ivp"] in ("RK45", "dopri5"):
            ys, stats = dopri5.odeint(
                lambda t, y: rhs(t, y, p, d), y0, ts, rtol=rtol, atol=atol
            )
        else:  # default / LSODA / BDF / Radau -> stiff Radau IIA(5)
            ys, stats = radau.odeint(
                lambda t, y: rhs(t, y, p, d), y0, ts, rtol=rtol, atol=atol
            )
        return ys, stats  # (tNo+1, varNo*zNo)

    return jax.jit(run)


def _run_n2(model_input, spec: homo.HomoSpec, opts):
    start = timer()
    p = homo.build_params(model_input)
    key = _cache_key("N2", spec, model_input, opts)
    runner = _jit_cache.get(key)
    if runner is None:
        runner = _n2_runner(spec, opts)
        _jit_cache[key] = runner

    # checkpoint/resume: the reference's dynamic models re-seed the IV from
    # the previous interval in memory only (pbHomoReactor.py:3684-3685);
    # here the raw integration state is a first-class artifact -- every run
    # returns a "checkpoint" and accepts one back via
    # modelInput["resume-state"] to continue where it stopped
    resume = model_input.get("resume-state")
    if resume is not None:
        if resume.get("model") != model_input["model"]:
            raise ValueError(
                f"resume-state is for model {resume.get('model')!r}, "
                f"not {model_input['model']!r}"
            )
        y_init = jnp.asarray(np.asarray(resume["state"], dtype=np.float64))
        expect = spec.var_no_n2 * spec.z_no
        if y_init.shape != (expect,):
            raise ValueError(
                f"resume-state has {y_init.shape} entries; this grid needs "
                f"({expect},)"
            )
        t_start = float(resume.get("t", 0.0))
    else:
        d0 = homo.feed_state(spec, p)
        y_init = homo.n2_initial_state(spec, p, d0)
        t_start = 0.0
    ys, stats = runner(p, y_init, jnp.asarray(t_start))
    stats_d = _check_integration(stats, "N2")
    ys = np.asarray(ys)
    _check_finite(ys, "N2", opts["ivp"])

    comp_list = list(spec.comp_list)
    n_comp = spec.n_comp
    iso = spec.iso_thermal
    z_no = spec.z_no
    var_no = spec.var_no_n2

    sp_coi0 = np.asarray(p["SpCoi0"])
    c_max = np.max(sp_coi0)
    Tf = float(p["T0"])
    op_t = float(p["opT"])
    t_bounds = t_start + op_t * np.linspace(0.0, 1.0, spec.t_no + 1)

    label_list = comp_list + ["Temperature"]
    data_xs = np.linspace(0.0, 1.0, z_no)

    data_pack = []
    for i in range(spec.t_no):
        reshaped = ys[i + 1].reshape(var_no, z_no)
        # QUIRK: dataYCons1 always drops the last row even in iso mode
        # (pbHomoReactor.py:3638)
        conc_dl = reshaped[:-1]
        temp_dl = reshaped[-1] if not iso else np.zeros(z_no)

        conc_all = reshaped[:-1] if not iso else reshaped
        conc_re = conc_all * c_max
        temp_re = (temp_dl * Tf + Tf).reshape(1, z_no)

        mo_fri = conc_re / np.sum(conc_re, axis=0)
        data_ys_all = np.concatenate([mo_fri, temp_re], axis=0)

        data_pack.append(
            {
                "modelId": model_input["model"],
                "processType": ISO if iso else model_input["operating-conditions"]["process-type"],
                "successStatus": True,
                "dataShape": np.array(t_bounds[i + 1]).shape,
                "labelList": label_list,
                "indexList": [n_comp, n_comp + 1, n_comp],
                "dataTime": t_bounds[i + 1],
                "dataXs": data_xs,
                "dataYCons1": conc_dl,
                "dataYCons2": conc_re,
                "dataYTemp1": temp_dl,
                "dataYTemp2": temp_re,
                "dataYs": data_ys_all,
            }
        )

    elapsed = roundNum(timer() - start)
    return {
        "computation-time": elapsed,
        "dataPack": data_pack,
        "solverStats": stats_d,
        "checkpoint": {
            "model": model_input["model"],
            "t": float(t_bounds[-1]),
            "state": ys[-1].copy(),
        },
    }


# ---------------------------------------------------------------------------
# M0/M4: plug-flow reactor
# ---------------------------------------------------------------------------

def _run_pf(model_input, opts):
    spec = pf.build_spec(model_input)
    p = pf.build_params(model_input)
    key = ("M0", spec.comp_list,
           tuple(model_input["reactions"].values()),
           _kinetics_fingerprint(model_input),
           opts["ivp"], opts["rtol"], opts["atol"], jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        rhs = pf.make_rhs(spec)

        def run(pp):
            y0 = pf.initial_state(spec, pp)
            ts = jnp.linspace(0.0, 1.0, spec.z_out).astype(y0.dtype) * pp["ReLe"]
            solver = dopri5.odeint if opts["ivp"] in ("RK45", "dopri5") else radau.odeint
            ys, stats = solver(
                lambda t, y: rhs(t, y, pp), y0, ts,
                rtol=opts["rtol"], atol=opts["atol"],
            )
            return ys.T, ts, stats

        runner = jax.jit(run)
        _jit_cache[key] = runner
    ys, ts, stats = runner(p)
    _check_integration(stats, "M0/M4")
    ys = np.asarray(ys)
    data_x = np.asarray(ts)

    label_list = list(spec.comp_list) + ["Temperature"]
    xy_list = [[data_x, row] for row in ys]
    data_list = [
        {"x": data_x, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Reactor Length (m)", "")
    return {"XYList": xy_list, "dataList": data_list}


# ---------------------------------------------------------------------------
# M1: steady packed-bed in molar-flow variables
# ---------------------------------------------------------------------------

def _run_m1(model_input, opts):
    spec = pb.build_spec(model_input)
    p = pb.build_params(model_input)
    key = ("M1", spec.comp_list,
           tuple(model_input["reactions"].values()),
           _kinetics_fingerprint(model_input),
           opts["ivp"], opts["rtol"], opts["atol"], jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        rhs = pb.make_m1_rhs(spec)

        def run(pp):
            y0 = pb.m1_initial_state(spec, pp)
            ts = jnp.linspace(0.0, 1.0, spec.z_out).astype(y0.dtype) * pp["ReLe"]
            solver = dopri5.odeint if opts["ivp"] in ("RK45", "dopri5") else radau.odeint
            ys, stats = solver(
                lambda t, y: rhs(t, y, pp), y0, ts,
                rtol=opts["rtol"], atol=opts["atol"],
            )
            return ys.T, ts, stats

        runner = jax.jit(run)
        _jit_cache[key] = runner
    ys, ts, stats = runner(p)
    _check_integration(stats, "M1")
    ys = np.asarray(ys)
    data_x = np.asarray(ts)
    n_comp = spec.n_comp

    # molar flowrates -> mole fractions (reference pbReactor.py:286-303)
    mo_fri = ys[:n_comp] / np.sum(ys[:n_comp], axis=0)
    data_ys_all = np.concatenate(
        [mo_fri, ys[n_comp:n_comp + 1], ys[n_comp + 1:n_comp + 2], ys[n_comp + 2:n_comp + 3]],
        axis=0,
    )
    ss_data_ys = np.concatenate([mo_fri, ys[n_comp + 1:n_comp + 2]], axis=0)

    label_list = list(spec.comp_list) + ["Flux", "Temperature", "Pressure"]
    xy_list = [[data_x, row] for row in data_ys_all]
    data_list = [
        {"x": data_x, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Reactor Length (m)", "")
    return {"dataYs": ss_data_ys, "XYList": xy_list, "dataList": data_list}


# ---------------------------------------------------------------------------
# M2: dynamic packed-bed in dimensional concentration variables
# ---------------------------------------------------------------------------

def _run_m2(model_input, opts, model_id="M2"):
    sc = model_input.get("solver-config", {})
    spec = pb.build_spec(
        model_input,
        z_no=int(sc.get("zNo", 100)),
        t_no=int(sc.get("tNo", 10)),
        times_no=int(sc.get("timesNo", 5)),
    )
    p = pb.build_params(model_input)
    key = (model_id, spec.comp_list, spec.z_no, spec.t_no,
           tuple(model_input["reactions"].values()),
           _kinetics_fingerprint(model_input),
           opts["rtol"], opts["atol"], jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        from ..ops.jacobian import colored_jacobian
        from ..solvers import stiff_ensemble

        if model_id == "M9":
            rhs = pb.make_m9_rhs(spec)
            rhs_frozen = pb.make_m9_rhs(spec, frozen_march_jac=True)
        else:
            rhs = pb.make_m2_rhs(spec)
            rhs_frozen = pb.make_m2_rhs(spec, frozen_pressure_jac=True)
        jac_c = colored_jacobian(rhs_frozen, spec.n_comp + 1, spec.z_no)

        def run(pp, y_init, t_start):
            y0 = y_init[None]  # B=1
            ts = (
                t_start
                + (pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1))
            ).astype(y0.dtype)
            fB = jax.vmap(lambda t, y: rhs(t, y, pp))
            jB = jax.vmap(lambda t, y: jac_c(t, y, pp))
            # attempt budget scales with the number of output intervals:
            # the reference integrates each interval with a fresh LSODA
            # budget (pbReactor.py per-interval re-seed), so a fixed
            # whole-run budget starves long operating periods
            # exact block-bidiagonal stage solves: at B=1 with
            # n = (compNo+1)*zNo = 700+ the dense Newton-Schulz
            # preconditioners are pure overhead (ops/block_solve)
            ys, stats = stiff_ensemble.odeint_ensemble(
                fB, y0, ts, rtol=opts["rtol"], atol=opts["atol"],
                jac=jB, batched=True,
                max_steps=max(1024, 256 * spec.t_no),
                block=(spec.n_comp + 1, spec.z_no),
            )
            return ys[:, 0, :], ts, stats

        runner = jax.jit(run)
        _jit_cache[key] = runner
    y_default = pb.m2_initial_state(spec, p)
    y_init, t_start = _resume_or(
        model_input, y_default, int(y_default.shape[0]), model_id
    )
    ys, ts, stats = runner(p, y_init, t_start)
    if int(stats.seg[0]) != spec.t_no:
        raise RuntimeError(
            f"{model_id}: lockstep integrator exhausted its attempt budget "
            f"at output segment {int(stats.seg[0])}/{spec.t_no}"
        )
    ys = np.asarray(ys)
    t_bounds = np.asarray(ts)

    n_comp = spec.n_comp
    z_no = spec.z_no
    data_xs = np.linspace(0, float(p["ReLe"]), z_no)
    label_list = list(spec.comp_list) + ["Temperature"]

    data_pack = []
    data_packtime = np.zeros((n_comp + 1, spec.t_no, z_no))
    for i in range(spec.t_no):
        Y = ys[i + 1].reshape(n_comp + 1, z_no)
        conc = Y[:n_comp]
        mo_fri = conc / np.sum(conc, axis=0)
        temp = Y[n_comp:n_comp + 1]
        data_ys_all = np.concatenate([mo_fri, temp], axis=0)
        data_pack.append({
            "successStatus": True,
            "dataTime": t_bounds[i + 1],
            "dataYCons": conc,
            "dataYTemp": temp,
            "dataYs": data_ys_all,
        })
        data_packtime[:, i, :] = data_ys_all

    # QUIRK: the reference returns only the XY series of the *last* state
    # variable over time (pbReactor.py:806-841); dataPack is an extension
    xy_list = [[data_xs, row] for row in data_packtime[-1]]
    labels_t = [f"{label_list[-1]} at t={t_bounds[t + 1]}" for t in range(spec.t_no)]
    data_list = [
        {"x": data_xs, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, labels_t)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Reactor Length (m)", "")
    return {
        "XYList": xy_list,
        "dataList": data_list,
        "dataPack": data_pack,
        "dataPacktime": data_packtime,
        "solverStats": _stats_dict(stats),
        "checkpoint": {
            "model": model_id,
            "t": float(t_bounds[-1]),
            "state": ys[-1].copy(),
        },
    }


# ---------------------------------------------------------------------------
# M3 (batch) and M5 (hetero steady, flow variables)
# ---------------------------------------------------------------------------

def _run_batch(model_input, opts):
    from ..models import batch

    spec = batch.build_spec(model_input)
    p = batch.build_params(model_input)
    key = ("M3", spec.comp_list, spec.iso_thermal,
           _kinetics_fingerprint(model_input),
           opts["rtol"], opts["atol"], jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        rhs = batch.make_rhs(spec)

        def run(pp):
            y0 = batch.initial_state(spec, pp)
            ts = (pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_out)).astype(y0.dtype)
            ys, stats = radau.odeint(
                lambda t, y: rhs(t, y, pp), y0, ts,
                rtol=opts["rtol"], atol=opts["atol"],
            )
            return ys.T, ts, stats

        runner = jax.jit(run)
        _jit_cache[key] = runner
    ys, ts, stats = runner(p)
    _check_integration(stats, "M3")
    ys = np.asarray(ys)
    data_x = np.asarray(ts)
    label_list = list(spec.comp_list) + ([] if spec.iso_thermal else ["Temperature"])
    xy_list = [[data_x, row] for row in ys]
    data_list = [
        {"x": data_x, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Time (s)", "Concentration (mol/m^3)")
    return {"XYList": xy_list, "dataList": data_list}


def _run_m5(model_input, opts):
    from ..models import hetero

    spec = hetero.build_spec(model_input)
    p = hetero.build_params(model_input)
    key = ("M5", spec.comp_list, tuple(model_input["reactions"].values()),
           opts["rtol"], opts["atol"], jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        rhs = hetero.make_m5_rhs(spec)

        def run(pp):
            y0 = hetero.m5_initial_state(spec, pp)
            ts = jnp.linspace(0.0, 1.0, spec.z_out).astype(y0.dtype) * pp["ReLe"]
            ys, stats = radau.odeint(
                lambda t, y: rhs(t, y, pp), y0, ts,
                rtol=opts["rtol"], atol=opts["atol"],
            )
            return ys.T, ts, stats

        runner = jax.jit(run)
        _jit_cache[key] = runner
    ys, ts, stats = runner(p)
    _check_integration(stats, "M5")
    ys = np.asarray(ys)
    data_x = np.asarray(ts)
    label_list = list(spec.comp_list) + ["Flux", "Temperature", "Pressure"]
    xy_list = [[data_x, row] for row in ys]
    data_list = [
        {"x": data_x, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Reactor Length (m)", "")
    return {"XYList": xy_list, "dataList": data_list}


# ---------------------------------------------------------------------------
# M7/M8: concentration-based steady packed-bed models
# ---------------------------------------------------------------------------

def _run_m_conc_steady(model_input, opts, model_id):
    spec = pb.build_spec(model_input)
    p = pb.build_params(model_input)
    key = (model_id, spec.comp_list,
           tuple(model_input["reactions"].values()),
           _kinetics_fingerprint(model_input),
           opts["ivp"], opts["rtol"], opts["atol"], jax.config.jax_enable_x64)
    n_out = 30 if model_id == "M7" else 25    # solverSetting M9.zNo / S3.timesNo
    runner = _jit_cache.get(key)
    if runner is None:
        if model_id == "M7":
            rhs = pb.make_m3_rhs(spec)
            init = pb.m3_initial_state
        else:
            rhs = pb.make_m4_rhs(spec)
            init = pb.m4_initial_state

        def run(pp):
            y0 = init(spec, pp)
            ts = jnp.linspace(0.0, 1.0, n_out).astype(y0.dtype) * pp["ReLe"]
            solver = dopri5.odeint if opts["ivp"] in ("RK45", "dopri5") else radau.odeint
            ys, stats = solver(
                lambda t, y: rhs(t, y, pp), y0, ts,
                rtol=opts["rtol"], atol=opts["atol"],
            )
            return ys.T, ts, stats

        runner = jax.jit(run)
        _jit_cache[key] = runner
    ys, ts, stats = runner(p)
    _check_integration(stats, model_id)
    ys = np.asarray(ys)
    data_x = np.asarray(ts)
    n_comp = spec.n_comp

    mo_fri = ys[:n_comp] / np.sum(ys[:n_comp], axis=0)
    data_ys = np.concatenate([mo_fri, ys[n_comp:n_comp + 1]], axis=0)
    label_list = list(spec.comp_list) + ["Temperature", "Pressure"]
    if model_id == "M8":
        label_list.append("Velocity")
    xy_list = [[data_x, row] for row in data_ys]
    data_list = [
        {"x": data_x, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Reactor Length (m)", "")
    return {"dataYs": data_ys, "XYList": xy_list, "dataList": data_list}


# ---------------------------------------------------------------------------
# T1/T2: single catalyst-particle diffusion-reaction
# ---------------------------------------------------------------------------

def _particle_sort(spec, ys_reshaped, p):
    n_comp = spec.n_comp
    c_max = float(np.max(np.asarray(p["SpCoi0"])))
    Tf = float(p["T0"])
    iso = spec.iso_thermal
    conc_dl = ys_reshaped[:-1] if not iso else ys_reshaped
    temp_dl = (
        ys_reshaped[-1:].reshape(1, spec.r_no)
        if not iso
        else np.zeros((1, spec.r_no))
    )
    conc_re = conc_dl * c_max
    temp_re = temp_dl * Tf + Tf
    mo_fri = conc_re / np.sum(conc_re, axis=0)
    return conc_dl, conc_re, mo_fri, temp_dl, temp_re


def _run_t1(model_input, opts):
    # T1 honors the reference's LSODA default tolerances unless the user
    # overrides them: the model's unscaled reaction-term quirk
    # (ops/particle_fd.py) makes the early transient explosively unstable
    # (autocatalytic modes with Re(lambda) ~ +1e12), and resolving it at
    # tight tolerance stalls any integrator -- the reference only ever runs
    # it at rtol=1e-3/atol=1e-6 (scipy defaults)
    sc = model_input.get("solver-config", {})
    opts = dict(opts)
    opts["rtol"] = float(sc.get("rtol", 1e-3))
    opts["atol"] = float(sc.get("atol", 1e-6))
    # radial discretization: "fdm" (default) or "oc" (reference
    # test-const numerical-method, particleModels.py:165-184; its OC
    # branch crashes -- models.particle.make_t1_rhs_oc documents the
    # reconstruction)
    method = (
        model_input.get("test-const", {}).get("numerical-method")
        or model_input.get("operating-conditions", {}).get("numerical-method")
        or "fdm"
    )
    spec = particle.build_spec(model_input)
    p = particle.build_params(model_input)
    key = ("T1", spec.comp_list, spec.iso_thermal, spec.r_no, spec.t_no,
           method, _kinetics_fingerprint(model_input),
           opts["rtol"], opts["atol"], jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        # OC drives the FDM branch's (raw-source) equations on the OC
        # basis: the reference OC branch's scaled sources trap the DME
        # trajectory in the clamped near-zero kinetics regime (see
        # make_t1_rhs_oc)
        rhs = (
            particle.make_t1_rhs_oc(spec, scaled_sources=False,
                                    clamp_interface=True)
            if method == "oc" else particle.make_t1_rhs(spec)
        )

        def run(pp, y_init, t_start):
            ts = (
                t_start
                + (pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1))
            ).astype(y_init.dtype)
            ys, stats = radau.odeint(
                lambda t, y: rhs(t, y, pp), y_init, ts,
                rtol=opts["rtol"], atol=opts["atol"],
            )
            return ys, ts, stats

        runner = jax.jit(run)
        _jit_cache[key] = runner
    y_default = particle.t1_initial_state(spec, p)
    y_init, t_start = _resume_or(
        model_input, y_default, int(y_default.shape[0]), "T1"
    )
    ys, ts, stats = runner(p, y_init, t_start)
    _check_integration(stats, "T1")
    ys = np.asarray(ys)
    t_bounds = np.asarray(ts)

    data_rs = np.linspace(0.0, 1.0, spec.r_no)
    label_list = list(spec.comp_list) + ["Temperature"]
    data_pack = []
    for i in range(spec.t_no):
        resh = ys[i + 1].reshape(spec.n_layer, spec.r_no)
        if method == "oc":
            # the OC surface row is dead storage; report the recomputed
            # algebraic interface value
            resh = np.asarray(particle.t1_oc_surface_values(spec, p, ys[i + 1]))
        conc_dl, conc_re, mo_fri, temp_dl, temp_re = _particle_sort(spec, resh, p)
        data_pack.append({
            "successStatus": True,
            "dataTime": t_bounds[i + 1],
            "dataYCo_DiLe": conc_dl,
            "dataYCo": conc_re,
            "dataYMoFr": mo_fri,
            "dataYT_DiLe": temp_dl,
            "dataYT": temp_re,
            "dataY": np.concatenate([conc_re, temp_re], axis=0),
        })
    xy_list = [[data_rs, row] for row in data_pack[-1]["dataY"]]
    data_list = [
        {"x": data_rs, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Dimensionless Particle Radius", "")
    return {
        "XYList": xy_list,
        "dataList": data_list,
        "dataPack": data_pack,
        "solverStats": _stats_dict(stats),
        "checkpoint": {
            "model": "T1",
            "t": float(t_bounds[-1]),
            "state": ys[-1].copy(),
        },
    }


def _run_t2(model_input, opts):
    from ..solvers import newton

    # radial discretization: "fdm" (default) or "oc" (reference reads
    # solver-config numerical-method for T2, particleModels.py:1126)
    method = (
        model_input.get("solver-config", {}).get("numerical-method")
        or model_input.get("test-const", {}).get("numerical-method")
        or model_input.get("operating-conditions", {}).get("numerical-method")
        or "fdm"
    )
    # "fem" = OCFE: NuEl 4-point Lobatto elements over the radius
    # (reference particleModels.py:1270-1282; NuEl default solSetting.py:101)
    nu_el = int(model_input.get("solver-config", {}).get("NuEl", 6))
    if method == "fem":
        spec = particle.build_spec(model_input, r_no=3 * nu_el + 1)
    else:
        spec = particle.build_spec(model_input)
    p = particle.build_params(model_input)
    key = ("T2", spec.comp_list, spec.iso_thermal, spec.r_no, method, nu_el,
           _kinetics_fingerprint(model_input), jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        res_fn = (
            particle.make_t2_residual_oc(spec) if method == "oc"
            else particle.make_t2_residual_ocfe(spec, nu_el) if method == "fem"
            else particle.make_t2_residual_fn(spec)
        )

        def run(pp):
            d = particle.t2_derived(spec, pp)
            y0 = particle.t2_initial_state(spec, pp)
            sol = newton.root(lambda y: res_fn(y, pp, d), y0, max_iter=80)
            return sol.x, sol.converged, sol.residual_norm

        runner = jax.jit(run)
        _jit_cache[key] = runner
    x, converged, res_norm = runner(p)
    if not bool(converged):
        raise RuntimeError(f"T2 root solve did not converge (|F|={float(res_norm):.2e})")

    resh = np.asarray(x).reshape(spec.n_layer, spec.r_no)
    conc_dl, conc_re, mo_fri, temp_dl, temp_re = _particle_sort(spec, resh, p)
    # radial output grid: the discretization's own nodes (reference
    # particleModels.py:1255-1282 -- linspace/Xc/xi per method)
    if method == "oc":
        from ..ops import oc_particle as _ocp

        data_rs = np.asarray(_ocp.oc_operator()["Xc"], dtype=np.float64)
    elif method == "fem":
        from ..ops import ocfe as _ocfe

        data_rs = np.asarray(_ocfe.ocfe_basis(nu_el)["xi"], dtype=np.float64)
    else:
        data_rs = np.linspace(0.0, 1.0, spec.r_no)
    label_list = list(spec.comp_list) + ["Temperature"]
    data_y = np.concatenate([conc_re, temp_re], axis=0)
    xy_list = [[data_rs, row] for row in data_y]
    data_list = [
        {"x": data_rs, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    data_pack = [{
        "successStatus": True,
        "dataYCo_DiLe": conc_dl,
        "dataYCo": conc_re,
        "dataYMoFr": mo_fri,
        "dataYT_DiLe": temp_dl,
        "dataYT": temp_re,
        "dataY": data_y,
    }]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Dimensionless Particle Radius", "")
    return {"XYList": xy_list, "dataList": data_list, "dataPack": data_pack}


def _run_t3(model_input, opts):
    """Steady axial-dispersion pseudo-homogeneous model (reference:
    examples/homoModels.py runT1; registered as T3Init in rmtCore.py:440 but
    unreachable through the reference dispatcher -- routed here).

    Solved by pseudo-transient continuation (Radau to a large pseudo-time)
    followed by a damped-Newton polish; the reference's fsolve from the
    0.5/0.25 flat guess diverges for strongly exothermic cases.
    """
    from ..ops import stencils as _st
    from ..solvers import newton, radau

    sc = model_input.get("solver-config", {})
    mesh_mode = sc.get("mesh", "normal")
    if mesh_mode != "normal":
        # refined two-zone mesh (reference FiDiMeshGenerator path,
        # homoModels.py:149-161; zMesh settings from solverSetting T1)
        mesh = _st.two_zone_mesh((15, 10), 1.0, 30, 1.001)
        z_no = int(mesh["n_nodes"])
    else:
        mesh = None
        z_no = int(sc.get("zNo", 10))
    spec = homo.build_spec(model_input, z_no=z_no)
    p = homo.t3_params(model_input)
    key = ("T3", spec.comp_list, spec.iso_thermal, spec.z_no, mesh_mode,
           _kinetics_fingerprint(model_input), jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        res_fn = homo.make_t3_residual(spec, mesh=mesh)

        def run(pp):
            d = homo.t3_feed(spec, pp)
            c_in = (pp["SpCoi0"] / d["Cmax"])[:, None] * jnp.ones((1, spec.z_no))
            rows = [c_in]
            if not spec.iso_thermal:
                rows.append(jnp.zeros((1, spec.z_no), c_in.dtype))
            y0 = jnp.concatenate(rows, axis=0).reshape(-1)
            # pseudo-transient continuation to the attractor of F
            ys, _ = radau.odeint(
                lambda t, y: res_fn(y, pp, d),
                y0, jnp.asarray([0.0, 20.0], y0.dtype), rtol=1e-6, atol=1e-9,
            )
            sol = newton.root(lambda y: res_fn(y, pp, d), ys[-1],
                              max_iter=50, tol=1e-8)
            return sol.x, sol.converged, sol.residual_norm

        runner = jax.jit(run)
        _jit_cache[key] = runner
    x, converged, res_norm = runner(p)
    if not bool(converged):
        raise RuntimeError(f"T3 root solve did not converge (|F|={float(res_norm):.2e})")

    n_layer = spec.n_comp + (0 if spec.iso_thermal else 1)
    resh = np.asarray(x).reshape(n_layer, spec.z_no)
    c_dl = resh[: spec.n_comp]
    theta = resh[spec.n_comp] if not spec.iso_thermal else np.zeros(spec.z_no)
    c_max = float(np.max(np.asarray(model_input["feed"]["concentration"])))
    conc_re = c_dl * c_max                              # MAX-mode real values
    temp_re = (1.0 + theta) * float(model_input["operating-conditions"]["temperature"])
    mo_fri = conc_re / np.sum(conc_re, axis=0, keepdims=True)
    data_xs = (
        np.asarray(mesh["xs"]) if mesh is not None
        else np.linspace(0.0, 1.0, spec.z_no)
    )
    label_list = list(spec.comp_list) + ["Temperature"]
    data_y = np.concatenate([mo_fri, temp_re[None]], axis=0)
    xy_list = [[data_xs, row] for row in data_y]
    data_list = [
        {"x": data_xs, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Reactor Length (m)", "Concentration (mol/m^3)")
    return {"dataYs": data_y, "XYList": xy_list, "dataList": data_list}


def _run_m14(model_input, opts):
    """Steady heterogeneous packed bed with a lumped catalyst phase
    (reference: pbReactor.runM9 via rmtCore.M14Init, which chains an runM3
    result as the initial guess and a rampList kinetics continuation).

    Solved on a row-scaled residual (hetero.m14_row_scales) by
    pseudo-transient continuation + damped Newton from the feed profile;
    the raw system mixes O(1) and O(1e3) rows and stalls both the
    reference's fsolve and plain Newton."""
    from ..models import hetero
    from ..ops import stencils as _st

    sc = model_input.get("solver-config", {})
    mesh_mode = sc.get("mesh", "normal")
    if mesh_mode != "normal":
        # refined two-zone mesh (reference FiDiMeshGenerator path; zMesh
        # settings from solverSetting M9, solSetting.py:56-62)
        mesh = _st.two_zone_mesh((15, 10), 1.0, 30, 1.001)
        z_no = int(mesh["n_nodes"])
    else:
        mesh = None
        z_no = int(sc.get("zNo", 30))
    spec = hetero.m14_build_spec(model_input, z_no=z_no)
    if spec.iso_thermal:
        # the reference's iso-thermal branch pins T* = 0 but keeps the
        # temperature unknowns in the root system (pbReactor.py:8101-8104),
        # leaving them unconstrained -- a singular Jacobian for any root
        # solver. Refuse instead of silently solving the wrong system.
        raise NotImplementedError(
            "M14 iso-thermal is degenerate in the reference formulation "
            "(temperature unknowns decouple); use process-type "
            "'non-iso-thermal'"
        )
    p = hetero.m14_params(model_input)
    # rampList kinetics continuation (reference solSetting.py:62,
    # pbReactor.py:7615-7643: solve at each ramp in turn, re-seeding from
    # the previous solution; default [1] = a single full-kinetics solve).
    # PTC from the feed profile handles the first ramp; later ramps start
    # from the previous converged state and only need the Newton polish.
    ramp_list = tuple(
        float(r) for r in model_input.get("solver-config", {}).get(
            "rampList", [1.0]
        )
    )
    key = ("M14", spec.comp_list, spec.iso_thermal, spec.z_no, ramp_list,
           mesh_mode, _kinetics_fingerprint(model_input),
           jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        runner = jax.jit(
            hetero.make_m14_runner(spec, mesh=mesh, ramp_list=ramp_list)
        )
        _jit_cache[key] = runner
    x, converged, res_norm = runner(p)
    if not bool(converged):
        raise RuntimeError(f"M14 root solve did not converge (|F|={float(res_norm):.2e})")

    resh = np.asarray(x).reshape(spec.n_comp + 1, 2, spec.z_no)
    c_max = float(np.max(np.asarray(model_input["feed"]["concentration"])))
    T0 = float(model_input["operating-conditions"]["temperature"])
    conc_gas = resh[: spec.n_comp, 0] * c_max
    conc_sol = resh[: spec.n_comp, 1] * c_max
    temp_gas = (1.0 + resh[spec.n_comp, 0]) * T0
    temp_sol = (1.0 + resh[spec.n_comp, 1]) * T0
    mo_fri = conc_gas / np.sum(conc_gas, axis=0, keepdims=True)
    data_xs = (
        np.asarray(mesh["xs"]) if mesh is not None
        else np.linspace(0.0, 1.0, spec.z_no)
    )
    label_list = (list(spec.comp_list) + ["Gas Temp"]
                  + list(spec.comp_list) + ["Solid Temp"])
    data_y = np.concatenate([mo_fri, temp_gas[None], conc_sol, temp_sol[None]], axis=0)
    xy_list = [[data_xs, row] for row in data_y]
    data_list = [
        {"x": data_xs, "y": xy[1], "leg": leg} for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Reactor Length (m)", "")
    return {"dataYs": data_y, "XYList": xy_list, "dataList": data_list,
            "dataPack": [{
                "successStatus": True,
                "dataYCoGas": conc_gas, "dataYCoSolid": conc_sol,
                "dataYTempGas": temp_gas, "dataYTempSolid": temp_sol,
            }]}


def _hetero_dyn_tols(model_input, opts):
    """Tolerance defaults for the coupled dynamic heterogeneous models
    (M10-M12): their product/near-zero concentration components sit at
    ~1e-12..1e-30 after the violent seed transient, and a tight atol makes
    the step controller reject forever on their noise. rtol 1e-5 /
    atol 1e-6 integrates the full operating period in a few hundred steps
    (still far tighter than the reference's LSODA rtol=1e-3 default);
    explicit solver-config values win."""
    sc = model_input.get("solver-config", {})
    rtol = float(sc["rtol"]) if "rtol" in sc else 1e-5
    atol = float(sc["atol"]) if "atol" in sc else 1e-6
    return rtol, atol


def _resume_or(model_input, default_y0, expect_len, model_id):
    """Initial-state injection for the dynamic hetero runners: accepts the
    same {"model", "t", "state"} checkpoint dicts the N2 runner emits, so
    transients can be continued or started from a physical state instead
    of the reference's 1e-6 seed (whose near-zero kinetics regime is
    singular for the OC-particle models)."""
    resume = model_input.get("resume-state")
    if resume is None:
        return default_y0, 0.0
    if resume.get("model") not in (None, model_id):
        raise ValueError(
            f"resume-state is for model {resume.get('model')!r}, not {model_id!r}"
        )
    y = jnp.asarray(np.asarray(resume["state"], dtype=np.float64)).reshape(-1)
    if y.shape[0] != expect_len:
        raise ValueError(
            f"resume-state has {y.shape[0]} entries; this grid needs {expect_len}"
        )
    return y, float(resume.get("t", 0.0))


def _run_m11(model_input, opts):
    """Dynamic heterogeneous packed bed with the particle interior carried
    in the ODE state (reference: pbReactor.runM7 via rmtCore.M11Init).
    One stiff MoL system over (noLayer, rNo+1, zNo) -- gas row + particle
    rows -- integrated across the tNo output intervals in a single
    multi-segment Radau run (the reference's per-interval re-seed,
    pbReactor.py:4302, carries the state identically). The Newton matrices
    use the two-phase colored Jacobian: 3 colors per gas variable + 1 per
    solid (layer, r) variable instead of a dense sweep."""
    from ..models import hetero_dyn
    from ..ops import jacobian as jac_ops

    from ..ops import stencils as _st

    sc = model_input.get("solver-config", {})
    mesh_mode = sc.get("mesh", "normal")
    if mesh_mode != "normal":
        # refined two-zone mesh, honored by the reference's runM7
        # (pbReactor.py:3820-3928, stencil branches :5148-5364)
        zmesh = _st.two_zone_mesh((15, 10), 1.0, 30, 1.001)
        z_no_eff = int(zmesh["n_nodes"])
    else:
        zmesh = None
        z_no_eff = int(sc.get("zNo", 10))  # solverSetting T1.zNo
    spec = hetero_dyn.m13_build_spec(
        model_input,
        z_no=z_no_eff,
        r_no=int(sc.get("rNo", 7)),       # T1.rNo.fdm
        t_no=int(sc.get("tNo", 5)),       # T1.tNo
    )
    p = hetero_dyn.m13_params(model_input)
    rtol, atol = _hetero_dyn_tols(model_input, opts)
    key = ("M11", spec.comp_list, spec.z_no, spec.r_no, spec.t_no, mesh_mode,
           tuple(model_input["reactions"].values()),
           _kinetics_fingerprint(model_input),
           rtol, atol, jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        rhs = hetero_dyn.make_m11_rhs(spec, mesh=zmesh)
        coloring = jac_ops.two_phase_coloring(
            spec.n_layer, spec.r_no + 1, spec.z_no
        )

        def run(pp, y0, t_start):
            d = hetero_dyn.m13_feed(spec, pp)
            ts_grid = (
                t_start + pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)
            ).astype(y0.dtype)
            jac = jac_ops.colored_jacobian_from(
                lambda t, y: rhs(t, y, pp, d), coloring
            )
            ys, stats = radau.odeint(
                rhs, y0, ts_grid, rtol=rtol, atol=atol,
                args=(pp, d), jac=jac,
            )
            return ys[1:], stats, ts_grid

        runner = jax.jit(run)
        _jit_cache[key] = runner

    start = timer()
    y_init, t_start = _resume_or(
        model_input, hetero_dyn.m11_initial_state(spec, p),
        spec.n_layer * (spec.r_no + 1) * spec.z_no, "M11",
    )
    ys_t, stats, ts_grid = runner(p, y_init, jnp.asarray(t_start))
    _check_integration(stats, "M11")

    ys_t = np.asarray(ys_t)
    t_bounds = np.asarray(ts_grid)
    n_comp, z_no = spec.n_comp, spec.z_no
    data_xs = (np.asarray(zmesh["xs"]) if zmesh is not None
               else np.linspace(0.0, 1.0, z_no))
    label_list = list(spec.comp_list) + ["Temperature"]

    data_pack = []
    for i in range(spec.t_no):
        Y = ys_t[i].reshape(spec.n_layer, spec.r_no + 1, z_no)
        conc_gas = Y[:n_comp, 0, :]
        temp_gas = Y[n_comp, 0, :][None]
        mo_fri = conc_gas / np.sum(conc_gas, axis=0)
        data_ys = np.concatenate([mo_fri, temp_gas], axis=0)
        data_pack.append({
            "successStatus": True,
            "dataTime": t_bounds[i + 1],
            "dataYCon": conc_gas,
            "dataYTemp": temp_gas,
            "dataYs": data_ys,
            # solid phase (dimensionless, radial storage order: row 0 =
            # gas-solid interface, like the reference's dataYs1SolidPhase)
            "dataYCons": Y[:n_comp, 1:, :],
            "dataYTemps": Y[n_comp, 1:, :],
        })

    xy_list = [[data_xs, row] for row in data_pack[-1]["dataYs"]]
    data_list = [
        {"x": data_xs, "y": xy[1], "leg": leg}
        for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Dimensionless Reactor Length", "")
    elapsed = roundNum(timer() - start)
    return {
        "XYList": xy_list,
        "dataList": data_list,
        "dataPack": data_pack,
        "computation-time": elapsed,
        "solverStats": _stats_dict(stats),
        "checkpoint": {
            "model": model_input["model"],
            "t": float(t_bounds[-1]),
            "state": ys_t[-1].copy(),
        },
    }


def _run_m10(model_input, opts):
    """Dynamic heterogeneous packed bed in real units with an OC particle
    (reference: pbReactor.runM6 via rmtCore.M10Init -- whose own RHS
    cannot run; see models.hetero_dyn.make_m10_rhs for the documented
    salvage). Reference defaults: zNo=100, tNo=10 (solverSetting S2)."""
    from ..models import hetero_dyn
    from ..ops import jacobian as jac_ops

    sc = model_input.get("solver-config", {})
    spec = hetero_dyn.m13_build_spec(
        model_input,
        z_no=int(sc.get("zNo", 100)),   # solverSetting S2.zNo
        r_no=7,                         # S2.rNo -- the OC basis size
        t_no=int(sc.get("tNo", 10)),    # S2.tNo
    )
    p = hetero_dyn.m10_params(model_input)
    rtol, atol = _hetero_dyn_tols(model_input, opts)
    key = ("M10", spec.comp_list, spec.z_no, spec.r_no, spec.t_no,
           tuple(model_input["reactions"].values()),
           _kinetics_fingerprint(model_input),
           rtol, atol, jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        rhs = hetero_dyn.make_m10_rhs(spec, clamp_interface=True)
        coloring = jac_ops.two_phase_coloring(
            spec.n_layer, spec.r_no + 1, spec.z_no
        )

        def run(pp, y0, t_start):
            ts_grid = (
                t_start + pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)
            ).astype(y0.dtype)
            jac = jac_ops.colored_jacobian_from(
                lambda t, y: rhs(t, y, pp), coloring
            )
            ys, stats = radau.odeint(
                rhs, y0, ts_grid, rtol=rtol, atol=atol,
                args=(pp,), jac=jac,
            )
            return ys[1:], stats, ts_grid

        runner = jax.jit(run)
        _jit_cache[key] = runner

    start = timer()
    y_init, t_start = _resume_or(
        model_input, hetero_dyn.m10_initial_state(spec, p),
        spec.n_layer * (spec.r_no + 1) * spec.z_no, "M10",
    )
    ys_t, stats, ts_grid = runner(p, y_init, jnp.asarray(t_start))
    _check_integration(stats, "M10")

    ys_t = np.asarray(ys_t)
    t_bounds = np.asarray(ts_grid)
    n_comp, z_no = spec.n_comp, spec.z_no
    data_xs = np.linspace(0.0, float(p["ReLe"]), z_no)
    label_list = list(spec.comp_list) + ["Temperature"]

    data_pack = []
    for i in range(spec.t_no):
        Y = ys_t[i].reshape(spec.n_layer, spec.r_no + 1, z_no)
        conc_gas = Y[:n_comp, 0, :]                  # [kmol/m^3]
        temp_gas = Y[n_comp, 0, :][None]             # [K]
        mo_fri = conc_gas / np.sum(conc_gas, axis=0)
        data_ys = np.concatenate([mo_fri, temp_gas], axis=0)
        data_pack.append({
            "successStatus": True,
            "dataTime": t_bounds[i + 1],
            "dataYCon": conc_gas,
            "dataYTemp": temp_gas,
            "dataYs": data_ys,
            # particle profiles, OC points center-first (real units)
            "dataYCons": Y[:n_comp, 1:, :],
            "dataYTemps": Y[n_comp, 1:, :],
        })

    xy_list = [[data_xs, row] for row in data_pack[-1]["dataYs"]]
    data_list = [
        {"x": data_xs, "y": xy[1], "leg": leg}
        for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Reactor Length (m)", "")
    elapsed = roundNum(timer() - start)
    return {
        "XYList": xy_list,
        "dataList": data_list,
        "dataPack": data_pack,
        "computation-time": elapsed,
        "solverStats": _stats_dict(stats),
        "checkpoint": {
            "model": model_input["model"],
            "t": float(t_bounds[-1]),
            "state": ys_t[-1].copy(),
        },
    }


def _run_m12(model_input, opts):
    """Dynamic heterogeneous packed bed with an orthogonal-collocation
    particle and a static (algebraically-updated) gas-solid interface
    (reference: pbReactor.runM8 via rmtCore.M12Init -- whose own RHS
    cannot run; see models.hetero_dyn.make_m12_rhs for the documented
    salvage). Same integration scheme as M11; solid rows are the OC
    points center-first, so rNo is pinned to the 7-point basis."""
    from ..models import hetero_dyn
    from ..ops import jacobian as jac_ops

    from ..ops import stencils as _st

    sc = model_input.get("solver-config", {})
    mesh_mode = sc.get("mesh", "normal")
    if mesh_mode != "normal":
        # refined two-zone mesh, honored by the reference's runM8
        # (pbReactor.py:5511-5600)
        zmesh = _st.two_zone_mesh((15, 10), 1.0, 30, 1.001)
        z_no_eff = int(zmesh["n_nodes"])
    else:
        zmesh = None
        z_no_eff = int(sc.get("zNo", 10))
    spec = hetero_dyn.m13_build_spec(
        model_input,
        z_no=z_no_eff,
        r_no=7,                        # T1.rNo.oc -- the OC basis size
        t_no=int(sc.get("tNo", 5)),
    )
    p = hetero_dyn.m13_params(model_input)
    rtol, atol = _hetero_dyn_tols(model_input, opts)
    key = ("M12", spec.comp_list, spec.z_no, spec.r_no, spec.t_no, mesh_mode,
           tuple(model_input["reactions"].values()),
           _kinetics_fingerprint(model_input),
           rtol, atol, jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        rhs = hetero_dyn.make_m12_rhs(spec, clamp_interface=True, mesh=zmesh)
        coloring = jac_ops.two_phase_coloring(
            spec.n_layer, spec.r_no + 1, spec.z_no
        )

        def run(pp, y0, t_start):
            d = hetero_dyn.m13_feed(spec, pp)
            ts_grid = (
                t_start + pp["opT"] * jnp.linspace(0.0, 1.0, spec.t_no + 1)
            ).astype(y0.dtype)
            jac = jac_ops.colored_jacobian_from(
                lambda t, y: rhs(t, y, pp, d), coloring
            )
            ys, stats = radau.odeint(
                rhs, y0, ts_grid, rtol=rtol, atol=atol,
                args=(pp, d), jac=jac,
            )
            surf = jax.vmap(
                lambda y: hetero_dyn.m12_surface_values(spec, pp, d, y)
            )(ys[1:])
            return ys[1:], surf, stats, ts_grid

        runner = jax.jit(run)
        _jit_cache[key] = runner

    start = timer()
    y_init, t_start = _resume_or(
        model_input, hetero_dyn.m11_initial_state(spec, p),
        spec.n_layer * (spec.r_no + 1) * spec.z_no, "M12",
    )
    ys_t, (cs_hat_t, ts_hat_t), stats, ts_grid = runner(
        p, y_init, jnp.asarray(t_start)
    )
    _check_integration(stats, "M12")

    ys_t = np.asarray(ys_t)
    cs_hat_t = np.asarray(cs_hat_t)
    ts_hat_t = np.asarray(ts_hat_t)
    t_bounds = np.asarray(ts_grid)
    n_comp, z_no = spec.n_comp, spec.z_no
    data_xs = (np.asarray(zmesh["xs"]) if zmesh is not None
               else np.linspace(0.0, 1.0, z_no))
    label_list = list(spec.comp_list) + ["Temperature"]

    data_pack = []
    for i in range(spec.t_no):
        Y = ys_t[i].reshape(spec.n_layer, spec.r_no + 1, z_no)
        conc_gas = Y[:n_comp, 0, :]
        temp_gas = Y[n_comp, 0, :][None]
        mo_fri = conc_gas / np.sum(conc_gas, axis=0)
        data_ys = np.concatenate([mo_fri, temp_gas], axis=0)
        # solid profiles with the dead surface-storage row replaced by the
        # recomputed algebraic interface value (OC order, center-first)
        sol_c = cs_hat_t[i]
        sol_t = ts_hat_t[i]
        data_pack.append({
            "successStatus": True,
            "dataTime": t_bounds[i + 1],
            "dataYCon": conc_gas,
            "dataYTemp": temp_gas,
            "dataYs": data_ys,
            "dataYCons": sol_c,
            "dataYTemps": sol_t,
        })

    xy_list = [[data_xs, row] for row in data_pack[-1]["dataYs"]]
    data_list = [
        {"x": data_xs, "y": xy[1], "leg": leg}
        for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Dimensionless Reactor Length", "")
    elapsed = roundNum(timer() - start)
    return {
        "XYList": xy_list,
        "dataList": data_list,
        "dataPack": data_pack,
        "computation-time": elapsed,
        "solverStats": _stats_dict(stats),
        "checkpoint": {
            "model": model_input["model"],
            "t": float(t_bounds[-1]),
            "state": ys_t[-1].copy(),
        },
    }


def _run_m13(model_input, opts):
    """Dynamic heterogeneous packed bed by operator splitting (reference:
    pbHeterReactor.runM2 via rmtCore.M13Init). Per interval: gas MoL phase
    under Radau with the previous interval's solid-surface values, then the
    per-node particle BVP by vmapped damped Newton with the previous
    interval's gas bulk values (the reference's staggered exchange order,
    pbHeterReactor.py:995-1148).

    Driver deviation (documented in models/hetero_dyn.py): the gas state is
    carried across intervals -- the reference re-seeds a dead variable and
    silently restarts the gas phase from 1e-6 every interval
    (pbHeterReactor.py:1148)."""
    from ..models import hetero_dyn
    from ..ops import stencils as _st

    sc = model_input.get("solver-config", {})
    mesh_mode = sc.get("mesh", "normal")
    if mesh_mode != "normal":
        # refined two-zone mesh (reference zMesh settings from
        # solverSetting T1, solSetting.py:63-68)
        mesh = _st.two_zone_mesh((15, 10), 1.0, 30, 1.001)
        z_no = int(mesh["n_nodes"])
    else:
        mesh = None
        z_no = int(sc.get("zNo", 10))     # solverSetting T1.zNo
    spec = hetero_dyn.m13_build_spec(
        model_input,
        z_no=z_no,
        r_no=int(sc.get("rNo", 7)),       # T1.rNo.fdm
        t_no=int(sc.get("tNo", 5)),       # T1.tNo
    )
    p = hetero_dyn.m13_params(model_input)
    key = ("M13", spec.comp_list, spec.z_no, spec.r_no, spec.t_no,
           mesh_mode, tuple(model_input["reactions"].values()),
           _kinetics_fingerprint(model_input),
           opts["rtol"], opts["atol"], jax.config.jax_enable_x64)
    runner = _jit_cache.get(key)
    if runner is None:
        # the driver (incl. the flux-sign/clamp salvages) lives in
        # models.hetero_dyn.make_m13_driver so design sweeps can vmap the
        # same function (parallel.run_m13_sweep)
        runner = jax.jit(hetero_dyn.make_m13_driver(
            spec, mesh=mesh, rtol=opts["rtol"], atol=opts["atol"]
        ))
        _jit_cache[key] = runner

    # checkpoint/resume: the reference re-seeds interval state in memory
    # only (pbHeterReactor.py:1134-1148); here the split gas+solid state is
    # a first-class artifact. M13's state is NOT a flat vector (staggered
    # gas/solid exchange), so the checkpoint carries both phases.
    resume = model_input.get("resume-state")
    if resume is not None:
        if resume.get("model") != "M13":
            raise ValueError(
                f"resume-state is for model {resume.get('model')!r}, "
                "not 'M13'"
            )
        y_gas0 = jnp.asarray(np.asarray(resume["gas"], dtype=np.float64)
                             ).reshape(-1)
        y_solid0 = jnp.asarray(np.asarray(resume["solid"], dtype=np.float64))
        if y_gas0.shape[0] != spec.n_layer * spec.z_no:
            raise ValueError(
                f"resume-state gas has {y_gas0.shape[0]} entries; this "
                f"grid needs {spec.n_layer * spec.z_no}"
            )
        if y_solid0.shape != (spec.n_layer, spec.r_no, spec.z_no):
            raise ValueError(
                f"resume-state solid has shape {y_solid0.shape}; this "
                f"grid needs {(spec.n_layer, spec.r_no, spec.z_no)}"
            )
        t_start = float(resume.get("t", 0.0))
    else:
        y_gas0 = y_solid0 = None
        t_start = 0.0

    start = timer()
    gas_t, solid_t, conv_t, unr_t, ts_grid = runner(
        p, y_gas0, y_solid0, jnp.asarray(t_start)
    )
    unr = np.asarray(unr_t)
    conv = np.asarray(conv_t)
    if unr.sum() or not conv.all():
        # report the FIRST failure: a diverged solid interface poisons all
        # later gas intervals, so downstream gas-budget failures are a
        # symptom, not the cause
        first_gas = int(np.argmax(unr > 0)) if unr.sum() else len(unr)
        first_sol = int(np.argmax(~conv)) if not conv.all() else len(conv)
        if first_sol < first_gas:
            bad = [i for i, c in enumerate(conv) if not c]
            raise RuntimeError(f"M13: solid BVP Newton did not converge at "
                               f"interval(s) {bad}")
        raise RuntimeError(
            f"M13: gas-phase integrator failed to reach "
            f"{int(unr.sum())} interval boundary(ies) within the step "
            f"budget (first at interval {first_gas})"
        )

    gas_t = np.asarray(gas_t)          # (tNo, n_layer*zNo)
    solid_t = np.asarray(solid_t)      # (tNo, n_layer, rNo, zNo)
    t_bounds = np.asarray(ts_grid)
    n_comp, z_no = spec.n_comp, spec.z_no
    c_max = float(np.max(np.asarray(p["SpCoi0"])))
    T0 = float(p["T0"])
    data_xs = (
        np.asarray(mesh["xs"]) if mesh is not None
        else np.linspace(0.0, 1.0, z_no)
    )
    label_list = list(spec.comp_list) + ["Temperature"]

    data_pack = []
    for i in range(spec.t_no):
        Yg = gas_t[i].reshape(spec.n_layer, z_no)
        conc_dl = Yg[:n_comp]
        temp_dl = Yg[n_comp:n_comp + 1]
        mo_fri = conc_dl / np.sum(conc_dl, axis=0)
        data_ys = np.concatenate([mo_fri, temp_dl], axis=0)
        sol = solid_t[i]
        data_pack.append({
            "successStatus": True,
            "dataTime": t_bounds[i + 1],
            "dataYCon": conc_dl,
            "dataYTemp": temp_dl,
            "dataYs": data_ys,
            # solid phase (the reference returns empty lists here;
            # we provide the real profiles, r index 0 = interface)
            "dataYCons": sol[:n_comp] * c_max,
            "dataYTemps": (sol[n_comp] * T0 + T0),
        })

    xy_list = [[data_xs, row] for row in data_pack[-1]["dataYs"]]
    data_list = [
        {"x": data_xs, "y": xy[1], "leg": leg}
        for xy, leg in zip(xy_list, label_list)
    ]
    if opts["display"]:
        from ..io import plot as _plot

        _plot.plot_xy_series(data_list, "Dimensionless Reactor Length", "")
    elapsed = roundNum(timer() - start)
    return {
        "XYList": xy_list,
        "dataList": data_list,
        "dataPack": data_pack,
        "computation-time": elapsed,
        "checkpoint": {
            "model": "M13",
            "t": float(t_bounds[-1]),
            "gas": gas_t[-1].copy(),
            "solid": solid_t[-1].copy(),
        },
    }


# ---------------------------------------------------------------------------

def rmtExe(modelInput: Mapping[str, Any]):
    """Check model input, then start computation (reference: rmt.py:21-80).

    Set RMT_TPU_PROFILE=<dir> to capture a jax.profiler trace of the run
    (device + host timelines, viewable in TensorBoard/Perfetto) — the
    TPU-native replacement for the reference's wall-clock-only
    observability (SURVEY §5; reference: pbHomoReactor.py:2705,2987).
    """
    profile_dir = os.environ.get("RMT_TPU_PROFILE")
    if profile_dir:
        # jax.profiler sessions cannot nest: a concurrent rmtExe call (or a
        # caller that already holds an active trace) must not turn an
        # opt-in debug flag into a hard failure -- fall through un-traced.
        try:
            trace_cm = jax.profiler.trace(profile_dir)
            trace_cm.__enter__()
        except Exception as e:  # pragma: no cover - profiler runtime state
            warnings.warn(f"RMT_TPU_PROFILE: trace not started ({e}); "
                          "running un-profiled", RuntimeWarning)
        else:
            try:
                return _rmt_exe_inner(modelInput)
            finally:
                trace_cm.__exit__(None, None, None)
    return _rmt_exe_inner(modelInput)


def _rmt_exe_inner(modelInput: Mapping[str, Any]):
    tic = timer()
    _validate_model_input(modelInput)
    model_type = modelInput["model"]
    _check_components(modelInput)

    # the two-zone refined mesh exists only where the reference honors it
    # (runM7/runM8/runM9, pbHeterReactor.runM2, homoModels.runT1); for
    # every other model the key would be silently ignored -- reject instead
    _MESH_MODELS = {"T3", "M11", "M12", "M13", "M14"}
    sc_mesh = modelInput.get("solver-config", {}).get("mesh", "normal")
    if sc_mesh != "normal" and model_type not in _MESH_MODELS:
        raise ValueError(
            f"solver-config mesh={sc_mesh!r} is not supported by model "
            f"{model_type!r} (refined-mesh models: {sorted(_MESH_MODELS)})"
        )

    if model_type in ("M0", "M4"):
        res_model = _run_pf(modelInput, _solver_options(modelInput))
    elif model_type == "M1":
        res_model = _run_m1(modelInput, _solver_options(modelInput))
    elif model_type in ("M2", "M9"):
        res_model = _run_m2(modelInput, _solver_options(modelInput), model_type)
    elif model_type == "M3":
        res_model = _run_batch(modelInput, _solver_options(modelInput))
    elif model_type == "M5":
        res_model = _run_m5(modelInput, _solver_options(modelInput))
    elif model_type in ("M7", "M8"):
        res_model = _run_m_conc_steady(modelInput, _solver_options(modelInput), model_type)
    elif model_type == "T1":
        res_model = _run_t1(modelInput, _solver_options(modelInput))
    elif model_type == "T2":
        res_model = _run_t2(modelInput, _solver_options(modelInput))
    elif model_type == "T3":
        res_model = _run_t3(modelInput, _solver_options(modelInput))
    elif model_type == "M11":
        res_model = _run_m11(modelInput, _solver_options(modelInput))
    elif model_type == "M10":
        res_model = _run_m10(modelInput, _solver_options(modelInput))
    elif model_type == "M12":
        res_model = _run_m12(modelInput, _solver_options(modelInput))
    elif model_type == "M13":
        res_model = _run_m13(modelInput, _solver_options(modelInput))
    elif model_type == "M14":
        res_model = _run_m14(modelInput, _solver_options(modelInput))
    elif model_type in ("N1", "N2"):
        spec = homo.build_spec(modelInput)
        opts = _solver_options(modelInput)
        if model_type == "N1":
            res_model = _run_n1(modelInput, spec, opts)
        else:
            res_model = _run_n2(modelInput, spec, opts)
        if opts["display"]:
            from ..io import plot as _plot

            if model_type == "N1":
                _plot.plot_results_steady_state(res_model)
            else:
                _plot.plot_results_dynamic(res_model, spec.t_no)
    else:
        raise NotImplementedError(
            f"model id {model_type!r} is not implemented yet in rmt_tpu "
            f"(implemented: {', '.join(sorted(_MODEL_IDS))})"
        )

    com_time = (timer() - tic) * 1000
    return {"resModel": res_model, "comTime": com_time}
