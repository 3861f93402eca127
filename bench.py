# Headline benchmark: large dynamic reactor ensembles (N2, DME
# chemistry) on one chip vs the sequential SciPy reference -- the
# qualifying leg integrates 131072 members in one invocation; the
# north-star claim is ">=4096 members AND >=100x AND <=1e-6".
#
# Prints JSON lines whose head matches the driver contract
#   {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
# and whose extra fields make the north-star claim verifiable from the
# artifact alone (4096 members, >=100x the SciPy baseline, <=1e-6 max
# relative state error SIMULTANEOUSLY):
#   baseline_seconds  measured wall-clock of ONE reference PyREMOT run
#   legs.f32 / .f32x  members_per_sec + vs_baseline + ON-CHIP measured
#                     max/mean relative state error vs a CPU-converged
#                     f64 run (committed artifact bench_ref.npz) of a
#                     16-member probe sweep EMBEDDED in the headline
#                     batch -- accuracy is measured at the headline B in
#                     the same run that is timed, not a separate config
#   legs.*.attempts_mean/max  per-member integrator attempts, so a
#                     future throughput regression is attributable to
#                     attempt counts vs host noise from the artifact
#   north_star        which leg satisfies ">=100x AND <=1e-6", if any
#
# Round-3 post-mortem hardening (BENCH_r03 was rc=124 with NO output):
#   * the headline line is RE-EMITTED after every completed leg -- the
#     driver parses the LAST JSON line, so a kill mid-bench still
#     captures everything finished so far;
#   * SIGTERM/SIGINT emit the best-so-far line before exiting (the
#     driver wraps the run in `timeout`, which sends SIGTERM first);
#   * an internal deadline (RMT_BENCH_DEADLINE seconds, default 1200)
#     gates every leg/child on remaining wall-clock;
#   * the converged f64 accuracy reference ships as a committed artifact
#     (bench_ref.npz, scripts/gen_bench_ref.py) instead of a ~10 min
#     CPU child; RMT_BENCH_REGEN_REF=1 recomputes it live;
#   * the SciPy baseline is measured ONCE (was twice);
#   * the f64 leg is opt-in (RMT_BENCH_F64=1): it qualifies nothing the
#     f32x leg doesn't and costs the most (TPU-emulated f64);
#   * the JAX persistent compilation cache stays OFF deliberately: on
#     this tunneled runtime a warm-cache "compile" measured 433 s vs
#     193 s cold (STATUS.md) -- server-side state dominates.
#
# Each throughput leg runs in a SUBPROCESS: the float mode is a
# process-level config and an over-HBM batch crashes the TPU worker,
# poisoning the parent's jax client.

import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

T_START = time.monotonic()
# r4 died at rc=124 with DEADLINE=2100 (the driver's own timeout is
# evidently tighter): 1200 s leaves headroom, and every leg/probe is
# individually gated on remaining wall-clock.
DEADLINE = float(os.environ.get("RMT_BENCH_DEADLINE", "1200"))
B = int(os.environ.get("RMT_BENCH_B", "4096"))
CH4_ACC_B = 16                  # CH4 guard probe batch (accuracy only)
REFERENCE_PATH = "/root/reference"
REF_NPZ = os.path.join(ROOT, "bench_ref.npz")

# Per-leg configurations.
#   f32  -- throughput leg: plain float32 at the f32-usable tolerances.
#   f32x -- north-star leg: f32 integrator with the kinetics chain in
#           compensated double-float32 pairs (accurate_rates="df32",
#           ops/df32.py -- pure f32 process, no emulated f64) + exact
#           block-bidiagonal stage solves. rtol=6e-7: the round-5
#           64-probe on-chip margin sweep measured max_rel_err
#           rtol=7e-7 -> 9.77e-7 at B=4096 / 8.94e-7 at B=131072
#           (2-11% margin under the 1e-6 bar -- too thin), 6e-7 ->
#           7.02e-7 (30% margin) at only +4% attempts, 5e-7 ->
#           7.32e-7 at +14% (non-monotone below 6e-7).
#   f64  -- full float64 (TPU-emulated) reference-grade leg (opt-in).
# j_every=8 on the f32 legs: on-chip B=512 A/B measured 17.4 -> 23.7
# members/s (fresher Jacobians break the Newton-failure limit cycle).
LEGS = {
    "f32": dict(x64="0", rtol=1e-5, atol=1e-7, max_steps=768,
                newton_iters=5, kw={"j_every": 8}),
    # f32x b_total: the wall is a per-invocation fixed cost ~flat in B
    # on this runtime (measured round 4, scripts/fixed_cost_probe.py:
    # 24 s at B=512, 31 s at 16384, 49 s at 65536, 69 s at 131072 --
    # identical attempt counts and accuracy, zero unfinished), so the
    # qualifying leg integrates 32x the north-star member count in ONE
    # device-resident call. Its block-mode carries are small (no dense (B,n,n) state),
    # unlike the NS-mode f32 leg.
    "f32x": dict(x64="0", rtol=6e-7, atol=1e-9, max_steps=768,
                 newton_iters=5, call_chunks=1,
                 # smoke runs (RMT_BENCH_B set) size this leg too; the
                 # 131072 headline applies only when nothing is overridden
                 b_total=int(os.environ.get(
                     "RMT_BENCH_B_F32X",
                     os.environ.get("RMT_BENCH_B", "131072"))),
                 kw={"j_every": 8, "accurate_rates": "df32",
                     "exact_solve": True, "cheap_sweeps": 2}),
    "f64": dict(x64="1", rtol=1e-7, atol=1e-10, max_steps=768,
                newton_iters=6, kw={}),
}

_best = {"metric": "n2_dme_ensemble_members_per_sec", "value": 0.0,
         "unit": "reactors/s", "vs_baseline": 0.0}


def _remaining():
    return DEADLINE - (time.monotonic() - T_START)


def emit():
    """Print the current best headline line. Called after every completed
    milestone and from the signal handlers: the driver takes the LAST
    JSON line, so repeated emission makes the artifact monotone-better
    instead of all-or-nothing (the round-3 failure mode)."""
    print(json.dumps(_best), flush=True)


def _on_signal(signum, frame):  # pragma: no cover - driver kill path
    print(f"# signal {signum}: emitting best-so-far and exiting",
          file=sys.stderr, flush=True)
    emit()
    os._exit(0)


def _update_head(legs, t_ref, north):
    head_name = max(
        legs, key=lambda k: legs[k].get("members_per_sec") or 0.0,
        default=None,
    ) if legs else None
    if head_name is None:
        return
    head = legs[head_name]
    _best.clear()
    _best.update({
        # STABLE metric name across rounds (the driver records a series);
        # the batch size lives in legs.*.B
        "metric": "n2_dme_ensemble_members_per_sec",
        "value": head["members_per_sec"],
        "unit": "reactors/s",
        "vs_baseline": head["vs_baseline"],
        "baseline_seconds": t_ref and round(t_ref, 3),
        "legs": legs,
        "north_star": north,
    })


def _north_star(legs):
    # north star: 4096 members AND >=100x AND <=1e-6, one leg, one run
    for name in ("f32", "f32x", "f64"):  # prefer the fastest qualifying leg
        leg = legs.get(name)
        if (leg and leg.get("vs_baseline") and leg["vs_baseline"] >= 100.0
                and leg.get("max_rel_err") is not None
                and leg["max_rel_err"] <= 1e-6 and leg["B"] >= 4096):
            return {"satisfied": True, "leg": name, "B": leg["B"],
                    "vs_baseline": leg["vs_baseline"],
                    "max_rel_err": leg["max_rel_err"]}
    return {"satisfied": False}


def measure_reference_seconds(model_input_factory):
    """Wall-clock of ONE reference PyREMOT N2 run (scipy LSODA, default
    tolerances) on this host. Returns None when the reference isn't
    importable -- a fabricated fallback would make vs_baseline look
    measured when it wasn't."""
    try:
        sys.path.insert(0, REFERENCE_PATH)
        import io
        from contextlib import redirect_stdout

        import matplotlib

        matplotlib.use("Agg")
        from PyREMOT import rmtExe as ref_rmt_exe

        mi = model_input_factory()
        t0 = time.perf_counter()
        with redirect_stdout(io.StringIO()):
            ref_rmt_exe(mi)
        return time.perf_counter() - t0
    except Exception as e:  # pragma: no cover - bench robustness
        print(f"# reference NOT measured ({e}); vs_baseline will be null",
              file=sys.stderr)
        return None


def _probe_layout(b, offsets):
    """Sweep offsets for b members with the reference-probe T0 offsets
    (64 DME / 16 CH4, bench_ref.npz) spliced in at evenly spaced indices
    (bit-exact: accuracy and throughput come from the SAME run at the
    SAME batch size)."""
    import numpy as np

    sweep = np.linspace(-5.0, 5.0, b)
    if b >= len(offsets):
        idx = np.round(np.linspace(0, b - 1, len(offsets))).astype(int)
        sweep[idx] = offsets
    else:  # smoke-test sizes: no probe
        idx = np.arange(0)
    return sweep, idx


def child_tput(leg_name, b, n_chunks, chemistry="dme"):
    """Integrate B = n_chunks * b members in this process; print one JSON
    line with throughput, per-member attempt stats, and -- when the
    committed reference artifact is present -- the probe members' max/mean
    relative error vs the CPU-converged f64 states.

    Microbatches of size b run as a lax.scan INSIDE one compiled call
    (run_n2_ensemble_lockstep(microbatch=b)): the tunneled runtime
    charges a large FIXED cost per executable invocation (~5-20 s
    measured, vs ms-scale marginal per integrator attempt), so one call
    amortizes what per-microbatch calls would pay n_chunks times. The
    runtime also KILLS long-running invocations (measured: ~150 s/call
    completes, 300+ s crashes the worker), so at most
    RMT_BENCH_CALL_CHUNKS microbatches run per call and the remainder
    loops over calls. The FIRST call (which also compiles) is untimed;
    throughput is measured over the remaining calls when there are any,
    else over a second run of the single call."""
    import numpy as np

    import jax

    if os.environ.get("RMT_BENCH_CPU"):  # smoke tests off-TPU
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    if chemistry == "dme":
        from dme_case import make_model_input
        t_base = 523.0
    else:
        from ch4_case import make_model_input
        t_base = 973.0

    leg = LEGS[leg_name]
    k_call = max(int(os.environ.get(
        "RMT_BENCH_CALL_CHUNKS", str(leg.get("call_chunks", 4)))), 1)

    ref_offsets = ref_ys = None
    if os.path.exists(REF_NPZ):
        with np.load(REF_NPZ) as z:
            ref_offsets = z[f"{chemistry}_offsets"]
            ref_ys = z[f"{chemistry}_ys"]

    b_total = b * n_chunks
    sweep_all, probe_idx = (
        _probe_layout(b_total, ref_offsets) if ref_offsets is not None
        else (np.linspace(-5.0, 5.0, b_total), np.arange(0))
    )

    mi = make_model_input(model="N2")

    def run_rows(lo, hi):
        """One compiled call over rows [lo, hi). Only the probe rows'
        trajectories are recorded (out_members): the full (tNo, B, n)
        output buffer was the single largest HBM term at headline B
        (round-5 audit) while accuracy needs only the probe rows and
        the budget/finiteness checks only need final states + stats."""
        n_here = (hi - lo) // b
        sweep = {"T0": jnp.asarray(t_base + sweep_all[lo:hi])}
        sel = probe_idx[(probe_idx >= lo) & (probe_idx < hi)] - lo
        common = dict(
            max_steps=leg["max_steps"], rtol=leg["rtol"], atol=leg["atol"],
            newton_iters=leg["newton_iters"], **leg.get("kw", {}),
        )
        if n_here > 1:  # multi-chunk call: microbatch scan, full ys
            ys, stats = run_n2_ensemble_lockstep(
                mi, sweep, microbatch=b, **common)
            ys_sel, y_fin = ys[:, sel, :], ys[-1]
        else:
            ys_sel, y_fin, stats = run_n2_ensemble_lockstep(
                mi, sweep, out_members=sel, **common)
        np.asarray(y_fin[0, 0])  # host sync (block_until_ready lies on axon)
        return ys_sel, y_fin, stats

    bounds = list(range(0, b_total + 1, k_call * b))
    if bounds[-1] != b_total:
        bounds.append(b_total)
    calls = list(zip(bounds[:-1], bounds[1:]))

    outs = [run_rows(*calls[0])]  # compile + first slice (untimed)
    t0 = time.perf_counter()
    if len(calls) > 1:
        outs += [run_rows(lo, hi) for lo, hi in calls[1:]]
        n_timed = b_total - calls[0][1]
    else:
        outs = [run_rows(*calls[0])]   # re-run the single call, timed
        n_timed = b_total
    t_ens = time.perf_counter() - t0

    ys_all, att_all, unfinished = [], [], 0
    n_seg_full = None
    for ys_sel, y_fin, stats in outs:
        assert bool(jnp.all(jnp.isfinite(y_fin)))
        n_seg_full = ys_sel.shape[0] - 1
        unfinished += int(jnp.sum(stats.seg < n_seg_full))
        att_all.append(np.asarray(stats.n_accepted + stats.n_rejected))
        ys_all.append(np.asarray(ys_sel, np.float64))
    assert unfinished == 0, \
        f"{unfinished}/{b_total} members exhausted the budget"
    att = np.concatenate(att_all)
    out = {"b": b, "n_chunks": n_chunks, "b_total": b_total,
           "n_timed": n_timed, "t_ens": t_ens,
           "attempts_mean": round(float(att.mean()), 1),
           "attempts_max": int(att.max())}

    if ref_ys is not None and probe_idx.size:
        got = np.concatenate(ys_all, axis=1)
        denom = np.maximum(np.abs(ref_ys), 1e-7)
        rel = np.abs(got - ref_ys) / denom
        out["max_rel_err"] = float(rel.max())
        out["mean_rel_err"] = float(rel.mean())
        out["acc_B"] = int(probe_idx.size)
    print(json.dumps(out), flush=True)


def _spawn(child_spec, x64, timeout):
    env = dict(os.environ, RMT_BENCH_CHILD=child_spec, RMT_TPU_X64=x64)
    return subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=timeout,
    )


def _leg_throughput(leg_name, t_ref, chemistry="dme", b_total=None):
    """Walk down batch-size candidates (an over-HBM batch crashes the
    worker; the next candidate runs in a fresh subprocess after a
    recovery pause). Returns the leg dict or None."""
    leg = LEGS[leg_name]
    b_total = b_total or B
    default_chunk = {"f64": "256"}.get(leg_name, "131072")
    # f32/f32x: ONE device-resident invocation at ANY measured B. The
    # round-4 cost attribution (scripts/ablate_inplace.py,
    # fixed_cost_probe.py) showed the wall is a per-INVOCATION fixed cost
    # ~flat in both B and attempt count on this runtime (f32x walls:
    # B=512 24s ... B=16384 31s, attempts/accuracy identical), so
    # splitting B across calls multiplies the only cost there is. The
    # walk-down below still covers over-HBM crashes on other tunnels.
    # f64: the x64 scan-of-pallas path kernel-faults at microbatch 512
    # (measured); 256 is the verified ceiling.
    chunk_max = int(os.environ.get("RMT_BENCH_CHUNK", default_chunk))
    candidates = sorted(
        {c for c in (min(b_total, chunk_max), 131072, 65536, 32768, 16384,
                     8192, 4096, 2048, 1024, 256, 64)
         if c <= min(b_total, chunk_max)},
        reverse=True,
    )
    for i, b in enumerate(candidates):
        if _remaining() < 240:
            print(f"# {leg_name}: {_remaining():.0f}s left, giving up",
                  file=sys.stderr)
            return None
        n_chunks = max(b_total // b, 1)
        try:
            proc = _spawn(
                f"tput;{leg_name};{b};{n_chunks};{chemistry}", leg["x64"],
                timeout=max(_remaining() - 45, 60))
            if proc.returncode == 0:
                d = json.loads(proc.stdout.strip().splitlines()[-1])
                mps = d["n_timed"] / d["t_ens"]
                res = {
                    "B": d["b_total"],
                    "members_per_sec": round(mps, 3),
                    "vs_baseline": (round(mps * t_ref, 2)
                                    if t_ref is not None else None),
                    "rtol": leg["rtol"], "atol": leg["atol"],
                    "attempts_mean": d["attempts_mean"],
                    "attempts_max": d["attempts_max"],
                    "config": leg.get("kw", {}),
                }
                for k in ("max_rel_err", "mean_rel_err", "acc_B"):
                    if k in d:
                        res[k] = d[k]
                return res
            tail = (proc.stderr or "").strip().splitlines()
            print(f"# {leg_name} B={b} failed: "
                  f"{tail[-1][:140] if tail else proc.returncode}",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - bench robustness
            print(f"# {leg_name} B={b} failed: {str(e)[:140]}",
                  file=sys.stderr)
        if i < len(candidates) - 1:
            print("# waiting 60s for TPU worker recovery", file=sys.stderr)
            time.sleep(60)
    return None


def main():
    spec = os.environ.get("RMT_BENCH_CHILD")
    if spec:
        parts = spec.split(";")
        child_tput(parts[1], int(parts[2]), int(parts[3]),
                   parts[4] if len(parts) > 4 else "dme")
        return

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    emit()  # a valid (if empty) line exists from second zero

    if os.environ.get("RMT_BENCH_REGEN_REF") or not os.path.exists(REF_NPZ):
        try:
            subprocess.run(
                [sys.executable, os.path.join(ROOT, "scripts",
                                              "gen_bench_ref.py")],
                timeout=max(_remaining() / 3, 60), check=True,
                capture_output=True, text=True)
        except Exception as e:  # pragma: no cover - bench robustness
            print(f"# reference regen failed ({str(e)[:140]}); "
                  "accuracy fields will be absent", file=sys.stderr)

    t_ref = None
    if not os.environ.get("RMT_BENCH_SKIP_BASELINE"):
        t_ref = measure_reference_seconds(
            lambda: __import__("dme_case").make_model_input(model="N2")
        )

    legs = {}
    # Leg order is claim-priority order (r4 post-mortem: the driver kill
    # took everything after the first leg, so everything the north-star
    # claim needs must land FIRST):
    #   1. f32x qualifying leg (throughput + DME accuracy probe);
    #   2. CH4 second-chemistry accuracy guard on the SAME configuration
    #      (cheap: a B=16 probe-only run) -- part of the north-star
    #      evidence that the df32 error model is not DME-specific;
    #   3. f32 legacy-comparison leg, only if wall-clock remains;
    #   4. f64, opt-in.
    def _run_leg(leg_name):
        leg = _leg_throughput(leg_name, t_ref,
                              b_total=LEGS[leg_name].get("b_total"))
        if leg is not None:
            legs[leg_name] = leg
            _update_head(legs, t_ref, _north_star(legs))
            emit()

    if not os.environ.get("RMT_BENCH_SKIP_F32X"):
        _run_leg("f32x")

    if ("f32x" in legs and _remaining() > 180
            and not os.environ.get("RMT_BENCH_SKIP_CH4")):
        ch4 = _leg_throughput("f32x", None, chemistry="ch4",
                              b_total=CH4_ACC_B)
        if ch4 and ch4.get("max_rel_err") is not None:
            legs["f32x"]["ch4_max_rel_err"] = ch4["max_rel_err"]
            legs["f32x"]["ch4_mean_rel_err"] = ch4["mean_rel_err"]
            _update_head(legs, t_ref, _north_star(legs))
            emit()

    if _remaining() > 300 and not os.environ.get("RMT_BENCH_SKIP_F32"):
        _run_leg("f32")
    if os.environ.get("RMT_BENCH_F64") and _remaining() > 300:
        _run_leg("f64")

    emit()


if __name__ == "__main__":
    main()
