# Headline benchmark: 4096-member dynamic reactor ensemble (N2, DME
# chemistry) on one chip vs the sequential SciPy reference.
#
# Prints ONE JSON line whose head matches the driver contract
#   {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
# and whose extra fields make the north-star claim verifiable from the
# artifact alone (4096 members, >=100x the SciPy baseline, <=1e-6 max
# relative state error SIMULTANEOUSLY):
#   baseline_seconds  measured wall-clock of ONE reference PyREMOT run
#   legs.f32 / .f64   members_per_sec + vs_baseline + ON-CHIP measured
#                     max/mean relative state error vs a CPU-converged
#                     f64 run of the same sweep (B=16 probe at the same
#                     tolerances as the throughput run)
#   north_star        which leg satisfies ">=100x AND <=1e-6", if any
#
# Each child runs in a SUBPROCESS: the float mode is a process-level
# config, an over-HBM batch crashes the TPU worker and poisons the
# parent's jax client, and the converged accuracy reference must run on
# the host CPU (true f64) while probes run on-chip.

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

B = int(os.environ.get("RMT_BENCH_B", "4096"))
ACC_B = int(os.environ.get("RMT_BENCH_ACC_B", "16"))
REFERENCE_PATH = "/root/reference"

# Per-leg configurations.
#   f32  -- throughput leg: plain float32 at the f32-usable tolerances.
#   f32x -- north-star leg: f32 integrator with the kinetics chain in
#           compensated double-float32 pairs (accurate_rates="df32",
#           ops/df32.py -- pure f32 process, no emulated f64) + exact
#           block-bidiagonal stage solves. rtol=7e-7: the run-to-run
#           accuracy floor is ~7e-7 (measured on-chip B=16 vs a
#           CPU-converged f64 run: rtol=1e-6 -> 9.8e-7, 7e-7 -> 6.6e-7,
#           5e-7 -> 8.3e-7 -- non-monotone, so 7e-7 buys the best 1e-6
#           margin at IDENTICAL attempts, 140-148 mean/max vs the plain
#           leg's 387: the accurate rates also smooth Newton). B=512
#           throughput 8.80 members/s (~850x).
#   f64  -- full float64 (TPU-emulated) reference-grade leg.
# j_every=8 on the f32 legs: on-chip B=512 A/B measured 17.4 -> 23.7
# members/s (fresher Jacobians break the Newton-failure limit cycle).
# call_chunks caps microbatches per executable invocation BELOW the
# runtime's long-invocation kill limit (~several hundred seconds):
# measured for the df32 leg, 2x512 in one call = 111 s -> 9.18
# members/s vs 7.2 for two single-512 calls (pure invocation-overhead
# amortization); 3-4 chunks (~220+ s/call) would court the kill limit
# (the f64 leg's 156 s calls survive, 300+ s calls crash, r2 data).
LEGS = {
    "f32": dict(x64="0", rtol=1e-5, atol=1e-7, max_steps=768,
                newton_iters=5, kw={"j_every": 8}),
    "f32x": dict(x64="0", rtol=7e-7, atol=1e-9, max_steps=768,
                 newton_iters=5, call_chunks=1,
                 kw={"j_every": 8, "accurate_rates": "df32",
                     "exact_solve": True}),
    "f64": dict(x64="1", rtol=1e-7, atol=1e-10, max_steps=768,
                newton_iters=6, kw={}),
}


def _sweep_offsets(b):
    import numpy as np

    return np.linspace(-5.0, 5.0, b)


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

        best = float("inf")
        for _ in range(2):
            mi = model_input_factory()
            t0 = time.perf_counter()
            with redirect_stdout(io.StringIO()):
                ref_rmt_exe(mi)
            best = min(best, time.perf_counter() - t0)
        return best
    except Exception as e:  # pragma: no cover - bench robustness
        print(f"# reference NOT measured ({e}); vs_baseline will be null",
              file=sys.stderr)
        return None


def _run_ensemble(b, microbatch, leg, max_steps=None):
    """Integrate a b-member T0 sweep at the leg's bench tolerances;
    returns (ys, stats). Used by both child modes so the accuracy probe
    measures EXACTLY the configuration the throughput leg runs."""
    import numpy as np

    import jax.numpy as jnp

    from dme_case import make_model_input
    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + _sweep_offsets(b))}
    ys, stats = run_n2_ensemble_lockstep(
        # newton_iters per leg: with the collocation-extrapolation stage
        # predictor 5 simplified-Newton sweeps suffice in f32 (A/B
        # on-chip: 36.0 vs 31.9 members/s at 6, B=512); the f64 leg keeps
        # 6 (its Newton tolerance is proportionally tighter).
        mi, sweep, max_steps=max_steps or leg["max_steps"],
        rtol=leg["rtol"], atol=leg["atol"],
        newton_iters=leg["newton_iters"],
        microbatch=microbatch,
        **leg.get("kw", {}),
    )
    np.asarray(ys[-1, 0, 0])  # host sync (block_until_ready lies on axon)
    return ys, stats


def child_tput(leg_name, b, n_chunks):
    """Time B = n_chunks * b members in this process; print one JSON line.

    Microbatches of size b run as a lax.scan INSIDE one compiled call
    (run_n2_ensemble_lockstep(microbatch=b)): the tunneled runtime
    charges a large FIXED cost per executable invocation (~17.5 s
    measured at B=512, vs ~4.4 ms marginal per integrator attempt), so
    one call amortizes what per-microbatch calls would pay n_chunks
    times. HBM holds one microbatch's integrator state at a time.

    The runtime also KILLS long-running invocations (measured: f64
    4x256 at 156 s/call completes; 8x512 and 16x256 -- several hundred
    seconds in one program -- crash the worker), so at most
    RMT_BENCH_CALL_CHUNKS microbatches (default 4) run per call and the
    remainder loops over calls."""
    import numpy as np

    import jax.numpy as jnp

    leg = LEGS[leg_name]
    k_call = max(int(os.environ.get(
        "RMT_BENCH_CALL_CHUNKS", str(leg.get("call_chunks", 4)))), 1)

    def run_once(n_here):
        return _run_ensemble(
            n_here * b, microbatch=b if n_here > 1 else None, leg=leg)

    call_sizes = [min(k_call, n_chunks - i) for i in range(0, n_chunks, k_call)]
    run_once(call_sizes[0])  # compile (full-size first call; later shapes
    # reuse the cache only if equal -- keep every call k_call chunks when
    # possible)
    t0 = time.perf_counter()
    outs = [run_once(n) for n in call_sizes]
    t_ens = time.perf_counter() - t0
    unfinished = 0
    for ys, stats in outs:
        assert bool(jnp.all(jnp.isfinite(ys[-1])))
        assert int(jnp.min(stats.n_accepted)) > 0
        unfinished += int(jnp.sum(stats.seg < ys.shape[0] - 1))
    assert unfinished == 0, \
        f"{unfinished}/{n_chunks * b} members exhausted the budget"
    print(json.dumps({"b": b, "n_chunks": n_chunks, "t_ens": t_ens}))


def child_acc(leg_name, b, path):
    """Integrate the B=b probe sweep and save the output states.
    leg_name "ref" = CPU-converged f64 reference (rtol=1e-9); otherwise
    the named leg's exact bench configuration on the default backend."""
    import numpy as np

    import jax

    if leg_name == "ref":
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; only the
        # config knob actually selects cpu
        jax.config.update("jax_platforms", "cpu")
        leg = dict(rtol=1e-9, atol=1e-12, newton_iters=6, max_steps=2048)
    else:
        leg = LEGS[leg_name]
    print(f"# acc child {leg_name}: backend {jax.default_backend()}",
          file=sys.stderr)
    ys, stats = _run_ensemble(b, microbatch=None, leg=leg)
    import jax.numpy as jnp

    assert int(jnp.sum(stats.seg < ys.shape[0] - 1)) == 0, "budget exhausted"
    np.save(path, np.asarray(ys, np.float64))


def _spawn(child_spec, x64, timeout):
    env = dict(os.environ, RMT_BENCH_CHILD=child_spec, RMT_TPU_X64=x64)
    return subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=timeout,
    )


def _leg_throughput(leg_name, t_ref):
    """Walk down batch-size candidates (an over-HBM batch crashes the
    worker; the next candidate runs in a fresh subprocess after a
    recovery pause). Returns {members_per_sec, vs_baseline, B} or None."""
    leg = LEGS[leg_name]
    default_chunk = {"f64": "256", "f32x": "1024"}.get(leg_name, "4096")
    # f32: B=4096 fits in ONE device-resident batch since the fused Pallas
    # NS kernel removed the stacked XLA intermediates. f64: the integrator
    # state is 2x and the x64 scan-of-pallas path kernel-faults at
    # microbatch 512 (measured); 256 is the verified ceiling. f32x (Pallas
    # block kernels): measured on-chip 1024/call = 91.5 s -> 11.19
    # members/s vs 512/call 10.60 (fit: ~5 s fixed per invocation + ~84
    # ms/member marginal); 2048/call (~180 s) would court the runtime's
    # long-invocation kill limit, so 1024 is the unit and each call runs
    # ONE batch (call_chunks=1).
    chunk_max = int(os.environ.get("RMT_BENCH_CHUNK", default_chunk))
    candidates = sorted(
        {c for c in (min(B, chunk_max), 2048, 1024, 256, 64)
         if c <= min(B, chunk_max)},
        reverse=True,
    )
    for i, b in enumerate(candidates):
        n_chunks = max(B // b, 1)
        try:
            proc = _spawn(f"tput;{leg_name};{b};{n_chunks}", leg["x64"],
                          timeout=3600)
            if proc.returncode == 0:
                d = json.loads(proc.stdout.strip().splitlines()[-1])
                n = d["b"] * d["n_chunks"]
                mps = n / d["t_ens"]
                return {
                    "B": n,
                    "members_per_sec": round(mps, 3),
                    "vs_baseline": (round(mps * t_ref, 2)
                                    if t_ref is not None else None),
                    "rtol": leg["rtol"], "atol": leg["atol"],
                    "config": leg.get("kw", {}),
                }
            tail = (proc.stderr or "").strip().splitlines()
            print(f"# {leg_name} B={b} failed: "
                  f"{tail[-1][:140] if tail else proc.returncode}",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - bench robustness
            print(f"# {leg_name} B={b} failed: {str(e)[:140]}",
                  file=sys.stderr)
        if i < len(candidates) - 1:
            print("# waiting 90s for TPU worker recovery", file=sys.stderr)
            time.sleep(90)
    return None


def _leg_accuracy(leg_name, ref_states):
    """On-chip B=ACC_B probe at the leg's bench tolerances vs the
    CPU-converged reference states; max/mean relative error over ALL
    output states with the 1e-7 relative floor (same metric as
    scripts/accuracy_n2.py)."""
    import numpy as np

    path = f"/tmp/rmt_bench_acc_{leg_name}.npy"
    try:
        proc = _spawn(f"acc;{leg_name};{ACC_B};{path}",
                      LEGS[leg_name]["x64"], timeout=1800)
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()
            print(f"# acc {leg_name} failed: "
                  f"{tail[-1][:140] if tail else proc.returncode}",
                  file=sys.stderr)
            return None
        got = np.load(path)
        denom = np.maximum(np.abs(ref_states), 1e-7)
        rel = np.abs(got - ref_states) / denom
        return {"acc_B": ACC_B, "max_rel_err": float(rel.max()),
                "mean_rel_err": float(rel.mean())}
    except Exception as e:  # pragma: no cover - bench robustness
        print(f"# acc {leg_name} failed: {str(e)[:140]}", file=sys.stderr)
        return None


def main():
    spec = os.environ.get("RMT_BENCH_CHILD")
    if spec:
        parts = spec.split(";")
        if parts[0] == "tput":
            child_tput(parts[1], int(parts[2]), int(parts[3]))
        else:
            child_acc(parts[1], int(parts[2]), parts[3])
        return

    t_ref = measure_reference_seconds(
        lambda: __import__("dme_case").make_model_input(model="N2")
    )

    # CPU-converged f64 reference for the accuracy probes (one child)
    ref_states = None
    try:
        import numpy as np

        ref_path = "/tmp/rmt_bench_acc_ref.npy"
        proc = _spawn(f"acc;ref;{ACC_B};{ref_path}", "1", timeout=3600)
        if proc.returncode == 0:
            ref_states = np.load(ref_path)
        else:
            tail = (proc.stderr or "").strip().splitlines()
            print(f"# converged reference failed: "
                  f"{tail[-1][:140] if tail else proc.returncode}",
                  file=sys.stderr)
    except Exception as e:  # pragma: no cover - bench robustness
        print(f"# converged reference failed: {str(e)[:140]}",
              file=sys.stderr)

    legs = {}
    for leg_name in ("f32", "f32x", "f64"):
        if os.environ.get(f"RMT_BENCH_SKIP_{leg_name.upper()}"):
            continue
        leg = _leg_throughput(leg_name, t_ref)
        if leg is not None and ref_states is not None:
            acc = _leg_accuracy(leg_name, ref_states)
            if acc:
                leg.update(acc)
        if leg is not None:
            legs[leg_name] = leg

    # north star: 4096 members AND >=100x AND <=1e-6, one leg, one run
    north = None
    for name in ("f32", "f32x", "f64"):  # prefer the fastest qualifying leg
        leg = legs.get(name)
        if (leg and leg.get("vs_baseline") and leg["vs_baseline"] >= 100.0
                and leg.get("max_rel_err") is not None
                and leg["max_rel_err"] <= 1e-6 and leg["B"] >= 4096):
            north = {"satisfied": True, "leg": name, "B": leg["B"],
                     "vs_baseline": leg["vs_baseline"],
                     "max_rel_err": leg["max_rel_err"]}
            break
    if north is None:
        north = {"satisfied": False}

    head = legs.get("f32") or legs.get("f32x") or legs.get("f64")
    if head is None:
        print(json.dumps({"metric": "n2_dme_ensemble_members_per_sec",
                          "value": 0.0, "unit": "reactors/s",
                          "vs_baseline": 0.0}))
        return
    print(json.dumps({
        "metric": f"n2_dme_ensemble{head['B']}_members_per_sec",
        "value": head["members_per_sec"],
        "unit": "reactors/s",
        "vs_baseline": head["vs_baseline"],
        "baseline_seconds": (round(t_ref, 3) if t_ref is not None else None),
        "legs": legs,
        "north_star": north,
    }))


if __name__ == "__main__":
    main()
