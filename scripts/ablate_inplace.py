# In-situ structural ablation of the lockstep integrator's per-attempt
# cost (RMT_TPU_ABLATE hooks in solvers/stiff_ensemble.py).
#
# WHY: isolated component probes (ablate_attempt.py, rhs_inscan_probe,
# scan_nesting_probe, scan_dispatch_probe) sum to ~12 ms/attempt at
# B=512 while the real integrator measures 230 ms/attempt (ns_plain,
# f32x_fixed_budget_ab) -- and NO isolated probe reproduces the
# inflation (scan nesting: free; per-iteration dispatch: free; fusing
# the RHS into one Pallas kernel: slightly SLOWER). So the cost must be
# attributed by removing structure from the REAL program, one element
# per subprocess (the env flag is read at trace time):
#   cond    early-exit lax.cond around run_chunk
#   rescue  cold-rescue lax.cond at NS refreshes
#   ns      warm Newton-Schulz update (the fused Pallas kernel call)
#   rhs     stage residual evals inside the Newton sweeps
#   solve   preconditioned stage solves (apply_P / block kernels)
#   err     smoothed embedded-error solve
#   fcand   post-accept RHS eval
#   jref    per-chunk Jacobian refresh
#   all     every hook at once -> the bare scan/carry/controller skeleton
# Results are numerically WRONG under ablation; only the wall time of a
# FIXED 64-attempt budget matters. Usage:
#   python scripts/ablate_inplace.py [case ...]   (default: full set)
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

CASES = {
    "base": "",
    "cond": "cond",
    "rescue": "rescue",
    "ns": "ns",
    "rhs": "rhs",
    "solve": "solve",
    "err": "err",
    "fcand": "fcand",
    "jref": "jref",
    "all": "cond,rescue,ns,rhs,solve,err,fcand,jref",
    # finer skeleton decomposition (the "all" case still measured 107
    # ms/attempt on-chip -- half the real total -- with every compute
    # element stubbed):
    "all_newton": "cond,rescue,ns,rhs,solve,err,fcand,jref,newton",
    "all_nt_ctl": "cond,rescue,ns,rhs,solve,err,fcand,jref,newton,ctrl",
    "all_nt_ctl_io": ("cond,rescue,ns,rhs,solve,err,fcand,jref,newton,"
                      "ctrl,outbuf,stats,kahan"),
    "all_everything": ("cond,rescue,ns,rhs,solve,err,fcand,jref,newton,"
                       "ctrl,outbuf,stats,kahan,pred"),
}
B = int(os.environ.get("MB", "512"))
STEPS = 64
ENGINE = os.environ.get("ABL_ENGINE", "ns")  # ns | blk_df32_cs2


def child(ablate):
    os.environ["RMT_TPU_ABLATE"] = ablate
    os.environ.setdefault("RMT_TPU_X64", "0")
    import numpy as np
    import jax.numpy as jnp
    from dme_case import make_model_input
    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    kw = dict(newton_iters=5, j_every=8)
    if ENGINE == "blk_df32_cs2":
        kw.update(accurate_rates="df32", exact_solve=True, cheap_sweeps=2)
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}

    def run(steps):
        ys, _ = run_n2_ensemble_lockstep(
            mi, sweep, rtol=1e-9, atol=1e-12, max_steps=steps, **kw)
        np.asarray(ys[-1, 0, 0])

    # steps-differencing: the per-INVOCATION fixed cost on this runtime
    # scales with program complexity (trivial jits ~26 ms, the full
    # integrator measured seconds), so total/steps overstates the
    # marginal attempt cost. t(64) - t(16) isolates 48 marginal attempts
    # (same compiled program family, same invocation overhead).
    t0 = time.perf_counter()
    run(16)
    t_compile16 = time.perf_counter() - t0
    t16 = best16 = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run(16)
        best16 = min(best16, time.perf_counter() - t0)
    t0 = time.perf_counter()
    run(STEPS)
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run(STEPS)
        best = min(best, time.perf_counter() - t0)
    marg = (best - best16) / (STEPS - 16)
    fixed = best16 - 16 * marg
    print(json.dumps({"total_s": round(best, 3),
                      "t16_s": round(best16, 3),
                      "ms_per_attempt": round(best / STEPS * 1e3, 1),
                      "marginal_ms": round(marg * 1e3, 1),
                      "fixed_s": round(fixed, 2),
                      "compile_s": round(t_compile16 + t_compile, 1)}),
          flush=True)


def main():
    if os.environ.get("ABL_CHILD") is not None:
        child(os.environ["ABL_CHILD"])
        return
    names = sys.argv[1:] or list(CASES)
    for name in names:
        env = dict(os.environ, ABL_CHILD=CASES[name])
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=1500)
        if proc.returncode:
            tail = (proc.stderr or "").strip().splitlines()
            print(f"{name}: FAILED {tail[-1][:120] if tail else ''}",
                  flush=True)
            continue
        d = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"{name:14s} marginal {d['marginal_ms']:7.1f} ms/attempt, "
              f"fixed {d['fixed_s']:6.2f}s "
              f"(t64 {d['total_s']:.2f}s, t16 {d['t16_s']:.2f}s, "
              f"compile {d['compile_s']:.0f}s, "
              f"wall {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
