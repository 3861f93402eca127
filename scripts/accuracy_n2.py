# Measures the f32-mode accuracy of the lockstep N2 ensemble against a
# converged f64 run of the SAME sweep (the bound quoted in STATUS.md).
# Two subprocesses because the float mode is a process-level config:
#   child f64: rtol=1e-9 atol=1e-12 (converged reference)
#   child f32: bench tolerances rtol=1e-5 atol=1e-7
# Relative error is measured on all output states with an atol floor.
# Usage: python scripts/accuracy_n2.py [B]
import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(x64: bool, b: int, path: str):
    sys.path.insert(0, ROOT)
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var (it grabs the
    # backend regardless); only the config knob actually selects cpu.
    # ACC_PLATFORM_F64 / ACC_PLATFORM_F32 override per child so the f32
    # leg can run on-chip against a CPU-converged f64 reference.
    plat = os.environ.get(
        "ACC_PLATFORM_F64" if x64 else "ACC_PLATFORM_F32",
        os.environ.get("ACC_PLATFORM", "cpu"))
    if plat == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(f"# child backend: {jax.default_backend()}", file=sys.stderr)
    import jax.numpy as jnp

    from dme_case import make_model_input
    from rmt_tpu.parallel import run_n2_ensemble_lockstep

    mi = make_model_input(model="N2")
    offs = np.linspace(-5.0, 5.0, b)
    sweep = {"T0": jnp.asarray(523.0 + offs)}
    kw = {}
    if os.environ.get("ACC_NO_PREDICT"):
        kw["predict_stages"] = False
    if os.environ.get("ACC_NO_BARRIER"):
        kw["newton_h_barrier"] = False
    if os.environ.get("ACC_EXACT"):
        kw["exact_solve"] = True
    if os.environ.get("ACC_ACCURATE") and not x64:
        # f32 leg, f64 kinetics chain ("1"), whole f64 RHS ("full"),
        # or compensated double-f32 chain ("df32" -- pure f32 process)
        acc = os.environ["ACC_ACCURATE"]
        kw["accurate_rates"] = acc if acc in ("full", "df32") else True
    # ACC_CHILD_X64: run the "f32 leg" slot as plain f64 at the same
    # tolerances -- isolates the TRUNCATION component of the error at
    # bench tolerances from f32 evaluation/state noise
    if x64:
        ys, st = run_n2_ensemble_lockstep(
            mi, sweep, max_steps=2048, rtol=1e-9, atol=1e-12, **kw)
    else:
        rtol = float(os.environ.get("ACC_RTOL", "1e-5"))
        atol = float(os.environ.get("ACC_ATOL", "1e-7"))
        kw.setdefault("newton_iters", int(os.environ.get("ACC_NI", "5")))
        if os.environ.get("ACC_JEVERY"):
            kw["j_every"] = int(os.environ["ACC_JEVERY"])
        max_steps = int(os.environ.get("ACC_MAX_STEPS", "768"))
        ys, st = run_n2_ensemble_lockstep(
            mi, sweep, max_steps=max_steps, rtol=rtol, atol=atol, **kw)
        print(f"# f32 attempts mean/max: "
              f"{float((st.n_accepted + st.n_rejected).mean()):.0f}/"
              f"{int((st.n_accepted + st.n_rejected).max())}",
              file=sys.stderr)
    n_out = ys.shape[0]
    assert int(jnp.sum(st.seg < n_out - 1)) == 0, "budget exhausted"
    np.save(path, np.asarray(ys, np.float64))


def main():
    if os.environ.get("ACC_CHILD"):
        x64, b, path = os.environ["ACC_CHILD"].split(";")
        child(x64 == "1", int(b), path)
        return
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    outs = {}
    for mode in ("1", "0"):
        path = f"/tmp/acc_n2_{mode}.npy"
        # accurate_rates needs float64 in the f32 child's process --
        # except the "df32" compensated chain, which is pure f32
        x64 = "1" if (mode == "1"
                      or os.environ.get("ACC_ACCURATE") not in (None, "df32")
                      or os.environ.get("ACC_CHILD_X64")) else "0"
        env = dict(os.environ, ACC_CHILD=f"{mode};{b};{path}",
                   RMT_TPU_X64=x64, JAX_PLATFORMS=os.environ.get(
                       "ACC_PLATFORM", "cpu"))
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, check=True)
        outs[mode] = np.load(path)
    ref, f32 = outs["1"], outs["0"]
    denom = np.maximum(np.abs(ref), 1e-7)
    rel = np.abs(f32 - ref) / denom
    print(json.dumps({
        "B": b,
        "max_rel_err": float(rel.max()),
        "mean_rel_err": float(rel.mean()),
        "platform": {
            m: os.environ.get(
                f"ACC_PLATFORM_F{m}",
                os.environ.get("ACC_PLATFORM", "cpu"))
            for m in ("64", "32")},
    }))


if __name__ == "__main__":
    main()
