# On-chip throughput of the N1 steady-state ensemble (BASELINE configs
# #1/#3: the reference's primary documented use, pbHomoReactor.py:
# 2918-2932 -- solve_ivp over z with 101 output points) on the lockstep
# stiff integrator, vs ONE sequential reference PyREMOT N1 run on this
# host (--ref measures it; SciPy LSODA, default tolerances).
#
# The N1 state is tiny (n_comp + 2 = 8), so the lockstep engine runs it
# in plain NS mode; accuracy is probed against a CPU-f64-converged run
# of the same 8-member sweep (computed live -- cheap at n = 8).
# Usage: python scripts/bench_n1.py [B ...] [--ref]
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np
import jax

if os.environ.get("RMT_BENCH_CPU"):  # smoke tests off-TPU (env alone is
    jax.config.update("jax_platforms", "cpu")  # ignored by the axon plugin)
import jax.numpy as jnp

from dme_case import make_model_input
from rmt_tpu.models import homo
from rmt_tpu.parallel import batch_params
from rmt_tpu.solvers import stiff_ensemble

RTOL, ATOL = 1e-5, 1e-7
ACC_B = 8


def build(mi, b, t_offsets):
    spec = homo.build_spec(mi)
    base = homo.build_params(mi)
    params, axes = batch_params(base, {"T0": jnp.asarray(523.0 + t_offsets)})
    rhs = homo.make_n1_rhs(spec)

    def derive(q):
        d = homo.feed_state(spec, q)
        return d, homo.n1_initial_state(spec, q, d)

    dB, y0B = jax.vmap(derive, in_axes=(axes,))(params)
    fB = jax.vmap(rhs, in_axes=(0, 0, axes, 0))
    f_batched = lambda t, y: fB(t, y, params, dB)
    ts = jnp.linspace(0.0, 1.0, spec.z_out + 1).astype(y0B.dtype)
    return f_batched, y0B, ts


def run(mi, b, t_offsets, rtol=RTOL, atol=ATOL, max_steps=1536,
        dense_output=True):
    # dense_output: boundary states from the Radau collocation
    # interpolant (round-5 feature) -- without it the z-grid forces a
    # stop at each of the 101 output boundaries (the reference's LSODA
    # uses dense output and doesn't) and a trajectory costs ~1700
    # attempts (measured CPU B=16: mean 1683 / max 1835) instead of the
    # ~300 natural steps
    f_batched, y0B, ts = build(mi, b, t_offsets)
    ys, st = stiff_ensemble.odeint_ensemble(
        f_batched, y0B, ts, rtol=rtol, atol=atol, max_steps=max_steps,
        newton_iters=5, j_every=8, batched=True, dense_output=dense_output,
    )
    np.asarray(ys[-1, 0, 0])  # host sync
    return ys, st


def measure_reference():
    sys.path.insert(0, "/root/reference")
    import io
    from contextlib import redirect_stdout
    import matplotlib

    matplotlib.use("Agg")
    from PyREMOT import rmtExe as ref_exe

    mi = make_model_input(model="N1")
    t0 = time.perf_counter()
    with redirect_stdout(io.StringIO()):
        ref_exe(mi)
    return time.perf_counter() - t0


def main():
    bs = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [4096]
    mi = make_model_input(model="N1")

    t_ref = None
    if "--ref" in sys.argv:
        t_ref = measure_reference()
        print(f"reference N1 (scipy LSODA, this host): {t_ref:.2f}s")

    # accuracy probe: ACC_B-member sweep vs a CPU-f64-converged run
    probe_off = np.linspace(-5.0, 5.0, ACC_B)
    import subprocess, json as _json
    if os.environ.get("N1_REF_CHILD"):
        os.environ["RMT_TPU_X64"] = "1"
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_platforms", "cpu")
        ys, _ = run(mi, ACC_B, probe_off, rtol=1e-10, atol=1e-13,
                    max_steps=4096)
        np.save("/tmp/n1_ref.npy", np.asarray(ys, np.float64))
        return

    env = dict(os.environ, N1_REF_CHILD="1")
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   check=True, timeout=600)
    ref = np.load("/tmp/n1_ref.npy")

    for b in bs:
        offs = np.linspace(-5.0, 5.0, b)
        idx = np.round(np.linspace(0, b - 1, ACC_B)).astype(int)
        offs[idx] = probe_off
        t0 = time.perf_counter()
        ys, st = run(mi, b, offs)
        t_c = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            ys, st = run(mi, b, offs)
            best = min(best, time.perf_counter() - t0)
        att = np.asarray(st.n_accepted + st.n_rejected)
        unfin = int(jnp.sum(st.seg < ys.shape[0] - 1))
        got = np.asarray(ys, np.float64)[:, idx, :]
        rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-7)
        mps = b / best
        line = (f"N1 B={b}: wall {best:.2f}s = {mps:.1f} members/s, "
                f"attempts mean {att.mean():.0f} max {att.max()}, "
                f"unfinished {unfin}, max_rel_err {rel.max():.3g} "
                f"(probe {ACC_B}), compile+first {t_c:.0f}s")
        if t_ref:
            line += f", vs_baseline {mps * t_ref:.0f}x"
        print(line, flush=True)


if __name__ == "__main__":
    main()
