# A/B of the Newton-rate-keyed step-growth cap (theta_target) in the
# lockstep integrator: attempts mean/max + rejection breakdown at bench
# tolerances. Usage: python scripts/ab_theta.py [B] [f32|f64] [targets...]
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODE = sys.argv[2] if len(sys.argv) > 2 else "f32"
TARGETS = [None if t == "off" else float(t) for t in sys.argv[3:]] or [
    None, 0.1, 0.25, 0.5]
os.environ["RMT_TPU_X64"] = "1" if MODE == "f64" else "0"

import jax

if os.environ.get("AB_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import time

import jax.numpy as jnp
import numpy as np

from dme_case import make_model_input
from rmt_tpu.parallel import run_n2_ensemble_lockstep

RTOL, ATOL = (1e-7, 1e-10) if MODE == "f64" else (1e-5, 1e-7)
NI = 6 if MODE == "f64" else 5

mi = make_model_input(model="N2")
sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}

for tgt in TARGETS:
    t0 = time.perf_counter()
    ys, st = run_n2_ensemble_lockstep(
        mi, sweep, max_steps=768, rtol=RTOL, atol=ATOL, newton_iters=NI,
        theta_target=tgt,
    )
    np.asarray(ys[-1, 0, 0])
    dt = time.perf_counter() - t0
    att = np.asarray(st.n_accepted + st.n_rejected)
    unfin = int(jnp.sum(st.seg < ys.shape[0] - 1))
    print(
        f"theta_target={tgt}: attempts mean {att.mean():.0f} max {att.max()}"
        f" | acc {np.asarray(st.n_accepted).mean():.0f}"
        f" rej(conv/err/rho) {int(np.asarray(st.n_rej_conv).sum())}/"
        f"{int(np.asarray(st.n_rej_err).sum())}/"
        f"{int(np.asarray(st.n_rej_rho).sum())}"
        f" | unfinished {unfin} | {dt:.1f}s", flush=True,
    )
