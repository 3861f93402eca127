# On-chip micro-benchmark of the lockstep ensemble integrator (no
# reference timing): times run_n2_ensemble_lockstep at a given batch after
# one compile warmup. Usage: python scripts/bench_micro.py [B] [reps]
# Extra runner/solver kwargs ride RMT_AB_KW as a JSON dict, e.g.
#   RMT_AB_KW='{"j_every": 8}' python scripts/bench_micro.py 512
#   RMT_TPU_X64=1 RMT_AB_KW='{"accurate_rates": true}' ...  (hybrid f32)
import json
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax.numpy as jnp

from dme_case import make_model_input
from rmt_tpu.parallel import run_n2_ensemble_lockstep

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
KW = json.loads(os.environ.get("RMT_AB_KW", "{}"))
X64 = os.environ["RMT_TPU_X64"] != "0"
HYBRID = KW.get("accurate_rates")  # f32 state in an x64 process
RTOL, ATOL = (1e-7, 1e-10) if (X64 and not HYBRID) else (1e-5, 1e-7)
RTOL = float(os.environ.get("RMT_AB_RTOL", RTOL))
ATOL = float(os.environ.get("RMT_AB_ATOL", ATOL))

mi = make_model_input(model="N2")


def run(offs):
    sweep = {"T0": jnp.asarray(523.0 + offs)}
    ys, stats = run_n2_ensemble_lockstep(
        mi, sweep, max_steps=768, rtol=RTOL, atol=ATOL, newton_iters=5,
        **KW,
    )
    np.asarray(ys[-1, 0, 0])  # host sync
    return ys, stats


offs = np.linspace(-5.0, 5.0, B)
t0 = time.perf_counter()
ys, stats = run(offs)
print(f"compile+first run: {time.perf_counter() - t0:.2f}s")
best = float("inf")
for _ in range(REPS):
    t0 = time.perf_counter()
    ys, stats = run(offs)
    best = min(best, time.perf_counter() - t0)
unfinished = int(jnp.sum(stats.seg < ys.shape[0] - 1))
print(f"B={B} best {best:.3f}s = {B / best:.2f} members/s "
      f"(unfinished {unfinished}, acc {int(jnp.max(stats.n_accepted))} max, "
      f"rej {int(jnp.max(stats.n_rejected))} max)")
