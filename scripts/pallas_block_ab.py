# On-chip A/B of the fused Pallas block-solve kernels vs the XLA block
# formulation, at the f32x north-star leg configuration (df32 kinetics,
# exact block solves, rtol=7e-7). Usage:
#   python scripts/pallas_block_ab.py [B] [reps]
# RMT_TPU_PALLAS gates the kernel inside each leg; this script forces it
# per leg via use_pallas.
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
mi = make_model_input(model="N2")
sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
kw = dict(
    max_steps=768, rtol=7e-7, atol=1e-9, newton_iters=5,
    j_every=8, accurate_rates="df32", exact_solve=True,
)

for label, up in (("pallas-block", True), ("xla-block", False)):
    def run():
        ys, st = run_n2_ensemble_lockstep(mi, sweep, use_pallas=up, **kw)
        np.asarray(ys[-1, 0, 0])
        return ys, st

    t0 = time.perf_counter()
    run()
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        ys, st = run()
        best = min(best, time.perf_counter() - t0)
    att = st.n_accepted + st.n_rejected
    print(f"{label}: B={B} best {best:.2f}s = {B / best:.2f} members/s "
          f"att {float(att.mean()):.0f}/{int(att.max())} "
          f"unf {int((st.seg < ys.shape[0] - 1).sum())}", flush=True)
