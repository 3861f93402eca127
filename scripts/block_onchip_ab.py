# On-chip A/B of the exact block-bidiagonal stage solves vs the
# Newton-Schulz preconditioners (run after the block-solve landing).
# Usage: python scripts/block_onchip_ab.py [B]
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

X64 = os.environ["RMT_TPU_X64"] != "0"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
mi = make_model_input(model="N2")
sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
kw = dict(
    max_steps=768,
    rtol=1e-7 if X64 else 1e-5,
    atol=1e-10 if X64 else 1e-7,
    newton_iters=6 if X64 else 5,
)

for label, ex in (("block", True), ("ns", False)):
    def run():
        ys, st = run_n2_ensemble_lockstep(mi, sweep, exact_solve=ex, **kw)
        np.asarray(ys[-1, 0, 0])
        return ys, st

    t0 = time.perf_counter()
    run()
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ys, st = run()
        best = min(best, time.perf_counter() - t0)
    att = st.n_accepted + st.n_rejected
    print(f"{label}: B={B} best {best:.2f}s = {B / best:.1f} members/s "
          f"att {float(att.mean()):.0f}/{int(att.max())} "
          f"unf {int((st.seg < ys.shape[0] - 1).sum())}")
