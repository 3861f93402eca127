# On-chip A/B for the f32x (block+df32) leg: Newton sweeps per attempt
# and Jacobian refresh cadence. With exact stage solves the only role of
# J freshness is Newton contraction, and the df32 rates make Newton
# smooth (119-130 attempts vs plain's ~390), so fewer sweeps / sparser
# refreshes trade compute per attempt against attempt count directly.
# Usage: python scripts/f32x_newton_ab.py ni5_j8 ni4_j8 ni3_j8 ni5_j16
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dme_case import make_model_input  # noqa: E402
from rmt_tpu.parallel import run_n2_ensemble_lockstep  # noqa: E402

B = int(os.environ.get("MB", "512"))
CASES = {
    "ni5_j8": dict(newton_iters=5, j_every=8),
    "ni4_j8": dict(newton_iters=4, j_every=8),
    "ni3_j8": dict(newton_iters=3, j_every=8),
    "ni5_j16": dict(newton_iters=5, j_every=16),
    "ni4_j16": dict(newton_iters=4, j_every=16),
}


def main():
    names = sys.argv[1:] or ["ni4_j8", "ni3_j8", "ni5_j16"]
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
    for name in names:
        kw = CASES[name]
        run = lambda: run_n2_ensemble_lockstep(
            mi, sweep, rtol=7e-7, atol=1e-9, max_steps=768,
            accurate_rates="df32", exact_solve=True, **kw)
        ys, stats = run()
        np.asarray(ys[-1, 0, 0])
        t0 = time.perf_counter()
        ys, stats = run()
        np.asarray(ys[-1, 0, 0])
        dt = time.perf_counter() - t0
        att = stats.n_accepted + stats.n_rejected
        unf = int(jnp.sum(stats.seg < ys.shape[0] - 1))
        print(f"{name}: {dt:.2f}s = {B / dt:.2f} members/s, att mean "
              f"{float(jnp.mean(att)):.0f} max {int(jnp.max(att))} "
              f"unf {unf}", flush=True)


if __name__ == "__main__":
    main()
