# On-chip A/B: hybrid-precision Newton (cheap_sweeps) on the f32x leg.
# Usage: python scripts/f32x_cs_ab.py [B] [cs...]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CS = [int(c) for c in sys.argv[2:]] or [2]

LEG = dict(rtol=7e-7, atol=1e-9, max_steps=768, newton_iters=5,
           j_every=8, accurate_rates="df32", exact_solve=True)


def main():
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
    for cs in CS:
        run = lambda: run_n2_ensemble_lockstep(
            mi, sweep, cheap_sweeps=cs, **LEG)
        ys, stats = run()
        np.asarray(ys[-1, 0, 0])  # compile + sync
        t0 = time.perf_counter()
        ys, stats = run()
        np.asarray(ys[-1, 0, 0])
        dt = time.perf_counter() - t0
        att = stats.n_accepted + stats.n_rejected
        unf = int(jnp.sum(stats.seg < ys.shape[0] - 1))
        print(f"cs={cs}: {dt:.2f}s = {B / dt:.2f} members/s "
              f"att mean {int(jnp.mean(att))} max {int(jnp.max(att))} "
              f"unf {unf}", flush=True)


if __name__ == "__main__":
    main()
