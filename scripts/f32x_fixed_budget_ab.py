# On-chip attempt-cost decomposition under a FIXED budget: max_steps=64
# with tolerances nobody finishes at, so wall = 64 x attempt cost with
# no early-exit or attempt-count confounds (the tunnel's run-to-run
# noise swamped differencing on finished runs).
#
#   ni2 / ni5 / ni8   -> slope = cost per Newton sweep (df32 stage eval
#                        + solve apply + norms)
#   j8 / j64 at ni5   -> refresh amortization (colored J + extract)
#   plain vs df32     -> the df32 chain's per-attempt premium
#   ns vs block       -> solve-machinery premium
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
STEPS = 64
CASES = {
    "blk_df32_ni2_j8": dict(newton_iters=2, j_every=8,
                            accurate_rates="df32", exact_solve=True),
    "blk_df32_ni5_j8": dict(newton_iters=5, j_every=8,
                            accurate_rates="df32", exact_solve=True),
    "blk_df32_ni8_j8": dict(newton_iters=8, j_every=8,
                            accurate_rates="df32", exact_solve=True),
    "blk_df32_ni5_j64": dict(newton_iters=5, j_every=64,
                             accurate_rates="df32", exact_solve=True),
    "blk_plain_ni5_j8": dict(newton_iters=5, j_every=8, exact_solve=True),
    "ns_df32_ni5_j8": dict(newton_iters=5, j_every=8,
                           accurate_rates="df32"),
    "ns_plain_ni5_j8": dict(newton_iters=5, j_every=8),
    "blk_df32_ni5_j8_cs2": dict(newton_iters=5, j_every=8,
                                accurate_rates="df32", exact_solve=True,
                                cheap_sweeps=2),
    "blk_df32_ni5_j8_cs2_fused": dict(newton_iters=5, j_every=8,
                                      accurate_rates="df32",
                                      exact_solve=True, cheap_sweeps=2,
                                      fused_rhs=True),
    "blk_df32_ni5_j8_fused": dict(newton_iters=5, j_every=8,
                                  accurate_rates="df32", exact_solve=True,
                                  fused_rhs=True),
    "ns_plain_ni5_j8_fused": dict(newton_iters=5, j_every=8,
                                  fused_rhs=True),
}


def main():
    names = sys.argv[1:] or list(CASES)
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
    for name in names:
        kw = CASES[name]
        run = lambda: run_n2_ensemble_lockstep(
            mi, sweep, rtol=1e-9, atol=1e-12, max_steps=STEPS, **kw)
        ys, stats = run()
        np.asarray(ys[-1, 0, 0])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            ys, stats = run()
            np.asarray(ys[-1, 0, 0])
            best = min(best, time.perf_counter() - t0)
        att = stats.n_accepted + stats.n_rejected
        print(f"{name}: {best:.2f}s -> {best / STEPS * 1e3:.1f} "
              f"ms/attempt (att max {int(jnp.max(att))})", flush=True)


if __name__ == "__main__":
    main()
