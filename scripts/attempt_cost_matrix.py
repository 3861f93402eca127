# On-chip 2x2 differencing: per-attempt cost of {NS, block-pallas} x
# {plain f32 rates, df32 rates} at identical tolerances (B=512,
# rtol=1e-5). Attributes the f32x leg's ~280 ms/attempt (vs the NS
# leg's ~30 ms) to the block path vs the df32 RHS chain.
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
    "ns+plain": dict(),
    "ns+df32": dict(accurate_rates="df32"),
    "block+plain": dict(exact_solve=True),
    "block+df32": dict(exact_solve=True, accurate_rates="df32"),
}


def main():
    names = sys.argv[1:] or list(CASES)
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
    for name in names:
        kw = CASES[name]
        run = lambda: run_n2_ensemble_lockstep(
            mi, sweep, rtol=1e-5, atol=1e-7, max_steps=768,
            newton_iters=5, j_every=8, **kw)
        ys, stats = run()
        np.asarray(ys[-1, 0, 0])
        t0 = time.perf_counter()
        ys, stats = run()
        np.asarray(ys[-1, 0, 0])
        dt = time.perf_counter() - t0
        att = stats.n_accepted + stats.n_rejected
        att_mean = float(jnp.mean(att))
        unf = int(jnp.sum(stats.seg < ys.shape[0] - 1))
        # ~5 s fixed invocation cost measured by batch-size differencing
        per_att = (dt - 5.0) / max(float(jnp.max(att)), 1.0) * 1e3
        print(f"{name}: {dt:.2f}s = {B / dt:.2f} members/s, att mean "
              f"{att_mean:.0f} max {int(jnp.max(att))} unf {unf} -> "
              f"~{per_att:.0f} ms/attempt", flush=True)


if __name__ == "__main__":
    main()
