# On-chip probe: f32x leg throughput vs batch unit.
#
# The tunneled runtime charges a fixed ~17-23 s per executable
# invocation, so the bench's f32x unit (microbatch per call) trades
# fixed-cost amortization against the runtime's long-invocation kill
# limit (~300 s in one program crashes the worker). At the XLA-block
# 8.8 members/s, 512/call was the safe unit; the Pallas block kernel's
# 11.7 members/s re-opens the question. Usage:
#   python scripts/f32x_batch_probe.py 512 1024
#   python scripts/f32x_batch_probe.py 2x512      (microbatch scan-in-call)
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

LEG = dict(rtol=7e-7, atol=1e-9, max_steps=768, newton_iters=5,
           j_every=8, accurate_rates="df32", exact_solve=True,
           cheap_sweeps=2)


def run(b, microbatch=None):
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, b))}
    ys, stats = run_n2_ensemble_lockstep(
        mi, sweep, microbatch=microbatch, **LEG)
    np.asarray(ys[-1, 0, 0])  # host sync
    return ys, stats


def main():
    specs = sys.argv[1:] or ["512", "1024"]
    for spec in specs:
        if "x" in spec:
            k, b = map(int, spec.split("x"))
            total, mb = k * b, b
        else:
            total, mb = int(spec), None
        run(total, mb)  # compile
        t0 = time.perf_counter()
        ys, stats = run(total, mb)
        dt = time.perf_counter() - t0
        att = stats.n_accepted + stats.n_rejected
        unf = int(jnp.sum(stats.seg < ys.shape[0] - 1))
        print(f"{spec}: {dt:.2f}s = {total / dt:.2f} members/s "
              f"att mean {int(jnp.mean(att))} max {int(jnp.max(att))} "
              f"unf {unf}", flush=True)


if __name__ == "__main__":
    main()
