# On-chip wall-clock of the adjoint-gradient estimation step (BASELINE
# config #5 -- no reference equivalent exists): one jitted SGD step over
# log-kinetic constants, forward = IFT-differentiable fixed-step Radau
# (solvers/implicit_diff.py) at the REAL 0.5 s stiff operating period,
# backward = implicit-function-theorem adjoints. Same configuration as
# the driver's multichip dryrun phase 1 (z_no=8, n_steps=12), B swept.
# Usage: python scripts/bench_estimation.py [B ...]
import math
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
from rmt_tpu.parallel.estimation import make_estimation_step


def main():
    bs = [int(a) for a in sys.argv[1:]] or [512]
    mi = make_model_input(model="N2", op_period=0.5)
    spec = homo.build_spec(mi, z_no=8, t_no=1)
    base = homo.build_params(mi)

    RT = 8.314472 * 523.0
    theta0 = {
        "K1": jnp.asarray(math.log(35.45 * math.exp(-1.7069e4 / RT))),
        "K2": jnp.asarray(math.log(7.3976 * math.exp(-2.0436e4 / RT))),
        "K3": jnp.asarray(math.log(8.2894e4 * math.exp(-5.2940e4 / RT))),
    }

    for b in bs:
        sweep = {"T0": jnp.asarray(523.0 + np.linspace(-4.0, 4.0, b))}
        params, axes = batch_params(base, sweep)
        target = jnp.full((b, spec.n_comp), 1.0 / spec.n_comp)
        step = make_estimation_step(
            spec, axes, target, n_steps=12, lr=1e-3, integrator="radau"
        )
        t0 = time.perf_counter()
        theta, loss = step(theta0, params)
        float(loss)
        t_c = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            theta, loss = step(theta0, params)
            float(loss)
            best = min(best, time.perf_counter() - t0)
        assert all(bool(jnp.isfinite(v)) for v in theta.values())
        print(f"estimation B={b}: step wall {best:.2f}s "
              f"({b / best:.1f} members/s fwd+adjoint), loss "
              f"{float(loss):.6g}, compile+first {t_c:.0f}s", flush=True)


if __name__ == "__main__":
    main()
