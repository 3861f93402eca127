# Generate the CPU-converged f64 reference states for the bench accuracy
# probes and store them as a committed artifact (bench_ref.npz at the repo
# root). bench.py loads this file instead of spending ~10 min of the
# driver's bench budget recomputing a bit-identical deterministic result
# (CPU float64, fixed tolerances, fixed sweep); regeneration is this
# script (or RMT_BENCH_REGEN_REF=1 in bench.py).
#
# The probe sweep is a T0 offset grid (64 points for the headline DME
# chemistry, 16 for the CH4 guard); the throughput legs splice these
# exact offsets into their big sweep so accuracy is measured at the
# headline batch size from the same run.

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["RMT_TPU_X64"] = "1"

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from rmt_tpu.parallel import run_n2_ensemble_lockstep

RTOL, ATOL = 1e-9, 1e-12
MAX_STEPS = 2048


def converged(model_input, t_base, acc_b):
    offsets = np.linspace(-5.0, 5.0, acc_b)
    sweep = {"T0": jnp.asarray(t_base + offsets)}
    ys, stats = run_n2_ensemble_lockstep(
        model_input, sweep, max_steps=MAX_STEPS, rtol=RTOL, atol=ATOL,
        newton_iters=6,
    )
    assert int(jnp.sum(stats.seg < ys.shape[0] - 1)) == 0, "budget exhausted"
    return offsets, np.asarray(ys, np.float64)


def main():
    import dme_case
    import ch4_case

    out = {}
    for name, factory, t_base, acc_b in (
        # 64 DME probes: 16/131072 was thin evidence for the headline
        # accuracy claim (VERDICT r4 #8); CH4 stays 16 (guard only)
        ("dme", lambda: dme_case.make_model_input(model="N2"), 523.0, 64),
        ("ch4", lambda: ch4_case.make_model_input(model="N2"), 973.0, 16),
    ):
        offsets, ys = converged(factory(), t_base, acc_b)
        out[f"{name}_offsets"] = offsets
        out[f"{name}_ys"] = ys
        out[f"{name}_t_base"] = np.float64(t_base)
        print(f"{name}: ys {ys.shape}, finite={np.isfinite(ys).all()}")
    out["rtol"] = np.float64(RTOL)
    out["atol"] = np.float64(ATOL)
    path = os.path.join(ROOT, "bench_ref.npz")
    np.savez_compressed(path, **out)
    print("saved", path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
