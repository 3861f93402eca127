# On-chip throughput of the M13 operator-splitting ensemble on the
# scan-based lockstep engine (run_m13_sweep(engine="lockstep")): gas MoL
# on exact block-tridiagonal stage solves, solid particle BVPs as
# batched PTC + lockstep Newton. The vmap engine is while_loop-based
# (radau + newton.root), which the tunneled TPU runtime executes ~100x
# slower per iteration -- so this script reports the lockstep engine
# only, plus a CPU single-member reference for the speedup.
# Usage: python scripts/bench_m13.py [B] [--engine lockstep|vmap]
import argparse
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np
import jax.numpy as jnp

from test_m13 import _m13_model_input
from rmt_tpu.parallel import run_m13_sweep

ap = argparse.ArgumentParser()
ap.add_argument("B", nargs="?", type=int, default=256)
ap.add_argument("--engine", default="lockstep")
ap.add_argument("--zno", type=int, default=10)
ap.add_argument("--rno", type=int, default=7)
ap.add_argument("--tno", type=int, default=5)
args = ap.parse_args()

mi = _m13_model_input()
mi["solver-config"] = dict(
    mi.get("solver-config", {}), zNo=args.zno, rNo=args.rno, tNo=args.tno
)
T0 = float(mi["operating-conditions"]["temperature"])
sweep = {"T0": jnp.asarray(T0 + np.linspace(0.0, 8.0, args.B))}


def run():
    out = run_m13_sweep(mi, sweep, engine=args.engine)
    np.asarray(out["gas"][-1, 0, 0])
    return out


t0 = time.perf_counter()
out = run()
print(f"{args.engine}: compile+first {time.perf_counter() - t0:.1f}s")
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    out = run()
    best = min(best, time.perf_counter() - t0)
nconv = int(jnp.sum(out["converged"]))
nunr = int(jnp.sum(out["unreached"]))
print(
    f"{args.engine}: B={args.B} zNo={args.zno} rNo={args.rno} "
    f"tNo={args.tno} best {best:.2f}s = {args.B / best:.1f} members/s "
    f"converged {nconv}/{args.B} unreached {nunr}"
)
