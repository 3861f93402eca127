# HBM budget audit of the bench f32x invocation (VERDICT r4 #2).
#
# The axon runtime exposes NO runtime memory surface
# (device.memory_stats() is None), but XLA's compile-side
# memory_analysis() works: AOT-lower the EXACT bench program at each
# candidate batch size -- with the full (tNo, B, n) trajectory output
# and with the probe-only out_members buffer -- and record
# argument/output/temp bytes. This is the budget table that decides
# whether B can rise past 131072 and what owns the ceiling.
#
# Usage:  python scripts/hbm_audit.py [B ...]   (default sweep below)
# Writes one JSON line per configuration.

import json
import os
import sys
import time

# f32 process like the bench child: an x64 process leaks int64 iotas into
# the fused Pallas kernel, and Mosaic's int64->int32 convert lowering
# recurses forever (jax 0.9 _convert_helper punts back to itself)
os.environ.setdefault("RMT_TPU_X64", "0")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np

import jax
import jax.numpy as jnp

from dme_case import make_model_input
from rmt_tpu.parallel import run_n2_ensemble_lockstep

F32X = dict(max_steps=768, rtol=7e-7, atol=1e-9, newton_iters=5,
            j_every=8, accurate_rates="df32", exact_solve=True,
            cheap_sweeps=2)


def audit(b, probe_only, acc_b=64):
    mi = make_model_input(model="N2")
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, b))}
    kw = dict(F32X)
    if probe_only:
        kw["out_members"] = np.round(
            np.linspace(0, b - 1, min(acc_b, b))).astype(int)
    t0 = time.perf_counter()
    lowered = run_n2_ensemble_lockstep(mi, sweep, lower_only=True, **kw)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    gib = 1 << 30
    rec = {
        "B": b,
        "probe_only": bool(probe_only),
        "arg_gib": round(ma.argument_size_in_bytes / gib, 3),
        "out_gib": round(ma.output_size_in_bytes / gib, 3),
        "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
        "alias_gib": round(ma.alias_size_in_bytes / gib, 3),
        "total_gib": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / gib, 3),
        "t_lower_s": round(t_lower, 1),
        "t_compile_s": round(t_compile, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    bs = [int(a) for a in sys.argv[1:]] or [131072, 262144, 524288]
    for b in bs:
        for probe_only in (False, True):
            try:
                audit(b, probe_only)
            except Exception as e:
                print(json.dumps({"B": b, "probe_only": probe_only,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
