# Wall-clock of ONE reference PyREMOT M13 run (pbHeterReactor.runM2,
# operator splitting: scipy solve_ivp gas phase + fsolve solid phase per
# interval) on this host, with the same geometry/chemistry family as
# tests/test_m13.py -- the baseline for the M13 ensemble perf story
# (VERDICT r4 #5). The reference M13 integrates its own (linearly
# unstable, documented in models/hetero_dyn.py) interphase-flux sign; we
# only time it, we don't compare states here (state parity lives in
# tests/test_m13.py against the reference's own equations).
import io
import os
import sys
import time
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, "/root/reference")

import matplotlib

matplotlib.use("Agg")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from test_m13 import _m13_model_input

    mi = _m13_model_input()
    from PyREMOT import rmtExe as ref_exe

    t0 = time.perf_counter()
    try:
        with redirect_stdout(io.StringIO()):
            ref_exe(mi)
        dt = time.perf_counter() - t0
        print(f"reference M13 (scipy, this host): {dt:.2f}s")
    except Exception as e:
        dt = time.perf_counter() - t0
        print(f"reference M13 CRASHED after {dt:.2f}s: "
              f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
