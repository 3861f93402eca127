# On-chip probe of the runtime's cost model on the REAL bench configs:
#   wall(B, max_steps) for the f32x and f32 legs at bench tolerances.
# ablate_inplace steps-differencing found marginal per-attempt cost ~0
# at B=512 (t(64 attempts) == t(16) within noise; the whole wall is a
# per-invocation fixed cost scaling with program complexity). If that
# holds at bench tolerances and larger B, members/s is purely
# B / F(program, B) and the optimization target is program complexity,
# not attempts or kernel speed.
# Usage: python scripts/fixed_cost_probe.py [f32x|f32] [B ...]
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

LEG = sys.argv[1] if len(sys.argv) > 1 else "f32x"
BS = [int(b) for b in sys.argv[2:]] or [512, 1024]

if LEG == "f32x":
    kw = dict(rtol=7e-7, atol=1e-9, newton_iters=5, j_every=8,
              accurate_rates="df32", exact_solve=True, cheap_sweeps=2)
    steps_lo, steps_hi = 768, 768
elif LEG == "f32blk":
    # the loose-tolerance plain-f32 leg on the exact-block engine: no
    # dense (B,n,n) NS carries, so B scales like the f32x leg's
    kw = dict(rtol=1e-5, atol=1e-7, newton_iters=5, j_every=8,
              exact_solve=True)
    steps_lo, steps_hi = 768, 768
else:
    kw = dict(rtol=1e-5, atol=1e-7, newton_iters=5, j_every=8)
    steps_lo, steps_hi = 768, 768


def main():
    mi = make_model_input(model="N2")
    for B in BS:
        sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
        for steps in ([steps_lo] if steps_lo == steps_hi else [steps_lo, steps_hi]):
            t0 = time.perf_counter()
            ys, st = run_n2_ensemble_lockstep(
                mi, sweep, max_steps=steps, **kw)
            np.asarray(ys[-1, 0, 0])
            t_c = time.perf_counter() - t0
            best = np.inf
            att = None
            for _ in range(2):
                t0 = time.perf_counter()
                ys, st = run_n2_ensemble_lockstep(
                    mi, sweep, max_steps=steps, **kw)
                np.asarray(ys[-1, 0, 0])
                best = min(best, time.perf_counter() - t0)
                att = st.n_accepted + st.n_rejected
            unfin = int(jnp.sum(st.seg < ys.shape[0] - 1))
            print(f"{LEG} B={B} max_steps={steps}: wall {best:.2f}s "
                  f"({B/best:.2f} members/s), attempts mean "
                  f"{float(jnp.mean(att)):.0f} max {int(jnp.max(att))}, "
                  f"unfinished {unfin}, compile+first {t_c:.0f}s",
                  flush=True)


if __name__ == "__main__":
    main()
