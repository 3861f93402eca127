# Standalone per-eval cost of the fused N2 RHS kernels at ensemble scale
# (round-5 attribution follow-up: stage-residual RHS evals own ~89% of
# the large-B marginal -- 197 of 221.7 ms/attempt at B=65536 by in-situ
# ablation). This probe times the df32 and plain fused kernels (and the
# stage-stacked 3B form) OUTSIDE the integrator to discriminate
# compute-bound (df32 ~8-20x the plain flops -> df32 much slower) from
# launch/grid-bound (equal cost per launch).
# Usage: python scripts/rhs_eval_cost.py [B ...]
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np
import jax
import jax.numpy as jnp

from dme_case import make_model_input
from rmt_tpu.models import homo
from rmt_tpu.ops import pallas_rhs
from rmt_tpu.parallel.ensemble import batch_params

N_REPS = 30  # kernel launches per timed call (amortizes invocation cost)


def setup(b):
    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi)
    base = homo.build_params(mi)
    params, axes = batch_params(
        base, {"T0": jnp.asarray(523.0 + np.linspace(-5, 5, b))})

    def derive(q):
        d = homo.feed_state(spec, q)
        return d, homo.n2_initial_state(spec, q, d)

    dB, y0B = jax.vmap(derive, in_axes=(axes,))(params)
    pB = {}
    for k, v in params.items():
        if k == "kinetic_overrides":
            pB[k] = {kk: (vv if axes[k][kk] == 0 else jnp.broadcast_to(
                jnp.asarray(vv)[None], (b,) + jnp.asarray(vv).shape))
                for kk, vv in v.items()}
        elif axes[k] == 0:
            pB[k] = v
        else:
            arr = jnp.asarray(v)
            pB[k] = jnp.broadcast_to(arr[None], (b,) + arr.shape)
    return spec, pB, dB, y0B


def timed(fn, y, label):
    # chain N_REPS dependent evals inside ONE jitted call so per-launch
    # cost is isolated from the per-invocation fixed cost
    @jax.jit
    def many(y):
        def body(y, _):
            out = fn(None, y)
            return y + 1e-20 * out, None
        y, _ = jax.lax.scan(body, y, None, length=N_REPS)
        return y

    np.asarray(many(y)[0, 0])  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(many(y)[0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best / N_REPS * 1e3:.2f} ms/eval "
          f"({best:.2f}s / {N_REPS})", flush=True)
    return best / N_REPS


def main():
    bs = [int(a) for a in sys.argv[1:]] or [65536]
    for b in bs:
        spec, pB, dB, y0B = setup(b)
        f_df32 = pallas_rhs.build_n2_fused(spec, accurate_rates="df32")
        f_plain = pallas_rhs.build_n2_fused(spec)
        print(f"B={b}:", flush=True)
        t_d = timed(lambda t, y: f_df32(t, y, pB, dB), y0B, "df32 single-B")
        t_p = timed(lambda t, y: f_plain(t, y, pB, dB), y0B, "plain single-B")
        # stage-stacked 3B form (what the Newton sweeps actually call)
        y3 = jnp.concatenate([y0B, y0B, y0B], axis=0)
        pB3 = {}
        for k, v in pB.items():
            if k == "kinetic_overrides":
                pB3[k] = {kk: (jnp.tile(vv, (3,) + (1,) * (vv.ndim - 1))
                               if hasattr(vv, "ndim") and vv.ndim >= 1
                               and vv.shape[0] == b else vv)
                          for kk, vv in v.items()}
            elif hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == b:
                pB3[k] = jnp.tile(v, (3,) + (1,) * (v.ndim - 1))
            else:
                pB3[k] = v
        dB3 = jax.tree.map(lambda x: jnp.tile(
            x, (3,) + (1,) * (x.ndim - 1)) if hasattr(x, "ndim")
            and x.ndim >= 1 and x.shape[0] == b else x, dB)
        t_3 = timed(lambda t, y: f_df32(t, y, pB3, dB3), y3, "df32 3B-stacked")
        print(f"  ratio df32/plain {t_d / t_p:.2f}, 3B/single {t_3 / t_d:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
