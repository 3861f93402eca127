# On-chip probe of the fused Pallas N2 RHS (ops/pallas_rhs.py):
#   1. does Mosaic compile the plain and df32 kernels at all (compile t)?
#   2. do the values match the on-chip XLA RHS paths?
#   3. per-eval cost fused vs XLA (jitted, B and 3B stage-stacked shapes)
# Usage: python scripts/fused_rhs_probe.py [plain df32] [B]
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dme_case import make_model_input  # noqa: E402
from rmt_tpu.models import homo  # noqa: E402
from rmt_tpu.ops import pallas_rhs  # noqa: E402
from rmt_tpu.parallel import batch_params  # noqa: E402

B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MODES = sys.argv[1].split(",") if len(sys.argv) > 1 else ["plain", "df32"]


def setup(B):
    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi, z_no=20, t_no=5)
    base = homo.build_params(mi)
    sweep = {"T0": jnp.asarray(523.0 + np.linspace(-5.0, 5.0, B))}
    params, axes = batch_params(base, sweep)

    def derive(q):
        d = homo.feed_state(spec, q)
        return d, homo.n2_initial_state(spec, q, d)

    dB, y0B = jax.vmap(derive, in_axes=(axes,))(params)

    def bcast(val, ax):
        arr = jnp.asarray(val)
        return arr if ax == 0 else jnp.broadcast_to(arr[None], (B,) + arr.shape)

    pB = {}
    for k, v in params.items():
        if k == "kinetic_overrides":
            pB[k] = {kk: bcast(vv, axes[k][kk]) for kk, vv in v.items()}
        else:
            pB[k] = bcast(v, axes[k])
    key = jax.random.PRNGKey(0)
    yB = (y0B * (1.0 + 0.05 * jax.random.uniform(key, y0B.shape))).astype(
        jnp.float32)
    return spec, params, axes, pB, dB, yB


def bench(fn, *args, reps=20):
    out = fn(*args)
    np.asarray(out[0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    spec, params, axes, pB, dB, yB = setup(B)
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    for mode in MODES:
        acc = "df32" if mode == "df32" else False
        rhs = homo.make_n2_rhs(spec, accurate_rates=acc)
        fB = jax.jit(lambda y: jax.vmap(
            rhs, in_axes=(None, 0, axes, 0))(0.1, y, params, dB))
        rhs_f = pallas_rhs.build_n2_fused(spec, accurate_rates=acc)
        fF = jax.jit(lambda y: rhs_f(None, y, pB, dB))

        t0 = time.perf_counter()
        ref = np.asarray(fB(yB))
        t_xla = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = np.asarray(fF(yB))
        t_pal = time.perf_counter() - t0
        scale = np.maximum(np.abs(ref), 1e-3 * np.max(np.abs(ref)))
        rel = float(np.max(np.abs(got - ref) / scale))
        print(f"{mode}: compile xla {t_xla:.1f}s pallas {t_pal:.1f}s "
              f"max_rel_diff {rel:.3e}", flush=True)

        tx = bench(fB, yB)
        tp = bench(fF, yB)
        print(f"{mode}: per-eval  xla {tx*1e3:.3f} ms  fused {tp*1e3:.3f} ms",
              flush=True)

        # stage-stacked 3B shape (the integrator's hot call)
        y3 = jnp.tile(yB, (3, 1))
        fF3 = jax.jit(lambda y: rhs_f(None, y, pB, dB))
        t0 = time.perf_counter()
        np.asarray(fF3(y3))
        print(f"{mode}: 3B compile {time.perf_counter()-t0:.1f}s", flush=True)
        tp3 = bench(fF3, y3)
        fB3 = jax.jit(lambda y: jax.vmap(
            rhs, in_axes=(None, 0, axes, 0))(0.1, y, params, dB))
        # xla at 3B needs tiled params -- just report fused
        print(f"{mode}: per-eval 3B fused {tp3*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
