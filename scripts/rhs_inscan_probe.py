# On-chip probe: cost of ONE N2 RHS evaluation inside a lax.scan, plain
# f32 vs df32, measured by scan-length differencing -- isolates the RHS
# from the integrator so the cost-matrix deltas (df32 +170 ms/attempt,
# block +160 ms/attempt at B=512) can be attributed.
import functools
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
from jax import lax  # noqa: E402

B = int(os.environ.get("MB", "512"))


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run():
    from dme_case import make_model_input
    import rmt_tpu.parallel.ensemble as ens
    import rmt_tpu.models.homo as homo
    import rmt_tpu.solvers.stiff_ensemble as se

    mi = make_model_input(model="N2")

    for mode in ("plain", "df32"):
        captured = {}
        orig = se.odeint_ensemble

        def capture(fB, y0, ts, **kw):
            captured.update(fB=fB, y0=y0, ts=ts)
            return orig(fB, y0, ts, **kw)  # batched f(t (B,), y (B,n))

        se.odeint_ensemble = capture
        try:
            kw = dict(rtol=1e-5, atol=1e-7, max_steps=16, newton_iters=2,
                      j_every=8)
            if mode == "df32":
                kw["accurate_rates"] = "df32"
            ens.run_n2_ensemble_lockstep(
                mi, {"T0": jnp.asarray(523.0 + np.linspace(-5, 5, B))},
                **kw)
        finally:
            se.odeint_ensemble = orig

        fB, y0, ts = captured["fB"], captured["y0"], captured["ts"]
        t0v = jnp.full((B,), float(ts[0]) + 1e-6, jnp.float32)

        @functools.partial(jax.jit, static_argnames=("T",))
        def prog(y, T):
            def body(c, _):
                f = fB(t0v, c)
                return c + 1e-9 * f, ()
            out, _ = lax.scan(body, y, None, length=T)
            return out

        t = {}
        for T in (4, 64):
            sync(prog(y0, T))
            t0 = time.perf_counter()
            sync(prog(y0, T))
            t[T] = time.perf_counter() - t0
        per = (t[64] - t[4]) / 60.0
        print(f"RHS {mode} in-scan: {per * 1e3:.2f} ms/eval "
              f"(t4={t[4]:.3f}s t64={t[64]:.3f}s)", flush=True)


if __name__ == "__main__":
    run()
