# On-chip probe: does lax.scan NESTING multiply per-op cost on this
# runtime? The isolated df32 kinetics chain measures ~0.4 ms/eval at
# B=512 (kinetics_layout_probe), yet the same chain inside the lockstep
# integrator's newton-sweep scan (inside the attempt scan, inside the
# chunk scan) accounts for ~35 ms/eval by cheap_sweeps differencing --
# ~80x. Candidate explanations: scan-nesting overhead (the homo.py
# pressure march measured "an inner scan nested under the integrator's
# scans costs ~10x"), or fusion barriers at scan boundaries. Cases:
#   flat1   -- one scan, 1 chain eval / iteration (anchor)
#   nest    -- outer scan x inner scan(5 evals)
#   nest_u  -- same, inner scan unroll=True
#   nest_py -- same, inner Python for-loop (trace-time unroll)
#   nest3   -- three levels (chunk/attempt/newton shape): 8 x 4 x 5
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
from rmt_tpu.ops import df32 as D  # noqa: E402

B = int(os.environ.get("PB", "512"))
Z = 20


def main():
    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi)
    rng = np.random.default_rng(0)
    T = jnp.asarray(523.0 + 5 * rng.random((B, Z)), jnp.float32)
    P = jnp.asarray(5e6 * (1 - 0.01 * rng.random((B, Z))), jnp.float32)
    c = jnp.asarray(rng.random((B, spec.n_comp, Z)) + 0.1, jnp.float32)
    mf = c / jnp.sum(c, axis=1, keepdims=True)

    def chain(t_carry):
        f = jax.vmap(
            lambda t, p, m, cc: spec.rates(
                D.DF32.from_value(t), D.DF32.from_value(p),
                D.DF32.from_value(m), D.DF32.from_value(cc), {}
            ).value(jnp.float32),
            in_axes=(0, 0, 0, 0))
        r = f(T + t_carry * 1e-12, P, mf, c)
        return jnp.sum(r).astype(jnp.float32)

    def inner_scan(carry, k, unroll):
        def body(cr, _):
            return cr + chain(cr), None
        out, _ = jax.lax.scan(body, carry, None, length=k, unroll=unroll)
        return out

    def inner_py(carry, k):
        for _ in range(k):
            carry = carry + chain(carry)
        return carry

    N_EVALS = 160  # total chain evals per timed call, all cases

    cases = {
        "flat1": lambda c0: inner_scan(c0, N_EVALS, 1),
        "nest": lambda c0: jax.lax.scan(
            lambda cr, _: (inner_scan(cr, 5, 1), None), c0, None,
            length=N_EVALS // 5)[0],
        "nest_u": lambda c0: jax.lax.scan(
            lambda cr, _: (inner_scan(cr, 5, True), None), c0, None,
            length=N_EVALS // 5)[0],
        "nest_py": lambda c0: jax.lax.scan(
            lambda cr, _: (inner_py(cr, 5), None), c0, None,
            length=N_EVALS // 5)[0],
        "nest3": lambda c0: jax.lax.scan(
            lambda cr, _: (jax.lax.scan(
                lambda c2, _: (inner_scan(c2, 5, 1), None), cr, None,
                length=4)[0], None), c0, None, length=N_EVALS // 20)[0],
    }

    for name, fn in cases.items():
        f = jax.jit(fn)
        np.asarray(f(jnp.float32(0.0)))  # compile + sync
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(f(jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / N_EVALS * 1e3:.2f} ms/eval", flush=True)


if __name__ == "__main__":
    main()
