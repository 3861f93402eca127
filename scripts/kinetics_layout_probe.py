# On-chip probe: does lane packing pay for the kinetics chain?
#
# The vmapped N2 RHS evaluates the kinetics chain (and the df32
# compensated version of it) on (B, z)-shaped arrays; the TPU lays the
# minor axis on the 128-lane dimension, so z=20 wastes 108/128 lanes of
# every elementwise op in the ~300-op chain. Flattening (B, z) -> (B*z,)
# is contiguity-preserving (free reshape) and packs the lanes fully.
# This probe times the isolated chain both ways under a data-dependent
# lax.scan so per-op overhead and lane usage both show:
#   vm    -- jax.vmap of the per-member chain: (B, z) arrays
#   flat  -- the same chain called ONCE on (c, B*z) arrays
# for the plain f32 chain and the df32 chain.
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
N = 64  # scan length


def main():
    mi = make_model_input(model="N2")
    spec = homo.build_spec(mi)
    rng = np.random.default_rng(0)
    T = jnp.asarray(523.0 + 5 * rng.random((B, Z)), jnp.float32)
    P = jnp.asarray(5e6 * (1 - 0.01 * rng.random((B, Z))), jnp.float32)
    c = jnp.asarray(rng.random((B, spec.n_comp, Z)) + 0.1, jnp.float32)
    mf = c / jnp.sum(c, axis=1, keepdims=True)
    ov = {}

    def chain_member(T, P, mf, co, df):
        if df:
            r = spec.rates(D.DF32.from_value(T), D.DF32.from_value(P),
                           D.DF32.from_value(mf), D.DF32.from_value(co), ov)
            return r.value(jnp.float32)
        return spec.rates(T, P, mf, co, ov)

    cases = {}
    for df in (False, True):
        tag = "df32" if df else "plain"

        def vm(T, P, mf, c, _df=df):
            # vmap over members: chain sees (z,) / (c, z) per member
            f = jax.vmap(
                lambda t, p, m, cc: chain_member(t, p, m, cc, _df),
                in_axes=(0, 0, 0, 0))
            return f(T, P, mf, c)

        def flat(T, P, mf, c, _df=df):
            # one call on (c, B*z): elementwise over the trailing axis
            Tf = T.reshape(-1)
            Pf = P.reshape(-1)
            mff = mf.transpose(1, 0, 2).reshape(spec.n_comp, -1)
            cf = c.transpose(1, 0, 2).reshape(spec.n_comp, -1)
            return chain_member(Tf, Pf, mff, cf, _df)

        cases[f"vm_{tag}"] = vm
        cases[f"flat_{tag}"] = flat

    for name, fn in cases.items():
        @jax.jit
        def loop(T, P, mf, c, _fn=fn):
            def body(carry, _):
                r = _fn(T + carry * 1e-12, P, mf, c)
                return jnp.sum(r).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
            return out

        loop(T, P, mf, c).block_until_ready()
        np.asarray(loop(T, P, mf, c))  # sync
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(loop(T, P, mf, c))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / N * 1e3:.2f} ms/eval (B={B})", flush=True)


if __name__ == "__main__":
    main()
