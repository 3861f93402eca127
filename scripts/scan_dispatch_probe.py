# On-chip probe: is there a FIXED per-scan-iteration dispatch cost on
# this runtime, independent of body size? The round-4 attempt-cost
# attribution found per-attempt cost (230-711 ms at B=512) is ~10-50x the
# sum of its measured components and roughly independent of B -- and
# fusing the whole RHS into one Pallas kernel made it SLIGHTLY SLOWER
# (f32x_fixed_budget_ab). If the runtime charges per scan iteration,
# lax.scan(unroll=k) is the lever; if not, the cost lives in the body.
#
# Cases (all same total work = ITERS body applications):
#   tiny_u1   -- y *= c on (512, 140), scan length ITERS
#   tiny_u4   -- same, unroll=4
#   tiny_u16  -- same, unroll=16
#   mm_u1     -- y = 0.999*y + 1e-6*(y@W) on (512,140)@(140,140), scan
#   mm_u4     -- same, unroll=4
#   nest_tiny -- scan(ITERS//8) x scan(8) of the tiny body
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

B, N = 512, 140
ITERS = 64


def main():
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.random((B, N)), jnp.float32)
    W = jnp.asarray(rng.random((N, N)) * 1e-3, jnp.float32)

    def tiny(y):
        return y * np.float32(1.0000001)

    def mm(y):
        return np.float32(0.999) * y + np.float32(1e-6) * (
            y @ W)

    def make(body, unroll, nest=False):
        if nest:
            def outer(y, _):
                inner, _ = lax.scan(
                    lambda c, _: (body(c), None), y, None, length=8)
                return inner, None

            def prog(y):
                return lax.scan(outer, y, None, length=ITERS // 8)[0]
        else:
            def prog(y):
                return lax.scan(
                    lambda c, _: (body(c), None), y, None,
                    length=ITERS, unroll=unroll)[0]
        return jax.jit(prog)

    cases = {
        "tiny_u1": make(tiny, 1),
        "tiny_u4": make(tiny, 4),
        "tiny_u16": make(tiny, 16),
        "mm_u1": make(mm, 1),
        "mm_u4": make(mm, 4),
        "nest_tiny": make(tiny, 1, nest=True),
    }
    for name, f in cases.items():
        t0 = time.perf_counter()
        np.asarray(f(y0)[0, 0])
        t_compile = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(y0)[0, 0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / ITERS * 1e3:.3f} ms/iter "
              f"(total {best*1e3:.1f} ms, compile {t_compile:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
