# On-chip probe: per-kernel (per-HLO-fusion) overhead of the tunneled
# runtime, and the kernel count of the real f32x attempt body.
#
# Hypothesis for the unattributed ~240 ms/attempt at B=512 (attributed
# kernels+RHS sum to ~40 ms): the runtime charges a fixed overhead per
# executed kernel, and the attempt body compiles to hundreds of small
# fusions. The probe measures ms/kernel on a scan whose body is K
# data-dependent, fusion-resistant small matmuls.
#
# MEASURED (2026-08-19, v5e tunnel): ~0.00 ms/kernel at K=8 and
# K=64 -- per-kernel launch overhead is NOT the cause; the
# hypothesis is dead. (Same probe also shows the per-invocation
# fixed cost for a tiny program is ~27 ms, so the ~5 s fixed cost
# of the f32x program scales with program/IO size.)
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


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def test_a():
    # body = K dependent small matmuls on (128, 128): each is its own
    # kernel (matmuls don't fuse into each other); scan length T
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (128, 128), jnp.float32) * 0.05

    import functools

    for K in (8, 64):
        @functools.partial(jax.jit, static_argnames=("T",))
        def prog(x, T, K=K):
            def body(c, _):
                y = c
                for _ in range(K):
                    y = (M @ y) * (1.0 / 128.0) + c
                return y, ()
            out, _ = lax.scan(body, x, None, length=T)
            return out

        x = jnp.ones((128, 128), jnp.float32)
        for T in (4, 64):
            sync(prog(x, T))  # compile per T (static length)
        t = {}
        for T in (4, 64):
            t0 = time.perf_counter()
            sync(prog(x, T))
            t[T] = time.perf_counter() - t0
        per_iter = (t[64] - t[4]) / 60.0
        print(f"K={K}: t4={t[4]:.3f}s t64={t[64]:.3f}s -> "
              f"{per_iter * 1e3:.2f} ms/iter, "
              f"{per_iter / K * 1e3:.3f} ms/kernel", flush=True)


if __name__ == "__main__":
    test_a()
