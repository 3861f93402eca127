# On-chip probe: is there a FIXED cost per KERNEL EXECUTION (fusion
# boundary) inside a scan iteration on this runtime? All earlier probes
# used bodies XLA fuses into 1-2 kernels (elementwise chains, one
# matmul) and measured ~free iterations, while the real integrator's
# attempt body -- which compiles to hundreds of unfused kernels
# (reductions, einsums, selects at different shapes) -- costs 100-200
# ms/attempt even with every compute element stubbed (ablate_inplace
# "all" = 107 ms). A chain of k DEPENDENT reductions cannot fuse into
# one kernel, so per-iter cost vs k measures the per-kernel charge.
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

B, N = 512, 140
ITERS = 64


def main():
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.random((B, N)), jnp.float32)

    for k in (1, 8, 32, 128):
        def prog(y, k=k):
            def body(c, _):
                for _ in range(k):
                    # reduce -> broadcast -> elementwise: each round is a
                    # separate kernel (the reduction breaks fusion) and
                    # depends on the previous one
                    c = c * (np.float32(1.0) + np.float32(1e-12)
                             * jnp.mean(c))
                return c, None
            return lax.scan(body, y, None, length=ITERS)[0]

        f = jax.jit(prog)
        t0 = time.perf_counter()
        np.asarray(f(y0)[0, 0])
        t_c = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(y0)[0, 0])
            best = min(best, time.perf_counter() - t0)
        print(f"k={k:4d} reductions/iter: {best / ITERS * 1e3:7.3f} ms/iter "
              f"-> {best / ITERS / k * 1e3:6.3f} ms/reduction "
              f"(total {best:.3f}s, compile {t_c:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
