# On-chip probe: does a scan iteration cost scale with the size of DEAD
# carry (large arrays passed through unchanged)? Motivated by
# ablate_inplace: the lockstep integrator's bare skeleton (every
# compute element stubbed) still costs 107 ms/attempt at B=512 -- the
# carry holds J + Pr + Pcr + Pci = 4 x (512,140,140) f32 = 160 MB.
# Cases: dead carry of k big matrices, body updates only a (512,140)
# state. If per-iter cost grows ~linearly in k, the runtime copies the
# carry every iteration and big matrices must leave scan carries.
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

    for k in (0, 1, 4):
        dead = tuple(
            jnp.asarray(rng.random((B, N, N)), jnp.float32) for _ in range(k)
        )

        def prog(y, dead):
            def body(c, _):
                yy, dd = c
                return (yy * np.float32(1.0000001), dd), None
            (yy, dd), _ = lax.scan(body, (y, dead), None, length=ITERS)
            return yy

        f = jax.jit(prog)
        t0 = time.perf_counter()
        np.asarray(f(y0, dead)[0, 0])
        t_c = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(y0, dead)[0, 0])
            best = min(best, time.perf_counter() - t0)
        mb = k * B * N * N * 4 / 1e6
        print(f"dead carry {k} mats ({mb:.0f} MB): "
              f"{best / ITERS * 1e3:.2f} ms/iter (total {best:.3f}s, "
              f"compile {t_c:.1f}s)", flush=True)

    # same 4 matrices, but UPDATED each iteration (a where-mask touch):
    # distinguishes pass-through copies from genuine read+write traffic
    dead = tuple(
        jnp.asarray(rng.random((B, N, N)), jnp.float32) for _ in range(4)
    )

    def prog2(y, dead):
        def body(c, _):
            yy, dd = c
            m = yy[:, 0] > 0.5
            dd = tuple(jnp.where(m[:, None, None], d, d) for d in dd)
            return (yy * np.float32(1.0000001), dd), None
        (yy, dd), _ = lax.scan(body, (y, dead), None, length=ITERS)
        return yy

    f2 = jax.jit(prog2)
    t0 = time.perf_counter()
    np.asarray(f2(y0, dead)[0, 0])
    t_c = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f2(y0, dead)[0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"masked-touch 4 mats (160 MB): {best / ITERS * 1e3:.2f} ms/iter "
          f"(total {best:.3f}s, compile {t_c:.1f}s)", flush=True)


if __name__ == "__main__":
    main()


def nested():
    # outer scan (8 chunks) x inner scan (8 attempts) with the dead
    # carry crossing the INNER scan boundary each chunk -- the lockstep
    # integrator's exact structure. Compare per-iter cost to the flat
    # cases above: a jump means the inner-scan boundary copies the carry.
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.random((B, N)), jnp.float32)
    for k in (0, 4):
        dead = tuple(
            jnp.asarray(rng.random((B, N, N)), jnp.float32) for _ in range(k)
        )

        def prog(y, dead):
            def inner_body(c, _):
                yy, dd = c
                return (yy * np.float32(1.0000001), dd), None

            def outer_body(c, _):
                c, _ = lax.scan(inner_body, c, None, length=8)
                return c, None

            (yy, _), _ = lax.scan(outer_body, (y, dead), None,
                                  length=ITERS // 8)
            return yy

        f = jax.jit(prog)
        t0 = time.perf_counter()
        np.asarray(f(y0, dead)[0, 0])
        t_c = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(y0, dead)[0, 0])
            best = min(best, time.perf_counter() - t0)
        mb = k * B * N * N * 4 / 1e6
        print(f"NESTED dead carry {k} mats ({mb:.0f} MB): "
              f"{best / ITERS * 1e3:.2f} ms/iter (total {best:.3f}s, "
              f"compile {t_c:.1f}s)", flush=True)


if os.environ.get("NESTED"):
    nested()
