# On-chip probe: cost of the member-major <-> member-last layout
# transposes at the Pallas block-kernel boundary, and of the pallas
# calls inside a scan (vs standalone).
#
# The f32x attempt body moves R (B,3,n) -> (3,m,z,B) before block_apply
# and back after, ~12 transposes per attempt. TPU transposes that move
# the batch axis from major to minor are lane-crossing relayouts of
# arrays whose minor dim (z=20) wastes 108/128 lanes -- candidate for
# the unattributed ~240 ms/attempt.
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

B, m, z = 512, 7, 20
n = m * z


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(fn, *args):
    sync(fn(*args))
    t0 = time.perf_counter()
    sync(fn(*args))
    return time.perf_counter() - t0


def main():
    key = jax.random.PRNGKey(0)
    R = jax.random.normal(key, (B, 3, n), jnp.float32)

    # K round-trip transposes under a scan (differencing 8 vs 64 iters)
    for K in (2, 8):
        import functools

        @functools.partial(jax.jit, static_argnames=("T",))
        def prog(x, T, K=K):
            def body(c, _):
                y = c
                for _ in range(K):
                    yt = y.reshape(B, 3, m, z).transpose(1, 2, 3, 0)
                    yt = yt + 1.0
                    y = yt.transpose(3, 0, 1, 2).reshape(B, 3, n) * 0.999
                return y, ()
            out, _ = lax.scan(body, x, None, length=T)
            return out

        t = {}
        for T in (4, 64):
            sync(prog(R, T))
            t[T] = timed(prog, R, T)
        per_iter = (t[64] - t[4]) / 60.0
        print(f"transpose-pairs K={K}: {per_iter * 1e3:.2f} ms/iter -> "
              f"{per_iter / (2 * K) * 1e3:.3f} ms/transpose", flush=True)

    # pallas block_apply inside a scan, full solve chain per iteration
    from rmt_tpu.ops import pallas_block as pb
    from rmt_tpu.solvers.stiff_ensemble import _transformed_tableau

    _, _, _, _, W, T_, TINV = _transformed_tableau()
    gamma = float(W[0].real)
    mu_r, mu_i = float(W[1].real), float(W[1].imag)
    T4 = lambda M: tuple(map(tuple, M))
    rng = np.random.default_rng(0)
    Jd_t = jnp.asarray(
        (5 * rng.standard_normal((z, m, m, B))).astype(np.float32))
    Jl_t = jnp.asarray(
        (2 * rng.standard_normal((z, m, m, B))).astype(np.float32))
    h32 = jnp.asarray(10 ** rng.uniform(-3, -1.5, B), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnames=("T",))
    def prog2(R, T):
        MinvR, MinvCr, MinvCi = pb.block_factor(
            Jd_t, h32, gamma=gamma, mu_r=mu_r, mu_i=mu_i)

        def body(c, _):
            R_t = c.reshape(B, 3, m, z).transpose(1, 2, 3, 0)
            dK_t = pb.block_apply(
                R_t, MinvR, MinvCr, MinvCi, Jl_t, h32,
                gamma=gamma, mu_r=mu_r, mu_i=mu_i,
                tir=T4(TINV.real), tii=T4(TINV.imag),
                tr=T4(T_.real), ti=T4(T_.imag))
            c2 = dK_t.transpose(3, 0, 1, 2).reshape(B, 3, n)
            return c2 * 0.5 + c * 0.5, ()
        out, _ = lax.scan(body, R, None, length=T)
        return out

    t = {}
    for T in (4, 64):
        sync(prog2(R, T))
        t[T] = timed(prog2, R, T)
    per_iter = (t[64] - t[4]) / 60.0
    print(f"in-scan transpose+apply: {per_iter * 1e3:.2f} ms/iter",
          flush=True)


if __name__ == "__main__":
    main()
