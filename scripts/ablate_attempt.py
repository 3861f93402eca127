# On-chip ablation of the lockstep integrator's per-attempt cost.
#
# Times each component of one attempt (B members, n states) as a jitted
# lax.scan of REPS applications, then compares the component sum to the
# real integrator's measured per-attempt cost (bench_micro). Usage:
#   python scripts/ablate_attempt.py [B] [reps]
import os
import sys
import time

os.environ.setdefault("RMT_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dme_case import make_model_input
from rmt_tpu.models import homo
from rmt_tpu.parallel.ensemble import batch_params

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64

mi = make_model_input(model="N2")
spec = homo.build_spec(mi)
base = homo.build_params(mi)
params, axes = batch_params(base, {"T0": jnp.asarray(
    523.0 + np.linspace(-5.0, 5.0, B))})
rhs = homo.make_n2_rhs(spec)
jac_c = homo.make_n2_colored_jacobian(spec)

dB, y0B = jax.vmap(
    lambda q: ((lambda d: (d, homo.n2_initial_state(spec, q, d)))(
        homo.feed_state(spec, q))), in_axes=(axes,))(params)
n = y0B.shape[1]
print(f"# B={B} n={n} reps={REPS}")

fB = jax.vmap(rhs, in_axes=(0, 0, axes, 0))
jB = jax.vmap(jac_c, in_axes=(0, 0, axes, 0))
t0v = jnp.zeros((B,), y0B.dtype)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        best = min(best, time.perf_counter() - t0)
    per = best / REPS * 1e3
    print(f"{name:28s} {per:8.3f} ms/rep")
    return per


# 1. single RHS eval (scan to amortize dispatch)
@jax.jit
def rhs_loop(y):
    def body(c, _):
        c = fB(t0v, c, params, dB) * 1e-6 + c
        return c, None
    c, _ = lax.scan(body, y, None, length=REPS)
    return c

c_rhs = timeit("RHS eval x1", rhs_loop, y0B)

# 2. stage eval (3 states per member, as the integrator shapes it)
@jax.jit
def stage_loop(y):
    Y = jnp.tile(y[:, None, :], (1, 3, 1))
    def body(c, _):
        F = fB(
            jnp.tile(t0v, 3),
            c.reshape(B * 3, n),
            jax.tree.map(
                lambda a, ax: (jnp.tile(a, (3,) + (1,) * (a.ndim - 1))
                               if ax == 0 else a),
                params, axes),
            jax.tree.map(lambda a: jnp.tile(a, (3,) + (1,) * (a.ndim - 1)), dB),
        ).reshape(B, 3, n)
        return c + F * 1e-6, None
    c, _ = lax.scan(body, Y, None, length=REPS)
    return c

c_stage = timeit("stage eval (3 states)", stage_loop, y0B)

# 3. colored Jacobian
@jax.jit
def jac_loop(y):
    def body(c, _):
        J = jB(t0v, y, params, dB)
        return c + jnp.mean(J) * 1e-6, None
    c, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
    return c

c_jac = timeit("colored Jacobian", jac_loop, y0B)

# 4. fused pallas NS step
from rmt_tpu.ops.pallas_ns import ns_fused_step
from rmt_tpu.solvers.stiff_ensemble import _transformed_tableau

_, _, _, _, w_np, _, _ = _transformed_tableau()
gamma = float(w_np[0].real)
mu_r, mu_i = float(w_np[1].real), float(w_np[1].imag)
J0 = jB(t0v, y0B, params, dB).astype(jnp.float32)
eyeB = jnp.tile(jnp.eye(n, dtype=jnp.float32)[None], (B, 1, 1))
h32 = jnp.full((B,), 1e-3, jnp.float32)


@jax.jit
def ns_loop(Pr, Pcr, Pci):
    def body(c, _):
        Pr, Pcr, Pci = c
        Pr, Pcr, Pci, rho = ns_fused_step(
            J0, Pr, Pcr, Pci, h32, gamma=gamma, mu_r=mu_r, mu_i=mu_i)
        return (Pr, Pcr, Pci), None
    c, _ = lax.scan(body, (Pr, Pcr, Pci), None, length=REPS)
    return c

c_ns = timeit("pallas NS step", ns_loop, eyeB, eyeB, jnp.zeros_like(eyeB))

# 5. the preconditioner matvec set of ONE Newton sweep (apply_P shape)
Tr = jnp.eye(3, dtype=y0B.dtype)


@jax.jit
def matvec_loop(R):
    def body(c, _):
        R32 = c.astype(jnp.float32)
        Z0 = jnp.einsum("bnm,bm->bn", eyeB, R32[:, 0],
                        precision=lax.Precision.HIGHEST)
        X = jnp.stack([R32[:, 1], R32[:, 2]], axis=-1)
        Yr = jnp.matmul(eyeB, X, precision=lax.Precision.HIGHEST)
        Yi = jnp.matmul(eyeB, X, precision=lax.Precision.HIGHEST)
        dK = jnp.stack([Z0, Yr[..., 0], Yi[..., 1]], axis=1).astype(c.dtype)
        return c + dK * 1e-6, None
    c, _ = lax.scan(body, R, None, length=REPS)
    return c

c_mv = timeit("apply_P matvecs x1", matvec_loop,
              jnp.tile(y0B[:, None, :], (1, 3, 1)))

NI = 5
total = c_stage * NI + c_rhs + c_jac / 16 + c_ns * (1 + 5 / 16) + c_mv * NI
print(f"# modeled per-attempt (ni={NI}, j_every=16): {total:.3f} ms")
