# Bit-twiddling float32 exponent manipulation, Pallas/Mosaic-safe.
#
# jnp.frexp / jnp.ldexp do not lower inside Pallas TPU kernels (Mosaic has
# no rule for them), but the compensated transcendentals in ops/df32.py and
# ops/accurate_math.py need exponent extraction / scaling in their
# range-reduction steps. These replacements use pure bitcast/shift/mask ops
# (all Mosaic-supported) and are BIT-IDENTICAL to the jnp originals on the
# domain the transcendentals use:
#
#   * frexp_pos: positive NORMAL finite float32 (log's domain after its
#     own x > 0 guard). Zero / denormal / negative / inf inputs return
#     garbage mantissas -- callers must guard (df32.log and
#     accurate_math.log return nan for x <= 0 explicitly).
#   * ldexp2: |k| <= 253 exact; larger |k| saturates to inf / flushes
#     toward zero through the two-step product exactly like exp overflow/
#     underflow should.
#
# Used unconditionally (not just inside kernels) so the XLA and Pallas
# paths compute identical values.

from __future__ import annotations

import jax
import jax.numpy as jnp

_I32 = jnp.int32
_F32 = jnp.float32


def frexp_pos(x):
    """(m, e) with x = m * 2^e, m in [0.5, 1), for positive normal f32 x.

    Bit-exact vs jnp.frexp on that domain. The exponent comes from the bit
    field (gradient-free, like a shape constant); the mantissa is the
    DIFFERENTIABLE exact product x * 2^-e, so jax.grad sees dm/dx = 2^-e
    -- a pure bit-masked mantissa would silently zero every gradient
    flowing through log/pow (caught by test_accurate_math)."""
    bits = jax.lax.bitcast_convert_type(x, _I32)
    e = ((bits >> 23) & 0xFF) - 126                 # unbiased + 1
    m = ldexp2(x, jax.lax.stop_gradient(-e))
    return m, e


def ldexp2(x, k):
    """x * 2^k for int32 k via two exact power-of-two multiplies.

    Exact for |k| <= 253 (covers exp's |arg| <= 128*ln2 reduction with
    headroom); beyond that the result saturates to inf / underflows to 0
    through the intermediate product, matching exp's own limit behavior."""
    k = k.astype(_I32)
    k1 = jnp.clip(k, -126, 127)
    k2 = jnp.clip(k - k1, -126, 127)

    def pow2(e):
        return jax.lax.bitcast_convert_type((e + 127) << 23, _F32)

    return (x * pow2(k1)) * pow2(k2)
