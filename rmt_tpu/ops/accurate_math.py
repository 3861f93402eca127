# Accurate float32 transcendentals for the TPU backend.
#
# TPU XLA lowers f32 exp/log/pow to fast polynomial approximations that are
# accurate to ~1e-5 relative -- 2 orders looser than IEEE f32 rounding
# (6e-8). In f32 mode the kinetics DSL (Arrhenius exponentials, LHHW
# partial-pressure powers, 10**(A/T - B) equilibrium constants) runs every
# RHS evaluation, and the measured on-chip ensemble error (max ~7e-5 vs a
# converged f64 run) is dominated by exactly this arithmetic, not by
# integrator accumulation (STATUS.md round-2 measurements; CPU-f32 with
# IEEE-quality libm gets ~1.5e-6 under identical stepping).
#
# These implementations use classic argument reduction with two-term
# constants and Horner polynomials evaluated in plain f32 adds/muls (IEEE
# round-to-nearest on TPU -- only the transcendental *approximations* are
# loose, not +/*). Target: <=5e-7 relative for exp/log and <=1e-6 for pow
# at the exponent magnitudes the DSL uses (|y*ln x| <= ~30). The log->pow
# path carries a hi/lo compensated logarithm so the y*log(x) product does
# not lose the low bits that exp then amplifies.
#
# All entry points pass f64 (and weak-float python scalars promoted to the
# default dtype) through to jnp untouched: in x64 mode nothing changes.

from __future__ import annotations

import math as _math

import jax.numpy as jnp
import numpy as np

from . import floatbits as _fb

# smallest normal f32: the bit-twiddled frexp (ops/floatbits.py) garbles
# denormals, so the guarded entry points route sub-normal inputs to the
# native jnp fallback branch they already compute
_MIN_NORMAL = np.float32(1.1754943508222875e-38)

# ln2 split: LN2_HI has its 12 low mantissa bits zeroed, so k * LN2_HI is
# exact in f32 for integer |k| < 2^11 (covers |x| <= 88, the f32 exp range)
_LN2_HI = np.float32(0.693145751953125)
_LN2_LO = np.float32(1.428606765330187e-06)
_INV_LN2 = np.float32(1.4426950408889634)
_LN2_F64 = 0.6931471805599453
_INV_LN10 = np.float32(0.4342944819032518)
_SQRT_HALF = np.float32(0.7071067811865476)

# exp(r) Taylor on r in [-ln2/2, ln2/2]: truncation r^9/9! <= 1.6e-10
_EXP_COEFS = tuple(
    np.float32(1.0 / _math.factorial(k)) for k in range(8, 1, -1)
)

# atanh-form log: log(m) = 2s + s^3*poly(s^2), s=(m-1)/(m+1), |s|<=0.1716;
# Taylor coefficients 2/(2k+1); truncation 2 s^11/11 <= 6e-10
_LOG_COEFS = (
    np.float32(2.0 / 11.0),
    np.float32(2.0 / 9.0),
    np.float32(2.0 / 7.0),
    np.float32(2.0 / 5.0),
    np.float32(2.0 / 3.0),
)


def _is_f32(*xs) -> bool:
    return any(
        getattr(x, "dtype", None) == jnp.float32 and not _weak(x) for x in xs
    )


def _weak(x) -> bool:
    return bool(getattr(x, "weak_type", False))


def _exp_kernel(x, extra=None):
    """exp(x + extra) for f32 x, |x| <= ~87; extra (optional) is a small
    correction term (|extra| << 1) folded into the reduced argument."""
    k = jnp.round(x * _INV_LN2)
    r = (x - k * _LN2_HI) - k * _LN2_LO
    if extra is not None:
        r = r + extra
    p = _EXP_COEFS[0]
    for c in _EXP_COEFS[1:]:
        p = p * r + c
    p = p * r + np.float32(1.0)
    p = p * r + np.float32(1.0)
    # bit-twiddled 2^k scaling: bit-identical to jnp.ldexp for |k| <= 253
    # (|x| < 87 keeps |k| <= 126) and Mosaic-safe for fused Pallas kernels
    return _fb.ldexp2(p, k.astype(jnp.int32))


def exp(x):
    """Accurate f32 exp; f64 passes through to jnp.exp."""
    x = jnp.asarray(x)
    if not _is_f32(x):
        return jnp.exp(x)
    # outside the reduction's exact-k range the result under/overflows
    # anyway -- defer to the native op there (inf/0/nan semantics)
    safe = jnp.abs(x) < np.float32(87.0)
    xs = jnp.where(safe, x, np.float32(0.0))
    return jnp.where(safe, _exp_kernel(xs), jnp.exp(x))


def _log_ext(x):
    """Compensated log for f32 x > 0: returns (hi, lo) with
    hi + lo = log(x) to ~1e-9 absolute. hi = e*LN2_HI + 2s is NOT a
    two-float (its own rounding is ~f32 eps); the point is that the
    *constituent* terms are exact/compensated so pow can re-associate."""
    # bit-twiddled exponent split: bit-identical to jnp.frexp for positive
    # NORMAL x (callers' `ok` guards exclude x < _MIN_NORMAL) and
    # Mosaic-safe for fused Pallas kernels
    m, e = _fb.frexp_pos(x)                # x = m * 2^e, m in [0.5, 1)
    small = m < _SQRT_HALF
    m = jnp.where(small, m + m, m)         # m in [sqrt(1/2), sqrt(2))
    e = (e - small.astype(e.dtype)).astype(jnp.float32)
    s = (m - np.float32(1.0)) / (m + np.float32(1.0))
    s2 = s * s
    p = _LOG_COEFS[0]
    for c in _LOG_COEFS[1:]:
        p = p * s2 + c
    poly = (s * s2) * p                    # log(m) - 2s, |.| <= 3.4e-3
    two_s = s + s                          # exact (doubling)
    hi = e * _LN2_HI + two_s               # e*LN2_HI exact; one rounding
    # lo collects the pieces below hi's last bit
    lo = (e * _LN2_HI - (hi - two_s)) + poly + e * _LN2_LO
    return hi, lo


def log(x):
    """Accurate f32 natural log; f64 passes through."""
    x = jnp.asarray(x)
    if not _is_f32(x):
        return jnp.log(x)
    ok = (x >= _MIN_NORMAL) & jnp.isfinite(x)
    xs = jnp.where(ok, x, np.float32(1.0))
    hi, lo = _log_ext(xs)
    return jnp.where(ok, hi + lo, jnp.log(x))


def log10(x):
    x = jnp.asarray(x)
    if not _is_f32(x):
        return jnp.log10(x)
    ok = (x >= _MIN_NORMAL) & jnp.isfinite(x)
    xs = jnp.where(ok, x, np.float32(1.0))
    hi, lo = _log_ext(xs)
    return jnp.where(ok, (hi + lo) * _INV_LN10, jnp.log10(x))


def _two_prod(a, b):
    """Dekker product: a*b = p + err exactly, f32, no fma (split by the
    4097 trick; TPU f32 add/mul are IEEE round-to-nearest)."""
    p = a * b
    c = np.float32(4097.0) * a
    a_hi = c - (c - a)
    a_lo = a - a_hi
    c = np.float32(4097.0) * b
    b_hi = c - (c - b)
    b_lo = b - b_hi
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


def pow(x, y):
    """Accurate f32 x**y for x > 0 (the DSL's partial-pressure powers and
    10**(...) equilibrium constants); other cases and f64 defer to
    jnp.power. The y*log(x) product is kept as a two-float so exp sees
    the low bits (a 1e-7 absolute slip there is a 1e-7 *relative* error
    after exp, amplified by nothing -- without it, |y*ln x|=30 would turn
    f32 product rounding into ~2e-6)."""
    # static small-integer exponents (math.pow(T, 2) etc.): XLA expands
    # integer powers to exact multiply chains -- strictly more accurate
    # than any exp(y*log(x)) route
    if isinstance(y, (int, float)) and float(y).is_integer() and abs(y) <= 8:
        return jnp.power(x, int(y))
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if not _is_f32(x, y):
        return jnp.power(x, y)
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    ok = (x32 >= _MIN_NORMAL) & jnp.isfinite(x32) & jnp.isfinite(y32)
    xs = jnp.where(ok, x32, np.float32(1.0))
    ys = jnp.where(ok, y32, np.float32(1.0))
    hi, lo = _log_ext(xs)
    p_hi, p_err = _two_prod(ys, hi)
    p_lo = p_err + ys * lo
    safe = jnp.abs(p_hi) < np.float32(87.0)
    out = _exp_kernel(
        jnp.where(safe, p_hi, np.float32(0.0)),
        extra=jnp.where(safe, p_lo, np.float32(0.0)),
    )
    out = jnp.where(safe, out, jnp.exp(p_hi))
    return jnp.where(ok, out, jnp.power(x, y))


def sqrt(x):
    """XLA f32 sqrt is correctly rounded on TPU -- pass through (kept so
    callers can route every DSL transcendental through one module)."""
    return jnp.sqrt(x)
