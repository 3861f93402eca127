# Double-float32 (compensated-pair) arithmetic for the kinetics chain.
#
# Motivation: the f32 whole-run accuracy floor of the lockstep N2 ensemble
# is owned by the kinetics chain -- near chemical equilibrium the net rate
# is a small difference of large opposing terms, so f32 rounding of the
# individual terms is amplified ~10^3x (measured, scripts/rhs_noise.py).
# Promoting the chain to float64 fixes the accuracy (on-chip max 7.5e-7,
# round-3 probe) but costs ~6x throughput on TPU: float64 is EMULATED by
# XLA, and an x64-enabled process additionally promotes every weak-typed
# literal in the program.
#
# A double-float32 value represents x = hi + lo with |lo| <= ulp(hi)/2,
# giving ~2^-48 relative arithmetic (between f32's 2^-24 and f64's 2^-53)
# from PURE f32 adds/muls -- native-speed VPU ops on TPU (measured
# "elementwise is free" on this runtime). Algorithms are the classic
# error-free transformations (Dekker 1971, Knuth TAOCP 4.2.2; accuracy
# bounds per Joldes, Muller & Popescu 2017) with the 4097-trick split
# (no fma exposure needed). The transcendentals target ~1e-9 relative --
# far below the <=1e-6 north-star bar and above nothing the chain needs.
#
# The DF32 class quacks like a scalar/ndarray through operator overloads,
# so the reference's user-supplied ``lambda x: ...`` kinetics programs
# (SURVEY.md section 2.3) evaluate in compensated arithmetic UNCHANGED --
# the kinetics DSL seeds DF32 inputs and the math shim dispatches on the
# type. Python float constants in user lambdas are split hi/lo so their
# full double precision survives (35.45, 1.7069e4, ... in the DME case).
#
# Everything here must stay f32 even inside an x64-enabled process (tests
# run with x64 on): scalars are split with np.float32 and array operands
# are cast, never promoted.

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from . import floatbits as _fb

_f32 = jnp.float32


def _as_f32(x):
    return jnp.asarray(x, dtype=_f32)


# CONTRACTION HAZARD. XLA:CPU's LLVM backend fuses mul->add chains into
# fmas (measured: jitting quick_two_sum(p, e) on a product p computed
# s = fma(a, b, e) instead of fl(p + e), and the classic err form
# b - (s - a) then corrupted the pair by a full product rounding --
# whole-chain accuracy collapsed from 2.6e-9 to 1.3e-6 under jit while
# every EFT passed in isolation; HLO optimization_barrier does NOT
# survive into LLVM, and no xla_cpu flag disables the contraction).
# The EFTs below are therefore written in CONTRACTION-ROBUST forms:
# err = (a - s) + b stays a valid residual whether or not a (a product)
# is contracted -- fma(x, y, -s) just computes the residual against the
# TRUE product, which makes the pair MORE accurate, never corrupt.


def _two_sum(a, b):
    """a + b = s + err exactly (Knuth; no magnitude ordering required)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """a + b = s + err, REQUIRES |a| >= |b| (or a == 0).

    Contraction-robust form (see module note): with s possibly
    fma-contracted, (a - s) itself contracts to the residual against the
    true product and err telescopes correctly either way."""
    s = a + b
    err = (a - s) + b
    return s, err


def _opaque(x):
    """Materialize a product as a rounded value the compiler treats as an
    opaque add-operand (see the contraction-hazard note): a select is not
    an fmul, so fma contraction cannot reach through it, and XLA cannot
    fold the NaN-guard select without violating IEEE NaN semantics.
    (HLO optimization_barrier does NOT work here -- it dissolves before
    LLVM instruction selection, measured.)"""
    return jnp.where(x == x, x, jnp.zeros_like(x))


def _split(a):
    """Dekker split: a = hi + lo with hi carrying the top 12 mantissa bits
    (4097 = 2^12 + 1 for f32's 24-bit mantissa)."""
    c = _opaque(np.float32(4097.0) * a)
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """a * b = p + err exactly (Dekker product, f32, no fma).

    p is guarded: err and downstream pair ops need the ROUNDED product --
    if the compiler substitutes the true product into the adds (fma
    contraction), the correlated error term e = true - p double-counts
    and the pair corrupts (measured on XLA:CPU, see module note)."""
    p = _opaque(a * b)
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


class DF32:
    """An unevaluated f32 pair hi + lo (double-float32 number/array)."""

    __slots__ = ("hi", "lo")
    # beat jnp.ndarray.__mul__ etc. to the dispatch in mixed expressions
    __array_priority__ = 200

    def __init__(self, hi, lo=None):
        self.hi = _as_f32(hi)
        self.lo = _as_f32(0.0 if lo is None else lo)

    # -- constructors ------------------------------------------------------
    @staticmethod
    def from_value(x):
        """Lift x to DF32 preserving all the precision it carries: python
        floats and f64 arrays split hi/lo; f32 arrays get lo = 0."""
        if isinstance(x, DF32):
            return x
        if isinstance(x, (int, float)):
            hi = np.float32(x)
            return DF32(hi, np.float32(float(x) - float(hi)))
        x = jnp.asarray(x)
        if x.dtype == jnp.float64:
            hi = x.astype(_f32)
            return DF32(hi, (x - hi.astype(jnp.float64)).astype(_f32))
        return DF32(x.astype(_f32), jnp.zeros_like(x, dtype=_f32))

    @staticmethod
    def stack(values):
        vals = [DF32.from_value(v) for v in values]
        his = jnp.broadcast_arrays(*[v.hi for v in vals])
        los = jnp.broadcast_arrays(*[v.lo for v in vals])
        return DF32(jnp.stack(his), jnp.stack(los))

    # -- output ------------------------------------------------------------
    def value(self, dtype=None):
        """Collapse to a plain array. f32 (default) applies the single
        final rounding; float64 (x64 processes only) keeps both words."""
        if dtype is not None and jnp.dtype(dtype) == jnp.float64:
            return self.hi.astype(jnp.float64) + self.lo.astype(jnp.float64)
        return self.hi + self.lo

    @property
    def shape(self):
        return self.hi.shape

    def __getitem__(self, idx):
        return DF32(self.hi[idx], self.lo[idx])

    def __repr__(self):
        return f"DF32(hi={self.hi!r}, lo={self.lo!r})"

    # -- arithmetic --------------------------------------------------------
    def __neg__(self):
        return DF32(-self.hi, -self.lo)

    def __abs__(self):
        neg = self.hi < 0
        return DF32(jnp.where(neg, -self.hi, self.hi),
                    jnp.where(neg, -self.lo, self.lo))

    def __add__(self, other):
        # "sloppy" DW+DW (Joldes et al. alg. 5): error ~2^-48 relative to
        # the LARGER operand. Under catastrophic cancellation that bound
        # is relative to the cancelled-away magnitude -- for the kinetics
        # chain's ~1e3 amplification that is still ~4e-12 of the result,
        # far below the ~1e-9 chain target, at 60% the cost of the
        # fully-accurate variant.
        o = DF32.from_value(other)
        s, e = _two_sum(self.hi, o.hi)
        e = e + (self.lo + o.lo)
        return DF32(*_quick_two_sum(s, e))

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-DF32.from_value(other))

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        o = DF32.from_value(other)
        p, e = _two_prod(self.hi, o.hi)
        e = e + (self.hi * o.lo + self.lo * o.hi)
        return DF32(*_quick_two_sum(p, e))

    __rmul__ = __mul__

    def __truediv__(self, other):
        # two-quotient long division (Joldes et al. alg. 17): ~3*2^-48
        # relative -- a third refinement quotient buys nothing the chain
        # target can see and costs a full DF mul+sub cycle
        o = DF32.from_value(other)
        q1 = self.hi / o.hi
        r = self - o * q1
        q2 = (r.hi + r.lo) / o.hi
        return DF32(*_quick_two_sum(q1, q2))

    def __rtruediv__(self, other):
        return DF32.from_value(other) / self

    def __pow__(self, n):
        if isinstance(n, (int, float)) and float(n).is_integer():
            return _int_pow(self, int(n))
        return exp(log(self) * DF32.from_value(n))

    def __rpow__(self, base):
        # 10 ** x, e ** x, ... : exp(x * log(base))
        if isinstance(base, (int, float)):
            lb = DF32.from_value(_math.log(float(base)))
        else:
            lb = log(DF32.from_value(base))
        return exp(self * lb)

    # -- comparisons (on the collapsed value; used only for control flow) --
    def _cmp(self, other, op):
        o = DF32.from_value(other)
        return op(self.hi + self.lo, o.hi + o.lo)

    def __lt__(self, other):
        return self._cmp(other, jnp.less)

    def __le__(self, other):
        return self._cmp(other, jnp.less_equal)

    def __gt__(self, other):
        return self._cmp(other, jnp.greater)

    def __ge__(self, other):
        return self._cmp(other, jnp.greater_equal)


jax.tree_util.register_pytree_node(
    DF32,
    lambda v: ((v.hi, v.lo), None),
    lambda _, c: DF32(*c),
)


def _int_pow(x: DF32, n: int) -> DF32:
    if n == 0:
        return DF32.from_value(1.0)
    if n < 0:
        return DF32.from_value(1.0) / _int_pow(x, -n)
    out = None
    base = x
    while n:
        if n & 1:
            out = base if out is None else out * base
        n >>= 1
        if n:
            base = base * base
    return out


# -- transcendentals --------------------------------------------------------
# ln2 as a double-f32 constant: hi has 12 low mantissa bits zeroed so
# k * LN2_HI is exact for integer |k| < 2^11; (hi, lo) carries ln2 to
# ~2^-48. Matches ops/accurate_math.py's reduction constants.
_LN2_HI = np.float32(0.693145751953125)
_LN2_LO = np.float32(1.428606765330187e-06)
_INV_LN2 = np.float32(1.4426950408889634)

# Taylor tail Q(r) = sum_{k>=3} r^(k-3)/k! on |r| <= ln2/2, evaluated in
# PLAIN f32: the r^3*Q term contributes <= 7e-3 of exp(r), so f32 rounding
# of the tail (~3e-7 of itself) lands ~2e-9 relative on the result --
# below the chain target at a fraction of all-DF Horner cost.
_EXP_TAIL = tuple(
    np.float32(1.0 / _math.factorial(k)) for k in range(9, 2, -1)
)


def exp(x: DF32) -> DF32:
    """exp of a DF32, ~2e-9-relative for |x| <= ~80."""
    x = DF32.from_value(x)
    k = jnp.round(x.hi * _INV_LN2)
    # r = x - k*ln2 in pair arithmetic: k*LN2_HI is exact, so subtracting
    # it term-by-term keeps the reduction error at the ln2-pair level
    r = (x - k * _LN2_HI) - DF32(k * _LN2_LO,
                                 k * np.float32(5.4956039718e-14))
    q = _EXP_TAIL[0]
    for c in _EXP_TAIL[1:]:
        q = q * r.hi + c                     # plain f32 Horner
    r2 = r * r                               # DF: r^2
    tail = (r2.hi * r.hi) * q                # f32: r^3 * Q(r)
    out = r2 * np.float32(0.5) + (r + DF32(tail))
    out = out + 1.0
    ki = k.astype(jnp.int32)
    # bit-twiddled 2^k scaling (ops/floatbits.py): bit-identical to
    # jnp.ldexp for |k| <= 253 and Mosaic-safe, so the same chain runs
    # inside fused Pallas RHS kernels
    return DF32(_fb.ldexp2(out.hi, ki), _fb.ldexp2(out.lo, ki))


# atanh-series correction log(m) - 2s = s^3 * poly(s^2), s = (m-1)/(m+1),
# |s| <= 0.1716: evaluated in plain f32 (the correction is <= 3.4e-3 of
# log(m) and self-scales like s^3 near m = 1, so its f32 rounding stays
# ~1e-9 relative to the result everywhere).
_LOG_TAIL = tuple(
    np.float32(2.0 / (2 * k + 1)) for k in range(5, 0, -1)
)


def log(x: DF32) -> DF32:
    """Natural log of a DF32 (positive finite input), ~1e-9 relative.

    Direct pair formulation: m-1 is exact (Sterbenz) and m+1 a two_sum,
    so s = (m-1)/(m+1) carries pair precision into the exact doubling 2s;
    e*ln2 uses the ln2 pair; the series correction and the lo-word folding
    log(1 + lo/hi) ~= lo/hi ride in plain f32."""
    x = DF32.from_value(x)
    # bit-twiddled exponent split (ops/floatbits.py): bit-identical to
    # jnp.frexp for positive normal x (Mosaic-safe); non-positive inputs
    # are mapped to nan explicitly below (frexp_pos garbles them)
    m, e = _fb.frexp_pos(x.hi)               # x.hi = m * 2^e, m in [0.5, 1)
    small = m < np.float32(0.7071067811865476)
    m = jnp.where(small, m + m, m)           # m in [sqrt(1/2), sqrt(2))
    e = (e - small.astype(e.dtype)).astype(_f32)
    num = m - np.float32(1.0)                # exact (Sterbenz, 0.5<=m<=2)
    s = DF32(num) / DF32(*_two_sum(m, np.float32(1.0)))
    s2 = s.hi * s.hi
    p = _LOG_TAIL[0]
    for c in _LOG_TAIL[1:]:
        p = p * s2 + c                       # plain f32 Horner
    tail = (s2 * s.hi) * p + x.lo / x.hi     # series corr + lo folding
    out = DF32(s.hi + s.hi, s.lo + s.lo)     # 2s, exact doubling
    out = out + DF32(e * _LN2_HI, e * _LN2_LO)  # e*LN2_HI exact
    out = out + DF32(tail)
    # domain guard: frexp_pos garbles x <= 0 and denormals (jnp.frexp at
    # least kept the sign); nan-propagation makes a bad Newton iterate
    # (negative/underflowed value under a log) poison the increment
    # instead of returning a plausible finite value
    bad = x.hi < np.float32(1.1754943508222875e-38)
    nan = jnp.asarray(jnp.nan, dtype=_f32)
    return DF32(jnp.where(bad, nan, out.hi), jnp.where(bad, nan, out.lo))


# 1/ln10 split, kept as np scalars: a module-level DF32 would hold jax
# arrays, which Pallas kernels reject as captured constants
_INV_LN10_HI = np.float32(0.4342944920063019)
_INV_LN10_LO = np.float32(-1.0103049952192578e-08)


def log10(x: DF32) -> DF32:
    return log(x) * DF32(_INV_LN10_HI, _INV_LN10_LO)


def sqrt(x: DF32) -> DF32:
    """Square root via one exact-residual Newton correction.

    The residual x - y0^2 is computed with the pair ops (contraction-
    robust, see module note) -- a raw ((x.hi - s) - e) on two_prod's
    output would double-count e if the compiler contracts the first
    subtraction into fma(-y0, y0, x.hi)."""
    x = DF32.from_value(x)
    y0 = jnp.sqrt(x.hi)
    r = x - DF32(y0) * DF32(y0)
    d = r.hi + r.lo
    return DF32(*_quick_two_sum(y0, d / (y0 + y0)))


def pow(x, y):
    """x ** y with DF32 semantics on either argument."""
    if isinstance(y, (int, float)) and float(y).is_integer():
        return _int_pow(DF32.from_value(x), int(y))
    if isinstance(x, (int, float)):
        # constant base (10**(...) equilibrium constants): route through
        # __rpow__, whose log(base) is a PYTHON float split -- a traced
        # 0-d log would hit Mosaic's no-scalar-bitcast limit inside
        # fused Pallas kernels (and wastes ops everywhere else)
        y = y if isinstance(y, DF32) else DF32.from_value(y)
        return y.__rpow__(x)
    if isinstance(x, DF32):
        return x ** y
    return DF32.from_value(x) ** y
