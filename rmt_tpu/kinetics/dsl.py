# Kinetics DSL compiler.
#
# The reference's signature feature is a user-supplied reaction-rate program:
# modelInput['reaction-rates'] = {"VARS": {...}, "RATES": {...}} where each
# entry is ``lambda x: ...`` over a growing dict x seeded with
# {R_CONST, T, P, MoFri, SpCoi} and evaluated in insertion order -- a
# topologically ordered scalar expression DAG
# (reference: PyREMOT/docs/rmtReaction.py:11-61).
#
# Here the same dict-program is *traced* with JAX values instead of floats:
# the user's lambdas call math.exp / math.pow / numpy, so each lambda is
# re-bound to a shim namespace mapping math->jnp before evaluation. Under
# jit the whole program compiles to a pure fused XLA rate function, and any
# DSL variable (e.g. the kinetic constants K1..K3, KH2/KCO2/KCO) can be
# overridden with a traced array, which makes them vmap-able (ensembles over
# kinetic constants) and differentiable (adjoint parameter estimation).

from __future__ import annotations

import os
import types
from typing import Any, Mapping

import jax.numpy as jnp

from ..constants import R_CONST
from ..ops import accurate_math as _am
from ..ops import df32 as _df

# TPU XLA's f32 exp/log/pow are ~1e-5-accurate fast approximations; the
# compensated f32 implementations in ops/accurate_math recover ~IEEE
# quality at elementwise-op cost. They dispatch on dtype (f64 passes
# through to jnp), so this is a pure f32-mode knob. RMT_TPU_ACCURATE_F32=0
# reverts to the native ops.
_ACCURATE_F32 = os.environ.get("RMT_TPU_ACCURATE_F32", "1") != "0"


class _MathShim(types.ModuleType):
    """Drop-in replacement for the stdlib ``math`` module that dispatches to
    jnp so traced JAX values flow through user lambdas unchanged."""

    def __init__(self):
        super().__init__("math")
        self.pi = jnp.pi
        self.e = float(jnp.e)
        self.inf = jnp.inf
        self.nan = jnp.nan

    @staticmethod
    def exp(x):
        if isinstance(x, _df.DF32):
            return _df.exp(x)
        return _am.exp(x) if _ACCURATE_F32 else jnp.exp(x)

    @staticmethod
    def log(x, base=None):
        if isinstance(x, _df.DF32):
            lg = _df.log
        else:
            lg = _am.log if _ACCURATE_F32 else jnp.log
        if base is None:
            return lg(x)
        return lg(x) / lg(base)

    @staticmethod
    def log10(x):
        if isinstance(x, _df.DF32):
            return _df.log10(x)
        return _am.log10(x) if _ACCURATE_F32 else jnp.log10(x)

    @staticmethod
    def log2(x):
        return jnp.log2(x)

    @staticmethod
    def sqrt(x):
        if isinstance(x, _df.DF32):
            return _df.sqrt(x)
        return jnp.sqrt(x)

    @staticmethod
    def pow(x, y):
        if isinstance(x, _df.DF32) or isinstance(y, _df.DF32):
            return _df.pow(x, y)
        return _am.pow(x, y) if _ACCURATE_F32 else jnp.power(x, y)

    @staticmethod
    def fabs(x):
        return jnp.abs(x)

    @staticmethod
    def sin(x):
        return jnp.sin(x)

    @staticmethod
    def cos(x):
        return jnp.cos(x)

    @staticmethod
    def tan(x):
        return jnp.tan(x)

    @staticmethod
    def atan(x):
        return jnp.arctan(x)

    @staticmethod
    def asin(x):
        return jnp.arcsin(x)

    @staticmethod
    def acos(x):
        return jnp.arccos(x)

    @staticmethod
    def sinh(x):
        return jnp.sinh(x)

    @staticmethod
    def cosh(x):
        return jnp.cosh(x)

    @staticmethod
    def tanh(x):
        return jnp.tanh(x)

    @staticmethod
    def expm1(x):
        return jnp.expm1(x)

    @staticmethod
    def log1p(x):
        return jnp.log1p(x)

    @staticmethod
    def hypot(x, y):
        return jnp.hypot(x, y)

    @staticmethod
    def erf(x):
        from jax.scipy.special import erf

        return erf(x)


_MATH_SHIM = _MathShim()


def _rebind(fn):
    """Return ``fn`` with ``math``/``np``/``numpy`` rebound to jnp-backed
    shims in its globals, so tracing works on JAX values."""
    if not isinstance(fn, types.FunctionType):
        return fn
    g = dict(fn.__globals__)
    g["math"] = _MATH_SHIM
    g["np"] = jnp
    g["numpy"] = jnp
    g["jnp"] = jnp
    out = types.FunctionType(fn.__code__, g, fn.__name__, fn.__defaults__, fn.__closure__)
    out.__kwdefaults__ = fn.__kwdefaults__
    return out


class RateProgram:
    """A compiled view of a {"VARS": ..., "RATES": ...} reaction-rate spec.

    Calling it evaluates the dict-program with JAX semantics and returns the
    stacked reaction rates (n_rxn,). ``overrides`` replaces named DSL
    variables (kinetic constants) with caller-supplied traced values.
    """

    def __init__(self, vars_dict: Mapping[str, Any], rates_dict: Mapping[str, Any]):
        self.var_names = tuple(vars_dict.keys())
        self.rate_names = tuple(rates_dict.keys())
        self._vars = {k: _rebind(v) for k, v in vars_dict.items()}
        self._rates = {k: _rebind(v) for k, v in rates_dict.items()}
        self.n_rxn = len(self._rates)

    def call_list(self, T, P, mole_frac, conc, overrides: Mapping[str, Any] | None = None):
        """Evaluate the dict-program and return the per-reaction rates as a
        plain LIST (no stacking). Fused Pallas RHS kernels consume this
        form directly -- stacking to (n_rxn, ...) and re-slicing per
        reaction is wasted relayout work inside a kernel."""
        x: dict[str, Any] = {
            "R_CONST": R_CONST,
            "T": T,
            "P": P,
            "MoFri": mole_frac,
            "SpCoi": conc,
        }
        overrides = overrides or {}
        for name, fn in self._vars.items():
            if name in overrides:
                x[name] = overrides[name]
            elif callable(fn):
                x[name] = fn(x)
            else:
                x[name] = fn
        rates = []
        for name, fn in self._rates.items():
            if name in overrides:
                rates.append(overrides[name])
            else:
                rates.append(fn(x))
        return rates

    def __call__(self, T, P, mole_frac, conc, overrides: Mapping[str, Any] | None = None):
        rates = self.call_list(T, P, mole_frac, conc, overrides)
        if any(isinstance(r, _df.DF32) for r in rates):
            # compensated (double-f32) evaluation: keep the pair so the
            # caller's nu@R cancellation resolves before the one final
            # rounding (ops/df32.py rationale)
            return _df.DF32.stack(rates)
        return jnp.stack([jnp.asarray(r) for r in rates])


def compile_rate_program(reaction_rate_expr: Mapping[str, Any]) -> RateProgram:
    """Build a RateProgram from the modelInput['reaction-rates'] dict."""
    return RateProgram(reaction_rate_expr["VARS"], reaction_rate_expr["RATES"])
