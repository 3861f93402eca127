# Global numeric configuration.
#
# The reference runs everything in NumPy float64. To reproduce its results to
# <=1e-6 relative error the solver pipeline defaults to float64
# (jax_enable_x64). On TPU float64 is software-emulated; for throughput-first
# ensemble runs set RMT_TPU_X64=0 (or call setup(x64=False)) to run float32.

import os
import sys

import jax

_CONFIGURED = False


def setup(x64: bool | None = None) -> None:
    """Configure JAX for the framework. Idempotent; call before tracing."""
    global _CONFIGURED
    if x64 is None:
        x64 = os.environ.get("RMT_TPU_X64", "1") != "0"
    # Tracing the fused Pallas RHS (the df32 kinetics chain is ~12.5k ops
    # deep through dsl -> df32 -> floatbits frames) exceeds CPython's
    # default 1000-frame recursion limit under jax >= 0.9 (deeper tracer
    # frames than the 0.8.x this code was first built on). Raise it once;
    # never lower a user's higher setting.
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 10000))
    jax.config.update("jax_enable_x64", bool(x64))
    if not x64:
        # TPU lowers default-precision f32 matmuls to bf16 passes (4e-3
        # relative error). In whole-program f32 mode that noise enters the
        # Radau stage construction and the MoL stencil products, exceeds the
        # Newton convergence floor, and collapses the step size (measured:
        # frozen trajectories on v5e). True-f32 matmuls fix it at ~2x the
        # bf16 matmul cost -- still ~10x faster end-to-end than emulated f64.
        jax.config.update("jax_default_matmul_precision", "highest")
    _CONFIGURED = True


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_float():
    import jax.numpy as jnp

    return jnp.float64 if x64_enabled() else jnp.float32
