# TPU-native reactor modeling framework with the capabilities of PyREMOT
# (sinagilassi/rmt-app), redesigned for JAX/XLA: jitted kinetics, vectorized
# method-of-lines balances, jittable adaptive integrators, vmapped ensembles.

from . import config as _config

_config.setup()

from .api.rmt import rmtExe, rmtCom  # noqa: E402

__version__ = "0.1.0"
__all__ = ["rmtExe", "rmtCom", "__version__"]
