# Test configuration: run everything on a virtual 8-device CPU mesh in
# float64, regardless of any attached accelerator. The reference package at
# /root/reference (if present) is importable as a numeric oracle.

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["RMT_TPU_X64"] = "1"

import jax

# the axon TPU plugin ignores JAX_PLATFORMS; the config knob works
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

_REFERENCE_PATH = "/root/reference"
HAVE_REFERENCE = os.path.isdir(os.path.join(_REFERENCE_PATH, "PyREMOT"))
if HAVE_REFERENCE and _REFERENCE_PATH not in sys.path:
    sys.path.insert(0, _REFERENCE_PATH)

if HAVE_REFERENCE:
    import matplotlib

    matplotlib.use("Agg")

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference: test compares against the PyREMOT oracle"
    )


def pytest_collection_modifyitems(config, items):
    if HAVE_REFERENCE:
        return
    skip = pytest.mark.skip(reason="reference PyREMOT oracle not available")
    for item in items:
        if "reference" in item.keywords:
            item.add_marker(skip)
