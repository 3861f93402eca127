# modelInput schema validation: unknown sections and malformed required
# sections fail loudly (the reference accepts the raw dict verbatim and
# silently ignores what it doesn't read).

import pytest

from dme_case import make_model_input
from rmt_tpu import rmtExe


def test_unknown_top_level_key_rejected():
    mi = make_model_input(model="N1")
    mi["reactor-config"] = {}  # typo for "reactor"
    with pytest.raises(ValueError, match="reactor-config"):
        rmtExe(mi)


def test_unknown_operating_condition_key_rejected():
    mi = make_model_input(model="N1")
    mi["operating-conditions"]["presure"] = 1e5  # typo
    with pytest.raises(ValueError, match="presure"):
        rmtExe(mi)


def test_unknown_solver_config_key_rejected():
    mi = make_model_input(model="N1")
    mi["solver-config"]["rtoll"] = 1e-9  # typo
    with pytest.raises(ValueError, match="rtoll"):
        rmtExe(mi)


def test_missing_model_id_rejected():
    mi = make_model_input(model="N1")
    del mi["model"]
    with pytest.raises(ValueError, match="model"):
        rmtExe(mi)


def test_missing_feed_components_rejected():
    mi = make_model_input(model="N1")
    del mi["feed"]["components"]
    with pytest.raises(ValueError, match="components"):
        rmtExe(mi)


def test_malformed_reaction_rates_rejected():
    mi = make_model_input(model="N1")
    mi["reaction-rates"] = {"VARS": {}, "RATES": [1, 2]}
    with pytest.raises(ValueError, match="RATES"):
        rmtExe(mi)


def test_malformed_reactions_rejected():
    mi = make_model_input(model="N1")
    mi["reactions"] = {"R1": 42}
    with pytest.raises(ValueError, match="reaction"):
        rmtExe(mi)


def test_unimplemented_model_id_raises_not_implemented():
    mi = make_model_input(model="M6")
    with pytest.raises(NotImplementedError):
        rmtExe(mi)


def test_kinetic_overrides_accepted_and_applied():
    import numpy as np

    mi = make_model_input(model="N1")
    base = np.asarray(rmtExe(mi)["resModel"][0]["dataYs"])
    mi2 = make_model_input(model="N1")
    mi2["kinetic-overrides"] = {"K1": 1e-6}  # kill the methanol rate
    mod = np.asarray(rmtExe(mi2)["resModel"][0]["dataYs"])
    assert np.max(np.abs(base - mod)) > 1e-4


def test_profile_env_captures_jax_trace(tmp_path, monkeypatch):
    # RMT_TPU_PROFILE=<dir> wraps the run in jax.profiler.trace (SURVEY §5
    # observability: device/host timelines replace the reference's
    # wall-clock-only reporting, pbHomoReactor.py:2987).
    import os

    monkeypatch.setenv("RMT_TPU_PROFILE", str(tmp_path))
    res = rmtExe(make_model_input(model="N1"))
    assert "resModel" in res
    dumped = [
        os.path.join(r, f)
        for r, _, fs in os.walk(tmp_path)
        for f in fs
    ]
    assert dumped, "profiler trace directory is empty"


def test_typo_ivp_value_rejected():
    # a typo'd ivp must raise, not silently fall through to radau
    # (reference configs name LSODA/BDF/Radau, pbHomoReactor.py:2916-2932)
    mi = make_model_input(model="N1")
    mi["solver-config"]["ivp"] = "LSODAX"
    with pytest.raises(ValueError, match="LSODAX"):
        rmtExe(mi)


def test_reference_ivp_names_accepted():
    import numpy as np

    mi = make_model_input(model="N1")
    mi["solver-config"]["ivp"] = "LSODA"
    a = np.asarray(rmtExe(mi)["resModel"][0]["dataYs"])
    mi2 = make_model_input(model="N1")
    mi2["solver-config"]["ivp"] = "BDF"
    b = np.asarray(rmtExe(mi2)["resModel"][0]["dataYs"])
    # both stiff names route to the same Radau IIA(5) integrator
    assert np.array_equal(a, b)


def test_profile_env_nested_trace_degrades_gracefully(tmp_path, monkeypatch):
    # an already-active profiler session must not turn RMT_TPU_PROFILE
    # into a hard failure (advisor finding, round 2)
    import warnings as _warnings

    import jax

    monkeypatch.setenv("RMT_TPU_PROFILE", str(tmp_path))
    with jax.profiler.trace(str(tmp_path / "outer")):
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore", RuntimeWarning)
            res = rmtExe(make_model_input(model="N1"))
    assert "resModel" in res


def test_fixed_stepper_divergence_raises():
    """ivp='AM' routes to the fixed-step PreCorr3 marcher, which diverges
    on the stiff N1 chemistry at the default AM_n -- rmtExe must raise
    loudly instead of returning NaN states. (The reference CRASHES on
    this input: its 'AM' string reaches scipy solve_ivp, which rejects
    it, pbHomoReactor.py:2931.)"""
    mi = make_model_input(model="N1")
    mi["solver-config"] = {"ivp": "AM"}
    with pytest.raises(RuntimeError, match="non-finite"):
        rmtExe(mi)
