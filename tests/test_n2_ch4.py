# Second chemistry for the dynamic N2 model: methane coupling
# 2CH4 <=> C2H4 + 2H2 (reference tests/test_rmt_N2_CH4.py). Proves the
# kinetics DSL generalizes beyond the DME fixture: concentration-based
# (SpCoi) rate, stoichiometric coefficient 2 in the reaction string, a
# different species slice of the DB, and the Tm==0 adiabatic quirk.

import jax.numpy as jnp
import numpy as np
import pytest

from ch4_case import make_model_input
from rmt_tpu.models import homo
from test_n2 import _reference_n2_params


@pytest.mark.reference
def test_n2_ch4_rhs_matches_reference_pointwise():
    from PyREMOT.docs.pbHomoReactor import PackedBedHomoReactorClass

    mi = make_model_input()
    spec = homo.build_spec(mi)
    p = homo.build_params(mi)
    d = homo.feed_state(spec, p)
    rhs = homo.make_n2_rhs(spec)
    y0 = np.asarray(homo.n2_initial_state(spec, p, d))
    params_set = _reference_n2_params(mi)

    rng = np.random.default_rng(7)
    for _ in range(5):
        y = y0 * rng.uniform(0.6, 1.4, size=y0.shape)
        y[-20:] = rng.uniform(-0.05, 0.02, 20)  # temperature rows (endotherm)
        ref = np.asarray(
            PackedBedHomoReactorClass.modelEquationN2(0.1, y, params_set)
        )
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p, d))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_n2_ch4_end_to_end_physical():
    from rmt_tpu import rmtExe

    res = rmtExe(make_model_input())["resModel"]
    packs = res["dataPack"]
    assert len(packs) == 5
    np.testing.assert_allclose(
        [p["dataTime"] for p in packs], [2.0, 4.0, 6.0, 8.0, 10.0]
    )
    for p in packs:
        assert p["successStatus"]
        ys = np.asarray(p["dataYs"])
        assert ys.shape == (4, 20)  # 3 species + T, zNo=20
        assert np.all(np.isfinite(ys))
        np.testing.assert_allclose(ys[:3].sum(axis=0), 1.0, atol=1e-8)
    last = np.asarray(packs[-1]["dataYs"])
    y_ch4, y_c2h4, y_h2 = last[0], last[1], last[2]
    # CH4 consumed along the bed, C2H4 and H2 formed
    assert y_ch4[-1] < y_ch4[0]
    assert y_c2h4[-1] > y_c2h4[0]
    assert y_h2[-1] > y_h2[0]
    # stoichiometry: per mole C2H4 formed, two moles H2 (same feed offset
    # 0.05 for both) -- loose because mole fractions renormalize
    d_c2h4 = y_c2h4[-1] - y_c2h4[0]
    d_h2 = y_h2[-1] - y_h2[0]
    assert 1.5 < d_h2 / d_c2h4 < 2.5
    # endothermic + adiabatic (MeTe=0 => Qm=0): the rate has no Arrhenius
    # factor (k0 is constant), so the reaction keeps consuming enthalpy as
    # the gas cools -- temperature falls far below the 973 K feed but must
    # stay positive and finite (dataYs T row is real Kelvin)
    T_re = last[3]
    assert T_re.max() < 973.0
    assert T_re.min() > 0.0


@pytest.mark.reference
def test_n2_ch4_rmt_exe_matches_reference():
    from PyREMOT import rmtExe as ref_rmt_exe

    from rmt_tpu import rmtExe

    ours = rmtExe(make_model_input())["resModel"]
    ref = ref_rmt_exe(make_model_input())["resModel"]

    assert len(ours["dataPack"]) == len(ref["dataPack"]) == 5
    for op, rp in zip(ours["dataPack"], ref["dataPack"]):
        a, b = np.asarray(op["dataYs"]), np.asarray(rp["dataYs"])
        assert a.shape == b.shape
        # mole-fraction rows within the reference's LSODA default tolerance
        assert np.max(np.abs(a[:3] - b[:3])) < 5e-3
        # real-Kelvin temperature row
        assert np.max(np.abs(a[3] - b[3]) / np.abs(b[3])) < 2e-3
