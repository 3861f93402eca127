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


def test_m14_ch4_end_to_end():
    """Steady heterogeneous M14 on the methane-coupling chemistry
    (reference test_rmt_CH4_6.py config): converges and lands on a
    physical endothermic steady state."""
    from ch4_case import make_hetero_model_input

    from rmt_tpu import rmtExe

    res = rmtExe(make_hetero_model_input(model="M14"))["resModel"]
    pack = res["dataPack"][0]
    assert pack["successStatus"]
    Tg = np.asarray(pack["dataYTempGas"])
    Ts = np.asarray(pack["dataYTempSolid"])
    assert np.all(np.isfinite(Tg)) and np.all(np.isfinite(Ts))
    # endothermic + adiabatic with a temperature-INDEPENDENT rate (no
    # Arrhenius factor, k0 constant): the reaction keeps consuming
    # enthalpy as the bed cools, so the mathematical steady state runs
    # monotonically cold along the bed -- below 0 K at the outlet, a
    # property of the reference's own toy chemistry, whose test is
    # print-and-inspect with no asserts. Assert the structure the
    # equations actually imply.
    assert Tg.max() <= 973.0 + 1e-6
    assert np.all(np.diff(Tg.ravel()) < 0.0)   # monotone cooling
    assert Ts.min() <= Tg.min() + 1e-6         # reacting solid colder
    # CH4 consumed along the bed
    cg = np.asarray(pack["dataYCoGas"])
    assert cg[0, -1] < cg[0, 0]


def test_m10_ch4_end_to_end():
    """Dynamic heterogeneous M10 (OC particle) on the methane-coupling
    chemistry (reference test_rmt_C6.py config)."""
    from ch4_case import make_hetero_model_input

    from rmt_tpu import rmtExe

    # short horizon / coarse grid like the DME M10 e2e: the OC particle's
    # transient keeps Radau steps tiny, so a full period is minutes of CPU
    mi = make_hetero_model_input(model="M10", op_period=0.02)
    mi["solver-config"].update({"zNo": 4, "tNo": 2})
    res = rmtExe(mi)["resModel"]
    packs = res["dataPack"]
    assert len(packs) == 2
    for p in packs:
        assert p["successStatus"]
        assert np.all(np.isfinite(np.asarray(p["dataYs"])))
    last = packs[-1]
    # mole fractions renormalize to 1; temperatures stay physical through
    # the endothermic transient
    np.testing.assert_allclose(np.sum(last["dataYs"][:3], axis=0), 1.0,
                               rtol=1e-6)
    t_gas = np.asarray(last["dataYTemp"]).ravel()
    assert np.all(t_gas > 500.0) and np.all(t_gas < 1000.0)
