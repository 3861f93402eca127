# Package data layer: geometry defaults and feed helpers, bit-for-bit vs
# the reference data modules.

import numpy as np
import pytest

from rmt_tpu.data import defaults


@pytest.mark.reference
def test_geometry_defaults_match_reference():
    from PyREMOT.data import inputDataReactor as ref

    assert defaults.REACTOR["rea_D"] == ref.rea_D
    assert defaults.REACTOR["rea_L"] == ref.rea_L
    assert defaults.REACTOR["bed_por"] == ref.bed_por
    assert defaults.REACTOR["kwall"] == ref.kwall
    assert defaults.CATALYST["cat_d"] == ref.cat_d
    assert defaults.CATALYST["cat_rho"] == ref.cat_rho
    assert defaults.CATALYST["cat_por"] == ref.cat_por
    assert defaults.CATALYST["cat_tor"] == ref.cat_tor
    assert defaults.CATALYST["therCop"] == ref.therCop
    assert defaults.CATALYST["cat_Cp"] == ref.cat_Cp
    assert defaults.CATALYST["bulk_rho"] == ref.bulk_rho
    assert defaults.MEMBRANE["QH2"] == ref.QH2


@pytest.mark.reference
@pytest.mark.parametrize("ratios", [(1.0, 0.5), (2.0, 0.8), (3.0, 0.2)])
def test_feed_mole_fraction_matches_reference(ratios):
    from PyREMOT.data.initData import setFeedMoleFraction as ref_fn

    ours = defaults.setFeedMoleFraction(*ratios)
    ref = ref_fn(*ratios)
    np.testing.assert_array_equal(ours, ref)
    assert ours.dtype == ref.dtype


@pytest.mark.reference
@pytest.mark.parametrize("unit", ["kmol/m^3", "mol/m^3"])
def test_concentration_helpers_match_reference(unit):
    from PyREMOT.data.initData import calConcentration, calTotalConcentration

    mo_fri = defaults.setFeedMoleFraction(1.0, 0.5)
    ours = defaults.calConcentration(mo_fri, 5e6, 523.0, unit)
    ref = calConcentration(mo_fri, 5e6, 523.0, unit)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
    assert defaults.calTotalConcentration(ours) == calTotalConcentration(ref)


def test_canonical_input_builds_from_package_alone():
    """A user can assemble the canonical DME feed with only rmt_tpu."""
    from rmt_tpu.data import (
        CATALYST, REACTOR, calConcentration, setFeedMoleFraction,
    )

    mo_fri = setFeedMoleFraction(1.0, 0.5)
    ci = calConcentration(mo_fri, 5e6, 523.0, "mol/m^3")
    assert np.all(np.asarray(ci)[:4] > 0)
    assert REACTOR["rea_D"] > 0 and CATALYST["bulk_rho"] > 0
