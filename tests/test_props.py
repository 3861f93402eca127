# Property engine parity vs the reference oracle
# (thermo: PyREMOT/docs/rmtThermo.py; transport: docs/gasTransPor.py).

import numpy as np
import pytest

from rmt_tpu.data import species_indices
from rmt_tpu.props import thermo, transport

COMP = ["H2", "CO2", "H2O", "CO", "CH3OH", "DME"]
IDX = species_indices(COMP)
MW = np.array([2.0, 44.01, 18.01, 28.01, 32.04, 46.07])
MOFRI = np.array([0.4999925, 0.2499963, 1e-5, 0.2499962, 1e-5, 1e-5])
MOFRI = MOFRI / MOFRI.sum()


@pytest.mark.reference
@pytest.mark.parametrize("T", [300.0, 423.5, 523.0, 650.0])
def test_cp_mean_matches_reference(T):
    from PyREMOT.docs.rmtThermo import calMeanHeatCapacityAtConstantPressure

    ref = calMeanHeatCapacityAtConstantPressure(COMP, T)
    ours = np.asarray(thermo.cp_mean(T, IDX))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


@pytest.mark.reference
@pytest.mark.parametrize("T", [300.0, 523.0, 700.0])
def test_viscosity_matches_reference(T):
    from PyREMOT.docs.gasTransPor import calGasViscosity

    ref = calGasViscosity(COMP, T)
    ours = np.asarray(transport.viscosity(T, IDX))
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


@pytest.mark.reference
@pytest.mark.parametrize("T", [300.0, 523.0, 700.0])
def test_thermal_conductivity_matches_reference(T):
    from PyREMOT.docs.gasTransPor import calGasThermalConductivity

    ref = calGasThermalConductivity(COMP, T)
    ours = np.asarray(transport.thermal_conductivity(T, IDX))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


@pytest.mark.reference
def test_wilke_mixture_matches_reference():
    from PyREMOT.docs.gasTransPor import calGasViscosity, calMixturePropertyM1

    T = 523.0
    mu = calGasViscosity(COMP, T)
    ref = calMixturePropertyM1(len(COMP), mu, MOFRI, MW)
    ours = float(transport.wilke_mixture(np.asarray(mu), MOFRI, MW))
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


@pytest.mark.reference
def test_diffusivity_matches_reference():
    from PyREMOT.docs.gasTransPor import calGaDiEq1

    T, P = 523.0, 5e6
    params = {
        "MoFri": MOFRI,
        "T": T,
        "P": P,
        "MWi": MW,
        "CrTei": [33.25, 304.12, 647.14, 132.85, 512.64, 400.0],
        "CrPri": [12.97, 73.74, 220.64, 34.94, 80.97, 53.0],
    }
    ref = calGaDiEq1(COMP, params)
    ours = np.asarray(transport.diffusivity_chapman_enskog(T, P, MOFRI, IDX))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_cp_is_batched_and_jittable():
    import jax

    T = np.array([300.0, 500.0, 700.0])
    out = jax.jit(lambda t: thermo.cp_mol(t, IDX))(T)
    assert out.shape == (3, len(COMP))
    # polynomial evaluated directly for CO2 at 500 K
    expected = 22.243 + 5.98e-2 * 500 - 3.50e-5 * 500**2 + 7.46e-9 * 500**3
    np.testing.assert_allclose(np.asarray(out)[1][np.array(COMP) == "CO2"], expected)
