# Kinetics DSL compiler + stoichiometry parity and differentiability.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dme_case import COMP_LIST, REACTION_SET, dme_kinetics
from rmt_tpu.kinetics import Stoichiometry, compile_rate_program

T, P = 523.0, 5e6
MOFRI = np.array([0.4999925, 0.2499963, 1e-5, 0.2499962, 1e-5, 1e-5])
MOFRI = MOFRI / MOFRI.sum()
CONC = MOFRI * 1149.83


@pytest.mark.reference
def test_rate_program_matches_reference_executor():
    from PyREMOT.docs.rmtReaction import reactionRateExe

    kin = dme_kinetics()
    ref = np.array(reactionRateExe((T, P, MOFRI, CONC), kin["VARS"], kin["RATES"]))
    prog = compile_rate_program(kin)
    ours = np.asarray(prog(T, P, MOFRI, CONC))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_rate_program_jits_and_vmaps():
    prog = compile_rate_program(dme_kinetics())
    f = jax.jit(lambda t, p, mf, c: prog(t, p, mf, c))
    r1 = np.asarray(f(T, P, MOFRI, CONC))
    assert r1.shape == (3,)
    # vmap over a temperature batch
    Ts = jnp.asarray([500.0, 523.0, 550.0])
    rb = jax.vmap(lambda t: prog(t, P, MOFRI, CONC))(Ts)
    assert rb.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(rb)[1], r1, rtol=1e-12)


def test_kinetic_overrides_are_differentiable():
    prog = compile_rate_program(dme_kinetics())

    def loss(k1):
        r = prog(T, P, jnp.asarray(MOFRI), jnp.asarray(CONC), {"K1": k1})
        return r[0]

    k1_base = 35.45 * np.exp(-1.7069e4 / (8.314472 * T))
    g = jax.grad(loss)(jnp.asarray(k1_base))
    # r1 is linear in K1, so dr1/dK1 = r1/K1
    np.testing.assert_allclose(float(g), float(loss(k1_base)) / k1_base, rtol=1e-9)


@pytest.mark.reference
def test_stoichiometry_matches_reference_formation_rates():
    from PyREMOT.docs.rmtReaction import componentFormationRate, reactionRateExe
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil

    kin = dme_kinetics()
    rates = np.array(reactionRateExe((T, P, MOFRI, CONC), kin["VARS"], kin["RATES"]))
    sorted_ = rmtUtil.buildReactionCoefficient(REACTION_SET)
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    ref = componentFormationRate(len(COMP_LIST), COMP_LIST, coeff, rates)

    st = Stoichiometry(REACTION_SET, COMP_LIST)
    ours = np.asarray(st.formation_rates(rates))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


@pytest.mark.reference
def test_standard_heat_of_reaction_matches_reference():
    from PyREMOT.docs.rmtThermo import calStandardEnthalpyOfReaction

    st = Stoichiometry(REACTION_SET, COMP_LIST)
    ref = np.array([calStandardEnthalpyOfReaction(r) for r in REACTION_SET.values()])
    np.testing.assert_allclose(st.dh_rxn_25, ref, rtol=1e-12)


def test_fractional_coefficients_parse():
    st = Stoichiometry({"R1": "CH4 + 0.5O2 <=> CH3OH"}, ["CH4", "CH3OH"])
    np.testing.assert_allclose(st.nu_comp, [[-1.0, 1.0]])
    # O2 is not in the property database: it is excluded from the enthalpy
    # bookkeeping (zero contribution), matching the reference's behavior
    assert "O2" not in st.eq_symbols
