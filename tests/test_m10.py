# M10: dynamic heterogeneous packed bed in REAL units, OC particle, live
# velocity/pressure marches. Oracle: reference modelEquationM6 with ONLY
# its solCatParticle crash bugs patched (same patch as test_m12 -- the
# interior OC rows involve no const3; the Robin surface row is zero after
# the interface update).

import io
from contextlib import redirect_stdout

import jax.numpy as jnp
import numpy as np
import pytest

from rmt_tpu.models import hetero_dyn
from test_m13 import _m13_model_input, GA_DII


def _m10_model_input():
    mi = _m13_model_input()
    mi["model"] = "M10"
    return mi


def _setup(z_no):
    mi = _m10_model_input()
    spec = hetero_dyn.m13_build_spec(mi, z_no=z_no, r_no=7)
    p = hetero_dyn.m10_params(mi)
    return mi, spec, p


def _reference_m6_funparam(mi, z_no, r_no):
    """FunParam exactly as runM6 builds it (pbReactor.py:2833-2871)."""
    from PyREMOT.data.componentData import componentDataSource
    from PyREMOT.docs.rmtThermo import calStandardEnthalpyOfReaction
    from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
    from PyREMOT.solvers.solOrCo import OrCoClass
    import PyREMOT.core.constants as CONST

    comp_list = mi["feed"]["components"]["shell"]
    comp_no = len(comp_list)
    reaction_list = rmtUtil.buildReactionList(mi["reactions"])
    sorted_ = rmtUtil.buildReactionCoefficient(mi["reactions"])
    coeff = rmtUtil.buildReactionCoeffVector(sorted_)
    internal = [it for c in comp_list for it in componentDataSource if it["symbol"] == c]
    SpCoi0 = np.asarray(mi["feed"]["concentration"])
    ReSpec = mi["reactor"]
    var_no = comp_no + 1
    fun_param = {
        "compList": comp_list,
        "const": {
            "CrSeAr": CONST.PI_CONST * ReSpec["ReInDi"] ** 2 / 4,
            "MoWei": np.array([it["MW"] for it in internal]),
            "StHeRe25": np.array(list(map(calStandardEnthalpyOfReaction, reaction_list))),
            "GaMiVi": mi["feed"]["mixture-viscosity"],
            "varNo": var_no,
            "varNoT": var_no * z_no,
            "reactionListNo": len(reaction_list),
        },
        "ReSpec": ReSpec,
        "ExHe": mi["external-heat"],
        "constBC1": {
            "VoFlRa0": mi["feed"]["volumetric-flowrate"],
            "SpCoi0": SpCoi0,
            "SpCo0": float(np.sum(SpCoi0)),
            "P0": mi["operating-conditions"]["pressure"],
            "T0": mi["operating-conditions"]["temperature"],
            "SuGaVe0": mi["feed"]["superficial-velocity"],
        },
        "meshSetting": {
            "noLayer": comp_no + 1,
            "varNoLayer": z_no * (r_no + 1),
            "varNoLayerT": (comp_no + 1) * z_no * (r_no + 1),
            "varNoRows": r_no + 1,
            "varNoColumns": z_no,
            "rNo": r_no,
            "zNo": z_no,
            "dz": ReSpec["ReLe"] / (z_no - 1),
        },
        "solverSetting": {"OrCoClassSetRes": OrCoClass().buildMatrix()},
        "reactionRateExpr": mi["reaction-rates"],
    }
    return sorted_, coeff, fun_param


def _random_state(spec, p, rng, z_no):
    """Perturbed state with SMALL gas-solid gaps: the reference M6
    velocity march integrates dv/dz ~ -(film flux)/C (pbReactor.py:3622),
    and a sizable interphase gap drives v negative within one dz, NaN-ing
    its own film correlations (Re^0.6 of a negative) -- states with
    near-equilibrated interphase are the ones the model can represent."""
    c0 = np.asarray(p["SpCoi0"])
    c_gas = c0[:, None, None] * rng.uniform(0.9, 1.05, (spec.n_comp, 1, z_no))
    c_sol = c_gas * rng.uniform(0.995, 1.005, (spec.n_comp, spec.r_no, z_no))
    T0 = float(p["T0"])
    t_all = T0 * rng.uniform(0.995, 1.01, (1, spec.r_no + 1, z_no))
    return np.concatenate(
        [np.concatenate([c_gas, c_sol], axis=1), t_all], axis=0
    ).reshape(-1)


@pytest.mark.reference
def test_m10_rhs_matches_patched_reference(monkeypatch):
    import PyREMOT.docs.pbReactor as pbr
    from PyREMOT.solvers.solCatParticle import OrCoCatParticleClass

    class FixedOrCo(OrCoCatParticleClass):
        def buildOrCoMatrix(self, yj, const1, const2, const3=(), mode="default"):
            y = np.asarray(yj).ravel()
            xc = np.asarray(self.Xc)
            L = const1 * (np.asarray(self.B) + (2.0 / xc)[:, None] * np.asarray(self.A))
            out = L @ y + np.asarray(const2).ravel()
            out[-1] = 0.0
            return out

    monkeypatch.setattr(pbr, "OrCoCatParticleClass", FixedOrCo)

    z_no = 5
    mi, spec, p = _setup(z_no)
    rhs = hetero_dyn.make_m10_rhs(spec)
    sorted_, coeff, fun_param = _reference_m6_funparam(mi, z_no, spec.r_no)

    rng = np.random.default_rng(23)
    for trial in range(2):
        y = _random_state(spec, p, rng, z_no)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                pbr.PackedBedReactorClass.modelEquationM6(
                    0.1, y, sorted_, coeff, fun_param
                )
            )
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m10_api_end_to_end():
    # short horizon: the e2e check exercises routing/integration/
    # postprocessing (the parity test pins the physics); the OC particle's
    # near-zero-kinetics transient keeps Radau steps ~1e-5 s, so a long
    # period is minutes of CPU
    from rmt_tpu.api import rmt

    mi = _m10_model_input()
    mi["operating-conditions"]["period"] = 0.02
    mi["solver-config"].update({"zNo": 4, "tNo": 2})
    res = rmt.rmtExe(mi)
    packs = res["resModel"]["dataPack"]
    assert len(packs) == 2
    for pack in packs:
        assert pack["successStatus"]
        assert np.all(np.isfinite(pack["dataYs"]))
    last = packs[-1]
    n_comp = len(mi["feed"]["components"]["shell"])
    np.testing.assert_allclose(
        np.sum(last["dataYs"][:n_comp], axis=0), 1.0, rtol=1e-6
    )
    # real-unit temperatures stay physical through the transient
    t_gas = last["dataYTemp"].ravel()
    assert np.all(t_gas > 400.0) and np.all(t_gas < 1000.0)
    assert np.all(last["dataYTemps"] > 400.0)
