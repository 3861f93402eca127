# M12: dynamic heterogeneous packed bed, OC particle, static interface.
#
# The reference's modelEquationM8 cannot run as shipped: every
# buildOrCoMatrix call passes const3=() and dies on constCT2[1]
# (solCatParticle.py:150), and the (N,1) interface vector broadcasts
# RY+f into an (N,N) matrix (:229-232). The oracle here is the reference
# RHS with ONLY those crash bugs patched (interior OC rows need no
# const3 at all; the Robin surface row is exactly zero after the
# algebraic interface update, so the patched row is 0 for any beta/bulk)
# -- everything else, including the solid-Cp-at-dimensionless-T unit bug,
# runs as the reference wrote it.

import io
from contextlib import redirect_stdout

import jax.numpy as jnp
import numpy as np
import pytest

from rmt_tpu.models import hetero_dyn
from test_m13 import _m13_model_input, _reference_m13_args


def _m12_model_input():
    mi = _m13_model_input()
    mi["model"] = "M12"
    return mi


def _setup(z_no):
    mi = _m12_model_input()
    spec = hetero_dyn.m13_build_spec(mi, z_no=z_no, r_no=7)
    p = hetero_dyn.m13_params(mi)
    d = hetero_dyn.m13_feed(spec, p)
    return mi, spec, p, d


def _random_state(spec, p, rng, z_no):
    c_in = np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"])))
    c_gas = c_in[:, None, None] * rng.uniform(0.3, 1.1, (spec.n_comp, 1, z_no))
    c_sol = c_in[:, None, None] * rng.uniform(0.2, 1.0, (spec.n_comp, spec.r_no, z_no))
    t_all = rng.uniform(-0.02, 0.08, (1, spec.r_no + 1, z_no))
    return np.concatenate(
        [np.concatenate([c_gas, c_sol], axis=1), t_all], axis=0
    ).reshape(-1)


@pytest.mark.reference
def test_m12_rhs_matches_patched_reference(monkeypatch):
    import PyREMOT.docs.pbReactor as pbr
    from PyREMOT.solvers.solCatParticle import OrCoCatParticleClass
    from PyREMOT.solvers.solOrCo import OrCoClass

    class FixedOrCo(OrCoCatParticleClass):
        """Crash-bugs-only patch: flat vectors, no const3 access, rows
        aligned with their collocation points, Robin row = 0 (exact after
        the interface update)."""

        def buildOrCoMatrix(self, yj, const1, const2, const3=(), mode="default"):
            y = np.asarray(yj).ravel()
            xc = np.asarray(self.Xc)
            L = const1 * (np.asarray(self.B) + (2.0 / xc)[:, None] * np.asarray(self.A))
            out = L @ y + np.asarray(const2).ravel()
            out[-1] = 0.0
            return out

    monkeypatch.setattr(pbr, "OrCoCatParticleClass", FixedOrCo)

    z_no = 5
    mi, spec, p, d = _setup(z_no)
    rhs = hetero_dyn.make_m12_rhs(spec, cp_at_real_temperature=False)
    sorted_, coeff, fun_param, dl_params = _reference_m13_args(mi, z_no, spec.r_no)
    fun_param["solverSetting"]["OrCoClassSetRes"] = OrCoClass().buildMatrix()
    params_set = (sorted_, coeff, fun_param, dl_params)

    rng = np.random.default_rng(13)
    for trial in range(2):
        y = _random_state(spec, p, rng, z_no)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                pbr.PackedBedReactorClass.modelEquationM8(
                    0.1, y, sorted_, coeff, fun_param, dl_params
                )
            )
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p, d))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m12_interface_rows_are_static():
    z_no = 4
    mi, spec, p, d = _setup(z_no)
    rhs = hetero_dyn.make_m12_rhs(spec)
    rng = np.random.default_rng(17)
    y = _random_state(spec, p, rng, z_no)
    out = np.asarray(rhs(0.0, jnp.asarray(y), p, d)).reshape(
        spec.n_layer, spec.r_no + 1, z_no
    )
    # surface (last OC) rows carry exactly zero derivative
    np.testing.assert_array_equal(out[:, -1, :], 0.0)
    # interior rows are live
    assert np.abs(out[:, 1:-1, :]).max() > 0


def test_m12_api_end_to_end():
    from rmt_tpu.api import rmt

    # short horizon, small grid: routing/integration/postprocessing smoke
    # (the patched-oracle parity test pins the physics). Starts from the
    # physical feed-everywhere state via the resume-state injection: the
    # reference's 1e-6 seed drives the solid into the singular
    # near-zero-kinetics regime within ~1e-6 s (measured), which no
    # integrator leaves; from a physical state the model integrates in
    # ~50 steps/ms
    mi = _m12_model_input()
    mi["operating-conditions"]["period"] = 4e-3
    mi["solver-config"].update({"zNo": 4, "tNo": 2})
    spec = hetero_dyn.m13_build_spec(mi, z_no=4, r_no=7, t_no=2)
    p = hetero_dyn.m13_params(mi)
    c_in = np.asarray(p["SpCoi0"]) / np.max(np.asarray(p["SpCoi0"]))
    y0 = np.concatenate(
        [np.tile(c_in[:, None, None], (1, 8, 4)), np.zeros((1, 8, 4))],
        axis=0,
    ).reshape(-1)
    mi["resume-state"] = {"model": "M12", "t": 0.0, "state": y0}
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
    # the reported solid interface is the recomputed algebraic value, not
    # the dead storage row: it must track the gas bulk (dimensionless)
    cs_surf = last["dataYCons"][:, -1, :]
    assert np.all(np.isfinite(cs_surf))
    gap = np.abs(cs_surf - last["dataYCon"])
    assert gap.max() < 0.5
    t_sol = last["dataYTemps"]
    assert np.all(np.isfinite(t_sol))
    assert t_sol.max() >= last["dataYTemp"].max() - 1e-2
