# Two-zone refined mesh: generator parity vs the reference
# FiDiMeshGenerator, refined-mesh T3 residual parity vs the reference's
# solverMeshSet=False stencil branches, and an end-to-end refined-mesh
# solve through rmtExe (solver-config mesh != "normal" is now honored).

import jax.numpy as jnp
import numpy as np
import pytest

from rmt_tpu.models import homo
from rmt_tpu.ops import stencils
from test_t3 import _t3_model_input, _reference_t3_args


@pytest.mark.reference
def test_two_zone_mesh_matches_reference_generator():
    from PyREMOT.solvers.solFiDi import FiDiMeshGenerator

    ref = FiDiMeshGenerator([15, 10], 1, 30, 1.001)
    ours = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    np.testing.assert_allclose(ours["xs"], np.asarray(ref["data1"]), rtol=1e-14)
    np.testing.assert_allclose(ours["dzs"], np.asarray(ref["data2"]), rtol=1e-14)
    assert ours["n_nodes"] == ref["data3"]
    np.testing.assert_allclose(ours["dz_uniform"], ref["data5"], rtol=1e-14)


@pytest.mark.reference
def test_t3_refined_mesh_residual_matches_reference():
    from PyREMOT.examples.homoModels import HomoModelClass

    mi = _t3_model_input()
    mi["solver-config"]["mesh"] = "refined"
    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    z_no = int(mesh["n_nodes"])
    spec = homo.build_spec(mi, z_no=z_no)
    p = homo.t3_params(mi)
    d = homo.t3_feed(spec, p)
    res_fn = homo.make_t3_residual(spec, mesh=mesh)

    sorted_, coeff, fun_param, dl_params = _reference_t3_args(mi, z_no)
    fun_param["meshSetting"].update({
        "solverMesh": "refined",
        "solverMeshSet": False,
        "zNo": z_no,
        "varNoColumns": z_no,
        "varNoLayer": z_no,
        "varNoLayerT": (spec.n_comp + 1) * z_no,
        "dz": mesh["dz_uniform"],
        "dzs": list(mesh["dzs"]),
        "zR": list(mesh["rs"]),
        "zNoNo": [15, 10],
    })
    fun_param["const"]["varNoT"] = (spec.n_comp + 1) * z_no

    y0 = np.asarray(homo.t3_initial_guess(spec))
    rng = np.random.default_rng(19)
    for _ in range(2):
        y = y0 * rng.uniform(0.8, 1.2, y0.shape)
        ref = np.asarray(
            HomoModelClass.modelEquationT1(
                y, sorted_, coeff, fun_param, dl_params, "non-iso-thermal"
            )
        )
        ours = np.asarray(res_fn(jnp.asarray(y), p, d))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_t3_refined_mesh_end_to_end():
    from rmt_tpu.api import rmt

    mi = _t3_model_input()
    mi["solver-config"]["mesh"] = "refined"
    res = rmt.rmtExe(mi)
    data_y = np.asarray(res["resModel"]["dataYs"])
    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    assert data_y.shape[1] == mesh["n_nodes"]
    mo_fri, T_re = data_y[:-1], data_y[-1]
    assert np.all(np.isfinite(data_y))
    np.testing.assert_allclose(mo_fri.sum(axis=0), 1.0, atol=1e-8)
    assert T_re.max() > 523.0 + 20 and T_re.max() < 900.0

    # refinement consistency: the refined-mesh outlet agrees with the
    # uniform-mesh solve of the same problem
    mi_u = _t3_model_input()
    res_u = rmt.rmtExe(mi_u)
    out_u = np.asarray(res_u["resModel"]["dataYs"])[:, -1]
    out_r = data_y[:, -1]
    np.testing.assert_allclose(out_r[:-1], out_u[:-1], atol=0.02)  # mole fractions
    assert abs(out_r[-1] - out_u[-1]) < 15.0                       # outlet T [K]


@pytest.mark.reference
def test_m14_refined_mesh_residual_matches_reference():
    from PyREMOT.docs.pbReactor import PackedBedReactorClass
    from test_m14 import _m14_model_input, _reference_m14_args
    from rmt_tpu.models import hetero
    import io
    from contextlib import redirect_stdout

    mi = _m14_model_input()
    mi["solver-config"]["mesh"] = "refined"
    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    z_no = int(mesh["n_nodes"])
    spec = hetero.m14_build_spec(mi, z_no=z_no)
    p = hetero.m14_params(mi)
    d = hetero.m14_feed(spec, p)
    res_fn = hetero.make_m14_residual(spec, mesh=mesh)

    sorted_, coeff, fun_param, dl_params = _reference_m14_args(mi, z_no)
    fun_param["meshSetting"].update({
        "solverMesh": "refined",
        "solverMeshSet": False,
        "varNoLayer": z_no * 2,
        "varNoLayerT": (spec.n_comp + 1) * z_no * 2,
        "varNoColumns": z_no,
        "zNo": z_no,
        "dz": mesh["dz_uniform"],
        "dzs": list(mesh["dzs"]),
        "zR": list(mesh["rs"]),
        "zNoNo": [15, 10],
    })
    fun_param["const"]["varNoT"] = (spec.n_comp + 1) * z_no
    params_set = (sorted_, coeff, fun_param, dl_params, "non-iso-thermal")

    c_in = np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"])))
    base = np.concatenate(
        [np.tile(c_in[:, None, None], (1, 2, z_no)),
         np.full((1, 2, z_no), 0.05)], axis=0
    ).reshape(-1)
    rng = np.random.default_rng(29)
    for _ in range(2):
        y = base * rng.uniform(0.85, 1.15, base.shape)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                PackedBedReactorClass.modelEquationM9(y, params_set, 1.0)
            )
        ours = np.asarray(res_fn(jnp.asarray(y), p, d, 1.0))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m14_refined_mesh_end_to_end():
    from rmt_tpu.api import rmt
    from test_m14 import _m14_model_input

    mi = _m14_model_input()
    mi["solver-config"]["mesh"] = "refined"
    res = rmt.rmtExe(mi)
    ys = np.asarray(res["resModel"]["dataYs"])
    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    assert ys.shape[1] == mesh["n_nodes"]
    assert np.all(np.isfinite(ys))
    # catalyst hotter than gas, physical range (as the uniform-mesh test)
    Ts = ys[-1]
    assert 523.0 < Ts.max() < 900.0


def test_m13_refined_mesh_end_to_end():
    # the refined two-zone mesh's sharp inlet front undershoots and the
    # reference-style hard EPS clamps break both the gas stage Newton and
    # the particle solve; the driver's smooth-clamp salvage (gas clamp_width
    # + smooth bulk clamp) makes the operator-splitting loop integrable
    from rmt_tpu.api import rmt
    from test_m13 import _m13_model_input

    mi = _m13_model_input()
    mi["solver-config"].update({"mesh": "refined", "rNo": 7, "tNo": 5})
    res = rmt.rmtExe(mi)
    packs = res["resModel"]["dataPack"]
    assert len(packs) == 5
    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    for pack in packs:
        assert pack["successStatus"]
        ys = np.asarray(pack["dataYs"])
        assert ys.shape[1] == mesh["n_nodes"]
        assert np.all(np.isfinite(ys))
        np.testing.assert_allclose(ys[:-1].sum(axis=0), 1.0, atol=1e-8)
    # exothermic DME synthesis: gas warms along the run, stays physical
    T_dl = np.asarray(packs[-1]["dataYs"])[-1]
    assert 0.0 < T_dl.max() < 0.5


@pytest.mark.reference
def test_m13_refined_mesh_gas_rhs_matches_reference():
    from PyREMOT.docs.pbHeterReactor import PackedBedHeteroReactorClass
    from test_m13 import _m13_model_input, _reference_m13_args
    from rmt_tpu.models import hetero_dyn
    import io
    from contextlib import redirect_stdout

    mi = _m13_model_input()
    mi["solver-config"]["mesh"] = "refined"
    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    z_no = int(mesh["n_nodes"])
    spec = hetero_dyn.m13_build_spec(mi, z_no=z_no)
    p = hetero_dyn.m13_params(mi)
    d = hetero_dyn.m13_feed(spec, p)
    rhs = hetero_dyn.make_m13_gas_rhs(spec, mesh=mesh)

    sorted_, coeff, fun_param, dl_params = _reference_m13_args(mi, z_no, spec.r_no)
    fun_param["meshSetting"].update({
        "solverMesh": "refined",
        "solverMeshSet": False,
        "varNoLayer": z_no * (spec.r_no + 1),
        "varNoLayerT": (spec.n_comp + 1) * z_no * (spec.r_no + 1),
        "varNoColumns": z_no,
        "zNo": z_no,
        "dz": mesh["dz_uniform"],
        "dzs": list(mesh["dzs"]),
        "zR": list(mesh["rs"]),
        "zNoNo": [15, 10],
    })
    fun_param["const"]["varNoT"] = (spec.n_comp + 1) * z_no

    c_in = np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"])))
    rng = np.random.default_rng(31)
    for _ in range(2):
        c = c_in[:, None] * rng.uniform(0.3, 1.1, (spec.n_comp, z_no))
        theta = rng.uniform(-0.02, 0.08, (1, z_no))
        y = np.concatenate([c, theta], axis=0).reshape(-1)
        cs_surf = c * rng.uniform(0.7, 1.0, c.shape)
        ts_surf = theta[0] + rng.uniform(0.0, 0.05, z_no)
        interface = {"SpCosi_zi": cs_surf, "Ts_zi": ts_surf}
        params_set = (sorted_, coeff, fun_param, dl_params, interface)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                PackedBedHeteroReactorClass.modelEquationM2(0.1, y, params_set)
            )
        ours = np.asarray(
            rhs(0.1, jnp.asarray(y), p, d, jnp.asarray(cs_surf),
                jnp.asarray(ts_surf))
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


@pytest.mark.reference
def test_m11_refined_mesh_rhs_matches_reference():
    """Full coupled M11 RHS on the refined two-zone mesh vs the
    reference's modelEquationM7 non-uniform stencil branches
    (pbReactor.py:5148-5364), raw-source quirk pinned."""
    from PyREMOT.docs.pbReactor import PackedBedReactorClass
    from test_m13 import _m13_model_input, _reference_m13_args
    from rmt_tpu.models import hetero_dyn
    import io
    from contextlib import redirect_stdout

    mi = _m13_model_input()
    mi["model"] = "M11"
    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    z_no = int(mesh["n_nodes"])
    r_no = 7
    spec = hetero_dyn.m13_build_spec(mi, z_no=z_no, r_no=r_no)
    p = hetero_dyn.m13_params(mi)
    d = hetero_dyn.m13_feed(spec, p)
    rhs = hetero_dyn.make_m11_rhs(spec, scaled_sources=False, mesh=mesh)

    sorted_, coeff, fun_param, dl_params = _reference_m13_args(mi, z_no, r_no)
    fun_param["meshSetting"].update({
        "solverMesh": "refined",
        "solverMeshSet": False,
        "varNoLayer": z_no * (r_no + 1),
        "varNoLayerT": (spec.n_comp + 1) * z_no * (r_no + 1),
        "varNoColumns": z_no,
        "zNo": z_no,
        "dz": mesh["dz_uniform"],
        "dzs": list(mesh["dzs"]),
        "zR": list(mesh["rs"]),
        "zNoNo": [15, 10],
    })
    fun_param["const"]["varNoT"] = (spec.n_comp + 1) * z_no
    params_set = (sorted_, coeff, fun_param, dl_params)

    c_in = np.asarray(p["SpCoi0"]) / float(np.max(np.asarray(p["SpCoi0"])))
    rng = np.random.default_rng(17)
    for _ in range(2):
        c_gas = c_in[:, None, None] * rng.uniform(
            0.3, 1.1, (spec.n_comp, 1, z_no)
        )
        c_sol = c_in[:, None, None] * rng.uniform(
            0.2, 1.0, (spec.n_comp, r_no, z_no)
        )
        t_all = rng.uniform(-0.02, 0.08, (1, r_no + 1, z_no))
        y = np.concatenate(
            [np.concatenate([c_gas, c_sol], axis=1), t_all], axis=0
        ).reshape(-1)
        with redirect_stdout(io.StringIO()):
            ref = np.asarray(
                PackedBedReactorClass.modelEquationM7(0.1, y, params_set)
            )
        ours = np.asarray(rhs(0.1, jnp.asarray(y), p, d))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_m11_refined_mesh_end_to_end():
    from rmt_tpu.api import rmt
    from test_m13 import _m13_model_input

    mi = _m13_model_input()
    mi["model"] = "M11"
    mi["operating-conditions"]["period"] = 5.0
    mi["solver-config"].update({"mesh": "refined", "rNo": 4, "tNo": 5})
    res = rmt.rmtExe(mi)
    packs = res["resModel"]["dataPack"]
    assert len(packs) == 5
    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    for pack in packs:
        assert pack["successStatus"]
        ys = np.asarray(pack["dataYs"])
        assert ys.shape[-1] == mesh["n_nodes"]
        assert np.all(np.isfinite(ys))
    last = packs[-1]
    n_comp = len(mi["feed"]["components"]["shell"])
    np.testing.assert_allclose(
        np.sum(np.asarray(last["dataYs"])[:n_comp], axis=0), 1.0, rtol=1e-6
    )


def test_m12_refined_mesh_end_to_end():
    from rmt_tpu.api import rmt
    from test_m12 import _m12_model_input
    from rmt_tpu.models import hetero_dyn

    mesh = stencils.two_zone_mesh((15, 10), 1.0, 30, 1.001)
    z_no = int(mesh["n_nodes"])
    mi = _m12_model_input()
    mi["operating-conditions"]["period"] = 4e-3
    mi["solver-config"].update({"mesh": "refined", "tNo": 2})
    spec = hetero_dyn.m13_build_spec(mi, z_no=z_no, r_no=7, t_no=2)
    p = hetero_dyn.m13_params(mi)
    c_in = np.asarray(p["SpCoi0"]) / np.max(np.asarray(p["SpCoi0"]))
    y0 = np.concatenate(
        [np.tile(c_in[:, None, None], (1, 8, z_no)), np.zeros((1, 8, z_no))],
        axis=0,
    ).reshape(-1)
    mi["resume-state"] = {"model": "M12", "t": 0.0, "state": y0}
    res = rmt.rmtExe(mi)
    packs = res["resModel"]["dataPack"]
    assert len(packs) == 2
    for pack in packs:
        assert pack["successStatus"]
        ys = np.asarray(pack["dataYs"])
        assert ys.shape[-1] == z_no
        assert np.all(np.isfinite(ys))


def test_refined_mesh_rejected_on_unsupported_model():
    from rmt_tpu.api import rmt
    from dme_case import make_model_input

    mi = make_model_input(model="N2")
    mi["solver-config"]["mesh"] = "refined"
    with pytest.raises(ValueError, match="mesh"):
        rmt.rmtExe(mi)
