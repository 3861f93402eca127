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
