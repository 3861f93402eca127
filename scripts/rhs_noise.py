# Attribution of f32 RHS evaluation noise for the N2 model: evaluate the
# same RHS at the same (f32-representable) states in f32 and f64 and
# report relative deviation per output row group (Ci vs T), plus the
# deviation of intermediate quantities (pressure march, kinetics, cp).
# The whole-run f32 accuracy floor (~2e-6) is suspected to be RHS
# evaluation noise; this pins down which term owns it.
# Usage: python scripts/rhs_noise.py
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
os.environ["RMT_TPU_X64"] = "1"

import jax

if os.environ.get("AB_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dme_case import make_model_input
from rmt_tpu.models import homo
from rmt_tpu.solvers import radau

mi = make_model_input(model="N2")
spec = homo.build_spec(mi)
p = homo.build_params(mi)
d = homo.feed_state(spec, p)
rhs = homo.make_n2_rhs(spec)
y0 = homo.n2_initial_state(spec, p, d)

# sample states along a tightly-integrated f64 trajectory (the states
# only need to be representative, not converged)
ts = jnp.linspace(0.0, p["opT"], 33)
ys, _ = radau.odeint(lambda t, y: rhs(t, y, p, d), y0, ts,
                     rtol=1e-7, atol=1e-10)
ys = np.asarray(ys)


def cast_tree(tree, dt):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x, dtype=dt))
        if hasattr(x, "dtype") and jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating) else x, tree)


p32, d32 = cast_tree(p, np.float32), cast_tree(d, np.float32)
rhs32 = jax.jit(lambda t, y: rhs(t, y, p32, d32))
rhs64 = jax.jit(lambda t, y: rhs(t, y, p, d))

n_comp, z_no = spec.n_comp, spec.z_no
rows = []
for k in range(1, 33):
    y64 = ys[k]
    y32 = y64.astype(np.float32)          # f32-representable common state
    yc = y32.astype(np.float64)
    f64 = np.asarray(rhs64(jnp.asarray(ts[k]), jnp.asarray(yc)))
    f32 = np.asarray(rhs32(jnp.asarray(ts[k], np.float32),
                           jnp.asarray(y32))).astype(np.float64)
    # relative to the row-group scale (same floor as accuracy_n2)
    rel = np.abs(f32 - f64) / np.maximum(np.abs(f64), 1e-7 * np.abs(f64).max())
    R = rel.reshape(spec.var_no_n2, z_no)
    rows.append((R[:n_comp].max(), R[n_comp:].max() if not spec.iso_thermal
                 else 0.0))
rows = np.asarray(rows)
print(f"RHS f32 deviation: Ci rows max {rows[:,0].max():.3e} "
      f"median {np.median(rows[:,0]):.3e}; T row max {rows[:,1].max():.3e}")

# intermediate attribution: pressure march noise in isolation
Y = ys[16].reshape(spec.var_no_n2, z_no)


def p_march(y, pp, dd, dt):
    Y = jnp.asarray(y.astype(dt)).reshape(spec.var_no_n2, z_no)
    from rmt_tpu.constants import EPS_CONST
    from rmt_tpu.props import thermo
    from rmt_tpu.constants import R_CONST

    c = jnp.maximum(Y[:n_comp], EPS_CONST)
    T_re = Y[n_comp] * pp["T0"] + pp["T0"]
    co = c * dd["Cmax"]
    mo = co / jnp.sum(co, axis=0, keepdims=True)
    mw = thermo.mixture_molecular_weight(mo.T, dd["mw"], "kg/mol")
    su = dd["SuGaVe0"]
    eps_ = pp["BeVoFr"]
    erg_a = 150 * dd["GaMiVi"] * su / pp["PaDi"] ** 2
    erg_b = (1 - eps_) ** 2 / eps_**3
    erg_c = 1.75 * su**2 / pp["PaDi"]
    erg_d = (1 - eps_) / eps_**3
    rg_t = (R_CONST / mw) * T_re
    dz = 1.0 / (z_no - 1)
    a_co = 1.0 - (erg_c * erg_d / rg_t) * dz
    b_co = -(erg_a * erg_b) * dz
    A_cum = jnp.concatenate([jnp.ones((1,), a_co.dtype),
                             jnp.cumprod(a_co[:-1])])
    D = b_co / (A_cum * a_co)
    S = jnp.concatenate([jnp.zeros((1,), a_co.dtype), jnp.cumsum(D[:-1])])
    return A_cum * (jnp.asarray(pp["P0"], dt) + S)


y16_32 = ys[16].astype(np.float32)
Pz64 = np.asarray(p_march(y16_32.astype(np.float64), p, d, jnp.float64))
Pz32 = np.asarray(p_march(y16_32, p32, d32, jnp.float32)).astype(np.float64)
print(f"P march f32 rel dev: max {np.max(np.abs(Pz32-Pz64)/Pz64):.3e}")

# kinetics in isolation (with whatever accurate-math shim is active)
from rmt_tpu.props import thermo as th

T_re64 = (ys[16].reshape(spec.var_no_n2, z_no)[n_comp] * p["T0"] + p["T0"])
cp64 = np.asarray(th.cp_mean(jnp.asarray(T_re64), spec.comp_idx))
cp32 = np.asarray(th.cp_mean(jnp.asarray(T_re64, np.float32),
                             spec.comp_idx)).astype(np.float64)
print(f"cp_mean f32 rel dev: max {np.max(np.abs(cp32-cp64)/np.abs(cp64)):.3e}")
