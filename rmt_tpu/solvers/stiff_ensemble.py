# Batched lockstep stiff integrator for TPU ensembles:
# Radau IIA(5) with eigen-transformed stages and Newton-Schulz
# matmul-preconditioners -- no LU anywhere in the hot loop.
#
# Motivation (measured on TPU v5e via axon): a batched 420x420 LU costs
# ~170 ms per call because triangular factorizations lower to
# sequential scalar loops, while batched (B,140,140) f32 matmuls run at
# MXU speed. This solver therefore:
#   * diagonalizes the 3-stage Radau coefficient matrix A = T diag(g, m, m*)
#     T^-1 once at build time, decoupling the stacked Newton system
#     (I - h A(x)J) dK = -R into one real and one complex n x n system per
#     member (the conjugate system is free);
#   * maintains approximate inverses P_r ~ (I - h g J)^-1 and
#     P_c ~ (I - h m J)^-1 by Newton-Schulz iteration (P <- 2P - P M P),
#     which is pure batched matmul and converges quadratically because h
#     changes by a bounded factor per step (max growth < 2);
#   * runs one *global* adaptive loop over the whole ensemble with
#     per-member step sizes and masked accept/reject, so expensive global
#     decisions (Jacobian refresh) happen under a scalar lax.cond and are
#     skipped when not needed;
#   * keeps states and Newton residuals in the working dtype (float64 for
#     <=1e-6 reproducibility) while all preconditioner algebra is float32
#     MXU work, with one f64 refinement pass per solve using the exact
#     Kronecker matvec M v = v - h (A @ V) J^T (never materializing the
#     s*n x s*n matrix);
#   * uses complex arithmetic spelled out as (real, imag) f32 pairs since
#     complex128 does not exist on TPU and complex64 promotion under x64 is
#     fragile.
#
# Replaces scipy LSODA/BDF/Radau for the reference's ensemble workloads
# (reference runs one reactor per scipy call, PyREMOT/docs/pbHomoReactor.py
# :3609; here 4096 reactors integrate in one XLA program).

from __future__ import annotations

import os
import sys
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .radau import extrap_weights, radau_tableau

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 1.4          # small growth keeps Newton-Schulz warm starts sharp
_ORDER_EXP = -0.25         # embedded estimate is order 3 -> exponent 1/4
_NEWTON_TOL = 0.03
_STATE_NOISE_MULT = 2.0   # amplification of eps*|y| through J and the
                           # preconditioned solve (~1/gamma plus slack)


def _transformed_tableau():
    """Radau5 tableau + eigen-decomposition A = T diag(gamma, mu, mu*) T^-1
    with T arranged so that row/col 0 is the real eigenpair and col 2 is the
    conjugate of col 1 (all derived numerically)."""
    c, A, b, bhat = radau_tableau(3)
    w, V = np.linalg.eig(A)
    i_real = int(np.argmin(np.abs(w.imag)))
    i_cplx = [i for i in range(3) if i != i_real]
    # order the complex pair so the first has positive imaginary part
    if w[i_cplx[0]].imag < 0:
        i_cplx = [i_cplx[1], i_cplx[0]]
    order = [i_real, i_cplx[0], i_cplx[1]]
    w = w[order]
    V = V[:, order]
    # make the real eigenvector exactly real and the third column the
    # conjugate of the second
    V[:, 0] = V[:, 0].real / np.linalg.norm(V[:, 0].real)
    V[:, 2] = V[:, 1].conj()
    Vinv = np.linalg.inv(V)
    assert np.allclose(V @ np.diag(w) @ Vinv, A, atol=1e-12)
    return c, A, b, bhat, w, V, Vinv


class EnsembleStats(NamedTuple):
    n_fev: jnp.ndarray        # (B,) RHS evals (counting vectorized stage evals)
    n_jev: jnp.ndarray        # scalar: global Jacobian refreshes
    n_accepted: jnp.ndarray   # (B,)
    n_rejected: jnp.ndarray   # (B,)
    seg: jnp.ndarray          # (B,) final output-segment pointer; a member is
                              # fully integrated iff seg == len(ts) - 1
    n_rej_conv: jnp.ndarray   # (B,) rejections where the Newton increment
                              # did not converge within the sweep budget
    n_rej_err: jnp.ndarray    # (B,) rejections with converged Newton but
                              # embedded error estimate > 1
    n_rej_rho: jnp.ndarray    # (B,) rejections where Newton's increment
                              # converged but the NS certificate failed
                              # (rho >= 0.5 or non-finite residual)


_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    """Full-f32 matmul: TPU lowers default-precision f32 matmuls to bf16
    passes, whose 4e-3 relative error times cond(M) exceeds 1 for stiff
    steps and makes Newton-Schulz diverge."""
    return jnp.matmul(a, b, precision=_HI)


def _cmatmul(ar, ai, br, bi):
    """(ar+i*ai) @ (br+i*bi) as real pairs."""
    return _mm(ar, br) - _mm(ai, bi), _mm(ar, bi) + _mm(ai, br)


@partial(
    jax.jit,
    static_argnums=(0, 5, 6, 7, 8, 9, 10, 11, 12, 14, 15, 16, 17, 18, 19,
                    20, 21, 22, 23, 24, 25, 26),
)
def odeint_ensemble(
    f,
    y0,                     # (B, n)
    ts,                     # (n_out,) shared output grid
    rtol=1e-7,
    atol=1e-10,
    max_steps: int = 1024,
    newton_iters: int = 6,
    j_every: int = 16,
    ns_refresh: int = 5,
    ns_step: int = 1,
    jac=None,
    batched: bool = False,
    rhs_noise: float | None = None,
    args=None,
    use_pallas: bool | None = None,
    predict_stages: bool = True,
    newton_h_barrier: bool = False,
    block=None,
    max_factor: float | None = None,
    theta_target: float | None = None,
    jac_blocks=None,
    f_cheap=None,
    cheap_sweeps: int = 0,
    f_stages=None,
    f_cheap_stages=None,
    out_members=None,
    dense_output: bool = False,
):
    """Integrate a stiff ensemble dy/dt = f(t, y, *args) for every member.

    f is a single-member RHS (t scalar, y (n,)) vmapped internally, unless
    batched=True, in which case f (and jac, if given) already operate on
    the whole batch: f(t (B,), y (B,n)) -> (B,n), jac -> (B,n,n). The
    batched form is how per-member parameters enter (close them over in f).

    rhs_noise is the relative evaluation noise of f on this hardware; it
    sets the floor of the Newton convergence test. TPU-emulated float64
    transcendentals are only ~f32 accurate (measured 4e-8 relative), so
    Newton increments plateau at noise*|K|/scale instead of reaching the
    nominal tolerance. Defaults per backend.

    block=(var_no, z_no): the Jacobian is block lower bidiagonal in the
    node index (flat state index v*z_no + z, the MoL layout of
    ops.jacobian.banded_coloring). The stage systems are then solved
    EXACTLY by batched small-block elimination + an associative scan
    (ops.block_solve) instead of maintaining Newton-Schulz approximate
    inverses -- ~m^2*z vs n^2 work per solve (m = var_no, n = m*z), no
    residual certificates, and no preconditioner state. ns_refresh /
    ns_step / use_pallas are ignored in this mode.
    block=(var_no, z_no, "tridiag"): same, for block-TRIdiagonal MoL
    Jacobians (central-difference axial dispersion couples z-1, z, z+1;
    the M13 gas phase). Solved exactly by block cyclic reduction
    (log2(z_no) levels of batched small matmuls, ops.block_solve).

    jac_blocks (bidiagonal block mode only): batched callable
    (t (B,), y (B,n)) -> (Jd, Jl), each (B, z_no, var_no, var_no) --
    e.g. ops.jacobian.colored_bidiag_blocks vmapped. When given, the
    dense (B, n, n) Jacobian is NEVER formed: refreshes gather the
    blocks straight from the colored JVP products (the dense build +
    re-extraction dominated the refresh cost on the TPU runtime) and
    the carry holds a placeholder in the J slot.

    f_cheap + cheap_sweeps: hybrid-precision simplified Newton. The
    first cheap_sweeps sweeps evaluate stage residuals with f_cheap (a
    cheaper, less accurate RHS -- e.g. the plain-f32 kinetics chain
    when f is the compensated-df32 one, measured ~10x the eval cost);
    the remaining newton_iters - cheap_sweeps sweeps use f. At the
    switch the per-member `done` flags RESET, so every member performs
    at least one accurate sweep and the convergence test is measured
    on accurate increments: the converged K then satisfies the
    ACCURATE stage equations to theta^k * |f - f_cheap| (k accurate
    sweeps from an f_cheap-converged point), not the cheap ones.
    Returns (ys, stats) with ys of shape (n_out, B, n); ys[0] == y0.

    out_members: optional host-side int index array (P,) into the batch.
    When given, only those members' trajectories are recorded -- the
    output buffer carried through the attempt scan shrinks from
    (n_out-1, B, n) to (n_out-1, P, n) -- and the return becomes
    (ys_sel, y_final, stats) with ys_sel (n_out, P, n) the selected
    members' boundary states and y_final (B, n) EVERY member's final
    integrated state. Motivation (measured round 5): the full (n_out-1,
    B, n) buffer is rewritten by masked scatter every attempt, and at
    the bench's B=131072 it is the largest single HBM buffer (~367 MB,
    double-buffered by the scan) while the reference's dataPack
    semantics only need interval-end states for non-probe members
    (PyREMOT/docs/pbHomoReactor.py:3628-3685 keeps dataPack slices per
    interval; full trajectories matter only to the accuracy probes).

    dense_output=True: output-boundary states come from the Radau
    collocation interpolant y(t+theta*h) = y + h*sum_i L_i(theta)*K_i
    (the cubic through the stage derivatives; L_i(1) = b_i, so the
    boundary landed on exactly reproduces the accepted state) instead
    of clamping every step to land on each of the n_out-1 boundaries.
    This is what scipy's solve_ivp does (dense output + t_eval), so it
    also mirrors the reference semantics. Steps then stop only at
    ts[-1]; a single step may cross several boundaries. Worth it when
    n_out is large relative to the natural step count: the N1 steady
    profile asks for 101 output points and the forced stops cost
    ~1750 attempts/trajectory vs ~300 natural steps. Interpolated
    states carry the collocation error (~the local error estimate, so
    ~rtol at the boundaries) rather than the accepted-endpoint error;
    keep it OFF where boundary states must be endpoint-accurate (the
    bench's f32x accuracy probes).
    """
    if args is not None:
        f_ = lambda t, y: f(t, y, *args)
    else:
        f_ = f

    # DIAGNOSTIC ONLY (scripts/ablate_inplace.py): comma-list of
    # structural elements to stub out, for attributing the on-chip
    # per-attempt cost of the REAL program (isolated component probes
    # measure ~12 ms/attempt where the integrator measures ~150-230 --
    # scripts/ablate_attempt.py vs f32x_fixed_budget_ab.py). Results are
    # WRONG under ablation; never set outside cost attribution.
    _ablate = frozenset(
        filter(None, os.environ.get("RMT_TPU_ABLATE", "").split(","))
    )
    if _ablate:
        # an ablated run is numerically WRONG; a leaked env var must
        # never be mistaken for a real result (advisor finding r4)
        print(
            f"[rmt_tpu] WARNING: RMT_TPU_ABLATE={sorted(_ablate)} -- "
            "structural elements are STUBBED OUT and results are wrong; "
            "unset RMT_TPU_ABLATE unless attributing attempt cost",
            file=sys.stderr, flush=True,
        )

    # Inner-Newton sweep unrolling (numerically identical; trace-time
    # flag like _ablate). Round-5 attribution: the in-situ per-sweep cost
    # is ~5x the standalone stage-eval kernels -- the suspect is
    # inter-sweep carry materialization in the inner scan; unroll lets
    # XLA fuse across sweeps. A/B on-chip before changing the default.
    _newton_unroll = os.environ.get(
        "RMT_TPU_NEWTON_UNROLL", "") not in ("", "0")

    y0 = jnp.asarray(y0)
    Bsz, n = y0.shape
    dtype = y0.dtype
    if out_members is not None:
        # static (hashable tuple): the recorded-member set is part of the
        # compiled program's shape, not runtime data
        out_idx = jnp.asarray(np.asarray(out_members, np.int32))
        n_rec = int(out_idx.shape[0])
    else:
        out_idx, n_rec = None, Bsz
    f32 = jnp.float32
    if rhs_noise is None:
        if dtype == jnp.float32:
            rhs_noise = 2e-6        # f32 evaluation noise incl. accumulation
        elif jax.default_backend() == "tpu":
            rhs_noise = 4e-8        # TPU-emulated f64 transcendentals
        else:
            rhs_noise = 1e-14
    # step-growth cap: the NS warm start needs small h drift (1.4x). The
    # exact block solves refactor at every attempt, so in f64 they
    # tolerate the larger growth a fresh transient wants (A/B: mf=3
    # improves accuracy at flat attempts). In f32 the exact solve still
    # carries eps32-level noise and aggressive growth just feeds the
    # Newton-failure limit cycle (A/B: mf=3 costs +22% attempts for no
    # accuracy gain), so f32 keeps 1.4.
    _max_fac = float(max_factor) if max_factor is not None else (
        3.0 if (block is not None and dtype != jnp.float32) else _MAX_FACTOR
    )
    ts = jnp.asarray(ts, dtype)
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)

    c_np, A_np, b_np, bhat_np, w_np, T_np, Tinv_np = _transformed_tableau()
    if dense_output:
        # integrated Lagrange basis at the collocation nodes c:
        # L_i(theta) = int_0^theta prod_{j!=i} (tau-c_j)/(c_i-c_j) dtau,
        # a cubic with zero constant term. Coefficients descending
        # (theta^3, theta^2, theta); check: L(1) == b (so the boundary
        # a step lands on exactly reproduces the accepted y1).
        dw_np = np.zeros((3, 3))
        for i in range(3):
            li = np.poly1d([1.0])
            for j in range(3):
                if j != i:
                    li = li * np.poly1d([1.0, -c_np[j]]) / (
                        c_np[i] - c_np[j])
            dw_np[i, :] = np.polyint(li).coeffs[:3]
        assert np.allclose(dw_np.sum(axis=1), b_np, atol=1e-12)
        DW = jnp.asarray(dw_np, dtype)
    C = jnp.asarray(c_np, dtype)
    A = jnp.asarray(A_np, dtype)
    Bv = jnp.asarray(b_np, dtype)
    BHAT = jnp.asarray(bhat_np, dtype)
    gamma = float(w_np[0].real)
    mu_r, mu_i = float(w_np[1].real), float(w_np[1].imag)
    Tr = jnp.asarray(T_np.real, dtype)
    Ti = jnp.asarray(T_np.imag, dtype)
    Tir = jnp.asarray(Tinv_np.real, dtype)
    Tii = jnp.asarray(Tinv_np.imag, dtype)
    Ainv = jnp.asarray(np.linalg.inv(A_np), dtype)

    def predict_K(Kp, hp, h_new, f0):
        """Stage initial guess by extrapolating the previous accepted
        step's collocation polynomial (RADAU5's 'starting values by
        extrapolation'; scipy Radau does the same via its dense output:
        Z0 = sol(t + h*C) - y). The previous stage values relative to the
        previous step's start are Z_j = hp*(A Kp)_j; the degree-3
        polynomial through (0, 0) and (c_j, Z_j) is evaluated at
        s_i = 1 + c_i*r, r = h_new/hp, and the predicted stage offsets
        from the CURRENT y are Z(s_i) - Z(1) (c_3 = 1 makes Z(1) the
        previous step's increment). Newton then starts from
        K = A^-1 (Y_pred - y)/h_new instead of the constant tile(f0).
        """
        r = jnp.clip(h_new / jnp.maximum(hp, 1e-300), 0.0, 4.0)   # (B,)
        W = extrap_weights(c_np, r).astype(dtype)                 # (B,3,3)
        Z = hp[:, None, None] * jnp.einsum("ij,bjn->bin", A, Kp)  # (B,3,n)
        Zg = jnp.einsum("bij,bjn->bin", W, Z) - Z[:, 2:3, :]      # (B,3,n)
        Kg = jnp.einsum("ij,bjn->bin", Ainv, Zg) / h_new[:, None, None]
        Kg = jnp.where(jnp.isfinite(Kg), Kg, 0.0)
        return Kg

    if args is not None and f_cheap is not None:
        fc_ = lambda t, y: f_cheap(t, y, *args)
    else:
        fc_ = f_cheap

    if batched:
        fB = f_                            # (B,), (B,n) -> (B,n)
        fB_cheap = fc_
        if jac is None:
            # jacfwd of the batched function, one member's tangent at a time
            def jacB(t, y):
                def fy(yy):
                    return fB(t, yy)

                eye = jnp.eye(n, dtype=y.dtype)
                jvp_cols = jax.vmap(
                    lambda col: jax.jvp(fy, (y,), (jnp.tile(col[None], (Bsz, 1)),))[1]
                )(eye)                     # (n, B, n) -> (B, n_out, n_in)
                return jnp.moveaxis(jvp_cols, 0, -1)
        else:
            jacB = jac
    else:
        fB = jax.vmap(f_)                  # (B,), (B,n) -> (B,n)
        fB_cheap = jax.vmap(fc_) if fc_ is not None else None
        jac_single = jax.jacfwd(f_, argnums=1) if jac is None else jac
        jacB = jax.vmap(jac_single)        # -> (B,n,n)

    _cheap_n = (min(int(cheap_sweeps), newton_iters - 1)
                if (f_cheap is not None and cheap_sweeps) else 0)

    def stage_eval(fB_, t, h, Y):
        """Y: (B,3,n) -> F: (B,3,n), mapping the batched RHS over stages.

        f_stages / f_cheap_stages (optional, batched mode): an explicit
        all-stages evaluator `(ts (B,3), Y (B,3,n)) -> (B,3,n)` used
        instead of vmapping the per-stage RHS -- fused Pallas RHS kernels
        provide one (a single kernel over the 3B stage-stacked batch
        instead of a vmapped pallas_call)."""
        ts_st = t[:, None] + C[None, :] * h[:, None]    # (B,3)
        if fB_ is fB and f_stages is not None:
            return f_stages(ts_st, Y)
        if fB_ is fB_cheap and f_cheap_stages is not None:
            return f_cheap_stages(ts_st, Y)
        return jax.vmap(fB_, in_axes=(1, 1), out_axes=1)(ts_st, Y)

    eye_f32 = jnp.eye(n, dtype=f32)[None]

    # Fused Pallas kernel for the Newton-Schulz update (one kernel per
    # member, intermediates in VMEM): measured 31.3 -> 42.1 members/s at
    # B=512 f32 on the chip vs the de-stacked XLA formulation. Default ON
    # for the TPU backend (RMT_TPU_PALLAS=0 forces the XLA path); off-TPU
    # it runs only when explicitly requested, in interpreter mode (slow --
    # tests use it for parity, CPU production stays on XLA).
    if use_pallas is None:
        env = os.environ.get("RMT_TPU_PALLAS", "")
        if env:
            _pallas = env != "0"
        else:
            _pallas = jax.default_backend() == "tpu"
    else:
        _pallas = bool(use_pallas)
    _pallas_interp = jax.default_backend() != "tpu"

    def ns_update(Pr, Pcr, Pci, h, J, k: int):
        """k Newton-Schulz iterations toward (I-h*g*J)^-1 and (I-h*mu*J)^-1,
        plus a residual estimate rho ~ max_b ||I - M P||_F / sqrt(n) of the
        *result* (costs one extra M P product).

        J: (B,n,n) f32; h: (B,) working dtype -> cast to f32.
        """
        h32 = h.astype(f32)[:, None, None]

        if _pallas:
            from ..ops.pallas_ns import ns_fused_step

            def it2p(carry, _):
                Prc, Pcrc, Pcic = carry
                Pr2, Pcr2, Pci2, rho_pre = ns_fused_step(
                    J, Prc, Pcrc, Pcic, h.astype(f32),
                    gamma=gamma, mu_r=mu_r, mu_i=mu_i,
                    interpret=_pallas_interp,
                )
                return (Pr2, Pcr2, Pci2), rho_pre

            (Pr, Pcr, Pci), rho_pres = lax.scan(
                it2p, (Pr, Pcr, Pci), None, length=k
            )
            rho_pre = rho_pres[-1]
            rho = jnp.where(rho_pre < 1.0, rho_pre**2, jnp.inf)
            rho = jnp.where(jnp.isfinite(rho), rho, jnp.inf)
            return Pr, Pcr, Pci, rho

        def mp(Pr, Pcr, Pci):
            # all three J-products as one J @ [Pr|Pcr|Pci] matmul: J is
            # read once and no (B,3,n,n) stack operand is materialized
            P_cat = jnp.concatenate([Pr, Pcr, Pci], axis=-1)   # (B,n,3n)
            JP_cat = jnp.matmul(J, P_cat, precision=_HI)
            JP, JPr, JPi = (
                JP_cat[..., :n], JP_cat[..., n:2 * n], JP_cat[..., 2 * n:]
            )
            MPr_r = Pr - (gamma * h32) * JP
            MPc_r = Pcr - h32 * (mu_r * JPr - mu_i * JPi)
            MPc_i = Pci - h32 * (mu_r * JPi + mu_i * JPr)
            return MPr_r, MPc_r, MPc_i

        def it2(carry, _):
            Pr, Pcr, Pci = carry
            MPr_r, MPc_r, MPc_i = mp(Pr, Pcr, Pci)
            # Frobenius residual of the CURRENT iterate from the products
            # already computed for the update (free except elementwise work)
            res_r = jnp.sqrt(
                jnp.mean((eye_f32 - MPr_r) ** 2, axis=(-1, -2)) * n
            )
            res_c = jnp.sqrt(
                (jnp.mean((eye_f32 - MPc_r) ** 2, axis=(-1, -2))
                 + jnp.mean(MPc_i**2, axis=(-1, -2))) * n
            )
            rho_pre = jnp.maximum(res_r, res_c)
            # the five P@M products without stacking (B,5,n,n) operands:
            # complex P@M as two (n x 2n) matmuls reading Pcr/Pci once each
            Mc = jnp.concatenate([MPc_r, MPc_i], axis=-1)        # (B,n,2n)
            Ar = jnp.matmul(Pcr, Mc, precision=_HI)
            Ai = jnp.matmul(Pci, Mc, precision=_HI)
            PrM = jnp.matmul(Pr, MPr_r, precision=_HI)
            Pr_new = 2 * Pr - PrM
            Pcr_new = 2 * Pcr - (Ar[..., :n] - Ai[..., n:])
            Pci_new = 2 * Pci - (Ai[..., :n] + Ar[..., n:])
            return (Pr_new, Pcr_new, Pci_new), rho_pre

        (Pr, Pcr, Pci), rho_pres = lax.scan(
            it2, (Pr, Pcr, Pci), None, length=k
        )
        # Certify the RETURNED iterate from the last pre-update residual
        # via the exact Newton-Schulz identity I - M P' = (I - M P)^2:
        # ||I - M P'||_F <= ||I - M P||_F^2, so rho_pre^2 is a true upper
        # bound -- the extra M P product an earlier version spent on
        # measuring the final residual directly (3 of 11 n^3 products per
        # attempt) is unnecessary.
        rho_pre = rho_pres[-1]
        rho = jnp.where(rho_pre < 1.0, rho_pre**2, jnp.inf)
        rho = jnp.where(jnp.isfinite(rho), rho, jnp.inf)
        return Pr, Pcr, Pci, rho

    def ns_cold_start(h, J):
        """Guaranteed-convergent Newton-Schulz seeds P0 = M^H/(|M|_1 |M|_inf).

        Used after a Jacobian refresh: the warm start P_old is only valid
        while M drifts a little, and a diverged Newton-Schulz iterate never
        recovers (the residual squares), so refreshes re-seed from scratch.
        """
        h32 = h.astype(f32)[:, None, None]
        eye = jnp.eye(n, dtype=f32)[None]
        Mr = eye - (gamma * h32) * J
        Mcr = eye - h32 * mu_r * J
        Mci = -h32 * mu_i * J

        def seed(Ar, Ai):
            norm1 = jnp.max(jnp.sum(jnp.sqrt(Ar**2 + Ai**2), axis=-2), axis=-1)
            norminf = jnp.max(jnp.sum(jnp.sqrt(Ar**2 + Ai**2), axis=-1), axis=-1)
            scale = (norm1 * norminf)[:, None, None]
            # conjugate transpose over the last two axes
            return jnp.swapaxes(Ar, -1, -2) / scale, -jnp.swapaxes(Ai, -1, -2) / scale

        Pr0, _ = seed(Mr, jnp.zeros_like(Mr))
        Pcr0, Pci0 = seed(Mcr, Mci)
        return Pr0, Pcr0, Pci0

    def m_matvec(K, h, J64):
        """Exact M @ K via the Kronecker structure, in the working dtype.

        K: (B,3,n); J64: (B,n,n) in working dtype; returns (B,3,n).
        """
        G = jnp.einsum("ij,bjn->bin", A, K)
        return K - h[:, None, None] * jnp.einsum("bin,bmn->bim", G, J64)

    def apply_P(R, Pr, Pcr, Pci):
        """Approximate solve M dK = R via the stage eigen-transform.

        R: (B,3,n) real. Returns dK (B,3,n) real.

        Measured NEGATIVE result: a fused Pallas version of this solve
        (one kernel per member, matvecs as (n x 1)/(n x 2) MXU products)
        ran SLOWER on-chip than this XLA formulation (35.4 vs 42.1
        members/s at B=512) -- the narrow products waste the 128-lane MXU
        tiles and the per-instance kernel overhead x 6 Newton sweeps
        exceeds XLA's batched-GEMV path. Unlike the NS update (square
        n x n products, see ops/pallas_ns.py), matvec application stays
        on XLA.
        """
        # W = T^-1 @ R (complex, but row 0 is real and row 2 = conj(row 1))
        Wr = jnp.einsum("ij,bjn->bin", Tir, R)
        Wi = jnp.einsum("ij,bjn->bin", Tii, R)
        R32r = Wr.astype(f32)
        R32i = Wi.astype(f32)
        # The five preconditioner matvecs WITHOUT stacking matrices: an
        # earlier version packed [Pr,Pcr,Pci,Pcr,Pci] into a (B,5,n,n)
        # operand each call, and XLA materializes that stack -- at 6
        # Newton sweeps/attempt it was the integrator's largest HBM
        # traffic term (measured 23.3 -> 25.3 members/s at B=512 from
        # this change alone). Instead read each matrix once: the complex
        # matvec (Pcr + i Pci)(xr + i xi) is two (n x 2)-wide matmuls.
        Z0 = jnp.einsum("bnm,bm->bn", Pr, R32r[:, 0], precision=_HI)
        X = jnp.stack([R32r[:, 1], R32i[:, 1]], axis=-1)      # (B,n,2)
        Yr = jnp.matmul(Pcr, X, precision=_HI)
        Yi = jnp.matmul(Pci, X, precision=_HI)
        Z1r = Yr[..., 0] - Yi[..., 1]
        Z1i = Yi[..., 0] + Yr[..., 1]
        # stage 2 = conj(stage 1)
        Zr = jnp.stack([Z0, Z1r, Z1r], axis=1).astype(dtype)
        Zi = jnp.stack([jnp.zeros_like(Z0), Z1i, -Z1i], axis=1).astype(dtype)
        # dK = Re(T @ Z)
        dK = jnp.einsum("ij,bjn->bin", Tr, Zr) - jnp.einsum("ij,bjn->bin", Ti, Zi)
        return dK

    def solve(Rhs, h, J64, Pr, Pcr, Pci):
        """Preconditioned solve. No linear refinement pass: the outer
        Newton iteration re-evaluates the residual in the working dtype
        every sweep, so approximate solves only affect the contraction
        rate -- and a refinement would cost TPU-emulated f64 matmuls
        (~20x f32) per iteration."""
        return apply_P(Rhs, Pr, Pcr, Pci)

    def norm_b(v, scale):
        return jnp.sqrt(jnp.mean((v / scale) ** 2, axis=-1))

    if block is not None:
        from ..ops import block_solve as _bs

        var_no_b, z_no_b = block[0], block[1]
        # block=(m, z) -> lower bidiagonal (BD convection MoL);
        # block=(m, z, "tridiag") -> tridiagonal (CD axial dispersion)
        block_tridiag = len(block) > 2 and block[2] == "tridiag"
        if var_no_b * z_no_b != n:
            raise ValueError(
                f"block {block} does not tile the state size {n}"
            )
        # fused Pallas path for the bidiagonal stage solves (member on
        # the lane axis, factorization + recurrence in VMEM): the XLA
        # formulation is hundreds of tiny 7x7 ops whose per-op overhead
        # made block attempts ~3x an NS attempt on-chip. Same default
        # as the NS kernel: on for the TPU backend, RMT_TPU_PALLAS=0
        # reverts, interpreter mode only when explicitly requested.
        _pallas_block = _pallas and not block_tridiag
        if _pallas_block:
            from ..ops import pallas_block as _pblock

            _tir_s = tuple(map(tuple, Tinv_np.real))
            _tii_s = tuple(map(tuple, Tinv_np.imag))
            _tr_s = tuple(map(tuple, T_np.real))
            _ti_s = tuple(map(tuple, T_np.imag))

            def pb_apply(R, MinvR, MinvCr, MinvCi, Jl_t, h32b):
                R_t = R.astype(f32).reshape(
                    Bsz, 3, var_no_b, z_no_b
                ).transpose(1, 2, 3, 0)
                dK_t = _pblock.block_apply(
                    R_t, MinvR, MinvCr, MinvCi, Jl_t, h32b,
                    gamma=gamma, mu_r=mu_r, mu_i=mu_i,
                    tir=_tir_s, tii=_tii_s, tr=_tr_s, ti=_ti_s,
                    interpret=_pallas_interp,
                )
                return dK_t.transpose(3, 0, 1, 2).reshape(
                    Bsz, 3, n
                ).astype(dtype)

            def pb_apply_real(e32, MinvR, Jl_t, h32b):
                e_t = e32.reshape(Bsz, var_no_b, z_no_b).transpose(1, 2, 0)
                x_t = _pblock.block_apply_real(
                    e_t, MinvR, Jl_t, h32b, gamma=gamma,
                    interpret=_pallas_interp,
                )
                return x_t.transpose(2, 0, 1).reshape(Bsz, n).astype(dtype)

        def to_blocks(x):       # (B, n) flat v*z -> (B, z, m)
            return x.reshape(Bsz, var_no_b, z_no_b).transpose(0, 2, 1)

        def from_blocks(xb):    # (B, z, m) -> (B, n)
            return xb.transpose(0, 2, 1).reshape(Bsz, n)

        def make_block_solvers(h_eff, Jd, Jl, Ju):
            if block_tridiag:
                return _bs.make_shifted_solvers_tridiag(
                    Jd, Jl, Ju, h_eff, gamma, mu_r, mu_i
                )
            return _bs.make_shifted_solvers(
                Jd, Jl, h_eff, gamma, mu_r, mu_i
            )

        def apply_block(R, solve_real, solve_cplx):
            """Exact stage solve M dK = R via the eigen-transform, the
            block-solver twin of apply_P."""
            Wr = jnp.einsum("ij,bjn->bin", Tir, R)
            Wi = jnp.einsum("ij,bjn->bin", Tii, R)
            z0 = from_blocks(solve_real(to_blocks(Wr[:, 0].astype(f32))))
            z1r, z1i = solve_cplx(
                to_blocks(Wr[:, 1].astype(f32)),
                to_blocks(Wi[:, 1].astype(f32)),
            )
            Z1r, Z1i = from_blocks(z1r), from_blocks(z1i)
            Zr = jnp.stack([z0, Z1r, Z1r], axis=1).astype(dtype)
            Zi = jnp.stack(
                [jnp.zeros_like(z0), Z1i, -Z1i], axis=1
            ).astype(dtype)
            return (jnp.einsum("ij,bjn->bin", Tr, Zr)
                    - jnp.einsum("ij,bjn->bin", Ti, Zi))

    # Control-flow note (measured on the axon-tunneled TPU): while_loop
    # iterations cost ~1s each (apparent per-iteration host sync of the
    # carry), while the identical body under lax.scan costs ~10ms. The
    # integrator is therefore a FIXED budget of scan chunks with no
    # while_loop anywhere: members carry their own output-segment pointer,
    # write boundary states into the output buffer by masked scatter, and
    # idle (masked) once finished. max_steps is the total attempt budget.
    n_out = ts.shape[0]
    chunk = j_every  # attempts between global Jacobian refreshes

    def attempt(state, _):
        t, y, yc, fval, h, J, Pr, Pcr, Pci, seg, out, st, Kp, hp, pv, hbar = state
        seg_c = jnp.minimum(seg + 1, n_out - 1)
        # dense mode: steps stop only at the final time (boundary states
        # come from the collocation interpolant); clamped mode: at the
        # next unwritten output boundary
        t_end = (jnp.broadcast_to(ts[-1], seg_c.shape) if dense_output
                 else ts[seg_c])                        # (B,)
        active = seg < (n_out - 1)
        h_eff = jnp.where(active, jnp.minimum(h, t_end - t), h)
        h_eff = jnp.maximum(h_eff, 1e-300)
        J64 = J.astype(dtype)

        if block is not None:
            # exact block solvers rebuilt from (Jd, Jl[, Ju]) at the
            # CURRENT h: factorization is batched (m x m) inversions --
            # cheap enough to do every attempt, so no warm-start state
            # exists. (Pr, Pcr) carry (Jd, Jl); Pci carries Ju in tridiag
            # mode and is an unused placeholder otherwise. On the pallas
            # path the carried blocks are member-last (z, m, m, B).
            if _pallas_block:
                h32b = h_eff.astype(f32)
                MinvR, MinvCr, MinvCi = _pblock.block_factor(
                    Pr, h32b, gamma=gamma, mu_r=mu_r, mu_i=mu_i,
                    interpret=_pallas_interp,
                )
                solve_stages = lambda R: pb_apply(
                    R, MinvR, MinvCr, MinvCi, Pcr, h32b
                )
                solve_err = lambda e32: pb_apply_real(e32, MinvR, Pcr, h32b)
            else:
                solve_real, solve_cplx = make_block_solvers(
                    h_eff, Pr, Pcr, Pci
                )
                solve_stages = lambda R: apply_block(
                    R, solve_real, solve_cplx
                )
                solve_err = lambda e32: from_blocks(
                    solve_real(to_blocks(e32))
                ).astype(dtype)
            rho = jnp.zeros((Bsz,), f32)
        elif "ns" in _ablate:
            rho = jnp.zeros((Bsz,), f32)
        else:
            # warm preconditioner maintenance every attempt (h drift <= 1.4x)
            Pr, Pcr, Pci, rho = ns_update(Pr, Pcr, Pci, h_eff, J, ns_step)

        scale = atol + rtol * jnp.abs(y)

        # f32 state-representation noise floor of the Newton increment:
        # the stage values Y = y + h*A*K round at eps*|y|, the RHS maps
        # that through J, and the preconditioned solve returns it as an
        # increment plateau ~ eps*|y|/(gamma*scale) -- INDEPENDENT of h
        # and growing like 1/rtol in scaled units. Without this term the
        # plateau crosses _NEWTON_TOL below rtol~5e-6 and Newton "fails"
        # forever at any h (measured: rtol=3e-6 pins every member at a
        # 32% reject limit cycle regardless of sweeps or J refresh; the
        # un-resolvable increment contributes only O(eps*|y|) to the
        # step, far below tolerance, so stopping at the plateau is sound)
        state_floor = (
            _STATE_NOISE_MULT * jnp.asarray(jnp.finfo(dtype).eps, dtype)
            * norm_b(y, scale)
        )

        # --- simplified Newton on the stacked stages (fixed sweeps, masked)
        f0 = fval
        K = jnp.tile(f0[:, None, :], (1, 3, 1))
        if predict_stages and "pred" not in _ablate:
            # extrapolated stage guess once a previous accepted step exists
            Kg = predict_K(Kp, hp, h_eff, f0)
            K = jnp.where(pv[:, None, None], Kg, K)

        def newton_with(fB_used):
          def newton(carry_n, _):
            K, done, dn, rn, theta = carry_n
            Y = y[:, None, :] + h_eff[:, None, None] * jnp.einsum(
                "ij,bjn->bin", A, K
            )
            if "rhs" in _ablate:
                F = Y * np.float32(1e-3) - K * np.float32(0.01)
            else:
                F = stage_eval(fB_used, t, h_eff, Y)
            R = F - K
            rn_new = norm_b(
                (h_eff[:, None] * R.reshape(Bsz, -1)),
                jnp.tile(scale, (1, 3)) * jnp.sqrt(3.0),
            )
            rn_new = jnp.where(jnp.isfinite(rn_new), rn_new, jnp.inf)
            if "solve" in _ablate:
                dK = R
            elif block is not None:
                dK = solve_stages(R)
            else:
                dK = solve(R, h_eff, J64, Pr, Pcr, Pci)
            K_new = K + jnp.where(done[:, None, None], 0.0, dK)
            # convergence measured on the stage-value increment h*dK
            dn_new = norm_b(
                (h_eff[:, None] * dK.reshape(Bsz, -1)),
                jnp.tile(scale, (1, 3)) * jnp.sqrt(3.0),
            )
            dn_new = jnp.where(jnp.isfinite(dn_new), dn_new, jnp.inf)
            floor = rhs_noise * norm_b(
                (h_eff[:, None] * K.reshape(Bsz, -1)),
                jnp.tile(scale, (1, 3)) * jnp.sqrt(3.0),
            )
            tol_eff = jnp.maximum(_NEWTON_TOL, 3.0 * floor + state_floor)
            rn_keep = jnp.where(done, rn, rn_new)
            done_new = done | (dn_new < tol_eff)
            dn_keep = jnp.where(done, dn, dn_new)
            # measured contraction rate of the simplified Newton iteration
            # (Radau5's FACCON). Only ratios of PRE-convergence increments
            # count: the converging sweep's increment sits at the
            # tolerance/noise plateau and its ratio is meaningless (an
            # A/B with the last-ratio form strangled h on healthy members
            # -- accepted steps forever at tiny h, 64/64 unfinished).
            # Members converging within 2 sweeps keep theta = 0 (no rate
            # information -> no growth cap).
            ratio = dn_new / jnp.maximum(dn, 1e-300)
            theta_new = jnp.where(
                done | done_new | ~jnp.isfinite(dn), theta, ratio
            )
            return (K_new, done_new, dn_keep, rn_keep, theta_new), None
          return newton

        carry_n0 = (
            K, jnp.zeros(Bsz, bool), jnp.full((Bsz,), jnp.inf, dtype),
            jnp.full((Bsz,), jnp.inf, dtype), jnp.zeros((Bsz,), dtype))
        if "newton" in _ablate:
            # skip the whole Newton loop structure: fixed point = guess
            conv = jnp.ones((Bsz,), bool)
            newton_done = conv
            res_n = jnp.zeros((Bsz,), dtype)
            theta_n = jnp.zeros((Bsz,), dtype)
        elif _cheap_n > 0:
            # hybrid precision: cheap-RHS sweeps first, then RESET the
            # done flags so every member runs the remaining sweeps on
            # the accurate RHS -- convergence (and the accepted K) is
            # judged on accurate increments only. dn resets to inf too:
            # the first accurate increment jumps by ~|f - f_cheap|, and
            # a cheap-vs-accurate ratio would pollute the measured
            # Newton rate theta (observed with theta_target: theta ~ 1
            # froze all step growth and every member exhausted the
            # budget at h0-sized steps). With inf the first accurate
            # ratio is 0 and theta keeps its prior value; genuine rates
            # are measured from the second accurate sweep on.
            carry_n0, _ = lax.scan(
                newton_with(fB_cheap), carry_n0, None, length=_cheap_n,
                unroll=_newton_unroll,
            )
            Kc, _, dnc, rnc, thc = carry_n0
            carry_n0 = (Kc, jnp.zeros(Bsz, bool),
                        jnp.full((Bsz,), jnp.inf, dtype), rnc, thc)
        if "newton" not in _ablate:
            (K, conv, _, res_n, theta_n), _ = lax.scan(
                newton_with(fB), carry_n0, None,
                length=newton_iters - _cheap_n,
                unroll=_newton_unroll,
            )
            # certify the linear solves: a silently-bad preconditioner
            # makes Newton increments tiny while the system stays unsolved
            newton_done = conv
            conv = conv & (rho < 0.5) & jnp.isfinite(res_n)

        y1 = y + h_eff[:, None] * jnp.einsum("j,bjn->bn", Bv, K)

        # embedded error estimate smoothed by (I - h*gamma*J)^-1 (f32)
        err_raw = h_eff[:, None] * (
            jnp.einsum("j,bjn->bn", Bv - BHAT[1:], K) - BHAT[0] * f0
        )
        e32 = err_raw.astype(f32)
        if "err" in _ablate:
            err_s = e32.astype(dtype)
        elif block is not None:
            err_s = solve_err(e32)
        else:
            err_s32 = jnp.einsum("bnm,bm->bn", Pr, e32, precision=_HI)
            r_e = e32 - (
                err_s32
                - (gamma * h_eff.astype(f32))[:, None] * jnp.einsum(
                    "bnm,bm->bn", J, err_s32, precision=_HI
                )
            )
            err_s = (err_s32 + jnp.einsum(
                "bnm,bm->bn", Pr, r_e, precision=_HI
            )).astype(dtype)

        scale2 = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
        err_norm = norm_b(err_s, scale2)
        err_norm = jnp.where(jnp.isfinite(err_norm), err_norm, jnp.inf)
        err_norm = jnp.where(conv, err_norm, jnp.inf)
        if "ctrl" in _ablate:
            err_norm = jnp.full((Bsz,), 0.5, dtype)

        accept = (err_norm <= 1.0) & active
        err_c = jnp.clip(err_norm, 1e-10, 1e10)
        factor = jnp.clip(_SAFETY * err_c**_ORDER_EXP, _MIN_FACTOR, _max_fac)
        if theta_target is not None:
            # Newton-rate-keyed growth cap (Hairer-Wanner IV.8; Radau5's
            # FACCON): with the embedded error far below 1, the plain
            # I-controller grows h until simplified Newton fails, then
            # halves -- a grow-until-fail limit cycle (measured: 100% of
            # rejections are Newton non-convergence). The measured
            # contraction rate theta scales roughly linearly with h
            # through ||(I - hA J0)^-1 (hA (J - J0))||, so capping growth
            # at theta_target/theta keeps the PREDICTED next-step rate
            # under theta_target instead of probing failure. Members with
            # theta = 0 (converged on sweep 1, no rate info) get no cap.
            # growth-only: never shrink an accepted step on rate evidence
            # (the error controller and rejections own shrinking); theta
            # only gates how fast h may grow toward the Newton cliff.
            fac_con = jnp.where(
                theta_n > 1e-8,
                theta_target / jnp.maximum(theta_n, 1e-8).astype(dtype),
                jnp.inf,
            )
            factor = jnp.minimum(
                factor, jnp.clip(fac_con, 1.0, _max_fac)
            )
        factor = jnp.where(accept, factor, jnp.minimum(1.0, factor))
        factor = jnp.where(conv, factor, 0.5)
        clamped = h_eff < h
        h_new = jnp.where(
            accept & clamped, jnp.maximum(h, h_eff * factor), h_eff * factor
        )
        if newton_h_barrier:
            # Newton-failure barrier: with the error estimate far below 1
            # the I-controller grows h 1.4x/step until simplified Newton
            # stops converging, then halves -- a grow-until-fail limit
            # cycle measured at ~30% rejection rate (100% of rejections
            # were Newton-increment failures, 0% error-estimate). Remember
            # the failed step size and cap regrowth below it until the
            # next Jacobian refresh lifts the barrier (chunk_body resets
            # it to inf: staleness of J is one driver of the failures).
            # Default OFF: on-chip (B=512 f32 N2) the barrier RAISED the
            # max member's accepted-step count (+52, total attempts 696
            # vs 633 with the stage predictor alone) -- the clamp holds h
            # below what noisier on-chip Newton could actually sustain.
            # On CPU it mildly helps (603 vs 619 max attempts). Kept as
            # an option for workloads where rejections cluster.
            hbar = jnp.where(active & ~conv, jnp.minimum(hbar, 0.8 * h_eff), hbar)
            h_new = jnp.minimum(h_new, hbar)
        h_new = jnp.where(active, h_new, h)

        t_new = jnp.where(accept, t + h_eff, t)
        # Kahan-compensated state accumulation: in f32 mode the per-step
        # rounding of y + h*(b.K) random-walks to ~1e-6 over a few hundred
        # accepted steps -- the dominant term of the whole-run error. The
        # compensation vector carries the lost low-order bits, making the
        # accumulation effectively double-width for free elementwise cost.
        delta = h_eff[:, None] * jnp.einsum("j,bjn->bn", Bv, K)
        if "kahan" in _ablate:
            y_new = jnp.where(accept[:, None], y + delta, y)
            yc_new = yc
        else:
            u = delta + yc
            y1k = y + u
            yc1 = u - (y1k - y)
            y_new = jnp.where(accept[:, None], y1k, y)
            yc_new = jnp.where(accept[:, None], yc1, yc)
        # fval only seeds the next attempt's Newton start (predictor /
        # tile(f0)) and the BHAT[0]*f0 term of the error ESTIMATE -- both
        # noise-tolerant -- so in hybrid mode the cheap RHS suffices (the
        # accepted state itself never consumes fval)
        if "fcand" in _ablate:
            f_new = fval
        else:
            f_cand = (fB_cheap if _cheap_n > 0 else fB)(t_new, y_new)
            f_new = jnp.where(accept[:, None], f_cand, fval)

        # segment-boundary crossing: record the state, advance the pointer
        # (tolerance scaled to the working dtype: clamped steps land within
        # a few ulps of the boundary)
        eps_t = 8 * jnp.finfo(dtype).eps * jnp.maximum(jnp.abs(t_end), 1.0)
        if dense_output:
            # boundaries newly crossed by this accepted step: eps-shifted
            # so the final clamped step (t_new == ts[-1] to within ulps)
            # counts its boundary, and each boundary counts EXACTLY once
            # (the predicate is a strict crossing of the shifted value;
            # t advances monotonically through disjoint (t, t_new] spans)
            eps_f = 8 * jnp.finfo(dtype).eps * jnp.maximum(
                jnp.abs(ts[-1]), 1.0)
            tsb = ts[1:] - eps_f                        # (n_out-1,)
            m_cross = ((tsb[:, None] > t[None, :])
                       & (tsb[:, None] <= t_new[None, :])
                       & accept[None, :])               # (n_out-1, B)
            if "outbuf" not in _ablate:
                if out_idx is None:
                    t_r, h_r, y_r, K_r, m_r = t, h_eff, y, K, m_cross
                else:
                    t_r, h_r = t[out_idx], h_eff[out_idx]
                    y_r, K_r = y[out_idx], K[out_idx]
                    m_r = m_cross[:, out_idx]
                th = jnp.clip(
                    (ts[1:, None] - t_r[None, :]) / h_r[None, :], 0.0, 1.0
                )[:, :, None]                           # (n_out-1, P, 1)
                w = ((DW[None, None, :, 0] * th + DW[None, None, :, 1])
                     * th + DW[None, None, :, 2]) * th  # (n_out-1, P, 3)
                y_d = y_r[None, :, :] + h_r[None, :, None] * jnp.einsum(
                    "jps,psn->jpn", w, K_r)
                out = jnp.where(m_r[:, :, None], y_d, out)
            seg_new = seg + jnp.sum(m_cross, axis=0).astype(jnp.int32)
        else:
            crossed = accept & (t_new >= t_end - eps_t)
            if "outbuf" not in _ablate:
                if out_idx is None:
                    seg_r, crossed_r, y_r = seg_c, crossed, y_new
                else:  # record only the selected members' trajectories
                    seg_r = seg_c[out_idx]
                    crossed_r = crossed[out_idx]
                    y_r = y_new[out_idx]
                onehot = (jnp.arange(1, n_out)[:, None] == seg_r[None, :]) \
                    & crossed_r[None, :]
                out = jnp.where(onehot[:, :, None], y_r[None, :, :], out)
            seg_new = seg + crossed.astype(jnp.int32)

        rejected = (~accept) & active
        if "stats" in _ablate:
            st_new = st
        else:
            st_new = _stats_update(st, active, accept, rejected, newton_done,
                                   conv, seg_new)
        # predictor state: the last ACCEPTED step's stages and size
        Kp_new = jnp.where(accept[:, None, None], K, Kp)
        hp_new = jnp.where(accept, h_eff, hp)
        pv_new = pv | accept
        return (t_new, y_new, yc_new, f_new, h_new, J, Pr, Pcr, Pci, seg_new,
                out, st_new, Kp_new, hp_new, pv_new, hbar), None

    def _stats_update(st, active, accept, rejected, newton_done, conv,
                      seg_new):
        return EnsembleStats(
            st.n_fev + jnp.where(active, 3 * newton_iters + 1, 0),
            st.n_jev,
            st.n_accepted + accept.astype(jnp.int32),
            st.n_rejected + rejected.astype(jnp.int32),
            seg_new,
            st.n_rej_conv + (rejected & ~newton_done).astype(jnp.int32),
            st.n_rej_err + (rejected & conv).astype(jnp.int32),
            st.n_rej_rho + (rejected & newton_done & ~conv).astype(jnp.int32),
        )

    def run_chunk(state):
        (t, y, yc, fval, h, J, Pr, Pcr, Pci, seg, out, st,
         Kp, hp, pv, hbar) = state
        # a fresh Jacobian lifts the Newton-failure step barrier entirely.
        # Measured alternative (B=64 CPU f32, N2 DME): lifting by only 2x
        # per refresh traps early-transient members at tiny h for many
        # chunks -- mean attempts ROSE 450 -> 616 and some members never
        # finished. The full reset pays ~1 failed probe per chunk but
        # recovers the step size immediately.
        hbar = jnp.full_like(hbar, jnp.inf)
        # refresh the Jacobian once per chunk; h grows <= 1.4^16 within it
        if block is not None and not block_tridiag and jac_blocks is not None:
            Jd, Jl = jac_blocks(t, y)
            Jd, Jl = Jd.astype(f32), Jl.astype(f32)
            Ju = Pci
            if _pallas_block:
                Jd = Jd.transpose(1, 2, 3, 0)
                Jl = Jl.transpose(1, 2, 3, 0)
            st = st._replace(n_jev=st.n_jev + 1)
            state = (t, y, yc, fval, h, J, Jd, Jl, Ju, seg, out, st,
                     Kp, hp, pv, hbar)
            state, _ = lax.scan(attempt, state, None, length=chunk)
            return state
        if "jref" not in _ablate:
            J = jacB(t, y).astype(f32)
        if block is not None:
            # block mode: carry the fresh (Jd, Jl[, Ju]) blocks; solvers
            # are rebuilt exactly from them at each attempt's h
            if block_tridiag:
                Jd, Jl, Ju = _bs.extract_tridiag_blocks(J, var_no_b, z_no_b)
            else:
                Jd, Jl = _bs.extract_bidiag_blocks(J, var_no_b, z_no_b)
                Ju = Pci
                if _pallas_block:
                    # member-last layout for the lane-axis kernels
                    Jd = Jd.transpose(1, 2, 3, 0)
                    Jl = Jl.transpose(1, 2, 3, 0)
            st = st._replace(n_jev=st.n_jev + 1)
            state = (t, y, yc, fval, h, J, Jd, Jl, Ju, seg, out, st,
                     Kp, hp, pv, hbar)
            state, _ = lax.scan(attempt, state, None, length=chunk)
            return state
        # reset any non-finite preconditioner to the safe cold seed
        Pr0c, Pcr0c, Pci0c = ns_cold_start(h, J)
        bad = ~jnp.all(
            jnp.isfinite(Pr) & jnp.isfinite(Pcr) & jnp.isfinite(Pci),
            axis=(-1, -2),
        )
        Pr = jnp.where(bad[:, None, None], Pr0c, Pr)
        Pcr = jnp.where(bad[:, None, None], Pcr0c, Pcr)
        Pci = jnp.where(bad[:, None, None], Pci0c, Pci)
        Pr, Pcr, Pci, rho_w = ns_update(Pr, Pcr, Pci, h, J, ns_refresh)

        # cold-rescue silently-diverged warm iterates: a Newton-Schulz
        # iterate outside its basin squares AWAY from the inverse while
        # staying finite, and the warm chain then never recovers at any
        # later refresh (observed on M11's violently nonlinear transient:
        # 694 accepted steps pinned at tiny h with 30% Newton-failure
        # rejections, fresh J every attempt). When any member's certified
        # residual says the refresh failed, redo those members from the
        # guaranteed-convergent cold seed. Behind a scalar cond: stiff-but-
        # tame ensembles (the N2 bench) never pay for it.
        need = ~(rho_w < 0.5)

        def rescue(ops):
            Pr, Pcr, Pci = ops
            Prc, Pcrc, Pcic, _ = ns_update(
                Pr0c, Pcr0c, Pci0c, h, J, ns_refresh
            )
            m = need[:, None, None]
            return (jnp.where(m, Prc, Pr), jnp.where(m, Pcrc, Pcr),
                    jnp.where(m, Pcic, Pci))

        if "rescue" not in _ablate:
            Pr, Pcr, Pci = lax.cond(
                jnp.any(need), rescue, lambda ops: ops, (Pr, Pcr, Pci)
            )
        st = st._replace(n_jev=st.n_jev + 1)

        state = (t, y, yc, fval, h, J, Pr, Pcr, Pci, seg, out, st,
                 Kp, hp, pv, hbar)
        state, _ = lax.scan(attempt, state, None, length=chunk)
        return state

    # Liveness/progress surface (the reference prints a progress bar from
    # inside its N1 RHS, PyREMOT/solvers/solProgress.py:5, hooked at
    # pbHomoReactor.py:3305-3312 -- impossible per-RHS-call inside jit).
    # Opt-in via RMT_TPU_PROGRESS=1: a host callback at every attempt-chunk
    # boundary (i.e. each Jacobian-refresh period) reports members
    # finished / attempt usage while a long ensemble invocation runs.
    # Default OFF: debug callbacks are unsupported on some TPU runtimes
    # (the axon tunnel) and the hot loop must not depend on them.
    _progress = os.environ.get("RMT_TPU_PROGRESS", "") not in ("", "0")

    def _progress_report(i, seg, n_acc, n_rej):
        done = int(np.sum(np.asarray(seg) >= n_out - 1))
        att = np.asarray(n_acc) + np.asarray(n_rej)
        print(
            f"[rmt_tpu] attempts {int(i + 1) * chunk}/{max_steps}: "
            f"{done}/{seg.shape[0]} members finished, "
            f"attempts used mean {att.mean():.0f} max {int(att.max())}",
            file=sys.stderr, flush=True,
        )

    def chunk_body(state, i):
        # early exit: once EVERY member has written its last output
        # segment, the remaining budget chunks are skipped at runtime
        # (lax.cond executes one branch on TPU -- unlike select). With the
        # attempt budget sized for the worst member of the worst sweep,
        # typical runs stop 20-40% early; integrated results and per-member
        # stats are bit-identical because finished members were already
        # fully masked inside attempt() (only n_jev stops counting).
        seg = state[9]
        if "cond" in _ablate:
            state = run_chunk(state)
        else:
            alive = jnp.any(seg < n_out - 1)
            state = lax.cond(alive, run_chunk, lambda s: s, state)
        if _progress:
            st = state[11]
            jax.debug.callback(
                _progress_report, i, state[9], st.n_accepted, st.n_rejected,
                ordered=False,
            )
        return state, None

    # --- initialization ---
    f0 = fB(jnp.full((Bsz,), ts[0], dtype), y0)
    span = ts[-1] - ts[0]
    if block is not None and not block_tridiag and jac_blocks is not None:
        # dense J is never formed in this mode; the carry holds a
        # placeholder in its slot and h0 uses the block row sums
        # (identical to the dense row sums: the row of (vi, z) is
        # exactly |Jd[z, vi, :]| + |Jl[z, vi, :]|)
        Jd0, Jl0 = jac_blocks(jnp.full((Bsz,), ts[0], dtype), y0)
        Jd0, Jl0 = Jd0.astype(f32), Jl0.astype(f32)
        row_sums = jnp.sum(jnp.abs(Jd0), axis=-1) + jnp.sum(
            jnp.abs(Jl0), axis=-1
        )                                               # (B, z, m)
        j_norm = jnp.max(row_sums, axis=(-1, -2)).astype(dtype)
        h0 = jnp.minimum(0.05 / (abs(gamma) * j_norm + 1e-30), 1e-3 * span)
        J0 = jnp.zeros((Bsz, 1, 1), f32)
        if _pallas_block:
            Jd0 = Jd0.transpose(1, 2, 3, 0)
            Jl0 = Jl0.transpose(1, 2, 3, 0)
        P1_0, P2_0, P3_0 = Jd0, Jl0, jnp.zeros((Bsz, 1, 1), f32)
    else:
        J0 = jacB(jnp.full((Bsz,), ts[0], dtype), y0).astype(f32)
        # conservative first step: ||h*gamma*J|| << 1 so P0 = I is a valid
        # Newton-Schulz seed
        j_norm = jnp.max(
            jnp.sum(jnp.abs(J0), axis=-1), axis=-1
        ).astype(dtype)                                 # (B,)
        h0 = jnp.minimum(0.05 / (abs(gamma) * j_norm + 1e-30), 1e-3 * span)
        if block is not None:
            # block mode carries (Jd, Jl) in the Pr/Pcr slots and either
            # Ju (tridiag) or a tiny placeholder where NS keeps Pci
            if block_tridiag:
                Jd0, Jl0, Ju0 = _bs.extract_tridiag_blocks(
                    J0, var_no_b, z_no_b
                )
                P1_0, P2_0, P3_0 = Jd0, Jl0, Ju0
            else:
                Jd0, Jl0 = _bs.extract_bidiag_blocks(J0, var_no_b, z_no_b)
                if _pallas_block:
                    Jd0 = Jd0.transpose(1, 2, 3, 0)
                    Jl0 = Jl0.transpose(1, 2, 3, 0)
                P1_0, P2_0, P3_0 = Jd0, Jl0, jnp.zeros((Bsz, 1, 1), f32)
        else:
            eyeB = jnp.tile(jnp.eye(n, dtype=f32)[None], (Bsz, 1, 1))
            P1_0, P2_0, P3_0 = eyeB, eyeB, jnp.zeros_like(eyeB)

    zero_b = jnp.zeros(Bsz, jnp.int32)
    stats0 = EnsembleStats(zero_b + 1, jnp.asarray(1, jnp.int32), zero_b, zero_b,
                           zero_b, zero_b, zero_b, zero_b)
    out0 = jnp.zeros((n_out - 1, n_rec, n), dtype)
    state0 = (
        jnp.full((Bsz,), ts[0], dtype),
        y0,
        jnp.zeros_like(y0),      # Kahan compensation of the state sum
        f0,
        h0,
        J0,
        P1_0,
        P2_0,
        P3_0,
        zero_b,
        out0,
        stats0,
        jnp.tile(f0[:, None, :], (1, 3, 1)),   # Kp (unused until pv)
        jnp.ones((Bsz,), dtype),               # hp
        jnp.zeros((Bsz,), bool),               # pv: no accepted step yet
        jnp.full((Bsz,), jnp.inf, dtype),      # hbar
    )
    n_chunks = max(max_steps // chunk, 1)
    state, _ = lax.scan(
        chunk_body, state0, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    y_fin, seg_final, out, stats = state[1], state[9], state[10], state[11]
    # members that exhausted the budget keep their final integrated state
    # in the remaining output slots (detectable via stats/n_accepted)
    y_tail = y_fin if out_idx is None else y_fin[out_idx]
    seg_tail = seg_final if out_idx is None else seg_final[out_idx]
    onehot_tail = jnp.arange(1, n_out)[:, None] > seg_tail[None, :]
    out = jnp.where(onehot_tail[:, :, None], y_tail[None, :, :], out)
    y0_head = y0 if out_idx is None else y0[out_idx]
    ys = jnp.concatenate([y0_head[None], out], axis=0)
    if out_idx is not None:
        return ys, y_fin, stats
    return ys, stats
