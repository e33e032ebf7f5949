"""Pallas fused-kernel correctness (interpret mode on the CPU mesh).

The fused batched lasso FB step must match the pure-XLA reference math
elementwise, and the kernel-driven solver must reproduce the generic
batched driver's per-lane iteration counts exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proxtpu.kernels.lasso import (
    fused_fb_prox_grad,
    reference_fb_prox_grad,
    solve_lasso_batch,
)

B, M, N = 5, 16, 24


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    A = jnp.asarray((rng.standard_normal((B, M, N)) / np.sqrt(M)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, M)).astype(np.float32))
    lam = jnp.asarray(
        0.1 * np.max(np.abs(np.einsum("bmn,bm->bn", np.asarray(A), np.asarray(b))), axis=1),
        jnp.float32,
    )
    Lf = jnp.asarray(
        [np.linalg.norm(np.asarray(A[i]), 2) ** 2 for i in range(B)], jnp.float32
    )
    return A, b, lam, Lf


def test_fused_step_matches_reference(data):
    A, b, lam, Lf = data
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    gamma = (1.0 / Lf).astype(jnp.float32)
    thr = gamma * lam
    z_k, r_k = fused_fb_prox_grad(A, b, x, gamma, thr, interpret=True)
    z_r, r_r = reference_fb_prox_grad(A, b, x, gamma, thr)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_r), atol=5e-6)
    np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_r), atol=5e-6)


def test_kernel_solver_matches_xla_solver(data):
    A, b, lam, Lf = data
    z1, it1, d1 = solve_lasso_batch(
        A, b, lam, Lf, 1e-5, maxit=3000, use_kernel=True, interpret=True
    )
    z2, it2, d2 = solve_lasso_batch(
        A, b, lam, Lf, 1e-5, maxit=3000, use_kernel=False
    )
    assert bool(jnp.all(d1)) and bool(jnp.all(d2))
    # kernel and XLA reference round differently in the last f32 bit, which
    # can move a lane across the stopping threshold by one iteration
    assert int(np.max(np.abs(np.asarray(it1) - np.asarray(it2)))) <= 1
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-4)


def test_kernel_solver_matches_generic_driver(data):
    """The specialized kernel solver must agree with the generic
    batched_run_loop + FISTA path on solutions (same math, same stopping)."""
    from proxtpu.algorithms.fast_forward_backward import (
        make_fast_forward_backward_iteration,
    )
    from proxtpu.parallel.batch import batched_run_loop
    from proxtpu.prox import LeastSquaresLoss, NormL1

    A, b, lam, Lf = data
    iteration = jax.vmap(
        lambda Ai, bi, li, Li: make_fast_forward_backward_iteration(
            x0=jnp.zeros(N, jnp.float32),
            f=LeastSquaresLoss(Ai, bi),
            g=NormL1(li),
            gamma=1.0 / Li,
        )
    )(A, b, lam, Lf)
    xs, iters, done = batched_run_loop(iteration, 3000, 1e-5)

    z, it, d = solve_lasso_batch(
        A, b, lam, Lf, 1e-5, maxit=3000, use_kernel=True, interpret=True
    )
    assert bool(jnp.all(d))
    # same fixed point to f32 solver tolerance, and same per-lane iteration
    # counts up to the f32 last-bit boundary effect
    np.testing.assert_allclose(np.asarray(z), np.asarray(xs), atol=1e-4)
    assert int(np.max(np.abs(np.asarray(it) - np.asarray(iters)))) <= 1


class TestBoxQPKernel:
    """Fused projected-gradient box-QP kernel vs references."""

    @pytest.fixture(scope="class")
    def qp(self):
        rng = np.random.default_rng(0)
        Bq, n = 6, 16
        Qs, qs, Lips = [], [], []
        for _ in range(Bq):
            U, _ = np.linalg.qr(rng.standard_normal((n, n)))
            ev = 2 * rng.random(n) - 1
            Q = (U @ np.diag(ev) @ U.T).astype(np.float32)
            Qs.append(0.5 * (Q + Q.T))
            qs.append(rng.standard_normal(n).astype(np.float32))
            Lips.append(np.max(np.abs(ev)))
        return (
            jnp.asarray(np.stack(Qs)),
            jnp.asarray(np.stack(qs)),
            jnp.asarray(np.array(Lips, np.float32)),
        )

    def test_step_matches_reference(self, qp):
        from proxtpu.kernels.box_qp import (
            fused_pg_box_step,
            reference_pg_box_step,
        )

        Q, q, Lip = qp
        Bq, n = q.shape
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((Bq, n)).astype(np.float32))
        gam = (0.95 / Lip).astype(jnp.float32)
        lo = jnp.full((Bq,), -1.0, jnp.float32)
        hi = jnp.full((Bq,), 1.0, jnp.float32)
        zk, rk = fused_pg_box_step(Q, q, x, gam, lo, hi, interpret=True)
        zr, rr = reference_pg_box_step(Q, q, x, gam, lo, hi)
        np.testing.assert_allclose(np.asarray(zk), np.asarray(zr), atol=5e-6)
        np.testing.assert_allclose(np.asarray(rk), np.asarray(rr), atol=5e-6)

    def test_solver_fixed_point(self, qp):
        from proxtpu.kernels.box_qp import solve_box_qp_batch

        Q, q, Lip = qp
        z, iters, done = solve_box_qp_batch(
            Q, q, -1.0, 1.0, Lip, 1e-4, use_kernel=True, interpret=True
        )
        assert bool(jnp.all(done))
        # verify the projected-gradient fixed-point residual directly
        for i in range(q.shape[0]):
            x = np.asarray(z[i], np.float64)
            gamma = 0.95 / float(Lip[i])
            step = np.clip(
                x - gamma * (np.asarray(Q[i], np.float64) @ x + np.asarray(q[i])),
                -1.0, 1.0,
            )
            assert np.max(np.abs(x - step)) / gamma <= 2e-4


def test_multirhs_matches_per_lane_batch(data):
    """The shared-A MXU formulation must reproduce the distinct-A batch
    solver exactly when every lane carries the same A: same counts (+-1
    f32 boundary), same fixed points."""
    from proxtpu.kernels.lasso import solve_lasso_batch, solve_lasso_multirhs

    A, b, lam, Lf = data
    A0 = A[0]
    Lf0 = Lf[0]
    A_rep = jnp.broadcast_to(A0, A.shape)
    Lf_rep = jnp.broadcast_to(Lf0, Lf.shape)

    z1, i1, d1 = solve_lasso_multirhs(A0, b, lam, Lf0, 1e-5, maxit=3000)
    z2, i2, d2 = solve_lasso_batch(
        A_rep, b, lam, Lf_rep, 1e-5, maxit=3000, use_kernel=False
    )
    assert bool(jnp.all(d1)) and bool(jnp.all(d2))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-4)
    assert int(np.max(np.abs(np.asarray(i1) - np.asarray(i2)))) <= 1

    # iteration blocking: same fixed point, upper-bound counts
    z3, i3, d3 = solve_lasso_multirhs(
        A0, b, lam, Lf0, 1e-5, maxit=3000, iter_block=8
    )
    assert bool(jnp.all(d3))
    np.testing.assert_allclose(np.asarray(z3), np.asarray(z1), atol=5e-4)
    # FISTA's residual is non-monotone: a lane that dips under tol between
    # sample points keeps iterating until a *sampled* residual is under tol,
    # so counts are an upper bound (not necessarily within K)
    assert np.all(np.asarray(i3) >= np.asarray(i1) - 1)


def test_multirhs_dispatch():
    """BatchedAlgorithm routes shared-A LeastSquaresLoss + NormL1 to the
    multirhs solver."""
    from proxtpu.algorithms.fast_forward_backward import (
        make_fast_forward_backward_iteration,
    )
    from proxtpu.kernels.dispatch import match_kernel_solver
    from proxtpu.prox import LeastSquaresLoss, NormL1

    rng = np.random.default_rng(5)
    A0 = jnp.asarray((rng.standard_normal((M, N)) / np.sqrt(M)).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal((B, M)).astype(np.float32))
    Lf0 = float(np.linalg.norm(np.asarray(A0), 2) ** 2)
    kw = dict(
        x0=jnp.zeros((B, N), jnp.float32),
        f=LeastSquaresLoss(A0, bb),
        g=NormL1(0.1),
        Lf=Lf0,
    )
    run = match_kernel_solver(
        make_fast_forward_backward_iteration, kw, tol=1e-5, maxit=3000
    )
    assert run is not None
    z, it, done = run()
    assert bool(jnp.all(done))
    # fixed-point check on lane 0
    x = np.asarray(z[0], np.float64)
    An = np.asarray(A0, np.float64)
    g0 = 1.0 / Lf0
    y = x - g0 * (An.T @ (An @ x - np.asarray(bb[0], np.float64)))
    zz = np.sign(y) * np.maximum(np.abs(y) - g0 * 0.1, 0)
    assert np.max(np.abs(x - zz)) / g0 <= 2e-5


def test_blocked_solver_matches_fixed_point(data):
    """Iteration-blocked FISTA reaches the same fixed point; its sampled
    stopping makes per-lane counts an upper bound (never earlier than the
    one-step solver)."""
    from proxtpu.kernels.lasso import (
        solve_lasso_batch,
        solve_lasso_batch_blocked,
    )

    A, b, lam, Lf = data
    z1, i1, d1 = solve_lasso_batch(
        A, b, lam, Lf, 1e-5, maxit=3000, use_kernel=True, interpret=True
    )
    z2, i2, d2 = solve_lasso_batch_blocked(
        A, b, lam, Lf, 1e-5, maxit=3000, iter_block=8, interpret=True
    )
    assert bool(jnp.all(d1)) and bool(jnp.all(d2))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=5e-4)
    assert np.all(np.asarray(i2) >= np.asarray(i1) - 1)


def test_blocked_box_qp_matches(qp=None):
    """Blocked box-QP PG reaches the same fixed point with upper-bound
    iteration counts."""
    from proxtpu.kernels import solve_box_qp_batch, solve_box_qp_batch_blocked

    rng = np.random.default_rng(3)
    n, Bq = 16, 8
    Qs, qs, Lips = [], [], []
    for _ in range(Bq):
        U, _ = np.linalg.qr(rng.standard_normal((n, n)))
        ev = 2 * rng.random(n) - 1
        Q0 = (U @ np.diag(ev) @ U.T).astype(np.float32)
        Qs.append(0.5 * (Q0 + Q0.T))
        qs.append(rng.standard_normal(n).astype(np.float32))
        Lips.append(np.max(np.abs(ev)))
    Q = jnp.asarray(np.stack(Qs))
    q = jnp.asarray(np.stack(qs))
    Lip = jnp.asarray(np.array(Lips, np.float32))

    z1, i1, d1 = solve_box_qp_batch(
        Q, q, -1.0, 1.0, Lip, 1e-4, use_kernel=True, interpret=True
    )
    z2, i2, d2 = solve_box_qp_batch_blocked(
        Q, q, -1.0, 1.0, Lip, 1e-4, iter_block=8, interpret=True
    )
    assert bool(jnp.all(d1)) and bool(jnp.all(d2))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=2e-3)
    assert np.all(np.asarray(i2) >= np.asarray(i1) - 1)


# ---------------------------------------------------------------------------
# Mixed-precision two-stage solver (bf16-A warm start + f32 polish)
# ---------------------------------------------------------------------------


def _fb_residual(A, b, lam, Lf, z):
    gamma = 1.0 / Lf
    _, res = reference_fb_prox_grad(A, b, z, gamma, gamma * lam)
    return res / gamma


@pytest.mark.parametrize("use_kernel,interpret",
                         [(False, False), (True, True)],
                         ids=["xla", "kernel-interp"])
def test_mixed_solver_reaches_f32_tolerance(data, use_kernel, interpret):
    """The bf16 warm start must not degrade final quality: the mixed
    solution satisfies the SAME f32 stopping criterion as the plain
    solver and matches a tight-tolerance ground truth at least as well."""
    from proxtpu.kernels.lasso import solve_lasso_batch_mixed

    A, b, lam, Lf = data
    tol = 1e-5
    z_m, it_m, d_m = solve_lasso_batch_mixed(
        A, b, lam, Lf, tol, maxit=3000, use_kernel=use_kernel,
        interpret=interpret,
    )
    assert bool(jnp.all(d_m))
    # recomputed f32 fixed-point residual clears tol (ulp slack)
    assert float(jnp.max(_fb_residual(A, b, lam, Lf, z_m))) <= 1.1 * tol
    z_gt, _, d_gt = solve_lasso_batch(A, b, lam, Lf, 1e-7, maxit=30000,
                                      use_kernel=False)
    z_ref, _, _ = solve_lasso_batch(A, b, lam, Lf, tol, maxit=3000,
                                    use_kernel=False)
    assert bool(jnp.all(d_gt))
    err_m = float(jnp.max(jnp.abs(z_m - z_gt)))
    err_ref = float(jnp.max(jnp.abs(z_ref - z_gt)))
    assert err_m <= 3 * max(err_ref, 1e-6), (err_m, err_ref)


def test_mixed_solver_stage2_fewer_f32_iterations(data):
    """The point of the warm start: the f32 stage runs a fraction of the
    plain solver's iterations (total counts include the cheap bf16 steps)."""
    from proxtpu.kernels.lasso import solve_lasso_batch_mixed

    A, b, lam, Lf = data
    tol = 1e-5
    _, it_plain, _ = solve_lasso_batch(A, b, lam, Lf, tol, maxit=3000,
                                       use_kernel=False)
    _, it_mixed, d = solve_lasso_batch_mixed(A, b, lam, Lf, tol, maxit=3000,
                                             use_kernel=False)
    assert bool(jnp.all(d))
    # total (bf16 + f32) count stays below the plain count: the warm lanes
    # re-enter stage 2 close to the solution
    assert float(jnp.mean(np.asarray(it_mixed))) < float(
        jnp.mean(np.asarray(it_plain))
    )


# ---------------------------------------------------------------------------
# Per-lane adaptive restart (O'Donoghue & Candes gradient scheme)
# ---------------------------------------------------------------------------


def test_restart_converges_faster_same_quality(data):
    """restart=True must reach the SAME stopping criterion in strictly
    fewer iterations (the gradient scheme kills FISTA's momentum
    oscillation once the active set settles)."""
    A, b, lam, Lf = data
    tol = 1e-5
    z_p, it_p, d_p = solve_lasso_batch(A, b, lam, Lf, tol, maxit=3000,
                                       use_kernel=False)
    z_r, it_r, d_r = solve_lasso_batch(A, b, lam, Lf, tol, maxit=3000,
                                       use_kernel=False, restart=True)
    assert bool(jnp.all(d_p)) and bool(jnp.all(d_r))
    assert float(jnp.max(_fb_residual(A, b, lam, Lf, z_r))) <= 1.1 * tol
    assert float(jnp.mean(np.asarray(it_r))) < float(
        jnp.mean(np.asarray(it_p))
    )


def test_restart_kernel_matches_xla_counts(data):
    """The in-kernel restart signal (a VMEM (1,N) reduction) reproduces
    the XLA path's decisions; knife-edge trials (rs summed in a different
    f32 order) may flip single iterations."""
    A, b, lam, Lf = data
    tol = 1e-5
    _, it_x, d_x = solve_lasso_batch(A, b, lam, Lf, tol, maxit=3000,
                                     use_kernel=False, restart=True)
    z_k, it_k, d_k = solve_lasso_batch(A, b, lam, Lf, tol, maxit=3000,
                                       use_kernel=True, interpret=True,
                                       restart=True)
    assert bool(jnp.all(d_x)) and bool(jnp.all(d_k))
    assert int(np.max(np.abs(np.asarray(it_x) - np.asarray(it_k)))) <= 1
    assert float(jnp.max(_fb_residual(A, b, lam, Lf, z_k))) <= 1.1 * tol


def test_restart_blocked_and_multirhs(data):
    """The blocked kernel restarts inside its inner loop; the shared-A
    MXU solver restarts per lane — both satisfy the residual criterion."""
    from proxtpu.kernels.lasso import (
        solve_lasso_batch_blocked, solve_lasso_multirhs,
    )

    A, b, lam, Lf = data
    tol = 1e-5
    z_b, it_b, d_b = solve_lasso_batch_blocked(
        A, b, lam, Lf, tol, maxit=3000, iter_block=4, interpret=True,
        restart=True,
    )
    assert bool(jnp.all(d_b))
    assert float(jnp.max(_fb_residual(A, b, lam, Lf, z_b))) <= 1.1 * tol

    A1 = A[0]
    Lf1 = float(np.linalg.norm(np.asarray(A1), 2) ** 2)
    z_m, it_m, d_m = solve_lasso_multirhs(A1, b, lam, Lf1, tol, maxit=3000,
                                          restart=True)
    _, it_p, d_p = solve_lasso_multirhs(A1, b, lam, Lf1, tol, maxit=3000)
    assert bool(jnp.all(d_m)) and bool(jnp.all(d_p))
    assert float(jnp.mean(np.asarray(it_m))) < float(
        jnp.mean(np.asarray(it_p))
    )


def test_restart_multirhs_block_boundary(data):
    """With iter_block>1 the restart signal is checked once per block (the
    per-step reduction would break the MXU epilogue fusion); the delayed
    check must still cut iterations vs plain K-blocked and satisfy the
    same residual criterion."""
    from proxtpu.kernels.lasso import solve_lasso_multirhs

    A, b, lam, Lf = data
    A1 = A[0]
    Lf1 = float(np.linalg.norm(np.asarray(A1), 2) ** 2)
    tol = 1e-5
    z_r, it_r, d_r = solve_lasso_multirhs(
        A1, b, lam, Lf1, tol, maxit=3000, iter_block=8, restart=True)
    z_p, it_p, d_p = solve_lasso_multirhs(
        A1, b, lam, Lf1, tol, maxit=3000, iter_block=8)
    assert bool(jnp.all(d_r)) and bool(jnp.all(d_p))
    gamma = 1.0 / Lf1
    res = jnp.max(jnp.abs(
        z_r - jnp.sign(z_r - gamma * ((z_r @ A1.T - b) @ A1))
        * jnp.maximum(
            jnp.abs(z_r - gamma * ((z_r @ A1.T - b) @ A1))
            - gamma * lam[:, None], 0.0))) / gamma
    assert float(res) <= 1.1 * tol
    assert float(jnp.mean(np.asarray(it_r))) < float(
        jnp.mean(np.asarray(it_p))
    )


def test_compacting_exact_parity(data):
    """Lane compaction is pure scheduling: per-lane counts and solutions
    are BIT-identical to solve_lasso_batch (shared loop body), for both
    the XLA and the interpreted-kernel step, plain and restarted, and
    with a lane capped at maxit."""
    from proxtpu.kernels.lasso import solve_lasso_batch_compacting

    A, b, lam, Lf = data
    rng = np.random.default_rng(5)
    # spread difficulty so compaction actually triggers
    lam = lam * jnp.asarray((0.2 + 0.8 * rng.random(lam.shape[0])),
                            jnp.float32)
    for use_kernel, interp in ((False, False), (True, True)):
        for restart in (False, True):
            z1, i1, d1 = solve_lasso_batch(
                A, b, lam, Lf, 1e-5, maxit=3000, use_kernel=use_kernel,
                interpret=interp, restart=restart)
            z2, i2, d2 = solve_lasso_batch_compacting(
                A, b, lam, Lf, 1e-5, maxit=3000, use_kernel=use_kernel,
                interpret=interp, restart=restart, segment=40, min_batch=2)
            assert (np.asarray(i1) == np.asarray(i2)).all()
            assert (np.asarray(d1) == np.asarray(d2)).all()
            if use_kernel:
                # per-lane VMEM reductions are batch-size invariant
                np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
            else:
                # XLA's batched-einsum reduction tiling depends on the
                # batch size -> last-ULP differences after the gather
                np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                                           atol=5e-7)

    # maxit cap: unconverged lanes report maxit and done=False
    z1, i1, d1 = solve_lasso_batch(A, b, lam, Lf, 1e-12, maxit=60,
                                   use_kernel=False)
    z2, i2, d2 = solve_lasso_batch_compacting(
        A, b, lam, Lf, 1e-12, maxit=60, use_kernel=False, segment=25,
        min_batch=2)
    assert (np.asarray(i1) == np.asarray(i2)).all()
    assert (np.asarray(d1) == np.asarray(d2)).all()
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_mixed_solver_restart_kernel_matches_xla(data):
    """Both mixed-solver step paths implement the unified IMMEDIATE
    restart semantic (reset before the coefficient): counts agree +-1,
    residual criterion holds."""
    from proxtpu.kernels.lasso import solve_lasso_batch_mixed

    A, b, lam, Lf = data
    tol = 1e-5
    z_x, it_x, d_x = solve_lasso_batch_mixed(
        A, b, lam, Lf, tol, maxit=3000, use_kernel=False, restart=True)
    z_k, it_k, d_k = solve_lasso_batch_mixed(
        A, b, lam, Lf, tol, maxit=3000, use_kernel=True, interpret=True,
        restart=True)
    assert bool(jnp.all(d_x)) and bool(jnp.all(d_k))
    assert int(np.max(np.abs(np.asarray(it_x) - np.asarray(it_k)))) <= 1
    assert float(jnp.max(_fb_residual(A, b, lam, Lf, z_k))) <= 1.1 * tol


def test_packed_solver_matches_onestep():
    """Zero-lane-padding packed kernel (round 4): same stopping rule and
    freezing as solve_lasso_batch; solutions in the same tol-ball,
    iteration counts equal up to reduction-order knife edges (the
    segmented contractions accumulate on the MXU instead of a lane tree)."""
    from proxtpu.kernels.lasso import (
        _pack_count,
        solve_lasso_batch_packed,
    )

    assert _pack_count(400, 256) == 8
    assert _pack_count(384, 256) == 1   # already lane-aligned
    assert _pack_count(400, 100) == 1   # pack does not divide B
    assert _pack_count(48, 8) == 1      # no aligned main region (N < 128)

    rng = np.random.default_rng(3)
    Bq, Mq, Nq = 8, 16, 160             # pack = 128/gcd(160,128) = 4
    A = jnp.asarray((rng.standard_normal((Bq, Mq, Nq)) / np.sqrt(Mq))
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal((Bq, Mq)).astype(np.float32))
    lam = jnp.asarray(0.1 * np.max(np.abs(np.einsum(
        "bmn,bm->bn", np.asarray(A), np.asarray(b))), axis=1), jnp.float32)
    Lf = jnp.asarray([np.linalg.norm(np.asarray(A[i]), 2) ** 2
                      for i in range(Bq)], jnp.float32)
    tol = 1e-5
    for restart in (False, True):
        z1, i1, d1 = solve_lasso_batch(
            A, b, lam, Lf, tol, maxit=3000, use_kernel=True,
            interpret=True, restart=restart)
        z2, i2, d2 = solve_lasso_batch_packed(
            A, b, lam, Lf, tol, maxit=3000, interpret=True,
            restart=restart)
        assert bool(jnp.all(d1)) and bool(jnp.all(d2))
        # counts: equal except possibly knife-edge flips on a minority
        same = np.asarray(i1) == np.asarray(i2)
        assert same.mean() >= 0.75, (np.asarray(i1), np.asarray(i2))
        # every packed lane satisfies the criterion at the f32 operator
        assert float(jnp.max(_fb_residual(A, b, lam, Lf, z2))) <= 1.1 * tol
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z1),
                                   atol=1e-3)

    # maxit cap + unconverged reporting parity
    z1, i1, d1 = solve_lasso_batch(A, b, lam, Lf, 1e-12, maxit=40,
                                   use_kernel=True, interpret=True)
    z2, i2, d2 = solve_lasso_batch_packed(A, b, lam, Lf, 1e-12, maxit=40,
                                          interpret=True)
    assert not bool(jnp.any(d2))
    assert (np.asarray(i2) == np.asarray(i1)).all()

    # pack=1 falls back to the natural-layout solver exactly
    z3, i3, d3 = solve_lasso_batch_packed(A, b, lam, Lf, tol, maxit=3000,
                                          interpret=True, pack=1)
    z4, i4, d4 = solve_lasso_batch(A, b, lam, Lf, tol, maxit=3000,
                                   use_kernel=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(z3), np.asarray(z4))


def test_packed_solver_mf_route():
    """Strongly-convex (mf>0) coefficients ride the packed kernel too:
    per-lane counts match the natural-layout mf solver and mf genuinely
    cuts iterations vs the plain t-recursion."""
    from proxtpu.kernels.lasso import solve_lasso_batch_packed

    rng = np.random.default_rng(13)
    Bq, Mq, Nq = 4, 320, 160            # tall A -> strongly convex; pack=4
    A = jnp.asarray((rng.standard_normal((Bq, Mq, Nq)) / np.sqrt(Mq))
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal((Bq, Mq)).astype(np.float32))
    lam = jnp.asarray(0.1 * np.max(np.abs(np.einsum(
        "bmn,bm->bn", np.asarray(A), np.asarray(b))), axis=1), jnp.float32)
    sv = [np.linalg.svd(np.asarray(A[i]), compute_uv=False)
          for i in range(Bq)]
    Lf = jnp.asarray([s[0] ** 2 for s in sv], jnp.float32)
    mf = min(float(s[-1] ** 2) for s in sv)
    z1, i1, d1 = solve_lasso_batch(A, b, lam, Lf, 1e-5, maxit=4000,
                                   use_kernel=True, interpret=True, mf=mf)
    z2, i2, d2 = solve_lasso_batch_packed(A, b, lam, Lf, 1e-5, maxit=4000,
                                          interpret=True, mf=mf)
    _, i3, d3 = solve_lasso_batch_packed(A, b, lam, Lf, 1e-5, maxit=4000,
                                         interpret=True)
    assert bool(jnp.all(d1)) and bool(jnp.all(d2)) and bool(jnp.all(d3))
    assert int(np.max(np.abs(np.asarray(i1) - np.asarray(i2)))) <= 1
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), atol=1e-4)
    assert float(np.mean(np.asarray(i2))) < float(np.mean(np.asarray(i3)))
    import pytest
    with pytest.raises(ValueError):
        solve_lasso_batch_packed(A, b, lam, Lf, 1e-5, maxit=10,
                                 interpret=True, mf=mf, restart=True)


def _lasso_problems(B_, M_, N_, seed=0, lam_frac=0.1):
    rng = np.random.default_rng(seed)
    A = jnp.asarray((rng.standard_normal((B_, M_, N_)) / np.sqrt(M_))
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B_, M_)).astype(np.float32))
    lam = jnp.asarray(lam_frac * np.max(np.abs(np.einsum(
        "bmn,bm->bn", np.asarray(A), np.asarray(b))), axis=1), jnp.float32)
    Lf = jnp.asarray([np.linalg.norm(np.asarray(A[i]), 2) ** 2
                      for i in range(B_)], jnp.float32)
    return A, b, lam, Lf


def _canonical_recheck(A, b, lam, Lf, x):
    """Worst-lane FB residual at the CANONICAL gamma = 1/Lf — the
    criterion every solve must satisfy regardless of its internal
    stepsize."""
    A, b, lam, Lf, x = map(np.asarray, (A, b, lam, Lf, x))
    gam = (1.0 / Lf)[:, None]
    y = x - gam * np.einsum("bmn,bm->bn", A,
                            np.einsum("bmn,bn->bm", A, x) - b)
    z = np.sign(y) * np.maximum(np.abs(y) - gam * lam[:, None], 0.0)
    return float(np.max(np.max(np.abs(x - z), axis=1) / gam[:, 0]))


def test_step_mult_faster_same_certificate():
    """Over-relaxed restart FISTA (round 5): step_mult=1.5 converges in
    fewer iterations than restart-only on the well-conditioned workload,
    and the returned solutions satisfy the CANONICAL criterion (res at
    gamma=1/Lf <= tol) — guaranteed by the gradient-mapping lemma via the
    in-solver ``res * Lf <= tol`` rule, not just rechecked."""
    # aspect/conditioning matter: at M/N = 1/2 with M >= 80 the win is
    # uniform (mean -20%); skinnier/smaller instances can trigger the
    # safeguard on unlucky draws (covered by the safeguard test below)
    A, b, lam, Lf = _lasso_problems(6, 80, 160, seed=0)
    tol = 1e-5
    for kw in (dict(use_kernel=False),
               dict(use_kernel=True, interpret=True)):
        z_r, it_r, d_r = solve_lasso_batch(
            A, b, lam, Lf, tol, maxit=3000, restart=True, **kw)
        z_s, it_s, d_s = solve_lasso_batch(
            A, b, lam, Lf, tol, maxit=3000, restart=True, step_mult=1.5,
            **kw)
        assert bool(jnp.all(d_s))
        assert _canonical_recheck(A, b, lam, Lf, z_s) <= tol * 1.05
        # same fixed point (both inside the tol-ball)
        np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_r),
                                   atol=5e-3)
        # mean count strictly improves on this workload (measured ~20%)
        assert float(jnp.mean(it_s)) < float(jnp.mean(it_r))


def test_step_mult_packed_matches_onestep():
    """The packed over-relaxed variant reproduces the natural-layout
    counts up to reduction-order knife edges and the same certificate."""
    from proxtpu.kernels.lasso import solve_lasso_batch_packed

    A, b, lam, Lf = _lasso_problems(8, 40, 160, seed=1)
    tol = 1e-5
    z1, it1, d1 = solve_lasso_batch(
        A, b, lam, Lf, tol, maxit=3000, restart=True, step_mult=1.5,
        use_kernel=True, interpret=True)
    z2, it2, d2 = solve_lasso_batch_packed(
        A, b, lam, Lf, tol, maxit=3000, restart=True, step_mult=1.5,
        interpret=True)
    assert bool(jnp.all(d1)) and bool(jnp.all(d2))
    assert _canonical_recheck(A, b, lam, Lf, z2) <= tol * 1.1
    same = np.asarray(it1) == np.asarray(it2)
    assert same.mean() >= 0.75, (np.asarray(it1), np.asarray(it2))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), atol=5e-3)


def test_step_mult_safeguard_rescues_divergence():
    """At lam = 0.02 lam_max the over-relaxed momentum DIVERGES without a
    safeguard (measured: crit 1e29 within 250 iterations); the
    runaway/stall triggers must cold-restart those lanes at the canonical
    stepsize so every lane still converges, within ~25% of the
    restart-only counts."""
    A, b, lam, Lf = _lasso_problems(8, 40, 160, seed=3, lam_frac=0.02)
    tol = 1e-5
    z_s, it_s, d_s = solve_lasso_batch(
        A, b, lam, Lf, tol, maxit=20000, restart=True, step_mult=1.5,
        use_kernel=False)
    z_r, it_r, d_r = solve_lasso_batch(
        A, b, lam, Lf, tol, maxit=20000, restart=True, use_kernel=False)
    assert bool(jnp.all(d_s)), np.asarray(it_s)
    assert _canonical_recheck(A, b, lam, Lf, z_s) <= tol * 1.05
    # bounded detection overhead: worst case = detection + textbook
    assert float(jnp.max(it_s)) <= 1.3 * float(jnp.max(it_r))


def test_step_mult_validation():
    A, b, lam, Lf = _lasso_problems(4, 16, 128)
    with pytest.raises(ValueError, match="outside"):
        solve_lasso_batch(A, b, lam, Lf, 1e-5, restart=True, step_mult=2.5)
    with pytest.raises(ValueError, match="requires restart"):
        solve_lasso_batch(A, b, lam, Lf, 1e-5, step_mult=1.5)
    with pytest.raises(ValueError, match="mf"):
        solve_lasso_batch(A, b, lam, Lf, 1e-5, restart=True, step_mult=1.5,
                          mf=0.5)


def test_step_mult_one_is_bitexact_default():
    """step_mult=1.0 must take the ORIGINAL code path — bit-identical
    results to not passing it at all (the parity tests pin that path)."""
    A, b, lam, Lf = _lasso_problems(5, 24, 128, seed=2)
    z1, it1, d1 = solve_lasso_batch(A, b, lam, Lf, 1e-5, maxit=2000,
                                    restart=True, use_kernel=False)
    z2, it2, d2 = solve_lasso_batch(A, b, lam, Lf, 1e-5, maxit=2000,
                                    restart=True, use_kernel=False,
                                    step_mult=1.0)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(it1), np.asarray(it2))


def _en_problems(B_=6, M_=40, N_=160, seed=0):
    A, b, lam1, Lf = _lasso_problems(B_, M_, N_, seed=seed)
    rng = np.random.default_rng(seed + 100)
    lam2 = jnp.asarray(0.05 + 0.1 * rng.random(B_), jnp.float32)
    return A, b, lam1, lam2, Lf


def test_elastic_net_kernel_matches_generic_driver():
    """The lam2 (elastic net) route: soft threshold + per-lane
    1/(1+gamma*lam2) shrink rides the fused kernel; counts/solutions
    match the generic FISTA driver with the combined ElasticNet prox
    (the XLA route near-exactly; kernel within f32 tail knife edges —
    elastic-net residuals plateau near the threshold, so reduction-order
    noise moves the crossing by more than lasso's +-1)."""
    from proxtpu.algorithms import make_fast_forward_backward_iteration
    from proxtpu.parallel import BatchedAlgorithm
    from proxtpu.prox import ElasticNet, LeastSquaresLoss

    A, b, lam1, lam2, Lf = _en_problems()
    B_, N_ = A.shape[0], A.shape[2]
    tol = 1e-5
    gen = BatchedAlgorithm(make_fast_forward_backward_iteration,
                           maxit=3000, tol=tol, use_kernels=False)
    xs_g, it_g, d_g = gen(x0=jnp.zeros((B_, N_), jnp.float32),
                          f=LeastSquaresLoss(A, b),
                          g=ElasticNet(mu=lam1, lam=lam2), Lf=Lf)
    assert bool(jnp.all(d_g))
    for kw, it_slack in ((dict(use_kernel=False), 3),
                         (dict(use_kernel=True, interpret=True), 30)):
        z, it, d = solve_lasso_batch(A, b, lam1, Lf, tol, maxit=3000,
                                     lam2=lam2, **kw)
        assert bool(jnp.all(d))
        np.testing.assert_allclose(np.asarray(z), np.asarray(xs_g),
                                   atol=1e-3)
        assert int(np.max(np.abs(np.asarray(it) - np.asarray(it_g)))) \
            <= it_slack


def test_elastic_net_multirhs_and_restart():
    """Shared-A elastic net rides the MXU multirhs formulation; restart
    composes with lam2 (measured ~3x count cut on this set)."""
    from proxtpu.algorithms import make_fast_forward_backward_iteration
    from proxtpu.kernels.lasso import solve_lasso_multirhs
    from proxtpu.parallel import BatchedAlgorithm
    from proxtpu.prox import ElasticNet, LeastSquaresLoss

    A, b, lam1, lam2, Lf = _en_problems()
    B_, N_ = A.shape[0], A.shape[2]
    tol = 1e-5
    A1, Lf1 = A[0], float(Lf[0])
    z_m, it_m, d_m = solve_lasso_multirhs(A1, b, lam1, Lf1, tol,
                                          maxit=3000, lam2=lam2)
    gen = BatchedAlgorithm(make_fast_forward_backward_iteration,
                           maxit=3000, tol=tol, use_kernels=False)
    xs_g, it_g, d_g = gen(x0=jnp.zeros((B_, N_), jnp.float32),
                          f=LeastSquaresLoss(A1, b),
                          g=ElasticNet(mu=lam1, lam=lam2), Lf=Lf1)
    assert bool(jnp.all(d_m)) and bool(jnp.all(d_g))
    np.testing.assert_allclose(np.asarray(z_m), np.asarray(xs_g),
                               atol=1e-3)
    # restart on the lam2 kernel route
    z_r, it_r, d_r = solve_lasso_batch(A, b, lam1, Lf, tol, maxit=3000,
                                       lam2=lam2, restart=True,
                                       use_kernel=True, interpret=True)
    assert bool(jnp.all(d_r))
    z_p, it_p, d_p = solve_lasso_batch(A, b, lam1, Lf, tol, maxit=3000,
                                       lam2=lam2, use_kernel=True,
                                       interpret=True)
    assert float(jnp.mean(it_r)) < 0.6 * float(jnp.mean(it_p))
    np.testing.assert_allclose(np.asarray(z_r), np.asarray(z_p), atol=1e-3)


def test_elastic_net_lam2_validation():
    A, b, lam1, lam2, Lf = _en_problems(4, 16, 128)
    with pytest.raises(ValueError, match="lam2"):
        solve_lasso_batch(A, b, lam1, Lf, 1e-5, lam2=lam2, mf=0.5)
    with pytest.raises(ValueError, match="lam2"):
        solve_lasso_batch(A, b, lam1, Lf, 1e-5, lam2=lam2, restart=True,
                          step_mult=1.5)


def test_packed_tail_solver():
    """Two-phase tail solver (round 5): both cond branches converge every
    lane to the shared criterion; solutions sit in the same tol-ball as
    the single-phase solve; phase-boundary restart may change counts."""
    from proxtpu.kernels.lasso import (
        solve_lasso_batch_packed,
        solve_lasso_batch_packed_tail,
    )

    rng = np.random.default_rng(5)
    Bq, Mq, Nq = 8, 16, 160
    A = jnp.asarray((rng.standard_normal((Bq, Mq, Nq)) / np.sqrt(Mq))
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal((Bq, Mq)).astype(np.float32))
    lam = jnp.asarray(0.1 * np.max(np.abs(np.einsum(
        "bmn,bm->bn", np.asarray(A), np.asarray(b))), axis=1), jnp.float32)
    Lf = jnp.asarray([np.linalg.norm(np.asarray(A[i]), 2) ** 2
                      for i in range(Bq)], jnp.float32)
    tol = 1e-5
    z0, i0, d0 = solve_lasso_batch_packed(
        A, b, lam, Lf, tol, maxit=3000, interpret=True, restart=True)
    # narrow branch: k1 past the median, tail wide enough
    z1, i1, d1 = solve_lasso_batch_packed_tail(
        A, b, lam, Lf, tol, maxit=3000, k1=int(np.median(np.asarray(i0))),
        tail=Bq // 2, restart=True, interpret=True)
    assert bool(jnp.all(d1))
    assert float(jnp.max(_fb_residual(A, b, lam, Lf, z1))) <= 1.1 * tol
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-3)
    # wide fallback branch: k1 tiny so the tail cannot fit
    z2, i2, d2 = solve_lasso_batch_packed_tail(
        A, b, lam, Lf, tol, maxit=3000, k1=5, tail=1, restart=True,
        interpret=True)
    assert bool(jnp.all(d2))
    assert float(jnp.max(_fb_residual(A, b, lam, Lf, z2))) <= 1.1 * tol
    # k1 >= maxit degrades to the single-phase solve
    z3, i3, d3 = solve_lasso_batch_packed_tail(
        A, b, lam, Lf, tol, maxit=100, k1=100, tail=4, restart=True,
        interpret=True)
    assert (np.asarray(i3) <= 100).all()
    # maxit < k1: phase 1 is capped at maxit (regression: it used to run
    # the full k1 iterations)
    z4, i4, d4 = solve_lasso_batch_packed_tail(
        A, b, lam, Lf, 1e-12, maxit=7, k1=100, tail=4, restart=True,
        interpret=True)
    assert (np.asarray(i4) <= 7).all()
    with np.testing.assert_raises(ValueError):
        solve_lasso_batch_packed_tail(
            A, b, lam, Lf, tol, tail=0, interpret=True)
    # scalar lam/Lf accepted like the packed solver (regression: the
    # narrow-branch gather used to crash on non-array parameters)
    z5, i5, d5 = solve_lasso_batch_packed_tail(
        A, b, 0.05, float(jnp.max(Lf)), tol, maxit=3000,
        k1=int(np.median(np.asarray(i0))), tail=4, restart=True,
        interpret=True)
    assert bool(jnp.all(d5))
