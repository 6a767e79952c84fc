"""Tests for the batch-on-lanes Pallas kernels (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.linalg import expm as scipy_expm

from qiskit_dynamics_tpu.ops.batched_linalg import (
    matmul_bol,
    expm_taylor_bol,
    to_bol,
    from_bol,
)


def _random_batch(rng, B, n, scale=1.0):
    return scale * (
        rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
    ).astype(np.complex64)


class TestMatmulBol:
    def test_matches_einsum(self):
        rng = np.random.default_rng(0)
        B, n = 128, 8
        A = _random_batch(rng, B, n)
        Bm = _random_batch(rng, B, n)
        Ar, Ai = to_bol(jnp.asarray(A))
        Br, Bi = to_bol(jnp.asarray(Bm))
        Cr, Ci = matmul_bol(Ar, Ai, Br, Bi, interpret=True, tile_b=128)
        C = np.asarray(from_bol(Cr, Ci))
        expected = A @ Bm
        np.testing.assert_allclose(C, expected, atol=1e-4, rtol=1e-4)

    def test_roundtrip_layout(self):
        rng = np.random.default_rng(1)
        A = _random_batch(rng, 8, 4)
        Ar, Ai = to_bol(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(from_bol(Ar, Ai)), A, atol=1e-7)


class TestExpmBol:
    def test_matches_scipy(self):
        rng = np.random.default_rng(2)
        B, n = 128, 8
        X = _random_batch(rng, B, n, scale=0.2)
        Xr, Xi = to_bol(jnp.asarray(X))
        Pr, Pi = expm_taylor_bol(Xr, Xi, order=10, squarings=1, interpret=True, tile_b=128)
        P = np.asarray(from_bol(Pr, Pi))
        expected = np.stack([scipy_expm(x.astype(np.complex128)) for x in X])
        np.testing.assert_allclose(P, expected, atol=2e-5, rtol=2e-4)

    def test_identity_at_zero(self):
        n, B = 4, 128
        Xr = jnp.zeros((n, n, B), dtype=jnp.float32)
        Pr, Pi = expm_taylor_bol(Xr, Xr, order=6, squarings=0, interpret=True, tile_b=128)
        P = np.asarray(from_bol(Pr, Pi))
        np.testing.assert_allclose(P, np.broadcast_to(np.eye(n), (B, n, n)), atol=1e-6)

    def test_bwd_kernel_matches_xla_twin_oracle(self):
        """The Pallas backward (stage-resident reverse sweep) equals jax.vjp
        through the XLA re-evaluation of the identical recursion, to
        machine precision, across squarings counts."""
        from qiskit_dynamics_tpu.ops.batched_linalg import (
            expm_taylor_bol_bwd,
            _xla_twin_vjp,
        )

        rng = np.random.default_rng(3)
        n, L, order = 5, 16, 8
        for squarings in (0, 1, 3):
            Xr = jnp.asarray(rng.normal(size=(n, n, L)) * 0.3)
            Xi = jnp.asarray(rng.normal(size=(n, n, L)) * 0.3)
            CTr = jnp.asarray(rng.normal(size=(n, n, L)))
            CTi = jnp.asarray(rng.normal(size=(n, n, L)))
            g_ref = _xla_twin_vjp(Xr, Xi, CTr, CTi, order, squarings)
            g_pl = expm_taylor_bol_bwd(
                Xr, Xi, CTr, CTi, order, squarings, interpret=True, tile_b=16
            )
            np.testing.assert_allclose(np.asarray(g_ref[0]), np.asarray(g_pl[0]), atol=1e-12)
            np.testing.assert_allclose(np.asarray(g_ref[1]), np.asarray(g_pl[1]), atol=1e-12)

    def test_ad_wrapper_grad_matches_fd(self):
        """jax.grad through expm_taylor_bol_ad (Pallas fwd + Pallas bwd)
        checked against central finite differences on a scalar loss."""
        from qiskit_dynamics_tpu.ops.batched_linalg import expm_taylor_bol_ad

        rng = np.random.default_rng(4)
        n, L = 3, 8
        X0r = jnp.asarray(rng.normal(size=(n, n, L)) * 0.2)
        X0i = jnp.asarray(rng.normal(size=(n, n, L)) * 0.2)
        D = jnp.asarray(rng.normal(size=(n, n, L)))

        def loss(a):
            pr, pi = expm_taylor_bol_ad(X0r * a, X0i * a, 8, 1, True, 8)
            return jnp.sum(pr * D) + jnp.sum(pi * D**2)

        g = float(jax.grad(loss)(0.7))
        eps = 1e-6
        fd = (float(loss(0.7 + eps)) - float(loss(0.7 - eps))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-6)


class TestFusedSweepSolver:
    def test_fused_matches_generic_path(self):
        import jax
        from qiskit_dynamics_tpu.benchmarks import cr_solver, fused_cr_sweep
        from qiskit_dynamics_tpu import Signal

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        amps = jnp.array([0.3, 0.75, 1.0])
        T, dt = 2.0, 0.5
        out = fused_cr_sweep(solver, w1, amps, t_final=T, dt=dt, tile_b=128, interpret=True)

        def ref(amp):
            sig = Signal(lambda t: amp * 0.02, carrier_freq=w1)
            res = solver.solve(
                t_span=[0.0, T], y0=y0, signals=[sig], method="jax_expm",
                max_dt=dt, magnus_order=2, expm_method="taylor",
                expm_order=8, expm_squarings=0,
            )
            return jnp.abs(res.y[-1]) ** 2

        expected = jax.vmap(ref)(amps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-10)

    def test_hermitian_kernel_path_matches_general(self):
        # anti-Hermitian generators: the one-matmul commutator path
        # (hermitian=True) must agree with the two-matmul general path
        from qiskit_dynamics_tpu.ops.sweep_solver import sweep_expm_magnus2

        rng = np.random.default_rng(1)
        n, k, T, B = 6, 2, 15, 8
        dt, t0 = 0.05, 0.2
        ah = lambda a: (a - a.conj().T) / 2
        H0 = ah(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        ops = np.array(
            [ah(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))) for _ in range(k)]
        )
        w = rng.normal(size=n)
        omega = w[None, :] - w[:, None]
        coef = rng.normal(size=(T, 2, k, B))
        y0 = rng.normal(size=(n, B)) + 1j * rng.normal(size=(n, B))
        kw = dict(dt=dt, t0=t0, order=10, tile_b=B, interpret=True)
        a = sweep_expm_magnus2(H0, ops, omega, coef, y0, hermitian=False, **kw)
        b = sweep_expm_magnus2(H0, ops, omega, coef, y0, hermitian=True, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_xla_engine_matches_pallas_kernel(self):
        # batch-major XLA engine (large-dim path): identical polynomial
        from qiskit_dynamics_tpu.ops.sweep_solver import sweep_expm_magnus2
        from qiskit_dynamics_tpu.ops.xla_sweep import sweep_expm_magnus2_xla

        rng = np.random.default_rng(5)
        n, k, T, B = 6, 2, 12, 8
        H0 = 0.3 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        ops = 0.3 * (rng.normal(size=(k, n, n)) + 1j * rng.normal(size=(k, n, n)))
        w = rng.normal(size=n)
        omega = w[None, :] - w[:, None]
        coef = rng.normal(size=(T, 2, k, B))
        y0 = rng.normal(size=(n, B)) + 1j * rng.normal(size=(n, B))
        a = sweep_expm_magnus2(
            H0, ops, omega, coef, y0, dt=0.04, t0=0.1, order=10, tile_b=B,
            interpret=True,
        )
        b = sweep_expm_magnus2_xla(H0, ops, omega, coef, y0, dt=0.04, t0=0.1, order=10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)

    def test_xla_engine_large_dim_lindblad(self):
        # dim-8 open system -> solve_dim 64: auto-selects the xla engine
        # (the pallas kernel's unrolled loops are a compile hazard there);
        # cross-check against the generic adaptive solver
        import jax
        from qiskit_dynamics_tpu.models import LindbladModel
        from qiskit_dynamics_tpu import Signal, Solver
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve

        dim = 8
        a_op = np.diag(np.sqrt(np.arange(1, dim)), 1)
        N = np.diag(np.arange(dim, dtype=float))
        H0 = 2 * np.pi * (5.0 * N - 0.33 / 2 * (N @ N - N))
        Hd = 2 * np.pi * 0.02 * (a_op + a_op.conj().T)
        model = LindbladModel(
            static_hamiltonian=H0,
            hamiltonian_operators=[Hd],
            static_dissipators=[np.sqrt(0.01) * a_op],
            rotating_frame=np.diag(H0),
            vectorized=True,
        )
        rho0 = np.zeros((dim, dim), dtype=complex)
        rho0[1, 1] = 1.0
        amps = jnp.array([0.4, 1.0])
        T = 1.0

        def signals_fn(amp):
            return ([Signal(lambda t: amp, carrier_freq=5.0)], None)

        out = fused_sweep_solve(
            model, signals_fn, amps, t_span=(0.0, T), max_dt=0.005, y0=rho0,
        )
        assert out.shape == (2, dim, dim)
        solver = Solver(
            static_hamiltonian=H0,
            hamiltonian_operators=[Hd],
            static_dissipators=[np.sqrt(0.01) * a_op],
            rotating_frame=np.diag(H0),
        )
        for i, amp in enumerate([0.4, 1.0]):
            res = solver.solve(
                t_span=[0.0, T], y0=rho0,
                signals=[Signal(lambda t, amp=amp: amp, carrier_freq=5.0)],
                method="tpu_dopri5", atol=1e-10, rtol=1e-10,
            )
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(res.y[-1]), atol=5e-7
            )

    def test_fused_sweep_gradient_matches_finite_differences(self):
        # custom-vjp path: Pallas primal, XLA-engine adjoint (ops/sweep_ad.py)
        import jax
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve
        from qiskit_dynamics_tpu import Signal

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        T = 2.0

        def signals_fn(amp):
            return [Signal(lambda t: amp * 0.02, carrier_freq=w1)]

        def loss(amps):
            yf = fused_sweep_solve(
                solver.model, signals_fn, amps, t_span=(0.0, T), max_dt=0.5,
                y0=y0, tile_b=8, interpret=True,
                rwa_signal_map=solver._rwa_signal_map,
            )
            return jnp.mean(jnp.abs(yf[:, 1]) ** 2)

        amps = jnp.array([0.3, 0.75, 1.0, 0.5, 0.2, 0.9, 0.6, 0.1])
        g = np.asarray(jax.grad(loss)(amps))
        eps = 1e-6
        for i in (0, 3, 7):
            ap = np.asarray(amps).copy()
            am = ap.copy()
            ap[i] += eps
            am[i] -= eps
            fd = (float(loss(jnp.asarray(ap))) - float(loss(jnp.asarray(am)))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, atol=1e-9)

    def test_t_eval_trajectories_match_generic_solver(self):
        import jax
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.exceptions import DynamicsError
        import pytest

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        T, dtmax = 2.0, 0.5
        amps = jnp.array([0.3, 0.75, 1.0, 0.5])

        def signals_fn(amp):
            return [Signal(lambda t: amp * 0.02, carrier_freq=w1)]

        t_eval = [0.0, 0.5, 1.0, 2.0]
        kw = dict(
            t_span=(0.0, T), max_dt=dtmax, y0=y0,
            rwa_signal_map=solver._rwa_signal_map, t_eval=t_eval,
        )
        traj = fused_sweep_solve(
            solver.model, signals_fn, amps, tile_b=4, interpret=True, **kw
        )
        traj_x = fused_sweep_solve(
            solver.model, signals_fn, amps, sweep_engine="xla", **kw
        )
        assert traj.shape == (4, 4, 4)
        np.testing.assert_allclose(np.asarray(traj), np.asarray(traj_x), atol=1e-12)

        def ref(amp):
            sig = Signal(lambda t, a=amp: a * 0.02, carrier_freq=w1)
            res = solver.solve(
                t_span=[0.0, T], y0=y0, signals=[sig], method="jax_expm",
                max_dt=dtmax, magnus_order=2, expm_method="taylor",
                expm_order=8, expm_squarings=0, t_eval=t_eval,
            )
            return np.asarray(res.y)

        for b, a in enumerate(np.asarray(amps)):
            np.testing.assert_allclose(
                np.asarray(traj[b]), ref(float(a)), atol=1e-10
            )

        # off-grid and decreasing t_eval rejected
        with pytest.raises(DynamicsError, match="grid"):
            fused_sweep_solve(
                solver.model, signals_fn, amps, tile_b=4, interpret=True,
                t_span=(0.0, T), max_dt=dtmax, y0=y0,
                rwa_signal_map=solver._rwa_signal_map, t_eval=[0.3],
            )
        with pytest.raises(DynamicsError, match="increasing"):
            fused_sweep_solve(
                solver.model, signals_fn, amps, tile_b=4, interpret=True,
                t_span=(0.0, T), max_dt=dtmax, y0=y0,
                rwa_signal_map=solver._rwa_signal_map, t_eval=[1.0, 0.5],
            )

    def test_unitary_sweep_engines_agree_and_dup_teval_rejected(self):
        # review fixes: batch-major (B, n, m) xla path for matrix y0 (shared
        # generator per member), and duplicate-step t_eval rejection
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.exceptions import DynamicsError
        import pytest

        solver, w1 = cr_solver(dim=2)
        y0 = np.eye(4, dtype=complex)  # m = 4 columns per member
        amps = jnp.array([0.3, 0.75, 1.0])

        def signals_fn(amp):
            return [Signal(lambda t: amp * 0.02, carrier_freq=w1)]

        kw = dict(
            t_span=(0.0, 2.0), max_dt=0.5, y0=y0,
            rwa_signal_map=solver._rwa_signal_map,
        )
        a = fused_sweep_solve(
            solver.model, signals_fn, amps, tile_b=12, interpret=True, **kw
        )
        b = fused_sweep_solve(
            solver.model, signals_fn, amps, sweep_engine="xla", **kw
        )
        assert a.shape == (3, 4, 4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)
        t_eval = [0.5, 1.0, 2.0]
        at = fused_sweep_solve(
            solver.model, signals_fn, amps, tile_b=12, interpret=True,
            t_eval=t_eval, **kw,
        )
        bt = fused_sweep_solve(
            solver.model, signals_fn, amps, sweep_engine="xla", t_eval=t_eval, **kw
        )
        assert at.shape == (3, 3, 4, 4)
        np.testing.assert_allclose(np.asarray(at), np.asarray(bt), atol=1e-13)
        with pytest.raises(DynamicsError, match="same fixed step"):
            fused_sweep_solve(
                solver.model, signals_fn, amps, tile_b=12, interpret=True,
                t_eval=[0.5 - 1e-8, 0.5 + 1e-8], **kw,
            )

    def test_lindblad_t_eval_trajectory(self):
        # vectorized-Lindblad branch of the trajectory collector
        from qiskit_dynamics_tpu.models import LindbladModel
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve
        from qiskit_dynamics_tpu import Signal, Solver

        X = np.array([[0, 1], [1, 0]], dtype=complex)
        Z = np.array([[1, 0], [0, -1]], dtype=complex)
        sm = np.array([[0, 1], [0, 0]], dtype=complex)
        H0 = 2 * np.pi * 5.0 * Z / 2
        Hd = 2 * np.pi * 0.1 * X / 2
        model = LindbladModel(
            static_hamiltonian=H0,
            hamiltonian_operators=[Hd],
            static_dissipators=[np.sqrt(0.02) * sm],
            rotating_frame=np.diag(H0),
            vectorized=True,
        )
        rho0 = np.array([[1.0, 0], [0, 0]], dtype=complex)
        amps = jnp.array([0.4, 1.0])
        T, dtmax = 1.0, 0.01
        t_eval = [0.5, 1.0]

        def signals_fn(amp):
            return ([Signal(lambda t: amp, carrier_freq=5.0)], None)

        traj = fused_sweep_solve(
            model, signals_fn, amps, t_span=(0.0, T), max_dt=dtmax, y0=rho0,
            tile_b=2, interpret=True, t_eval=t_eval,
        )
        assert traj.shape == (2, 2, 2, 2)
        solver = Solver(
            static_hamiltonian=H0,
            hamiltonian_operators=[Hd],
            static_dissipators=[np.sqrt(0.02) * sm],
            rotating_frame=np.diag(H0),
        )
        for i, amp in enumerate([0.4, 1.0]):
            res = solver.solve(
                t_span=[0.0, T], y0=rho0,
                signals=[Signal(lambda t, amp=amp: amp, carrier_freq=5.0)],
                method="tpu_dopri5", atol=1e-12, rtol=1e-12, t_eval=t_eval,
            )
            for j in range(len(t_eval)):
                np.testing.assert_allclose(
                    np.asarray(traj[i, j]), np.asarray(res.y[j]), atol=5e-7
                )

    def test_anti_hermitian_detection(self):
        from qiskit_dynamics_tpu.solvers.fused_sweep import _all_anti_hermitian

        X = np.array([[0, 1], [1, 0]], dtype=complex)
        assert _all_anti_hermitian(-1j * X, np.array([-1j * X]))
        assert not _all_anti_hermitian(X, np.array([-1j * X]))
        assert not _all_anti_hermitian(-1j * X, np.array([X]))
        # zero static op (common: all dynamics in the frame) counts
        assert _all_anti_hermitian(np.zeros((2, 2)), np.array([-1j * X]))

    def test_fused_sweep_validations(self):
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.exceptions import DynamicsError
        import pytest

        solver, w1 = cr_solver()
        model = solver.model
        y0 = np.zeros(16, dtype=complex)
        y0[0] = 1.0
        ok_fn = lambda amp: [Signal(lambda t: amp, carrier_freq=w1)]

        with pytest.raises(DynamicsError, match="t_span\\[1\\]"):
            fused_sweep_solve(model, ok_fn, jnp.array([0.1]), t_span=(0.0, -1.0),
                              max_dt=0.5, y0=y0, interpret=True)
        # signal count mismatch vs the RWA'd model's operator count
        with pytest.raises(DynamicsError, match="signals"):
            fused_sweep_solve(
                model, ok_fn, jnp.array([0.1]), t_span=(0.0, 1.0),
                max_dt=0.5, y0=y0, interpret=True,
            )


class TestLockstepAdaptiveSweep:
    def _setup(self):
        from qiskit_dynamics_tpu import Solver

        nu, r = 5.0, 0.1
        Xm = np.array([[0, 1], [1, 0]], dtype=complex)
        Zm = np.diag([1, -1]).astype(complex)
        solver = Solver(
            static_hamiltonian=2 * np.pi * nu * Zm / 2,
            hamiltonian_operators=[2 * np.pi * r * Xm / 2],
            rotating_frame=2 * np.pi * nu * Zm / 2,
        )
        model = solver.model
        coll = model._operator_collection
        d = np.asarray(model.rotating_frame.frame_diag)
        return solver, nu, (
            np.asarray(coll.static_operator),
            np.asarray(coll.operators),
            np.imag(d)[None, :] - np.imag(d)[:, None],
        )

    def test_matches_generic_adaptive(self):
        import jax
        from qiskit_dynamics_tpu.ops.adaptive_sweep import sweep_dopri5_lockstep
        from qiskit_dynamics_tpu import Signal

        solver, nu, (static_fb, ops_fb, omega) = self._setup()
        B, T = 8, 10.0
        amps = np.linspace(0.2, 1.0, B)
        y0 = np.zeros((2, B), dtype=complex)
        y0[0] = 1.0
        out = sweep_dopri5_lockstep(
            jnp.asarray(static_fb), jnp.asarray(ops_fb), jnp.asarray(omega),
            jnp.asarray([2 * np.pi * nu]), jnp.asarray(amps[None, :], dtype=complex),
            jnp.asarray(y0), tf=T, atol=1e-8, rtol=1e-8, h0=0.01,
            tile_b=8, interpret=True,
        )
        pop1 = np.abs(np.asarray(out))[1] ** 2

        def ref(amp):
            sig = Signal(lambda t: amp, carrier_freq=nu)
            res = solver.solve(t_span=[0.0, T], y0=y0[:, 0], signals=[sig],
                               method="tpu_dopri5", atol=1e-10, rtol=1e-10)
            return jnp.abs(res.y[-1][1]) ** 2

        expected = np.asarray(jax.vmap(ref)(jnp.asarray(amps)))
        np.testing.assert_allclose(pop1, expected, atol=2e-5)

    def test_bucket_lanes_permutation_roundtrip(self):
        """Stiffness bucketing must be a pure permutation: identical results
        (up to step-control differences) and correct member order."""
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve
        from qiskit_dynamics_tpu import Signal

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        # deliberately shuffled heterogeneous amplitudes
        amps = jnp.array([1.0, 0.05, 0.6, 0.2, 0.9, 0.1, 0.4, 0.75])
        sig_fn = lambda a: [Signal(lambda t: a * 0.02, carrier_freq=w1)]
        kwargs = dict(
            t_span=(0.0, 2.0), y0=y0, tile_b=4, interpret=True,
            rwa_signal_map=solver._rwa_signal_map,
        )
        out_b = fused_adaptive_sweep_solve(solver.model, sig_fn, amps, **kwargs)
        out_nb = fused_adaptive_sweep_solve(
            solver.model, sig_fn, amps, bucket_lanes=False, **kwargs
        )
        # member identity preserved: both match DOP853 per member
        for i, a in enumerate(np.asarray(amps)):
            ref = solver.solve(
                t_span=[0.0, 2.0], y0=y0, signals=sig_fn(float(a)),
                method="DOP853", atol=1e-12, rtol=1e-12,
            )
            np.testing.assert_allclose(
                np.asarray(out_b[i]), np.asarray(ref.y[-1]), atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(out_nb[i]), np.asarray(ref.y[-1]), atol=2e-5
            )

    def test_budget_exhaustion_poisons(self):
        from qiskit_dynamics_tpu.ops.adaptive_sweep import sweep_dopri5_lockstep

        _, nu, (static_fb, ops_fb, omega) = self._setup()
        y0 = np.zeros((2, 8), dtype=complex)
        y0[0] = 1.0
        out = sweep_dopri5_lockstep(
            jnp.asarray(static_fb), jnp.asarray(ops_fb), jnp.asarray(omega),
            jnp.asarray([2 * np.pi * nu]),
            jnp.ones((1, 8), dtype=complex),
            jnp.asarray(y0), tf=10.0, atol=1e-8, rtol=1e-8, h0=0.01,
            max_steps=3, tile_b=8, interpret=True,
        )
        assert np.isnan(np.asarray(out)).all()


class TestFusedAdaptiveSweepSolve:
    def test_matches_dop853(self):
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve
        from qiskit_dynamics_tpu import Signal

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        amps = jnp.array([0.3, 1.0])
        T = 2.0
        out = fused_adaptive_sweep_solve(
            solver.model,
            lambda a: [Signal(lambda t: a * 0.02, carrier_freq=w1)],
            amps, t_span=(0.0, T), y0=y0, atol=1e-9, rtol=1e-9, h0=0.01,
            tile_b=128, interpret=True, rwa_signal_map=solver._rwa_signal_map,
        )
        pops = np.abs(np.asarray(out)) ** 2
        for i, a in enumerate([0.3, 1.0]):
            ref = solver.solve(
                t_span=[0.0, T], y0=y0,
                signals=[Signal(lambda t, a=a: a * 0.02, carrier_freq=w1)],
                method="DOP853", atol=1e-12, rtol=1e-12,
            )
            np.testing.assert_allclose(
                pops[i], np.abs(np.asarray(ref.y[-1])) ** 2, atol=1e-5
            )

    def test_unitary_sweep_2d_y0(self):
        """y0 = identity -> per-member unitaries via column-to-lane mapping."""
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve
        from qiskit_dynamics_tpu import Signal

        solver, w1 = cr_solver(dim=2)
        dim = solver.model.dim
        amps = jnp.array([0.3, 0.9])
        T = 2.0
        fn = lambda a: [Signal(lambda t: a * 0.02, carrier_freq=w1)]
        U = fused_sweep_solve(
            solver.model, fn, amps, t_span=(0.0, T), max_dt=0.5,
            y0=np.eye(dim, dtype=complex), tile_b=8, interpret=True,
            rwa_signal_map=solver._rwa_signal_map,
        )
        assert U.shape == (2, dim, dim)
        for i, a in enumerate([0.3, 0.9]):
            sig = Signal(lambda t, a=a: a * 0.02, carrier_freq=w1)
            ref = solver.solve(
                t_span=[0.0, T], y0=np.eye(dim, dtype=complex), signals=[sig],
                method="jax_expm", max_dt=0.5, magnus_order=2,
                expm_method="taylor", expm_order=8, expm_squarings=0,
            )
            np.testing.assert_allclose(
                np.asarray(U[i]), np.asarray(ref.y[-1]), atol=1e-9
            )

    def test_envelope_table_pulse_sweep(self):
        """Piecewise-constant envelope tables: Gaussian-pulse amplitude sweep
        matches DOP853 on the identical DiscreteSignal."""
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve
        from qiskit_dynamics_tpu import Signal, DiscreteSignal

        solver, w1 = cr_solver(dim=2)
        model = solver.model
        dim = model.dim
        y0 = np.zeros(dim, dtype=complex)
        y0[0] = 1.0
        T, S = 4.0, 80
        env_dt = T / S
        amps = jnp.array([0.5, 1.0])

        def signals_fn(a):
            return [Signal(
                lambda t: a * 0.1 * jnp.exp(-((t - T / 2) ** 2) / (2 * 0.8**2)),
                carrier_freq=w1,
            )]

        out = fused_adaptive_sweep_solve(
            model, signals_fn, amps, t_span=(0.0, T), y0=y0, atol=1e-9, rtol=1e-9,
            h0=0.005, tile_b=8, interpret=True,
            rwa_signal_map=solver._rwa_signal_map, envelope_resolution=S,
        )
        pops = np.abs(np.asarray(out)) ** 2
        ts = (np.arange(S) + 0.5) * env_dt
        for i, a in enumerate([0.5, 1.0]):
            samples = a * 0.1 * np.exp(-((ts - T / 2) ** 2) / (2 * 0.8**2))
            dsig = DiscreteSignal(dt=env_dt, samples=samples.astype(complex),
                                  carrier_freq=w1)
            ref = solver.solve(t_span=[0.0, T], y0=y0, signals=[dsig],
                               method="DOP853", atol=1e-12, rtol=1e-12)
            np.testing.assert_allclose(
                pops[i], np.abs(np.asarray(ref.y[-1])) ** 2, atol=1e-5
            )

    def test_envelope_table_with_t_eval(self):
        """Both step-clipping mechanisms combined: envelope-cell boundaries
        AND arbitrary trajectory times — trajectory matches DOP853 on the
        identical DiscreteSignal at every t_eval point."""
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve
        from qiskit_dynamics_tpu import Signal, DiscreteSignal

        solver, w1 = cr_solver(dim=2)
        model = solver.model
        dim = model.dim
        y0 = np.zeros(dim, dtype=complex)
        y0[0] = 1.0
        T, S = 4.0, 80
        env_dt = T / S
        amps = jnp.array([0.5, 1.0])
        t_eval = [1.3, 2.7, 4.0]  # off both grids except tf

        def signals_fn(a):
            return [Signal(
                lambda t: a * 0.1 * jnp.exp(-((t - T / 2) ** 2) / (2 * 0.8**2)),
                carrier_freq=w1,
            )]

        traj = fused_adaptive_sweep_solve(
            model, signals_fn, amps, t_span=(0.0, T), y0=y0, atol=1e-9,
            rtol=1e-9, h0=0.005, tile_b=8, interpret=True,
            rwa_signal_map=solver._rwa_signal_map, envelope_resolution=S,
            t_eval=t_eval,
        )
        assert traj.shape == (2, 3, dim)
        ts = (np.arange(S) + 0.5) * env_dt
        for i, a in enumerate([0.5, 1.0]):
            samples = a * 0.1 * np.exp(-((ts - T / 2) ** 2) / (2 * 0.8**2))
            dsig = DiscreteSignal(
                dt=env_dt, samples=samples.astype(complex), carrier_freq=w1
            )
            ref = solver.solve(
                t_span=[0.0, T], y0=y0, signals=[dsig], method="DOP853",
                atol=1e-12, rtol=1e-12, t_eval=t_eval,
            )
            np.testing.assert_allclose(
                np.abs(np.asarray(traj[i])) ** 2,
                np.abs(np.asarray(ref.y)) ** 2,
                atol=2e-5,
            )

    def test_lindblad_vectorized_fused_sweep(self):
        """Vectorized Lindblad sweeps through the fused kernel match the
        generic vectorized DOP853 solve."""
        from qiskit_dynamics_tpu.models import LindbladModel
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve
        from qiskit_dynamics_tpu import Signal, Solver
        from qiskit_dynamics_tpu.quantum_info import DensityMatrix

        nu, gamma = 5.0, 0.1
        Xm = np.array([[0, 1], [1, 0]], dtype=complex)
        Zm = np.diag([1, -1]).astype(complex)
        sm = np.array([[0, 1], [0, 0]], dtype=complex)
        kwargs = dict(
            static_hamiltonian=2 * np.pi * nu * Zm / 2,
            hamiltonian_operators=[2 * np.pi * 0.1 * Xm / 2],
            static_dissipators=[np.sqrt(gamma) * sm],
            rotating_frame=2 * np.pi * nu * Zm / 2,
            vectorized=True,
        )
        model = LindbladModel(**kwargs)
        solver = Solver(**kwargs)
        rho0 = np.zeros((2, 2), dtype=complex)
        rho0[1, 1] = 1.0
        T = 3.0
        amps = jnp.array([0.4, 1.0])
        signals_fn = lambda a: ([Signal(lambda t: a, carrier_freq=nu)], None)
        out = fused_sweep_solve(model, signals_fn, amps, t_span=(0.0, T),
                                max_dt=0.02, y0=rho0, tile_b=8, interpret=True)
        assert out.shape == (2, 2, 2)
        for i, a in enumerate([0.4, 1.0]):
            sig = Signal(lambda t, a=a: a, carrier_freq=nu)
            ref = solver.solve(t_span=[0.0, T], y0=DensityMatrix(rho0),
                               signals=[sig], method="DOP853",
                               atol=1e-12, rtol=1e-12)
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(ref.y[-1]), atol=1e-6
            )

    def test_adaptive_glue_rejects_carrier_sweep_and_nonconstant_envelope(self):
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.exceptions import DynamicsError
        import pytest

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        with pytest.raises(DynamicsError, match="carrier"):
            fused_adaptive_sweep_solve(
                solver.model, lambda f: [Signal(lambda t: 0.02, carrier_freq=f)],
                jnp.array([5.0, 5.2]), t_span=(0.0, 1.0), y0=y0,
                tile_b=8, interpret=True, rwa_signal_map=solver._rwa_signal_map,
            )
        with pytest.raises(DynamicsError, match="constant-envelope"):
            fused_adaptive_sweep_solve(
                solver.model, lambda a: [Signal(lambda t: a * np.exp(-t), carrier_freq=w1)],
                jnp.array([0.5, 1.0]), t_span=(0.0, 1.0), y0=y0,
                tile_b=8, interpret=True, rwa_signal_map=solver._rwa_signal_map,
            )


class TestAdaptiveTrajectories:
    def test_t_eval_matches_tpu_dopri5(self):
        """Adaptive steps clip to arbitrary (off-grid) t_eval points; the
        stored trajectory matches the generic adaptive solver, and the
        bucket-lanes permutation is correctly inverted on the batch axis."""
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve
        from qiskit_dynamics_tpu import Signal

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        T = 2.0
        amps = jnp.array([0.9, 0.2, 0.6, 0.4])  # shuffled: bucket un-permute

        def signals_fn(amp):
            return [Signal(lambda t: amp * 0.02, carrier_freq=w1)]

        t_eval = [0.0, 0.7, 1.3, 2.0]
        traj = fused_adaptive_sweep_solve(
            solver.model, signals_fn, amps, t_span=(0.0, T), y0=y0, tile_b=4,
            interpret=True, rwa_signal_map=solver._rwa_signal_map,
            t_eval=t_eval,
        )
        assert traj.shape == (4, 4, 4)
        for b, a in enumerate(np.asarray(amps)):
            sig = Signal(lambda t, a=a: a * 0.02, carrier_freq=w1)
            res = solver.solve(
                t_span=[0.0, T], y0=y0, signals=[sig], method="tpu_dopri5",
                atol=1e-10, rtol=1e-10, t_eval=t_eval,
            )
            np.testing.assert_allclose(
                np.asarray(traj[b]), np.asarray(res.y), atol=5e-6
            )


    def test_t_eval_validation(self):
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.exceptions import DynamicsError
        import pytest

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        amps = jnp.array([0.5, 1.0])

        def signals_fn(amp):
            return [Signal(lambda t: amp * 0.02, carrier_freq=w1)]

        kw = dict(
            t_span=(0.0, 2.0), y0=y0, tile_b=2, interpret=True,
            rwa_signal_map=solver._rwa_signal_map,
        )
        with pytest.raises(DynamicsError, match="increasing"):
            fused_adaptive_sweep_solve(
                solver.model, signals_fn, amps, t_eval=[1.0, 0.5], **kw
            )
        with pytest.raises(DynamicsError, match="within t_span"):
            fused_adaptive_sweep_solve(
                solver.model, signals_fn, amps, t_eval=[1.0, 3.0], **kw
            )
        with pytest.raises(DynamicsError, match="non-empty"):
            fused_adaptive_sweep_solve(
                solver.model, signals_fn, amps, t_eval=[], **kw
            )


class TestFusedAdaptiveLindblad:
    def test_vectorized_lindblad_matches_dop853(self):
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.models import LindbladModel
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve, solve_lmde

        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
        SM = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        nu = 1.0

        def build(vectorized):
            return LindbladModel(
                static_hamiltonian=2 * np.pi * nu * Z / 2,
                hamiltonian_operators=[2 * np.pi * X / 2],
                hamiltonian_signals=[Signal(0.05, carrier_freq=nu)],
                static_dissipators=[0.2 * SM],
                rotating_frame=np.diag(-1j * 2 * np.pi * nu * np.diag(Z) / 2),
                vectorized=vectorized,
            )

        vec = build(True)
        rho0 = np.array([[1.0, 0.0], [0.0, 0.0]], dtype=complex)
        amps = jnp.array([0.3, 1.0])
        sig_fn = lambda a: ([Signal(a * 0.05, carrier_freq=nu)], None)
        out = fused_adaptive_sweep_solve(
            vec, sig_fn, amps, t_span=(0.0, 3.0), y0=rho0, tile_b=8,
            interpret=True,
        )
        assert out.shape == (2, 2, 2)
        for i, a in enumerate([0.3, 1.0]):
            ref_model = build(True)
            ref_model.signals = ([Signal(a * 0.05, carrier_freq=nu)], None)
            res = solve_lmde(
                ref_model, t_span=[0.0, 3.0], y0=rho0.ravel(order="F"),
                method="DOP853", atol=1e-12, rtol=1e-12,
            )
            # solve_lmde already returns standard-basis (frame) values
            ref_rho = np.asarray(res.y[-1]).reshape((2, 2), order="F")
            np.testing.assert_allclose(np.asarray(out[i]), ref_rho, atol=2e-5)


class TestEvalSlotsValidation:
    def _args(self, T=6, n=2, k=1, B=8):
        rng = np.random.default_rng(7)
        H0 = 0.1 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        ops = 0.1 * (rng.normal(size=(k, n, n)) + 1j * rng.normal(size=(k, n, n)))
        omega = np.zeros((n, n))
        coef = rng.normal(size=(T, 2, k, B))
        y0 = rng.normal(size=(n, B)) + 1j * rng.normal(size=(n, B))
        return H0, ops, omega, coef, y0

    def test_duplicate_and_gapped_slots_rejected(self):
        import pytest
        from qiskit_dynamics_tpu.ops.sweep_solver import sweep_expm_magnus2
        from qiskit_dynamics_tpu.ops.xla_sweep import sweep_expm_magnus2_xla

        args = self._args()
        kw = dict(dt=0.1, tile_b=8, interpret=True)
        # duplicate slot value 0 (slot 1 written twice -> slot semantics broken)
        with pytest.raises(ValueError, match="permutation"):
            sweep_expm_magnus2(*args, eval_slots=(0, -1, 0, -1, -1, 1), **kw)
        # gapped: slot 1 missing -> would return uninitialized/zero memory
        with pytest.raises(ValueError, match="permutation"):
            sweep_expm_magnus2(*args, eval_slots=(-1, 0, -1, -1, 2, 3), **kw)
        with pytest.raises(ValueError, match="permutation"):
            sweep_expm_magnus2_xla(*args, dt=0.1, eval_slots=(-1, 0, -1, -1, 2, 3))
        # valid permutation (not sorted by step is fine) still works
        out, traj = sweep_expm_magnus2(
            *args, eval_slots=(1, -1, 0, -1, -1, 2), **kw
        )
        assert traj.shape[0] == 3


class TestLargePhaseTrig:
    """Phase range reduction (ops/trig_reduce.py): f32 kernels must stay
    accurate when frame/carrier phases reach hundreds of radians
    (T * nu >~ 100 carrier cycles — the dim-27 serving regime; VERDICT r2
    item 3). Without the EFT mod-2pi reduction these configs measured
    ~4e-3 error; with it they sit at the f32 arithmetic floor (~4e-6)."""

    def _config(self):
        rng = np.random.default_rng(3)
        n, k, T, B = 4, 1, 40, 8
        dt, t0 = 0.5, 100.0  # absolute times ~100-120, omega ~30 -> ~3600 rad
        ah = lambda a: (a - a.conj().T) / 2
        H0 = ah(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        ops = np.array([ah(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))])
        w = rng.normal(size=n) * 30.0
        omega = w[None, :] - w[:, None]
        coef = rng.normal(size=(T, 2, k, B))
        y0 = rng.normal(size=(n, B)) + 1j * rng.normal(size=(n, B))
        return H0, ops, omega, coef, y0, dt, t0, T

    def _f64_reference(self, H0, ops, omega, coef, y0, dt, t0, T, order=10):
        from qiskit_dynamics_tpu.ops.sweep_solver import _GAUSS_C1, _GAUSS_C2, _P2

        y = y0.astype(complex)
        for s in range(T):
            Gs = []
            for gi, c in enumerate((_GAUSS_C1, _GAUSS_C2)):
                tau = t0 + (s + c) * dt
                A = H0 + np.einsum("kb,kij->bij", coef[s, gi], ops)
                Gs.append(A * np.exp(1j * omega * tau)[None])
            G1, G2 = Gs
            M = 0.5 * dt * (G1 + G2) + _P2 * dt * dt * (G2 @ G1 - G1 @ G2)
            v = y.copy()
            for kk in range(order, 0, -1):
                v = y + np.einsum("bij,jb->ib", M, v) / kk
            y = v
        return y

    def test_fixed_step_f32_kernels_match_f64_polynomial(self):
        # must run WITHOUT x64 so the kernels take the f32 reduction path
        import subprocess, sys, os

        code = (
            "import numpy as np\n"
            "from tests.test_batched_linalg import TestLargePhaseTrig\n"
            "t = TestLargePhaseTrig()\n"
            "H0, ops, omega, coef, y0, dt, t0, T = t._config()\n"
            "r = t._f64_reference(H0, ops, omega, coef, y0, dt, t0, T)\n"
            "from qiskit_dynamics_tpu.ops.sweep_solver import sweep_expm_magnus2\n"
            "from qiskit_dynamics_tpu.ops.xla_sweep import sweep_expm_magnus2_xla\n"
            "a = np.asarray(sweep_expm_magnus2(H0, ops, omega, coef, y0, dt=dt,"
            " t0=t0, order=10, tile_b=8, interpret=True))\n"
            "b = np.asarray(sweep_expm_magnus2_xla(H0, ops, omega, coef, y0,"
            " dt=dt, t0=t0, order=10))\n"
            "ea, eb = np.max(np.abs(a - r)), np.max(np.abs(b - r))\n"
            "assert ea < 2e-5, f'pallas kernel large-phase error {ea:.2e}'\n"
            "assert eb < 2e-5, f'xla engine large-phase error {eb:.2e}'\n"
            "print('OK', ea, eb)\n"
        )
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_ENABLE_X64="0",
            PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        env.pop("XLA_FLAGS", None)
        res = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True,
            timeout=600,
        )
        assert res.returncode == 0, res.stdout + res.stderr

    def test_adaptive_kernel_large_phase(self):
        # adaptive kernel is f32 even under x64: direct interpret-mode check
        from qiskit_dynamics_tpu.ops.adaptive_sweep import sweep_dopri5_lockstep
        from qiskit_dynamics_tpu.solvers.adaptive import tpu_dopri5

        rng = np.random.default_rng(11)
        n, B = 4, 8
        t0, tf = 200.0, 204.0
        ah = lambda a: (a - a.conj().T) / 2
        H0 = 0.4 * ah(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        op = 0.4 * ah(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        w = rng.normal(size=n) * 25.0  # phases ~ 25 * 204 ~ 5000 rad
        omega = w[None, :] - w[:, None]
        nu = 7.3  # carrier: ~ 1490 cycles by t = 204
        amps = (0.3 + 0.5 * rng.random(B)) * np.exp(2j * np.pi * rng.random(B))
        y0 = np.zeros((n, B), dtype=complex)
        y0[0] = 1.0

        out = np.asarray(
            sweep_dopri5_lockstep(
                H0, op[None], omega, np.array([2 * np.pi * nu]), amps[None, :],
                y0, tf=tf, t0=t0, atol=1e-8, rtol=1e-8, tile_b=8,
                interpret=True, h0=0.01,
            )
        )

        def rhs_factory(amp):
            def rhs(t, y):
                c = jnp.real(amp * jnp.exp(2j * jnp.pi * nu * t))
                G = (jnp.asarray(H0) + c * jnp.asarray(op)) * jnp.exp(
                    1j * jnp.asarray(omega) * t
                )
                return G @ y

            return rhs

        errs = []
        for b in range(B):
            res = tpu_dopri5(
                rhs_factory(amps[b]), (t0, tf), y0[:, b].astype(complex),
                rtol=1e-12, atol=1e-12,
            )
            errs.append(np.max(np.abs(out[:, b] - np.asarray(res.y[-1]))))
        # pre-reduction this config measured ~1e-3; floor is f32 arithmetic
        assert max(errs) < 3e-5, f"adaptive kernel large-phase error {max(errs):.2e}"


class TestMemberMajorEngine:
    """Member-major MXU kernel (ops/member_sweep.py): identical Magnus-2
    polynomial as the lane kernel / XLA engine, per-member matrices resident
    in VMEM with MXU matmuls (the large-dim layout; VERDICT r2 item 5)."""

    def _problem(self, n=6, k=2, T=12, B=11, seed=5, anti_hermitian=False):
        rng = np.random.default_rng(seed)
        mk = (lambda a: (a - a.conj().T) / 2) if anti_hermitian else (lambda a: 0.3 * a)
        H0 = mk(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        ops = np.array(
            [mk(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))) for _ in range(k)]
        ) * (1.0 if anti_hermitian else 1.0)
        w = rng.normal(size=n)
        omega = w[None, :] - w[:, None]
        coef = rng.normal(size=(T, 2, k, B))
        y0 = rng.normal(size=(n, B)) + 1j * rng.normal(size=(n, B))
        return H0, ops, omega, coef, y0

    def test_matches_xla_engine(self):
        from qiskit_dynamics_tpu.ops.member_sweep import sweep_expm_magnus2_member
        from qiskit_dynamics_tpu.ops.xla_sweep import sweep_expm_magnus2_xla

        args = self._problem()
        kw = dict(dt=0.04, t0=0.1, order=10)
        a = sweep_expm_magnus2_member(*args, interpret=True, block_m=4, **kw)
        b = sweep_expm_magnus2_xla(*args, **kw)
        # B=11 is not a multiple of block_m=4: exercises the pad/trim path
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_hermitian_shortcut(self):
        from qiskit_dynamics_tpu.ops.member_sweep import sweep_expm_magnus2_member

        args = self._problem(anti_hermitian=True, B=8)
        kw = dict(dt=0.04, t0=0.0, order=10, interpret=True, block_m=8)
        a = sweep_expm_magnus2_member(*args, hermitian=False, **kw)
        b = sweep_expm_magnus2_member(*args, hermitian=True, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    @pytest.mark.parametrize("horner", ["vpu", "hybrid", "bvpu"])
    def test_horner_modes_match_mxu(self, horner):
        # all Horner variants evaluate the identical Taylor polynomial —
        # "bvpu" batches the mat-vec across the resident member block as one
        # multiply + sublane reduction per iteration
        from qiskit_dynamics_tpu.ops.member_sweep import sweep_expm_magnus2_member

        args = self._problem(B=8)
        kw = dict(dt=0.04, t0=0.1, order=10, interpret=True, block_m=4)
        a = sweep_expm_magnus2_member(*args, horner="mxu", **kw)
        b = sweep_expm_magnus2_member(*args, horner=horner, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_hoisted_rotation_matches_per_member(self):
        # hoist_rotation frame-rotates the shared static/op tables once per
        # step (k fused multiply-adds per member) instead of paying the 6-op
        # rotation per member — identical polynomial, so interpret-mode f32
        # results must agree to reassociation level
        from qiskit_dynamics_tpu.ops.member_sweep import sweep_expm_magnus2_member

        args = self._problem(B=8)
        kw = dict(dt=0.04, t0=0.1, order=10, interpret=True, block_m=4)
        a = sweep_expm_magnus2_member(*args, hoist_rotation=False, **kw)
        b = sweep_expm_magnus2_member(*args, hoist_rotation=True, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
        # default heuristic at this size (n=6, k=2) enables the hoist
        c = sweep_expm_magnus2_member(*args, **kw)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=0)

    def test_bvpu_requires_resident(self):
        from qiskit_dynamics_tpu.ops.member_sweep import sweep_expm_magnus2_member

        args = self._problem(B=4)
        with pytest.raises(ValueError, match="bvpu"):
            sweep_expm_magnus2_member(
                *args, dt=0.04, horner="bvpu", resident=False, interpret=True
            )

    @pytest.mark.parametrize("hermitian", [False, True])
    @pytest.mark.parametrize("hoist", [False, True])
    def test_batched_build_matches_member(self, hermitian, hoist):
        # gen-2 whole-block build/assembly (build="batched"): identical
        # polynomial as the per-member op chains, so interpret results agree
        # to reassociation level in every (hermitian, hoist) combination
        from qiskit_dynamics_tpu.ops.member_sweep import sweep_expm_magnus2_member

        args = self._problem(B=8, anti_hermitian=hermitian)
        kw = dict(
            dt=0.04, t0=0.1, order=10, interpret=True, block_m=4,
            hermitian=hermitian, hoist_rotation=hoist,
        )
        a = sweep_expm_magnus2_member(*args, build="member", **kw)
        b = sweep_expm_magnus2_member(*args, build="batched", **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_batched_build_requires_resident(self):
        from qiskit_dynamics_tpu.ops.member_sweep import sweep_expm_magnus2_member

        args = self._problem(B=4)
        with pytest.raises(ValueError, match="batched"):
            sweep_expm_magnus2_member(
                *args, dt=0.04, build="batched", resident=False, interpret=True
            )

    def test_glue_member_build_batched_and_gradient(self):
        # member_build="batched" through fused_sweep_solve: forward matches
        # the XLA engine; gradient (member primal, XLA adjoint) matches too
        import jax
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        sig_fn = lambda a: [Signal(lambda t: a * 0.02, carrier_freq=w1)]
        kw = dict(
            t_span=(0.0, 2.0), max_dt=0.25, y0=y0,
            rwa_signal_map=solver._rwa_signal_map, interpret=True,
        )
        amps = jnp.array([0.3, 0.75, 1.0])
        out_b = fused_sweep_solve(
            solver.model, sig_fn, amps, sweep_engine="member",
            member_build="batched", **kw
        )
        out_x = fused_sweep_solve(solver.model, sig_fn, amps, sweep_engine="xla", **kw)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_x), atol=1e-12)

        def loss(amps, **ekw):
            yf = fused_sweep_solve(solver.model, sig_fn, amps, **ekw, **kw)
            return jnp.mean(jnp.abs(yf[:, 1]) ** 2)

        g_b = jax.grad(
            lambda a: loss(a, sweep_engine="member", member_build="batched")
        )(amps)
        g_x = jax.grad(lambda a: loss(a, sweep_engine="xla"))(amps)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_x), rtol=1e-6, atol=1e-12)

    def test_glue_member_engine(self):
        # through fused_sweep_solve with sweep_engine="member"
        import jax
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        amps = jnp.array([0.3, 0.75, 1.0])
        sig_fn = lambda a: [Signal(lambda t: a * 0.02, carrier_freq=w1)]
        kw = dict(
            t_span=(0.0, 2.0), max_dt=0.25, y0=y0,
            rwa_signal_map=solver._rwa_signal_map, interpret=True,
        )
        out_m = fused_sweep_solve(
            solver.model, sig_fn, amps, sweep_engine="member", **kw
        )
        out_x = fused_sweep_solve(solver.model, sig_fn, amps, sweep_engine="xla", **kw)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_x), atol=1e-12)

    def test_member_engine_gradient(self):
        # custom vjp (member primal, XLA adjoint): grads through the member
        # engine match the XLA engine's exactly (identical polynomial)
        import jax
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.benchmarks import cr_solver
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        sig_fn = lambda a: [Signal(lambda t: a * 0.02, carrier_freq=w1)]
        kw = dict(
            t_span=(0.0, 2.0), max_dt=0.25, y0=y0,
            rwa_signal_map=solver._rwa_signal_map, interpret=True,
        )

        def loss(amps, engine):
            yf = fused_sweep_solve(
                solver.model, sig_fn, amps, sweep_engine=engine, **kw
            )
            return jnp.mean(jnp.abs(yf[:, 1]) ** 2)

        amps = jnp.array([0.3, 0.75, 1.0])
        g_m = jax.grad(lambda a: loss(a, "member"))(amps)
        g_x = jax.grad(lambda a: loss(a, "xla"))(amps)
        np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_x), rtol=1e-6, atol=1e-12)
        assert np.max(np.abs(np.asarray(g_m))) > 0


class TestAdaptiveDifferentiable:
    """Differentiable lockstep-adaptive sweeps (VERDICT r2 items 2 and 6):
    Pallas primal with recorded steps, fixed-grid XLA replay adjoint
    (ops/adaptive_replay.py)."""

    def _setup(self, T=2.5):
        from qiskit_dynamics_tpu.benchmarks import cr_solver

        solver, w1 = cr_solver(dim=2)
        y0 = np.zeros(4, dtype=complex)
        y0[0] = 1.0
        sig_fn = lambda a: [__import__("qiskit_dynamics_tpu").Signal(
            lambda t: a * 0.02, carrier_freq=w1)]
        return solver, sig_fn, y0, T

    def test_primal_identical_through_ad_wrapper(self):
        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve

        solver, sig_fn, y0, T = self._setup()
        amps = jnp.array([0.4, 0.7, 0.9, 1.0, 0.5, 0.3, 0.6, 0.8])
        kw = dict(
            t_span=(0.0, T), y0=y0, tile_b=8, interpret=True,
            rwa_signal_map=solver._rwa_signal_map,
        )
        a = fused_adaptive_sweep_solve(solver.model, sig_fn, amps, **kw)
        b = fused_adaptive_sweep_solve(
            solver.model, sig_fn, amps, differentiable=False, **kw
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_replay_reproduces_kernel(self):
        # the adjoint's forward replay must track the Pallas primal to f32
        # roundoff — that is what makes the VJP the primal's adjoint
        from qiskit_dynamics_tpu.ops.adaptive_sweep import sweep_dopri5_lockstep
        from qiskit_dynamics_tpu.ops.adaptive_replay import dopri5_replay
        from qiskit_dynamics_tpu.ops.trig_reduce import split_array

        rng = np.random.default_rng(2)
        n, B = 4, 8
        t0, tf = 0.5, 3.0
        ah = lambda a: (a - a.conj().T) / 2
        H0 = 0.5 * ah(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        op = 0.5 * ah(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        w = rng.normal(size=n) * 3.0
        omega = w[None, :] - w[:, None]
        freqs = np.array([2 * np.pi * 1.1])
        amps = (0.2 + 0.5 * rng.random(B)) * np.exp(2j * np.pi * rng.random(B))
        y0 = rng.normal(size=(n, B)) + 1j * rng.normal(size=(n, B))

        out, rec = sweep_dopri5_lockstep(
            H0, op[None], omega, freqs, amps[None, :], y0, tf=tf, t0=t0,
            atol=1e-7, rtol=1e-7, tile_b=8, interpret=True, h0=0.05,
            record_steps=True, max_steps=512,
        )
        o_hi, o_lo = split_array(omega)
        f_hi, f_lo = split_array(freqs)
        replay = dopri5_replay(
            H0, op[None], o_hi, o_lo, f_hi, f_lo, amps[None, None, :], y0,
            rec, t0=t0, env_dt=tf - t0,
        )
        assert np.asarray(rec).max() > 0  # steps actually recorded
        err = np.max(np.abs(np.asarray(out) - np.asarray(replay)))
        assert err < 5e-6, f"replay deviates from kernel by {err:.2e}"

    def test_gradient_matches_finite_differences(self):
        import jax

        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve

        solver, sig_fn, y0, T = self._setup()
        amps0 = jnp.array([0.4, 0.7, 0.9, 1.0, 0.5, 0.3, 0.6, 0.8])

        def loss(amps):
            out = fused_adaptive_sweep_solve(
                solver.model, sig_fn, amps, t_span=(0.0, T), y0=y0, tile_b=8,
                interpret=True, rwa_signal_map=solver._rwa_signal_map,
            )
            return jnp.mean(jnp.abs(out[:, 1]) ** 2)

        g = np.asarray(jax.grad(loss)(amps0))
        eps = 3e-4
        for i in (0, 3):
            fd = (loss(amps0.at[i].add(eps)) - loss(amps0.at[i].add(-eps))) / (2 * eps)
            assert abs(g[i] - fd) <= 5e-3 * max(abs(fd), 1e-9), (i, g[i], float(fd))

    def test_trajectory_gradient(self):
        # multi-time calibration objective: grads flow through t_eval stores
        import jax

        from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve

        solver, sig_fn, y0, T = self._setup(T=2.0)
        amps0 = jnp.array([0.5, 0.8, 1.0, 0.4, 0.6, 0.9, 0.3, 0.7])
        t_eval = [0.9, 1.5, 2.0]

        def loss(amps):
            traj = fused_adaptive_sweep_solve(
                solver.model, sig_fn, amps, t_span=(0.0, T), y0=y0, tile_b=8,
                interpret=True, rwa_signal_map=solver._rwa_signal_map,
                t_eval=t_eval,
            )  # (B, n_eval, dim)
            return jnp.mean(jnp.abs(traj[:, :, 1]) ** 2)

        g = np.asarray(jax.grad(loss)(amps0))
        eps = 3e-4
        i = 2
        fd = (loss(amps0.at[i].add(eps)) - loss(amps0.at[i].add(-eps))) / (2 * eps)
        assert abs(g[i] - fd) <= 5e-3 * max(abs(fd), 1e-9), (g[i], float(fd))

    def test_fixed_step_trajectory_gradient(self):
        # eval_slots now flow through the fixed-step custom VJP too
        import jax

        from qiskit_dynamics_tpu.solvers import fused_sweep_solve

        solver, sig_fn, y0, T = self._setup(T=2.0)
        amps0 = jnp.array([0.5, 0.8, 1.0, 0.4])

        def loss(amps):
            traj = fused_sweep_solve(
                solver.model, sig_fn, amps, t_span=(0.0, T), max_dt=0.25,
                y0=y0, tile_b=128, interpret=True,
                rwa_signal_map=solver._rwa_signal_map, t_eval=[1.0, 2.0],
            )
            return jnp.mean(jnp.abs(traj[:, :, 1]) ** 2)

        g = np.asarray(jax.grad(loss)(amps0))
        eps = 1e-3
        i = 1
        fd = (loss(amps0.at[i].add(eps)) - loss(amps0.at[i].add(-eps))) / (2 * eps)
        assert abs(g[i] - fd) <= 5e-3 * max(abs(fd), 1e-9), (g[i], float(fd))
