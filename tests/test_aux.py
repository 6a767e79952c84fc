"""Tests for aux subsystems: arraylias compat, metrics, expm kernel, checkpointing."""
import os

import numpy as np
import jax
import jax.numpy as jnp
from scipy.linalg import expm as scipy_expm

from qiskit_dynamics_tpu import (
    DYNAMICS_NUMPY as unp,
    DYNAMICS_NUMPY_ALIAS as numpy_alias,
    DYNAMICS_SCIPY as usp,
    requires_array_library,
    Signal,
    solve_ode,
)
from qiskit_dynamics_tpu.ops import expm_taylor
from qiskit_dynamics_tpu.utils import enable_metrics, disable_metrics, solve_metrics


class TestArrayliasCompat:
    def test_unp_dispatch(self):
        out = unp.sin(np.array([0.0, np.pi / 2]))
        assert isinstance(out, np.ndarray)
        np.testing.assert_allclose(out, [0.0, 1.0], atol=1e-12)

        @jax.jit
        def f(x):
            return unp.sin(x)

        np.testing.assert_allclose(np.asarray(f(jnp.array(np.pi / 2))), 1.0, atol=1e-7)

    def test_unp_kwarg_tracer_dispatch(self):
        """A tracer arriving only via a kwarg (or nested in one) must flip
        dispatch to jnp — regression for the kwargs-blind dispatch."""

        @jax.jit
        def f(x):
            # tracer only in a kwarg
            return unp.full(3, fill_value=x)

        np.testing.assert_allclose(np.asarray(f(jnp.asarray(2.0))), [2.0] * 3)

        @jax.jit
        def g(x):
            # tracer nested inside a list kwarg
            return unp.concatenate([unp.zeros(1)], axis=0) + unp.stack(arrays=[x, x])

        np.testing.assert_allclose(np.asarray(g(jnp.asarray(1.5))), [1.5, 1.5])

        @jax.jit
        def h(x):
            # linalg with the operand in a kwarg-free position but traced
            return unp.linalg.norm(unp.stack(arrays=[x, x]))

        np.testing.assert_allclose(np.asarray(h(jnp.asarray(3.0))), np.sqrt(18.0), rtol=1e-6)

    def test_alias_asarray(self):
        x = [[1.0, 0.0], [0.0, 1.0]]
        assert isinstance(numpy_alias(like="numpy").asarray(x), np.ndarray)
        assert isinstance(numpy_alias(like="jax").asarray(x), jax.Array)
        bcoo = numpy_alias(like="jax_sparse").asarray(x)
        np.testing.assert_allclose(np.asarray(bcoo.todense()), x)
        sp = numpy_alias(like="scipy_sparse").asarray(x)
        np.testing.assert_allclose(sp.toarray(), x)

    def test_infer_libs(self):
        assert numpy_alias.infer_libs(np.zeros(2)) == ("numpy",)
        assert numpy_alias.infer_libs(jnp.zeros(2)) == ("jax",)

    def test_scipy_dispatch(self):
        A = np.array([[0.0, 1.0], [-1.0, 0.0]])
        np.testing.assert_allclose(usp.linalg.expm(A), scipy_expm(A), atol=1e-12)

    def test_scipy_alias(self):
        """DYNAMICS_SCIPY_ALIAS(like=...) returns the scipy namespace for the
        inferred library (reference top-level export, alias.py)."""
        import jax
        import jax.numpy as jnp
        from qiskit_dynamics_tpu import DYNAMICS_SCIPY_ALIAS

        A = np.array([[0.0, 1.0], [-1.0, 0.0]])
        ns = DYNAMICS_SCIPY_ALIAS(like=A)
        np.testing.assert_allclose(ns.linalg.expm(A), scipy_expm(A), atol=1e-12)
        assert DYNAMICS_SCIPY_ALIAS(like=jnp.zeros(2)) is jax.scipy
        assert DYNAMICS_SCIPY_ALIAS(like="jax") is jax.scipy
        assert DYNAMICS_SCIPY_ALIAS() is usp

    def test_requires_array_library_passthrough(self):
        @requires_array_library("jax")
        def f(x):
            return 2 * x

        assert f(3) == 6


class TestExpmTaylor:
    def test_matches_scipy(self):
        rng = np.random.default_rng(2)
        A = rng.standard_normal((5, 8, 8)) + 1j * rng.standard_normal((5, 8, 8))
        A = 0.3 * A
        out = np.asarray(expm_taylor(jnp.asarray(A), order=12, squarings=2))
        expected = np.stack([scipy_expm(a) for a in A])
        np.testing.assert_allclose(out, expected, atol=1e-10)

    def test_in_solver(self):
        # jax_expm with taylor kernel matches pade kernel
        G = -1j * np.array([[1.0, 0.3], [0.3, -1.0]], dtype=complex)

        def gen(t):
            return jnp.asarray(G) * jnp.cos(t)

        r1 = solve_ode(lambda t, y: gen(t) @ y, [0.0, 1.0], np.eye(2, dtype=complex),
                       method="DOP853", atol=1e-12, rtol=1e-12)
        from qiskit_dynamics_tpu import solve_lmde

        r2 = solve_lmde(gen, [0.0, 1.0], np.eye(2, dtype=complex), method="jax_expm",
                        max_dt=0.01, magnus_order=2, expm_method="taylor",
                        expm_order=10, expm_squarings=1)
        np.testing.assert_allclose(np.asarray(r2.y[-1]), np.asarray(r1.y[-1]), atol=1e-8)


class TestMetrics:
    def test_record_and_disable(self):
        disable_metrics(clear=True)
        enable_metrics()
        solve_ode(
            lambda t, y: -0.5 * y, [0.0, 1.0], np.array([1.0 + 0j]), method="DOP853"
        )
        records = solve_metrics()
        assert len(records) == 1
        assert "DOP853" in records[0].method
        assert records[0].wall_time_s > 0
        disable_metrics(clear=True)
        solve_ode(
            lambda t, y: -0.5 * y, [0.0, 1.0], np.array([1.0 + 0j]), method="DOP853"
        )
        assert solve_metrics() == []


class TestExpansionModelCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        from qiskit_dynamics_tpu.solvers import ExpansionModel, DysonSolver

        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.diag([1.0, -1.0]).astype(complex)
        G0 = -1j * 2 * np.pi * 5.0 * Z / 2
        G1 = -1j * 2 * np.pi * X / 2

        model = ExpansionModel(
            operators=[G1], rotating_frame=G0, dt=0.05, carrier_freqs=[5.0],
            chebyshev_orders=[1], expansion_method="dyson", expansion_order=3,
            atol=1e-12, rtol=1e-12,
        )
        path = os.path.join(tmp_path, "expansion.npz")
        model.save(path)
        loaded = ExpansionModel.load(path)

        coeffs = np.linspace(0.1, 0.4, len(model.expansion_polynomial.monomial_labels))
        # evaluate at arbitrary first-order variable values
        c = np.linspace(0.05, 0.2, 4)
        np.testing.assert_allclose(
            np.asarray(loaded.evaluate(c)), np.asarray(model.evaluate(c)), atol=1e-12
        )
        assert loaded.dt == model.dt
        np.testing.assert_allclose(loaded.Udt, model.Udt, atol=1e-12)

        # a solver built around the loaded model steps identically
        solver = DysonSolver.__new__(DysonSolver)
        from qiskit_dynamics_tpu.solvers.perturbative_solvers.perturbative_solver import (
            _PerturbativeSolver,
        )

        _PerturbativeSolver.__init__(solver, loaded)
        sig = Signal(lambda t: 0.3, carrier_freq=5.0)
        res = solver.solve(0.0, 5, np.eye(2, dtype=complex), [sig])
        assert np.isfinite(np.asarray(res.y[-1])).all()


class TestCheckpointedSweep:
    def test_resume_skips_completed_chunks(self, tmp_path):
        from qiskit_dynamics_tpu.utils import checkpointed_sweep

        calls = []

        def fn(chunk):
            calls.append(len(chunk))
            return chunk * 2.0

        params = np.arange(10.0)
        path = str(tmp_path / "sweep.npz")
        out = checkpointed_sweep(fn, params, path, chunk_size=4)
        np.testing.assert_allclose(out, params * 2.0)
        assert calls == [4, 4, 2]

        # "crash" after completion -> full resume does zero work
        calls.clear()
        out2 = checkpointed_sweep(fn, params, path, chunk_size=4)
        np.testing.assert_allclose(out2, params * 2.0)
        assert calls == []

        # changed params invalidate the checkpoint
        calls.clear()
        out3 = checkpointed_sweep(fn, params + 1.0, path, chunk_size=4)
        np.testing.assert_allclose(out3, (params + 1.0) * 2.0)
        assert calls == [4, 4, 2]


class TestRKTableaus:
    def test_inlined_tableaus_match_scipy(self):
        """The inlined Butcher tableaus must stay bit-identical to scipy's
        (guards against transcription drift; the package itself no longer
        imports scipy's private ``_ivp`` module)."""
        try:
            from scipy.integrate._ivp.rk import RK45, DOP853
        except ImportError:
            import pytest

            pytest.skip("scipy private RK module not importable")
        from qiskit_dynamics_tpu.ops import rk_tableaus as rk

        assert np.array_equal(rk.DOPRI5_A, RK45.A)
        assert np.array_equal(rk.DOPRI5_B, RK45.B)
        assert np.array_equal(rk.DOPRI5_C, RK45.C)
        assert np.array_equal(rk.DOPRI5_E, RK45.E)
        assert rk.DOPRI5_N_STAGES == RK45.n_stages
        ns = DOP853.n_stages
        assert rk.DOP853_N_STAGES == ns
        assert np.array_equal(rk.DOP853_A, DOP853.A[:ns, :ns])
        assert np.array_equal(rk.DOP853_B, DOP853.B)
        assert np.array_equal(rk.DOP853_C, DOP853.C[:ns])
        assert np.array_equal(rk.DOP853_E5, DOP853.E5)
        assert np.array_equal(rk.DOP853_E3, DOP853.E3)


class TestTrigReduce:
    """EFT phase reduction primitives (ops/trig_reduce.py)."""

    def test_reduced_phase_accuracy_large_args(self):
        from qiskit_dynamics_tpu.ops.trig_reduce import reduced_phase, split_array, split_const

        rng = np.random.default_rng(0)
        w64 = rng.uniform(-60, 60, size=512)
        w_hi, w_lo = split_array(w64)
        max_err = 0.0
        for t in (13.7, 512.25, 1999.0):
            t_hi, t_lo = split_const(t)
            r = np.asarray(
                reduced_phase(
                    (jnp.asarray(w_hi), jnp.asarray(w_lo)),
                    (jnp.float32(t_hi), jnp.float32(t_lo)),
                )
            )
            exact = np.float64(w64) * (np.float64(t_hi) + np.float64(t_lo))
            d = np.abs(np.angle(np.exp(1j * (np.float64(r) - exact))))
            max_err = max(max_err, float(d.max()))
            assert np.all(np.abs(r) <= np.pi + 1e-4)
        # naive f32 at |w t| ~ 1e5 loses ~6e-5 rad; the reduction holds ulps
        assert max_err < 1e-6, max_err

    def test_split_array_exact(self):
        from qiskit_dynamics_tpu.ops.trig_reduce import split_array

        rng = np.random.default_rng(1)
        w = rng.uniform(-100, 100, size=256)
        hi, lo = split_array(w)
        # hi + lo reproduces the f64 value to ~2^-49 relative (the residual
        # below the second f32's mantissa; an exact 2-term split needs 48
        # bits, f64 has 53)
        err = np.abs(hi.astype(np.float64) + lo.astype(np.float64) - w)
        assert np.max(err / np.abs(w)) < 2.0**-45

    def test_step_time_df(self):
        from qiskit_dynamics_tpu.ops.trig_reduce import split_const, step_time_df

        dt, off = 0.12345678912345, 100.987654321
        for idx in (0, 7, 999, 30001):
            hi, lo = step_time_df(
                jnp.float32(idx), split_const(dt), split_const(off)
            )
            got = np.float64(np.asarray(hi)) + np.float64(np.asarray(lo))
            # operands are f32 pairs: compare against the f64 value of those pairs
            dt64 = sum(np.float64(x) for x in split_const(dt))
            off64 = sum(np.float64(x) for x in split_const(off))
            assert abs(got - (idx * dt64 + off64)) < 1e-5 * max(1.0, idx * dt)
