"""End-to-end SPARSE solves: the intended library/method pairings.

Reference pairing (its userguide "configure simulations" how-to):
scipy_sparse models drive the numpy-path solvers; jax_sparse (BCOO) models
drive the jax-path solvers. Mismatches must fail loudly (a scipy-sparse
model cannot evaluate under a jax tracer)."""
import numpy as np
import pytest

from qiskit_dynamics_tpu import Signal, DynamicsError
from qiskit_dynamics_tpu.models import HamiltonianModel
from qiskit_dynamics_tpu.solvers import solve_lmde, solve_ode


def _chain_model(n=32, lib=None):
    rng = np.random.default_rng(0)
    H0 = (
        np.diag(rng.normal(size=n))
        + np.diag(0.3 * np.ones(n - 1), 1)
        + np.diag(0.3 * np.ones(n - 1), -1)
    )
    Hd = np.zeros((n, n))
    Hd[0, 1] = Hd[1, 0] = 1.0
    model = HamiltonianModel(
        static_operator=H0, operators=[Hd],
        signals=[Signal(0.5, carrier_freq=0.4)], array_library=lib,
    )
    y0 = np.zeros(n, dtype=complex)
    y0[0] = 1.0
    return model, y0


class TestSparseEndToEnd:
    @pytest.fixture(scope="class")
    def dense_reference(self):
        model, y0 = _chain_model()
        res = solve_lmde(
            model, t_span=[0.0, 2.0], y0=y0, method="jax_expm",
            max_dt=0.02, magnus_order=2, expm_method="taylor",
        )
        return np.asarray(res.y[-1])

    def test_scipy_sparse_numpy_lanczos(self, dense_reference):
        model, y0 = _chain_model(lib="scipy_sparse")
        res = solve_lmde(
            model, t_span=[0.0, 2.0], y0=y0, method="lanczos_diag",
            max_dt=0.02, k_dim=12,
        )
        assert np.max(np.abs(np.asarray(res.y[-1]) - dense_reference)) < 5e-5

    def test_jax_sparse_jax_lanczos(self, dense_reference):
        model, y0 = _chain_model(lib="jax_sparse")
        res = solve_lmde(
            model, t_span=[0.0, 2.0], y0=y0, method="jax_lanczos_diag",
            max_dt=0.02, k_dim=12,
        )
        assert np.max(np.abs(np.asarray(res.y[-1]) - dense_reference)) < 5e-5

    def test_scipy_sparse_scipy_expm(self, dense_reference):
        model, y0 = _chain_model(lib="scipy_sparse")
        res = solve_lmde(
            model, t_span=[0.0, 2.0], y0=y0, method="scipy_expm", max_dt=0.05
        )
        assert np.max(np.abs(np.asarray(res.y[-1]) - dense_reference)) < 5e-4

    def test_scipy_sparse_host_adaptive(self, dense_reference):
        model, y0 = _chain_model(lib="scipy_sparse")
        res = solve_ode(
            model, t_span=[0.0, 2.0], y0=y0, method="DOP853",
            atol=1e-10, rtol=1e-10,
        )
        assert np.max(np.abs(np.asarray(res.y[-1]) - dense_reference)) < 5e-5

    def test_scipy_sparse_under_jax_method_fails_loudly(self):
        model, y0 = _chain_model(lib="scipy_sparse")
        with pytest.raises(DynamicsError, match="jax_sparse"):
            solve_lmde(
                model, t_span=[0.0, 2.0], y0=y0, method="jax_lanczos_diag",
                max_dt=0.02, k_dim=12,
            )
        with pytest.raises(DynamicsError, match="jax_sparse"):
            solve_ode(model, t_span=[0.0, 2.0], y0=y0, method="tpu_dopri5")

    def test_jax_sparse_with_dense_expm_fails_loudly(self):
        model, y0 = _chain_model(lib="jax_sparse")
        with pytest.raises(DynamicsError, match="sparse"):
            solve_lmde(
                model, t_span=[0.0, 2.0], y0=y0, method="jax_expm", max_dt=0.02
            )

    def test_jax_sparse_adaptive_tpu_dopri5(self, dense_reference):
        # BCOO model RHS under the native adaptive jax solver
        model, y0 = _chain_model(lib="jax_sparse")
        res = solve_ode(
            model, t_span=[0.0, 2.0], y0=y0, method="tpu_dopri5",
            atol=1e-10, rtol=1e-10,
        )
        assert np.max(np.abs(np.asarray(res.y[-1]) - dense_reference)) < 5e-5
