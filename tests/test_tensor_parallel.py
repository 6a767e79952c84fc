"""Tensor (Hilbert-space) sharding layer (parallel/tensor.py).

Runs on the 8-device virtual CPU mesh (conftest). GSPMD partitions a fixed
program, so equality with the single-device chain here validates what the
real multi-chip mesh would compute.
"""
import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from qiskit_dynamics_tpu import parallel
from qiskit_dynamics_tpu.benchmarks import expm_chain


def _chain(T, b, n, m, seed=0):
    rng = np.random.default_rng(seed)
    shape = (T, b, n, n) if b else (T, n, n)
    G = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    G = -0.5j * (G + np.conj(np.swapaxes(G, -1, -2)))
    G = G / np.linalg.norm(G, axis=(-2, -1), keepdims=True) * 2.0
    yshape = (b, n, m) if b else (n, m)
    y0 = rng.normal(size=yshape) + 1j * rng.normal(size=yshape)
    return G, y0


class TestTensorExpmChain:
    def test_matches_single_device_unbatched(self):
        G, y0 = _chain(T=5, b=0, n=16, m=16)
        mesh = parallel.model_mesh(4)
        out = parallel.tensor_expm_chain(G, 0.8, y0, mesh)
        ref = expm_chain(G, 0.8, y0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)
        # the result is actually row-sharded over the model axis
        spec = out.sharding.spec
        assert spec[0] == parallel.MODEL_AXIS

    def test_data_by_model_mesh_batched(self):
        # 2-d parallelism: batch over "data", Hilbert space over "model"
        G, y0 = _chain(T=4, b=6, n=16, m=8, seed=1)
        mesh = parallel.make_mesh(
            (2, 4), (parallel.DATA_AXIS, parallel.MODEL_AXIS)
        )
        out = parallel.tensor_expm_chain(G, 0.6, y0, mesh)
        ref = expm_chain(G, 0.6, y0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)
        assert out.sharding.spec[:2] == P(parallel.DATA_AXIS, parallel.MODEL_AXIS)[:2]

    def test_model_only_mesh_batched(self):
        # batched chain on a model-only mesh: batch replicated, rows sharded
        G, y0 = _chain(T=3, b=2, n=8, m=8, seed=2)
        mesh = parallel.model_mesh(2)
        out = parallel.tensor_expm_chain(G, 0.5, y0, mesh)
        ref = expm_chain(G, 0.5, y0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)

    def test_shard_rows_helper(self):
        mesh = parallel.model_mesh(4)
        x = np.arange(16 * 16, dtype=float).reshape(16, 16)
        sx = parallel.shard_rows(x, mesh)
        assert sx.sharding.spec[0] == parallel.MODEL_AXIS
        np.testing.assert_array_equal(np.asarray(sx), x)

    def test_requires_model_axis(self):
        G, y0 = _chain(T=2, b=0, n=8, m=8)
        mesh = parallel.data_mesh()
        with pytest.raises(ValueError, match="model"):
            parallel.tensor_expm_chain(G, 0.5, y0, mesh)


class TestTensorMagnusSolve:
    def _ham_model(self, n=8, seed=3):
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.models import HamiltonianModel

        rng = np.random.default_rng(seed)
        H0 = rng.normal(size=(n, n))
        H0 = H0 + H0.T
        Hd = rng.normal(size=(n, n))
        Hd = Hd + Hd.T
        model = HamiltonianModel(
            static_operator=H0, operators=[Hd],
            signals=[Signal(0.4, carrier_freq=1.1)],
            rotating_frame=np.diag(np.diag(H0)),
        )
        y0 = np.zeros(n, dtype=complex)
        y0[0] = 1.0
        return model, y0

    @pytest.mark.parametrize("magnus_order", [1, 2, 3])
    def test_matches_solve_lmde(self, magnus_order):
        from qiskit_dynamics_tpu.solvers import solve_lmde

        model, y0 = self._ham_model()
        mesh = parallel.model_mesh(4)
        out = parallel.tensor_magnus_solve(
            model, (0.0, 1.0), y0, mesh, max_dt=0.1, magnus_order=magnus_order
        )
        ref = solve_lmde(
            model, t_span=[0.0, 1.0], y0=y0, method="jax_expm", max_dt=0.1,
            magnus_order=magnus_order, expm_method="taylor",
        )
        np.testing.assert_allclose(
            np.asarray(out.y[-1]), np.asarray(ref.y[-1]), atol=1e-12
        )
        # the result lives on the model mesh (the output stack itself may
        # be replicated; the sharding constraints act on the solve internals)
        assert len(out.y.sharding.device_set) == 4
        # the model's frame flag is restored
        assert model.in_frame_basis is False

    def test_matrix_y0(self):
        from qiskit_dynamics_tpu.solvers import solve_lmde

        model, _ = self._ham_model(seed=5)
        mesh = parallel.model_mesh(2)
        y0 = np.eye(8, dtype=complex)
        out = parallel.tensor_magnus_solve(model, (0.0, 0.5), y0, mesh, max_dt=0.05)
        ref = solve_lmde(
            model, t_span=[0.0, 0.5], y0=y0, method="jax_expm", max_dt=0.05,
            magnus_order=2, expm_method="taylor",
        )
        np.testing.assert_allclose(np.asarray(out.y[-1]), np.asarray(ref.y[-1]), atol=1e-12)

    def test_requires_model_axis(self):
        model, y0 = self._ham_model()
        with pytest.raises(ValueError, match="model"):
            parallel.tensor_magnus_solve(
                model, (0.0, 1.0), y0, parallel.data_mesh(), max_dt=0.1
            )

    def test_vectorized_lindblad(self):
        # open system: the sharded solve handles the vectorized dim^2 space
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.models import LindbladModel
        from qiskit_dynamics_tpu.solvers import solve_lmde

        dim = 3
        a = np.diag(np.sqrt(np.arange(1, dim)), 1)
        N = np.diag(np.arange(dim, dtype=float))
        H0 = 2 * np.pi * 5.0 * N
        Hd = 2 * np.pi * 0.1 * (a + a.conj().T)
        model = LindbladModel(
            static_hamiltonian=H0, hamiltonian_operators=[Hd],
            hamiltonian_signals=[Signal(0.5, carrier_freq=5.0)],
            static_dissipators=[np.sqrt(0.02) * a],
            rotating_frame=np.diag(H0), vectorized=True,
        )
        rho0 = np.zeros((dim, dim), dtype=complex)
        rho0[1, 1] = 1.0
        y0 = rho0.flatten(order="F")
        mesh = parallel.model_mesh(3)  # dim^2 = 9 rows over 3 shards
        out = parallel.tensor_magnus_solve(model, (0.0, 1.0), y0, mesh, max_dt=0.01)
        ref = solve_lmde(
            model, t_span=[0.0, 1.0], y0=y0, method="jax_expm", max_dt=0.01,
            magnus_order=2, expm_method="taylor",
        )
        np.testing.assert_allclose(np.asarray(out.y[-1]), np.asarray(ref.y[-1]), atol=1e-12)

    def test_grad_through_sharded_solve(self):
        # autodiff-everywhere extends to the model-sharded path: grad of a
        # population objective w.r.t. a signal amplitude matches the
        # single-device fixed-step solver's grad exactly
        import jax
        import jax.numpy as jnp
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.models import HamiltonianModel
        from qiskit_dynamics_tpu.solvers import solve_lmde

        n = 8
        rng = np.random.default_rng(3)
        H0 = rng.normal(size=(n, n)); H0 = H0 + H0.T
        Hd = rng.normal(size=(n, n)); Hd = Hd + Hd.T
        y0 = np.zeros(n, dtype=complex); y0[0] = 1.0
        mesh = parallel.model_mesh(4)

        def build(amp):
            return HamiltonianModel(
                static_operator=H0, operators=[Hd],
                signals=[Signal(amp, carrier_freq=1.1)],
                rotating_frame=np.diag(np.diag(H0)),
            )

        def loss_tensor(amp):
            yf = parallel.tensor_magnus_solve(build(amp), (0.0, 1.0), y0, mesh, max_dt=0.1).y[-1]
            return jnp.abs(yf[1]) ** 2

        def loss_ref(amp):
            r = solve_lmde(build(amp), t_span=[0.0, 1.0], y0=y0, method="jax_expm",
                           max_dt=0.1, magnus_order=2, expm_method="taylor")
            return jnp.abs(r.y[-1][1]) ** 2

        g1 = jax.grad(loss_tensor)(0.4)
        g2 = jax.grad(loss_ref)(0.4)
        assert abs(g1 - g2) < 1e-12

    def test_t_eval_and_solve_lmde_method(self):
        # "tensor_expm" is a first-class solve_lmde method with t_eval
        from qiskit_dynamics_tpu.solvers import solve_lmde

        model, y0 = self._ham_model(seed=7)
        mesh = parallel.model_mesh(4)
        t_eval = [0.25, 0.6, 1.0]
        out = solve_lmde(
            model, t_span=[0.0, 1.0], y0=y0, method="tensor_expm",
            mesh=mesh, max_dt=0.1, t_eval=t_eval,
        )
        ref = solve_lmde(
            model, t_span=[0.0, 1.0], y0=y0, method="jax_expm", max_dt=0.1,
            magnus_order=2, expm_method="taylor", t_eval=t_eval,
        )
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t))
        np.testing.assert_allclose(np.asarray(out.y), np.asarray(ref.y), atol=1e-12)

    def test_method_validation(self):
        from qiskit_dynamics_tpu import DynamicsError
        from qiskit_dynamics_tpu.solvers import solve_lmde

        model, y0 = self._ham_model()
        with pytest.raises(DynamicsError, match="mesh"):
            solve_lmde(model, t_span=[0.0, 1.0], y0=y0, method="tensor_expm", max_dt=0.1)


def test_time_by_model_propagator_scan():
    """The time-sharded associative scan composes with model sharding: on a
    2-d (time, model) mesh the block scans' matmuls are additionally
    row-partitioned (GSPMD), matching the single-device scan exactly."""
    import jax
    import jax.numpy as jnp
    import scipy.linalg as sla
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    T, n = 16, 8
    G = rng.normal(size=(T, n, n)) + 1j * rng.normal(size=(T, n, n))
    G = -0.5j * (G + np.conj(np.swapaxes(G, -1, -2)))
    props = np.stack([sla.expm(0.1 * g) for g in G])

    mesh = parallel.make_mesh((4, 2), (parallel.TIME_AXIS, parallel.MODEL_AXIS))
    p_sharded = jax.device_put(
        props, NamedSharding(mesh, P(parallel.TIME_AXIS, parallel.MODEL_AXIS, None))
    )
    out = parallel.sharded_propagator_scan(
        p_sharded, mesh=mesh, axis_name=parallel.TIME_AXIS
    )
    ref = jax.lax.associative_scan(lambda a, b: jnp.matmul(b, a), jnp.asarray(props))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_tensor_expm_through_solver_class():
    """method='tensor_expm' flows through Solver.solve (signal handling,
    quantum_info y0 table, results conversion) like any other LMDE method."""
    from qiskit_dynamics_tpu import Solver, Signal

    n = 8
    rng = np.random.default_rng(1)
    H0 = rng.normal(size=(n, n)); H0 = H0 + H0.T
    Hd = rng.normal(size=(n, n)); Hd = Hd + Hd.T
    solver = Solver(static_hamiltonian=H0, hamiltonian_operators=[Hd],
                    rotating_frame=np.diag(np.diag(H0)))
    y0 = np.zeros(n, dtype=complex); y0[0] = 1.0
    sig = [Signal(0.4, carrier_freq=1.1)]
    r = solver.solve(t_span=[0.0, 1.0], y0=y0, signals=sig,
                     method="tensor_expm", mesh=parallel.model_mesh(4), max_dt=0.1)
    ref = solver.solve(t_span=[0.0, 1.0], y0=y0, signals=sig, method="jax_expm",
                       max_dt=0.1, magnus_order=2, expm_method="taylor")
    np.testing.assert_allclose(np.asarray(r.y[-1]), np.asarray(ref.y[-1]), atol=1e-12)
