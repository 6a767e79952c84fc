"""Tests for DysonSolver / MagnusSolver against adaptive-solver ground truth."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu import Signal, solve_ode, DysonSolver, MagnusSolver
from qiskit_dynamics_tpu.exceptions import DynamicsError

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)

NU = 5.0
G0 = -1j * 2 * np.pi * NU * Z / 2
G1 = -1j * 2 * np.pi * X / 2


def _ground_truth(envelope, T):
    """Solution in the rotating frame of G0 (perturbative solvers solve the
    LMDE with the toggling-frame generator; see reference DysonSolver doc)."""
    from scipy.linalg import expm

    def rhs(t, y):
        sig = np.real(envelope(t) * np.exp(1j * 2 * np.pi * NU * t))
        return (G0 + sig * G1) @ y

    res = solve_ode(rhs, [0.0, T], np.eye(2, dtype=complex), method="DOP853",
                    atol=1e-13, rtol=1e-13)
    return expm(-T * G0) @ np.asarray(res.y[-1])


def _gauss(amp, sigma, T):
    def env(t):
        return amp * np.exp(-((t - T / 2) ** 2) / (2 * sigma**2))
    return env


@pytest.fixture(scope="module")
def dyson_solver():
    return DysonSolver(
        operators=[G1],
        rotating_frame=G0,
        dt=0.025,
        carrier_freqs=[NU],
        chebyshev_orders=[2],
        expansion_order=5,
        atol=1e-13, rtol=1e-13,
    )


@pytest.fixture(scope="module")
def magnus_solver():
    return MagnusSolver(
        operators=[G1],
        rotating_frame=G0,
        dt=0.025,
        carrier_freqs=[NU],
        chebyshev_orders=[2],
        expansion_order=3,
        atol=1e-13, rtol=1e-13,
    )


class TestDysonSolver:
    def test_vs_ground_truth(self, dyson_solver):
        T, n_steps = 1.0, 40
        env = _gauss(0.4, 0.25, T)
        sig = Signal(env, carrier_freq=NU)
        res = dyson_solver.solve(t0=0.0, n_steps=n_steps, y0=np.eye(2, dtype=complex),
                                 signals=[sig])
        expected = _ground_truth(env, T)
        err = np.max(np.abs(np.asarray(res.y[-1]) - expected))
        assert err < 1e-6, err

    def test_jax_path_matches_numpy(self, dyson_solver):
        T, n_steps = 0.5, 20
        env = _gauss(0.3, 0.2, T)
        sig = Signal(env, carrier_freq=NU)
        y0 = np.eye(2, dtype=complex)
        res_np = dyson_solver.solve(0.0, n_steps, y0, [sig], jax_control_flow=False)
        res_jax = dyson_solver.solve(0.0, n_steps, jnp.asarray(y0), [sig])
        np.testing.assert_allclose(
            np.asarray(res_jax.y[-1]), np.asarray(res_np.y[-1]), atol=1e-10
        )

    def test_jit_grad_through_solve(self, dyson_solver):
        n_steps = 10

        @jax.jit
        def overlap(amp):
            sig = Signal(lambda t: amp * jnp.exp(-((t - 0.125) ** 2) / 0.02),
                         carrier_freq=NU)
            res = dyson_solver.solve(0.0, n_steps, jnp.eye(2, dtype=complex), [sig])
            return jnp.abs(res.y[-1][1, 0]) ** 2

        v = overlap(0.5)
        g = jax.grad(lambda a: overlap(a).real)(0.5)
        assert np.isfinite(float(v)) and np.isfinite(float(g))

    def test_list_broadcast(self, dyson_solver):
        sig1 = Signal(_gauss(0.3, 0.2, 0.5), carrier_freq=NU)
        sig2 = Signal(_gauss(0.5, 0.2, 0.5), carrier_freq=NU)
        results = dyson_solver.solve(
            0.0, 10, np.eye(2, dtype=complex), [[sig1], [sig2]]
        )
        assert isinstance(results, list) and len(results) == 2

    def test_signal_length_validation(self, dyson_solver):
        with pytest.raises(DynamicsError):
            dyson_solver.solve(0.0, 5, np.eye(2, dtype=complex),
                               [Signal(1.0, NU), Signal(1.0, NU)])


class TestMagnusSolver:
    def test_vs_ground_truth(self, magnus_solver):
        T, n_steps = 1.0, 40
        env = _gauss(0.4, 0.25, T)
        sig = Signal(env, carrier_freq=NU)
        res = magnus_solver.solve(t0=0.0, n_steps=n_steps, y0=np.eye(2, dtype=complex),
                                  signals=[sig])
        expected = _ground_truth(env, T)
        err = np.max(np.abs(np.asarray(res.y[-1]) - expected))
        assert err < 1e-6, err

    def test_jax_path_matches_numpy(self, magnus_solver):
        T, n_steps = 0.5, 20
        env = _gauss(0.3, 0.2, T)
        sig = Signal(env, carrier_freq=NU)
        y0 = np.eye(2, dtype=complex)
        res_np = magnus_solver.solve(0.0, n_steps, y0, [sig], jax_control_flow=False)
        res_jax = magnus_solver.solve(0.0, n_steps, jnp.asarray(y0), [sig])
        np.testing.assert_allclose(
            np.asarray(res_jax.y[-1]), np.asarray(res_np.y[-1]), atol=1e-10
        )


class TestExpansionModelValidation:
    def test_bad_method(self):
        from qiskit_dynamics_tpu.solvers import ExpansionModel

        with pytest.raises(DynamicsError):
            ExpansionModel(
                operators=[G1], rotating_frame=G0, dt=0.1, carrier_freqs=[NU],
                chebyshev_orders=[1], expansion_method="taylor", expansion_order=2,
            )

    def test_length_mismatch(self):
        from qiskit_dynamics_tpu.solvers import ExpansionModel

        with pytest.raises(DynamicsError):
            ExpansionModel(
                operators=[G1], rotating_frame=G0, dt=0.1, carrier_freqs=[NU, NU],
                chebyshev_orders=[1], expansion_order=2,
            )


def test_solve_sweep_matches_per_member(dyson_solver):
    """Batched chain-kernel sweep == per-member solves."""
    y0 = np.array([1.0, 0.0], dtype=complex)
    amps = jnp.array([0.2, 0.4])
    n_steps = 10
    signals_fn = lambda a: [
        Signal(lambda t: a * jnp.exp(-((t - 0.125) ** 2) / 0.02), carrier_freq=NU)
    ]
    out = dyson_solver.solve_sweep(0.0, n_steps, y0, signals_fn, amps,
                                   tile_b=8, interpret=True)
    for i, a in enumerate([0.2, 0.4]):
        sig = Signal(lambda t, a=a: a * np.exp(-((t - 0.125) ** 2) / 0.02),
                     carrier_freq=NU)
        ref = dyson_solver.solve(0.0, n_steps, y0, [sig], jax_control_flow=False)
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref.y[-1]), atol=1e-10
        )


def test_solve_sweep_magnus_matches_per_member(magnus_solver):
    """Magnus batched sweep (bol expm + chain kernel) == per-member solves."""
    y0 = np.array([1.0, 0.0], dtype=complex)
    amps = jnp.array([0.2, 0.4])
    n_steps = 10
    signals_fn = lambda a: [
        Signal(lambda t: a * jnp.exp(-((t - 0.125) ** 2) / 0.02), carrier_freq=NU)
    ]
    out = magnus_solver.solve_sweep(0.0, n_steps, y0, signals_fn, amps,
                                    tile_b=4, interpret=True)
    for i, a in enumerate([0.2, 0.4]):
        sig = Signal(lambda t, a=a: a * np.exp(-((t - 0.125) ** 2) / 0.02),
                     carrier_freq=NU)
        ref = magnus_solver.solve(0.0, n_steps, y0, [sig], jax_control_flow=False)
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref.y[-1]), atol=1e-9
        )


def test_solve_sweep_mesh_matches_serial(dyson_solver):
    """solve_sweep(mesh=...) shards the batch over the 8-device mesh and
    matches the serial call exactly (pad-to-8 trimming exercised at B=6)."""
    from qiskit_dynamics_tpu.parallel import data_mesh

    y0 = np.array([1.0, 0.0], dtype=complex)
    amps = jnp.linspace(0.1, 0.6, 6)
    n_steps = 10
    signals_fn = lambda a: [
        Signal(lambda t: a * jnp.exp(-((t - 0.125) ** 2) / 0.02), carrier_freq=NU)
    ]
    kw = dict(tile_b=8, interpret=True)
    serial = dyson_solver.solve_sweep(0.0, n_steps, y0, signals_fn, amps, **kw)
    sharded = dyson_solver.solve_sweep(
        0.0, n_steps, y0, signals_fn, amps, mesh=data_mesh(), **kw
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(serial), atol=1e-13
    )
