"""End-to-end JAX transformability tests (reference model:
``test/dynamics/test_jax_transformations.py``): jit and grad of a full
parameterized simulation with a physics assertion."""
import numpy as np
import jax
import jax.numpy as jnp

from qiskit_dynamics_tpu import Solver, Signal
from qiskit_dynamics_tpu.pulse import Gaussian

NU = 5.0
X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)


def _solver():
    return Solver(
        static_hamiltonian=2 * np.pi * NU * Z / 2,
        hamiltonian_operators=[2 * np.pi * X / 2],
        rotating_frame=2 * np.pi * NU * Z / 2,
    )


def _sim_prob(amp, method="tpu_dopri5"):
    solver = _solver()
    y0 = np.array([1.0, 0.0], dtype=complex)
    sig = Signal(lambda t: amp, carrier_freq=NU)
    kwargs = (
        {"max_dt": 0.01, "magnus_order": 2}
        if method == "jax_expm"
        else {"atol": 1e-10, "rtol": 1e-10}
    )
    res = solver.solve(t_span=[0.0, 1.0], y0=y0, signals=[sig], method=method, **kwargs)
    return jnp.abs(res.y[-1][1]) ** 2


class TestJitGradEndToEnd:
    def test_jit_pi_pulse_physics(self):
        # amp=1 over T=1: exactly a pi rotation in the RWA; counter-rotating
        # corrections bounded by ~amp/(4 nu)
        prob = jax.jit(_sim_prob)(1.0)
        assert abs(float(prob) - 1.0) < 0.01

        half = jax.jit(_sim_prob)(0.5)
        assert abs(float(half) - 0.5) < 0.02

    def test_grad_sign_and_magnitude(self):
        # d/d amp sin^2(pi amp / 2) = pi/2 sin(pi amp); at amp=0.5: pi/2
        g = jax.grad(_sim_prob)(0.5)
        assert abs(float(g) - np.pi / 2) < 0.05

    def test_vmap_jit_sweep(self):
        amps = jnp.linspace(0.0, 1.0, 11)
        probs = jax.jit(jax.vmap(_sim_prob))(amps)
        expected = np.sin(np.pi * np.asarray(amps) / 2) ** 2
        np.testing.assert_allclose(np.asarray(probs), expected, atol=0.02)

    def test_grad_through_fixed_step(self):
        g = jax.grad(lambda a: _sim_prob(a, method="jax_expm"))(0.5)
        assert np.isfinite(float(g))

    def test_jit_grad_pulse_schedule_param(self):
        # gradient w.r.t. a Gaussian pulse amplitude through the Solver pulse path
        solver = Solver(
            static_hamiltonian=2 * np.pi * NU * Z / 2,
            hamiltonian_operators=[2 * np.pi * 0.1 * X / 2],
            hamiltonian_channels=["d0"],
            channel_carrier_freqs={"d0": NU},
            dt=0.1,
            rotating_frame=2 * np.pi * NU * Z / 2,
        )
        y0 = np.array([1.0, 0.0], dtype=complex)

        @jax.jit
        def prob(amp):
            sig = Signal(
                lambda t: amp * jnp.exp(-((t - 3.2) ** 2) / (2 * 1.0**2)),
                carrier_freq=NU,
            )
            res = solver.solve(
                t_span=[0.0, 6.4], y0=y0, signals=[sig], method="tpu_dopri5",
                atol=1e-8, rtol=1e-8,
            )
            return jnp.abs(res.y[-1][1]) ** 2

        v, g = jax.value_and_grad(prob)(0.8)
        assert 0.0 < float(v) < 1.0
        assert np.isfinite(float(g)) and float(g) != 0.0
