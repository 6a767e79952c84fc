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


class TestTransformBreadth:
    """Transforms through the remaining solve families (reference analog:
    test_jax_transformations.py + per-class jit/grad helpers)."""

    def test_grad_through_lindblad(self):
        """Gradient of excited population w.r.t. dissipator strength."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from qiskit_dynamics_tpu import Solver, Signal

        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.diag([1.0, -1.0]).astype(complex)
        L = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        rho0 = np.diag([0.0, 1.0]).astype(complex)

        def excited_pop(gamma):
            solver = Solver(
                static_hamiltonian=2 * np.pi * 5.0 * Z / 2,
                static_dissipators=[jnp.sqrt(gamma) * jnp.asarray(L)],
            )
            res = solver.solve(
                t_span=[0.0, 1.0], y0=rho0, method="tpu_dopri5",
                atol=1e-10, rtol=1e-10, convert_results=False,
            )
            return jnp.real(res.y[-1][1, 1])

        g = jax.grad(excited_pop)(0.5)
        # d/dgamma exp(-gamma t) at t=1, gamma=0.5: -exp(-0.5)
        np.testing.assert_allclose(float(g), -np.exp(-0.5), atol=1e-6)

    def test_grad_through_perturbative_solver(self):
        """DysonSolver.solve is differentiable in the signal amplitude."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from qiskit_dynamics_tpu.solvers import DysonSolver
        from qiskit_dynamics_tpu import Signal

        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.diag([1.0, -1.0]).astype(complex)
        nu = 5.0
        dt = 0.05
        solver = DysonSolver(
            operators=[-1j * 2 * np.pi * 0.1 * X / 2],
            rotating_frame=-1j * 2 * np.pi * nu * Z / 2,
            dt=dt,
            carrier_freqs=[nu],
            chebyshev_orders=[1],
            expansion_order=4,
        )
        y0 = np.array([1.0, 0.0], dtype=complex)

        def pop1(amp):
            sig = Signal(amp, carrier_freq=nu)
            yf = solver.solve(
                signals=[sig], y0=y0, t0=0.0, n_steps=40, jax_control_flow=True
            ).y[-1]
            return jnp.abs(yf[1]) ** 2

        g = jax.grad(pop1)(1.0)
        # Rabi: p1 = sin^2(pi r amp T / 2) (RWA rate r/2), T = 2.0, r = 0.1
        T, r = 40 * dt, 0.1
        expected = np.pi * r * T * np.sin(np.pi * r * T / 2) * np.cos(np.pi * r * T / 2)
        np.testing.assert_allclose(float(g), expected, rtol=5e-2)

    def test_vmap_over_t_span(self):
        """vmap over final times through the jittable solver."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from qiskit_dynamics_tpu import Solver, Signal

        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.diag([1.0, -1.0]).astype(complex)
        solver = Solver(
            static_hamiltonian=2 * np.pi * 5.0 * Z / 2,
            hamiltonian_operators=[2 * np.pi * 0.1 * X / 2],
            rotating_frame=2 * np.pi * 5.0 * Z / 2,
            rwa_cutoff_freq=7.5, rwa_carrier_freqs=[5.0],
        )
        y0 = np.array([1.0, 0.0], dtype=complex)

        def pop1(T):
            res = solver.solve(
                t_span=jnp.stack([0.0 * T, T]), y0=y0,
                signals=[Signal(1.0, carrier_freq=5.0)],
                method="tpu_dopri5", atol=1e-10, rtol=1e-10,
                convert_results=False,
            )
            return jnp.abs(res.y[-1][1]) ** 2

        Ts = jnp.array([1.0, 2.5, 5.0])
        pops = np.asarray(jax.vmap(pop1)(Ts))
        expected = np.sin(np.pi * 0.1 * np.asarray(Ts) / 2) ** 2
        np.testing.assert_allclose(pops, expected, atol=1e-4)

    def test_jit_grad_through_rotating_frame_param(self):
        """Differentiate through the frame frequency itself (diagonal frame)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from qiskit_dynamics_tpu.models import GeneratorModel
        from qiskit_dynamics_tpu import solve_ode, Signal

        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)

        def overlap(w):
            model = GeneratorModel(
                static_operator=None,
                operators=[-1j * 2 * np.pi * jnp.asarray(X) / 2],
                signals=[Signal(0.1, carrier_freq=w)],
                rotating_frame=jnp.array([-1j * jnp.pi * w, 1j * jnp.pi * w]),
            )
            res = solve_ode(
                model, [0.0, 1.0], jnp.array([1.0 + 0j, 0.0j]),
                method="tpu_dopri5", atol=1e-10, rtol=1e-10,
            )
            return jnp.abs(res.y[-1][0]) ** 2

        val, g = jax.jit(jax.value_and_grad(overlap))(5.0)
        assert np.isfinite(float(val)) and np.isfinite(float(g))
