"""Pseudorandom model-evaluation battery (mirrors the reference's
test_generator_model.py / test_lindblad_model.py evaluation families:
evaluate vs explicit formula, in/out of frame basis, evaluate_rhs
consistency, static-only and operators-only configurations, jit/grad)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.models import (
    GeneratorModel,
    HamiltonianModel,
    LindbladModel,
    RotatingFrame,
)
from qiskit_dynamics_tpu.signals import Signal, SignalList


def _rand_complex(rng, shape, scale=1.0):
    return scale * (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))


def _rand_herm(rng, n, scale=1.0):
    a = _rand_complex(rng, (n, n), scale)
    return (a + a.conj().T) / 2


class TestGeneratorModelPseudorandom:
    """evaluate()/evaluate_rhs() against the explicit frame formula
    G_F(t) = e^{-Ft}(G(t) - F)e^{Ft} for random operators and frames."""

    @pytest.mark.parametrize("seed", [1, 7, 42])
    def test_evaluate_vs_explicit_frame_formula(self, seed):
        rng = np.random.default_rng(seed)
        n, k = 5, 3
        static = _rand_complex(rng, (n, n), 0.4)
        ops = _rand_complex(rng, (k, n, n), 0.3)
        # anti-Hermitian frame (general F = -iH form)
        F = 1j * _rand_herm(rng, n)
        coeffs = rng.standard_normal(k)
        sigs = [Signal(float(c), carrier_freq=float(f))
                for c, f in zip(coeffs, rng.standard_normal(k))]
        model = GeneratorModel(
            static_operator=static, operators=ops, signals=sigs,
            rotating_frame=F,
        )
        t = 0.37
        sig_vals = np.array([s(t) for s in sigs])
        G_lab = static + np.tensordot(sig_vals, ops, axes=1)
        expFt = __import__("scipy.linalg", fromlist=["expm"]).expm(
            np.asarray(F) * t
        )
        expect = np.linalg.solve(expFt, (G_lab - F) @ expFt)
        np.testing.assert_allclose(
            np.asarray(model.evaluate(t)), expect, atol=1e-8
        )

    @pytest.mark.parametrize("seed", [3, 11])
    def test_evaluate_rhs_matches_evaluate_matmul(self, seed):
        rng = np.random.default_rng(seed)
        n, k = 4, 2
        model = GeneratorModel(
            static_operator=_rand_complex(rng, (n, n), 0.4),
            operators=_rand_complex(rng, (k, n, n), 0.3),
            signals=[Signal(1.0, carrier_freq=0.5), Signal(lambda t: t)],
            rotating_frame=1j * _rand_herm(rng, n),
        )
        t = 0.81
        y = _rand_complex(rng, (n,))
        np.testing.assert_allclose(
            np.asarray(model.evaluate_rhs(t, y)),
            np.asarray(model.evaluate(t)) @ y,
            atol=1e-9,
        )
        Y = _rand_complex(rng, (n, n))
        np.testing.assert_allclose(
            np.asarray(model.evaluate_rhs(t, Y)),
            np.asarray(model.evaluate(t)) @ Y,
            atol=1e-9,
        )

    def test_in_frame_basis_relation(self):
        rng = np.random.default_rng(5)
        n = 4
        model_args = dict(
            static_operator=_rand_complex(rng, (n, n), 0.4),
            operators=_rand_complex(rng, (1, n, n), 0.3),
            signals=[Signal(0.8, carrier_freq=0.2)],
            rotating_frame=1j * _rand_herm(rng, n),
        )
        m_lab = GeneratorModel(**model_args, in_frame_basis=False)
        m_fb = GeneratorModel(**model_args, in_frame_basis=True)
        t = 0.53
        U = np.asarray(m_fb.rotating_frame.frame_basis)  # eigenbasis map
        out_fb = np.asarray(m_fb.evaluate(t))
        out_lab = np.asarray(m_lab.evaluate(t))
        np.testing.assert_allclose(U @ out_fb @ U.conj().T, out_lab, atol=1e-8)

    def test_static_only_model(self):
        rng = np.random.default_rng(9)
        static = _rand_complex(rng, (3, 3), 0.5)
        model = GeneratorModel(static_operator=static)
        np.testing.assert_allclose(np.asarray(model.evaluate(1.3)), static, atol=1e-12)

    def test_operators_only_model(self):
        rng = np.random.default_rng(10)
        ops = _rand_complex(rng, (2, 3, 3), 0.5)
        model = GeneratorModel(
            operators=ops, signals=[Signal(2.0), Signal(-0.5)]
        )
        np.testing.assert_allclose(
            np.asarray(model.evaluate(0.0)), 2.0 * ops[0] - 0.5 * ops[1], atol=1e-9
        )


class TestLindbladModelPseudorandom:
    def _explicit_rhs(self, H, diss, rho):
        out = -1j * (H @ rho - rho @ H)
        for L in diss:
            out = out + L @ rho @ L.conj().T - 0.5 * (
                L.conj().T @ L @ rho + rho @ L.conj().T @ L
            )
        return out

    @pytest.mark.parametrize("seed", [2, 13])
    def test_evaluate_rhs_vs_explicit(self, seed):
        rng = np.random.default_rng(seed)
        n = 4
        H0 = _rand_herm(rng, n)
        Hk = _rand_herm(rng, n, 0.3)
        L0 = _rand_complex(rng, (n, n), 0.2)
        Lk = _rand_complex(rng, (n, n), 0.1)
        model = LindbladModel(
            static_hamiltonian=H0, hamiltonian_operators=[Hk],
            hamiltonian_signals=[Signal(0.7, carrier_freq=0.3)],
            static_dissipators=[L0],
            dissipator_operators=[Lk],
            dissipator_signals=[Signal(0.4)],
        )
        t = 0.29
        rho = _rand_complex(rng, (n, n))
        rho = rho + rho.conj().T
        sig_val = 0.7 * np.cos(2 * np.pi * 0.3 * t)
        H = H0 + sig_val * Hk
        expect = self._explicit_rhs(
            H, [L0, np.sqrt(0.4) * Lk], rho
        )
        np.testing.assert_allclose(
            np.asarray(model.evaluate_rhs(t, rho)), expect, atol=1e-8
        )

    def test_frame_conjugation_consistency(self):
        # solving in a frame then undoing it equals the no-frame RHS path
        rng = np.random.default_rng(21)
        n = 3
        H0 = _rand_herm(rng, n)
        L = _rand_complex(rng, (n, n), 0.2)
        rho = _rand_herm(rng, n)
        m_nf = LindbladModel(static_hamiltonian=H0, static_dissipators=[L])
        m_f = LindbladModel(
            static_hamiltonian=H0, static_dissipators=[L], rotating_frame=H0
        )
        t = 0.4
        rf = m_f.rotating_frame
        rho_in = np.asarray(rf.operator_into_frame(t, rho))
        out_f = np.asarray(m_f.evaluate_rhs(t, rho_in))
        # d/dt of the frame map adds the +i[H_frame, .] correction; compare
        # through the generator relation instead: undo the frame on the output
        # of the frame model applied to the frame input, vs the no-frame rhs
        # minus the frame correction.
        out_nf = np.asarray(m_nf.evaluate_rhs(t, rho))
        corr = -1j * (H0 @ rho - rho @ H0)  # frame removes the H0 rotation
        np.testing.assert_allclose(
            np.asarray(rf.operator_out_of_frame(t, out_f)),
            out_nf - corr,
            atol=1e-8,
        )

    def test_vectorized_rhs_matches_unvectorized(self):
        rng = np.random.default_rng(31)
        n = 3
        H0 = _rand_herm(rng, n)
        L = _rand_complex(rng, (n, n), 0.2)
        rho = _rand_herm(rng, n)
        m = LindbladModel(static_hamiltonian=H0, static_dissipators=[L])
        mv = LindbladModel(
            static_hamiltonian=H0, static_dissipators=[L], vectorized=True
        )
        t = 0.0
        out = np.asarray(m.evaluate_rhs(t, rho))
        out_v = np.asarray(mv.evaluate_rhs(t, rho.flatten(order="F")))
        np.testing.assert_allclose(out_v.reshape((n, n), order="F"), out, atol=1e-9)


class TestModelJaxTransforms:
    def test_generator_model_jit_grad_evaluate(self):
        rng = np.random.default_rng(17)
        n = 3
        static = 1j * _rand_herm(rng, n)
        op = 1j * _rand_herm(rng, n, 0.4)

        def fro_norm(c):
            model = GeneratorModel(
                static_operator=static, operators=[op],
                signals=[Signal(c, carrier_freq=0.1)],
                rotating_frame=static,
            )
            g = model.evaluate(0.3)
            return jnp.sum(jnp.abs(g) ** 2)

        v = jax.jit(fro_norm)(0.5)
        np.testing.assert_allclose(v, fro_norm(0.5), rtol=1e-6)
        g = jax.grad(fro_norm)(0.5)
        eps = 1e-5
        fd = (fro_norm(0.5 + eps) - fro_norm(0.5 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4, atol=1e-8)

    def test_lindblad_model_jit_rhs(self):
        rng = np.random.default_rng(19)
        n = 3
        H0 = _rand_herm(rng, n)
        L = _rand_complex(rng, (n, n), 0.2)
        model = LindbladModel(
            static_hamiltonian=H0, hamiltonian_operators=[_rand_herm(rng, n, 0.3)],
            hamiltonian_signals=[Signal(1.0, carrier_freq=0.5)],
            static_dissipators=[L],
        )
        rho = np.eye(n, dtype=complex) / n
        f = jax.jit(lambda t: model.evaluate_rhs(t, rho))
        np.testing.assert_allclose(
            np.asarray(f(0.4)), np.asarray(model.evaluate_rhs(0.4, rho)), atol=1e-9
        )
