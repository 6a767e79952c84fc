"""Lanczos/Krylov unit tests: tridiagonalization invariants and expm
accuracy vs dense ground truth (behaviors modeled on the reference
``/root/reference/test/dynamics/solvers/test_lanczos.py``; expectations
from the Lanczos recurrence identities)."""

import numpy as np
import pytest
from scipy.linalg import expm

from qiskit_dynamics_tpu.solvers.lanczos import (
    jax_lanczos_expm,
    lanczos_basis,
    lanczos_eigh,
    lanczos_expm,
)

rng = np.random.default_rng(5)


def _random_hermitian(d):
    m = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    return (m + m.conj().T) / 2


class TestLanczosBasis:
    def test_tridiagonal_recurrence(self):
        d, k = 12, 8
        A = _random_hermitian(d)
        y0 = rng.normal(size=d) + 1j * rng.normal(size=d)
        y0 = y0 / np.linalg.norm(y0)  # lanczos_basis expects normalized y0
        tridiag, Q = lanczos_basis(A, y0, k)
        Q = np.asarray(Q)
        tridiag = np.asarray(tridiag)
        # columns orthonormal
        np.testing.assert_allclose(
            Q.conj().T @ Q, np.eye(k), atol=1e-10
        )
        # A restricted to the Krylov space equals the tridiagonal matrix
        np.testing.assert_allclose(Q.conj().T @ A @ Q, tridiag, atol=1e-8)
        # first column is y0
        np.testing.assert_allclose(Q[:, 0], y0, atol=1e-12)

    def test_full_dim_reproduces_eigh(self):
        d = 6
        A = _random_hermitian(d)
        y0 = rng.normal(size=d) + 1j * rng.normal(size=d)
        y0 = y0 / np.linalg.norm(y0)
        _, evals, _ = lanczos_eigh(A, y0, d)
        np.testing.assert_allclose(
            np.sort(np.asarray(evals)), np.linalg.eigvalsh(A), atol=1e-8
        )


class TestLanczosExpm:
    @pytest.mark.parametrize("k_dim", [8, 10])
    def test_anti_hermitian_expm(self, k_dim):
        """lanczos_expm computes expm(-i H) y for anti-Hermitian A = -iH."""
        d = 10
        H = _random_hermitian(d)
        A = -1j * H
        y0 = rng.normal(size=d) + 1j * rng.normal(size=d)
        y0 = y0 / np.linalg.norm(y0)
        out = np.asarray(lanczos_expm(A, y0, k_dim))
        expected = expm(A) @ y0
        tol = 1e-8 if k_dim >= 10 else 5e-2  # k=8 of dim 10: truncated Krylov
        np.testing.assert_allclose(out, expected, atol=tol)

    def test_scale_factor(self):
        d = 8
        H = _random_hermitian(d)
        A = -1j * H
        y0 = np.eye(d, dtype=complex)[:, 0]
        dt = 0.3
        out = np.asarray(lanczos_expm(A, y0, d, scale_factor=dt))
        np.testing.assert_allclose(out, expm(dt * A) @ y0, atol=1e-8)

    def test_jax_matches_numpy(self):
        d, k = 8, 6
        H = _random_hermitian(d)
        A = -1j * H
        y0 = rng.normal(size=d) + 1j * rng.normal(size=d)
        y0 = y0 / np.linalg.norm(y0)
        a = np.asarray(lanczos_expm(A, y0, k, scale_factor=0.2))
        b = np.asarray(jax_lanczos_expm(A, y0, k, scale_factor=0.2))
        np.testing.assert_allclose(a, b, atol=1e-9)

    def test_jax_early_termination_krylov_closure(self):
        """y0 inside a 2-dim invariant subspace: the jax path's
        early-exit-as-zeros convention must still give the exact answer."""
        d = 6
        evals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        U = np.linalg.qr(
            rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        )[0]
        H = U @ np.diag(evals) @ U.conj().T
        A = -1j * H
        # y0 spans eigenvectors 0 and 1 only
        y0 = (U[:, 0] + U[:, 1]) / np.sqrt(2)
        out = np.asarray(jax_lanczos_expm(A, y0, 5))
        np.testing.assert_allclose(out, expm(A) @ y0, atol=1e-8)
