"""Krylov-subspace (Lanczos) matrix-exponential action.

Reference: ``/root/reference/qiskit_dynamics/solvers/lanczos.py``. For an
anti-Hermitian generator ``A = -iH``, ``exp(dt A) y`` is approximated by
tridiagonalizing ``H`` in the Krylov space span{y, Hy, ..., H^(k-1)y} (with one
reorthogonalization correction per iteration for stability) and exponentiating
the small tridiagonal eigensystem.

The JAX version runs the iteration as a ``lax.scan`` with a ``cond``-guarded
early exit (emitting zero vectors once beta underflows) so it is fully
jit/vmap-compatible with static shapes.
"""
from __future__ import annotations

from typing import Optional, Union

import numpy as np
import jax.numpy as jnp
from jax.lax import scan, cond
from scipy.sparse import csr_matrix

__all__ = ["lanczos_basis", "lanczos_eigh", "lanczos_expm", "jax_lanczos_expm"]


def lanczos_basis(A: Union[csr_matrix, np.ndarray], y0: np.ndarray, k_dim: int):
    """Tridiagonalize Hermitian ``A`` in a ``k_dim`` Krylov subspace (numpy).

    Returns ``(tridiagonal, q_basis)`` with ``q_basis`` of shape ``(n, k)``.
    """
    data_type = np.result_type(A.dtype, y0.dtype)
    y0 = np.asarray(y0).reshape(-1)
    n = A.shape[0]
    q_basis = np.zeros((k_dim, n), dtype=data_type)
    alpha = np.zeros(k_dim, dtype=data_type)
    beta = np.zeros(k_dim, dtype=data_type)

    q_basis[0] = y0
    projection = A @ y0
    alpha[0] = np.vdot(y0, projection)
    projection = projection - alpha[0] * y0
    beta[0] = np.linalg.norm(projection)

    eps = np.finfo(np.float64).eps
    for i in range(1, k_dim):
        if np.abs(beta[i - 1]) < eps:
            k_dim = i
            break
        v_prev = q_basis[i - 1]
        q_basis[i] = projection / beta[i - 1]
        projection = A @ q_basis[i]
        alpha[i] = np.vdot(q_basis[i], projection)
        projection = projection - alpha[i] * q_basis[i] - beta[i - 1] * v_prev
        # one reorthogonalization step for accuracy
        delta = np.vdot(q_basis[i], projection)
        projection = projection - delta * q_basis[i]
        alpha[i] = alpha[i] + delta
        beta[i] = np.linalg.norm(projection)

    tridiagonal = (
        np.diag(alpha[:k_dim])
        + np.diag(beta[: k_dim - 1], k=-1)
        + np.diag(beta[: k_dim - 1], k=1)
    )
    return tridiagonal, q_basis[:k_dim].T


def lanczos_eigh(A, y0, k_dim: int):
    """Eigendecomposition of the Krylov projection of Hermitian ``A``."""
    tridiagonal, q_basis = lanczos_basis(A, y0, k_dim)
    eigvals, eigvecs = np.linalg.eigh(tridiagonal)
    return q_basis, eigvals, eigvecs


def lanczos_expm(A, y0, k_dim: int, scale_factor: Optional[float] = 1.0):
    """``exp(scale_factor * A) @ y0`` for anti-Hermitian ``A`` (numpy)."""
    if y0.ndim == 1:
        H = 1j * A  # Hermitian
        norm = np.linalg.norm(y0)
        q_basis, eigvals, eigvecs = lanczos_eigh(H, y0 / norm, k_dim)
        return norm * (q_basis @ (eigvecs @ (np.exp(-1j * scale_factor * eigvals) * eigvecs[0])))
    cols = [lanczos_expm(A, yi, k_dim, scale_factor) for yi in np.asarray(y0).T]
    return np.array(cols).T


def _jax_lanczos_basis(A, y0, k_dim: int):
    """JAX Lanczos tridiagonalization with static shapes."""
    data_type = jnp.result_type(A.dtype, y0.dtype)
    y0 = jnp.asarray(y0, dtype=data_type)

    proj0 = A @ y0
    alpha0 = jnp.vdot(y0, proj0)
    proj0 = proj0 - alpha0 * y0
    beta0 = jnp.sqrt(jnp.abs(jnp.vdot(proj0, proj0)))

    def iteration(carry, _):
        q_prev, projection, beta_prev = carry

        def live(c):
            qp, proj, bp = c
            q_i = proj / bp
            proj_i = A @ q_i
            alpha_i = jnp.vdot(q_i, proj_i)
            proj_i = proj_i - alpha_i * q_i - bp * qp
            delta = jnp.vdot(q_i, proj_i)
            proj_i = proj_i - delta * q_i
            alpha_i = alpha_i + delta
            beta_i = jnp.sqrt(jnp.abs(jnp.vdot(proj_i, proj_i)))
            return (q_i, proj_i, beta_i), (alpha_i, beta_i, q_i)

        def dead(c):
            qp, proj, _ = c
            zero_vec = jnp.zeros_like(y0)
            zero_s = jnp.zeros((), dtype=data_type)
            return (zero_vec, zero_vec, jnp.zeros((), dtype=beta0.dtype)), (
                zero_s,
                jnp.zeros((), dtype=beta0.dtype),
                zero_vec,
            )

        return cond(jnp.real(beta_prev) > 0, live, dead, carry)

    _, (alphas, betas, qs) = scan(iteration, (y0, proj0, beta0), None, length=k_dim - 1)

    alpha = jnp.concatenate([jnp.asarray([alpha0]), alphas])
    beta = jnp.concatenate([jnp.asarray([beta0], dtype=betas.dtype), betas])
    q_basis = jnp.concatenate([y0[None], qs], axis=0)

    tridiagonal = (
        jnp.diag(alpha)
        + jnp.diag(beta[: k_dim - 1], k=-1)
        + jnp.diag(beta[: k_dim - 1], k=1)
    )
    return tridiagonal, q_basis.T


def jax_lanczos_expm(A, y0, k_dim: int, scale_factor: Optional[float] = 1.0):
    """``exp(scale_factor * A) @ y0`` for anti-Hermitian ``A`` (JAX)."""
    y0 = jnp.asarray(y0)
    if y0.ndim == 1:
        H = 1j * A
        norm = jnp.linalg.norm(y0)
        tridiagonal, q_basis = _jax_lanczos_basis(H, y0 / norm, k_dim)
        eigvals, eigvecs = jnp.linalg.eigh(tridiagonal)
        return norm * (q_basis @ (eigvecs @ (jnp.exp(-1j * scale_factor * eigvals) * eigvecs[0])))
    _, cols = scan(lambda _, yi: (None, jax_lanczos_expm(A, yi, k_dim, scale_factor)), None, y0.T)
    return cols.T
