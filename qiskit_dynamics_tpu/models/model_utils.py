"""Column-stacking vectorization utilities.

Reference: ``/root/reference/qiskit_dynamics/models/model_utils.py``. In
column-stacking convention ``vec(ABC) = (C^T kron A) vec(B)``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..unified import unp

__all__ = ["vec_commutator", "vec_dissipator"]


def _batch_kron(a, b):
    """kron over the last two axes, batch-aware."""
    if a.ndim == 2 and b.ndim == 2:
        return unp.kron(a, b)
    a = unp.asarray(a)
    b = unp.asarray(b)
    batch = unp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a = unp.broadcast_to(a, batch + a.shape[-2:])
    b = unp.broadcast_to(b, batch + b.shape[-2:])
    out = a[..., :, None, :, None] * b[..., None, :, None, :]
    return out.reshape(batch + (a.shape[-2] * b.shape[-2], a.shape[-1] * b.shape[-1]))


def vec_commutator(A):
    r"""Vectorization of ``X -> -i[A, X]``: ``-i(I kron A - A^T kron I)``.

    Batch-aware: a ``(k, n, n)`` stack returns ``(k, n^2, n^2)``.
    """
    A = unp.asarray(A)
    iden = unp.eye(A.shape[-1], dtype=A.dtype)
    At = unp.swapaxes(A, -1, -2)
    return -1j * (_batch_kron(iden, A) - _batch_kron(At, iden))


def vec_dissipator(L):
    r"""Vectorization of ``X -> L X L^dag - 1/2 {L^dag L, X}``:
    ``conj(L) kron L - 1/2 (I kron L^dag L + (L^dag L)^T kron I)``.

    Batch-aware: a ``(k, n, n)`` stack returns ``(k, n^2, n^2)``.
    """
    L = unp.asarray(L)
    iden = unp.eye(L.shape[-1], dtype=L.dtype)
    Lconj = L.conj()
    LdagL = unp.swapaxes(Lconj, -1, -2) @ L
    LdagLtrans = unp.swapaxes(LdagL, -1, -2)
    return _batch_kron(Lconj, L) - 0.5 * (
        _batch_kron(iden, LdagL) + _batch_kron(LdagLtrans, iden)
    )
