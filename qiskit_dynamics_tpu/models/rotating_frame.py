"""Rotating-frame transformations.

TPU-first implementation of the reference frame kernel
(``/root/reference/qiskit_dynamics/models/rotating_frame.py``). The frame is an
anti-Hermitian operator ``F = -iH``, eigendecomposed ONCE at construction; all
transforms are then elementwise phase multiplies in the frame eigenbasis:

- state into/out of frame: ``exp(-+ tF) y`` = diagonal multiply
- operator conjugation ``exp(-tF) G exp(tF)`` = Hadamard product with the
  rank-1 phase matrix ``conj(e) e^T`` where ``e = exp(t d)`` (reference
  ``rotating_frame.py:350-353``)
- vectorized (dim^2) superoperator maps via the flattened rank-1 phase outer
  product (reference ``rotating_frame.py:537-582``).

Everything is jit/vmap/grad-compatible; validation errors inside a trace are
signaled by NaN-poisoning (raising is impossible under tracing), matching the
reference convention (``rotating_frame.py:585-660``).
"""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..unified import dequtip, unp
from jax import lax
from jax.tree_util import register_pytree_node

from ..dtypes import ArrayLike
from ..exceptions import DynamicsError


def _is_bcoo(x) -> bool:
    from jax.experimental import sparse as jsparse

    return isinstance(x, jsparse.BCOO)


def _is_scipy_sparse(x) -> bool:
    from scipy.sparse import issparse

    return issparse(x)


def _is_sparse(x) -> bool:
    return _is_bcoo(x) or _is_scipy_sparse(x)


def _sparse_to_dense(x):
    return x.todense() if _is_bcoo(x) else np.asarray(x.toarray())

__all__ = ["RotatingFrame"]


def _is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)


def _enforce_anti_herm(mat, atol: float = 1e-10, rtol: float = 1e-10):
    """Return the anti-Hermitian version of ``mat``.

    Hermitian input -> ``-1j * mat``; anti-Hermitian input -> unchanged.
    Concrete non-(anti-)Hermitian input raises; traced input NaN-poisons.
    """
    mat = unp.asarray(mat)
    cdtype = np.result_type(mat.dtype, np.complex64)
    mat = mat.astype(cdtype)

    adj = unp.conj(mat) if mat.ndim == 1 else unp.conj(mat).T

    if not _is_tracer(mat):
        m = np.asarray(mat)
        a = np.asarray(adj)
        if np.allclose(m, a, atol=atol, rtol=rtol):
            return -1j * mat
        if np.allclose(m, -a, atol=atol, rtol=rtol):
            return mat
        raise DynamicsError(
            "frame_operator must be either a Hermitian or anti-Hermitian matrix."
        )

    def anti_herm_branch(b):
        b_adj = jnp.conj(b) if b.ndim == 1 else jnp.conj(b).T
        return lax.cond(
            jnp.allclose(b, -b_adj, atol=atol, rtol=rtol),
            lambda A: A,
            lambda A: jnp.nan * A,
            b,
        )

    return lax.cond(
        jnp.allclose(mat, adj, atol=atol, rtol=rtol),
        lambda A: -1j * A,
        anti_herm_branch,
        mat,
    )


def _reshape_f(x, shape):
    """Fortran-order reshape (unp.reshape lacks order='F')."""
    return unp.reshape(x.T if x.ndim > 0 else x, tuple(reversed(shape))).T


class RotatingFrame:
    r"""Rotating frame specified by an anti-Hermitian operator ``F = -iH``.

    Can be instantiated with ``None`` (trivial frame), a 1-d array (diagonal
    ``H`` or ``F``), or a 2-d Hermitian/anti-Hermitian array (eigendecomposed
    once at construction).
    """

    def __init__(self, frame_operator, atol: float = 1e-10, rtol: float = 1e-10):
        if isinstance(frame_operator, RotatingFrame):
            frame_operator = frame_operator.frame_operator
        frame_operator = dequtip(frame_operator)
        self._frame_operator = frame_operator

        if frame_operator is None:
            self._dim = None
            self._frame_diag = None
            self._frame_basis = None
            self._frame_basis_adjoint = None
        else:
            frame_operator = unp.asarray(frame_operator)
            if frame_operator.ndim == 1:
                self._frame_diag = _enforce_anti_herm(frame_operator, atol=atol, rtol=rtol)
                self._frame_basis = None
                self._frame_basis_adjoint = None
                self._dim = self._frame_diag.shape[0]
            else:
                frame_operator = _enforce_anti_herm(frame_operator, atol=atol, rtol=rtol)
                # one-time diagonalization: iF is Hermitian
                frame_diag, frame_basis = unp.linalg.eigh(1j * frame_operator)
                self._frame_diag = -1j * frame_diag
                self._frame_basis = frame_basis
                self._frame_basis_adjoint = frame_basis.conj().T
                self._dim = self._frame_diag.shape[0]

        # lazily-built change-of-basis for vectorized (dim^2) operators
        self._vectorized_frame_basis = None
        self._vectorized_frame_basis_adjoint = None

    # --- properties -----------------------------------------------------
    @property
    def dim(self) -> Optional[int]:
        """Dimension of the frame."""
        return self._dim

    @property
    def frame_operator(self):
        """The original frame operator."""
        return self._frame_operator

    @property
    def frame_diag(self):
        """Eigenvalues of the frame operator (purely imaginary)."""
        return self._frame_diag

    @property
    def frame_basis(self):
        """Diagonalizing unitary (None for trivial/diagonal frames)."""
        return self._frame_basis

    @property
    def frame_basis_adjoint(self):
        """Adjoint of the diagonalizing unitary."""
        return self._frame_basis_adjoint

    # --- frame basis transforms -------------------------------------------
    def state_into_frame_basis(self, y):
        """``frame_basis_adjoint @ y``."""
        y = unp.asarray(y)
        if self._frame_basis_adjoint is None:
            return y
        return self._frame_basis_adjoint @ y

    def state_out_of_frame_basis(self, y):
        """``frame_basis @ y``."""
        y = unp.asarray(y)
        if self._frame_basis is None:
            return y
        return self._frame_basis @ y

    def operator_into_frame_basis(self, op, convert_type: bool = True):
        """``frame_basis_adjoint @ op @ frame_basis`` (broadcasts over stacked ops).

        Sparse operators pass through unchanged for diagonal frames; a full
        frame densifies them (the conjugated result is dense anyway)."""
        if isinstance(op, (list, tuple)):
            return [self.operator_into_frame_basis(x) for x in op]
        if op is None:
            return None
        if _is_sparse(op):
            if self._frame_basis is None:
                return op
            op = _sparse_to_dense(op)
        op = unp.asarray(op)
        if self._frame_basis is None:
            return op
        return self._frame_basis_adjoint @ (op @ self._frame_basis)

    def operator_out_of_frame_basis(self, op, convert_type: bool = True):
        """``frame_basis @ op @ frame_basis_adjoint`` (broadcasts over stacked ops)."""
        if isinstance(op, (list, tuple)):
            return [self.operator_out_of_frame_basis(x) for x in op]
        if op is None:
            return None
        if _is_sparse(op):
            if self._frame_basis is None:
                return op
            op = _sparse_to_dense(op)
        op = unp.asarray(op)
        if self._frame_basis is None:
            return op
        return self._frame_basis @ (op @ self._frame_basis_adjoint)

    # --- state transforms -------------------------------------------------
    def state_into_frame(
        self,
        t,
        y,
        y_in_frame_basis: bool = False,
        return_in_frame_basis: bool = False,
    ):
        """``exp(-tF) @ y`` via diagonal phase multiply in the frame basis."""
        y = unp.asarray(y)
        if self._frame_operator is None:
            return y
        out = y if y_in_frame_basis else self.state_into_frame_basis(y)
        # multiply along axis 0 (dim axis); supports (dim,) and (dim, m)
        out = (unp.exp(-t * self._frame_diag) * out.T).T
        if not return_in_frame_basis:
            out = self.state_out_of_frame_basis(out)
        return out

    def state_out_of_frame(
        self,
        t,
        y,
        y_in_frame_basis: bool = False,
        return_in_frame_basis: bool = False,
    ):
        """``exp(tF) @ y``."""
        return self.state_into_frame(-t, y, y_in_frame_basis, return_in_frame_basis)

    # --- operator transforms ---------------------------------------------
    def _conjugate_and_add(
        self,
        t,
        operator,
        op_to_add_in_fb=None,
        operator_in_frame_basis: bool = False,
        return_in_frame_basis: bool = False,
        vectorized_operators: bool = False,
    ):
        r"""Compute ``exp(-tF) G exp(tF) + B`` (``B`` added in the frame basis).

        Stacked operators: ``(k, dim, dim)`` arrays broadcast; with
        ``vectorized_operators=True``, operators are ``(dim^2,)`` /
        ``(dim^2, k)`` column-stacked vectors. Sparse operators (scipy CSR or
        BCOO) stay sparse: the rank-1 phase conjugation is an elementwise
        multiply, which preserves the sparsity pattern.
        """
        if _is_sparse(operator) and not vectorized_operators:
            return self._conjugate_and_add_sparse(
                t, operator, op_to_add_in_fb, operator_in_frame_basis,
                return_in_frame_basis,
            )
        operator = unp.asarray(operator)
        if vectorized_operators:
            if self._frame_operator is None:
                if op_to_add_in_fb is None:
                    return operator
                return operator + unp.asarray(op_to_add_in_fb)
            if operator.ndim == 2:
                operator = operator.T
            operator = _reshape_f(operator, operator.shape[:-1] + (self.dim, self.dim))

        if self._frame_operator is None:
            if op_to_add_in_fb is None:
                return operator
            return operator + unp.asarray(op_to_add_in_fb)

        out = operator
        if not operator_in_frame_basis:
            out = self.operator_into_frame_basis(out)

        # rank-1 phase matrix: conj(e)_i e_j with e = exp(t d)
        exp_freq = unp.exp(t * self._frame_diag)
        frame_mat = exp_freq.conj()[:, None] * exp_freq[None, :]
        out = out * frame_mat

        if op_to_add_in_fb is not None:
            out = out + unp.asarray(op_to_add_in_fb)

        if not return_in_frame_basis:
            out = self.operator_out_of_frame_basis(out)

        if vectorized_operators:
            out = _reshape_f(out, out.shape[:-2] + (self.dim**2,))
            if out.ndim == 2:
                out = out.T
        return out

    def _conjugate_and_add_sparse(
        self, t, operator, op_to_add_in_fb, operator_in_frame_basis, return_in_frame_basis
    ):
        """Sparse branch of :meth:`_conjugate_and_add` (2d CSR or BCOO).

        Only meaningful for diagonal frames (full-frame basis changes
        densify via ``operator_into_frame_basis``); the phase conjugation
        scales the stored entries in place, keeping the pattern."""
        if self._frame_operator is None:
            if op_to_add_in_fb is None:
                return operator
            return operator + op_to_add_in_fb
        if not operator_in_frame_basis and self._frame_basis is not None:
            # full frame: result is dense — fall through to the dense path
            out = self.operator_into_frame_basis(operator)
            return self._conjugate_and_add(
                t, out, op_to_add_in_fb=op_to_add_in_fb,
                operator_in_frame_basis=True, return_in_frame_basis=return_in_frame_basis,
            )

        exp_freq = unp.exp(t * self._frame_diag)
        if _is_bcoo(operator):
            from jax.experimental import sparse as jsparse

            rows = operator.indices[:, 0]
            cols = operator.indices[:, 1]
            phase = jnp.conj(exp_freq)[rows] * exp_freq[cols]
            out = jsparse.BCOO(
                (operator.data * phase, operator.indices),
                shape=operator.shape,
                indices_sorted=operator.indices_sorted,
                unique_indices=operator.unique_indices,
            )
            if op_to_add_in_fb is not None:
                add = op_to_add_in_fb
                if not _is_bcoo(add):
                    add = jsparse.BCOO.fromdense(unp.asarray(add))
                out = out + add
        else:  # scipy sparse
            frame_mat = np.outer(np.conj(exp_freq), exp_freq)
            out = operator.multiply(frame_mat).tocsr()
            if op_to_add_in_fb is not None:
                from scipy.sparse import csr_matrix, issparse

                add = op_to_add_in_fb if issparse(op_to_add_in_fb) else csr_matrix(
                    np.asarray(op_to_add_in_fb)
                )
                out = (out + add).tocsr()
        if not return_in_frame_basis:
            out = self.operator_out_of_frame_basis(out)
        return out

    def operator_into_frame(
        self,
        t,
        operator,
        operator_in_frame_basis: bool = False,
        return_in_frame_basis: bool = False,
        vectorized_operators: bool = False,
    ):
        """``exp(-tF) @ operator @ exp(tF)``."""
        return self._conjugate_and_add(
            t,
            operator,
            operator_in_frame_basis=operator_in_frame_basis,
            return_in_frame_basis=return_in_frame_basis,
            vectorized_operators=vectorized_operators,
        )

    def operator_out_of_frame(
        self,
        t,
        operator,
        operator_in_frame_basis: bool = False,
        return_in_frame_basis: bool = False,
        vectorized_operators: bool = False,
    ):
        """``exp(tF) @ operator @ exp(-tF)``."""
        return self.operator_into_frame(
            -t,
            operator,
            operator_in_frame_basis=operator_in_frame_basis,
            return_in_frame_basis=return_in_frame_basis,
            vectorized_operators=vectorized_operators,
        )

    def generator_into_frame(
        self,
        t,
        operator,
        operator_in_frame_basis: bool = False,
        return_in_frame_basis: bool = False,
        vectorized_operators: bool = False,
    ):
        """``exp(-tF) @ operator @ exp(tF) - F``."""
        if self._frame_operator is None:
            return unp.asarray(operator)
        return self._conjugate_and_add(
            t,
            operator,
            op_to_add_in_fb=-unp.diag(self._frame_diag),
            operator_in_frame_basis=operator_in_frame_basis,
            return_in_frame_basis=return_in_frame_basis,
            vectorized_operators=vectorized_operators,
        )

    def generator_out_of_frame(
        self,
        t,
        operator,
        operator_in_frame_basis: bool = False,
        return_in_frame_basis: bool = False,
    ):
        """``exp(tF) @ operator @ exp(-tF) + F``."""
        if self._frame_operator is None:
            return unp.asarray(operator)
        return self._conjugate_and_add(
            -t,
            operator,
            op_to_add_in_fb=unp.diag(self._frame_diag),
            operator_in_frame_basis=operator_in_frame_basis,
            return_in_frame_basis=return_in_frame_basis,
        )

    # --- vectorized (dim^2) support ----------------------------------------
    @property
    def vectorized_frame_basis(self):
        """Lazily-built ``kron(conj(C), C)`` for vectorized operators."""
        if self._frame_basis is None:
            return None
        if self._vectorized_frame_basis is None:
            self._vectorized_frame_basis = unp.kron(
                self._frame_basis.conj(), self._frame_basis
            )
            self._vectorized_frame_basis_adjoint = self._vectorized_frame_basis.conj().T
        return self._vectorized_frame_basis

    @property
    def vectorized_frame_basis_adjoint(self):
        """Adjoint of :attr:`vectorized_frame_basis`."""
        if self._frame_basis is None:
            return None
        if self._vectorized_frame_basis_adjoint is None:
            _ = self.vectorized_frame_basis
        return self._vectorized_frame_basis_adjoint

    def vectorized_map_into_frame(
        self,
        time,
        op,
        operator_in_frame_basis: bool = False,
        return_in_frame_basis: bool = False,
    ):
        r"""Frame map for a column-stacked ``(dim^2, dim^2)`` superoperator.

        Computes ``(e^{tF}^T (x) e^{-tF}) op (e^{-tF}^T (x) e^{tF})`` via a
        Hadamard product with the flattened rank-1 phase outer product.
        """
        if self._frame_diag is None:
            return op
        op = unp.asarray(op)
        if not operator_in_frame_basis and self._frame_basis is not None:
            op = self.vectorized_frame_basis_adjoint @ (op @ self.vectorized_frame_basis)

        expvals = unp.exp(time * self._frame_diag)
        temp_outer = (expvals.conj()[:, None] * expvals[None, :]).flatten()
        delta_bar_otimes_delta = unp.outer(temp_outer.conj(), temp_outer)
        op = delta_bar_otimes_delta * op

        if not return_in_frame_basis and self._frame_basis is not None:
            op = self.vectorized_frame_basis @ (op @ self.vectorized_frame_basis_adjoint)
        return op

    # --- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        leaves = (
            self._frame_operator if self._frame_operator is None else unp.asarray(self._frame_operator),
            self._frame_diag,
            self._frame_basis,
            self._frame_basis_adjoint,
        )
        return leaves, (self._dim,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        (obj._dim,) = aux
        (
            obj._frame_operator,
            obj._frame_diag,
            obj._frame_basis,
            obj._frame_basis_adjoint,
        ) = leaves
        obj._vectorized_frame_basis = None
        obj._vectorized_frame_basis_adjoint = None
        return obj


register_pytree_node(RotatingFrame, RotatingFrame.tree_flatten, RotatingFrame.tree_unflatten)
