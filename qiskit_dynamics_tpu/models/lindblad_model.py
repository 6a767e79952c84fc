"""Lindblad master-equation model.

Reference: ``/root/reference/qiskit_dynamics/models/lindblad_model.py``.
Holds four operator groups (static/time-dependent Hamiltonian and dissipator
terms) with two signal lists; all operators rotated into the frame eigenbasis
at construction. Supports standard ``(n, n)`` density-matrix evaluation and a
column-stacking ``vectorized`` mode where the whole RHS is one
``(n^2, n^2) @ (n^2,)`` matvec (required for SuperOp simulation and LMDE
solvers).
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union
from warnings import warn

import numpy as np
import jax
import jax.numpy as jnp

from ..unified import unp
from jax.tree_util import register_pytree_node

from ..exceptions import DynamicsError
from ..signals import Signal, SignalList
from .rotating_frame import RotatingFrame
from .generator_model import (
    BaseGeneratorModel,
    _static_operator_into_frame_basis,
    _operators_into_frame_basis,
    is_hermitian,
)
from .operator_collections import (
    LindbladCollection,
    ScipySparseLindbladCollection,
    VectorizedLindbladCollection,
    ScipySparseVectorizedLindbladCollection,
)

__all__ = ["LindbladModel"]


class LindbladModel(BaseGeneratorModel):
    r"""Lindblad equation:

    ``d rho/dt = -i[H(t), rho] + Sigma_j (N_j rho N_j^dag - 1/2 {N_j^dag N_j, rho})
    + Sigma_j gamma_j(t) (L_j rho L_j^dag - 1/2 {L_j^dag L_j, rho})``.
    """

    def __init__(
        self,
        static_hamiltonian=None,
        hamiltonian_operators=None,
        hamiltonian_signals: Optional[Union[List[Signal], SignalList]] = None,
        static_dissipators=None,
        dissipator_operators=None,
        dissipator_signals: Optional[Union[List[Signal], SignalList]] = None,
        rotating_frame: Optional[Union[RotatingFrame, np.ndarray]] = None,
        in_frame_basis: bool = False,
        array_library: Optional[str] = None,
        vectorized: bool = False,
        validate: bool = True,
    ):
        if (
            static_hamiltonian is None
            and hamiltonian_operators is None
            and static_dissipators is None
            and dissipator_operators is None
        ):
            raise DynamicsError(
                f"{type(self).__name__} requires at least one operator group: pass "
                "static_hamiltonian, hamiltonian_operators, static_dissipators, "
                "or dissipator_operators."
            )
        from ..unified import dequtip

        static_hamiltonian = dequtip(static_hamiltonian)
        hamiltonian_operators = dequtip(hamiltonian_operators)
        static_dissipators = dequtip(static_dissipators)
        dissipator_operators = dequtip(dissipator_operators)
        if validate:
            if static_hamiltonian is not None and not is_hermitian(static_hamiltonian):
                raise DynamicsError("LindbladModel static_hamiltonian must be Hermitian.")
            if hamiltonian_operators is not None and any(
                not is_hermitian(op) for op in hamiltonian_operators
            ):
                raise DynamicsError("LindbladModel hamiltonian_operators must be Hermitian.")

        self._vectorized = vectorized
        self._rotating_frame = RotatingFrame(rotating_frame)
        self._in_frame_basis = in_frame_basis

        setup_library = "jax" if array_library == "jax_sparse" else array_library

        if static_hamiltonian is not None:
            static_hamiltonian = -1j * unp.asarray(static_hamiltonian)
        static_hamiltonian = _static_operator_into_frame_basis(
            static_hamiltonian, self._rotating_frame, setup_library
        )
        if static_hamiltonian is not None:
            static_hamiltonian = 1j * unp.asarray(static_hamiltonian)

        hamiltonian_operators = _operators_into_frame_basis(
            hamiltonian_operators, self._rotating_frame, setup_library
        )
        static_dissipators = _operators_into_frame_basis(
            static_dissipators, self._rotating_frame, setup_library
        )
        dissipator_operators = _operators_into_frame_basis(
            dissipator_operators, self._rotating_frame, setup_library
        )

        self._operator_collection = _get_lindblad_operator_collection(
            array_library=array_library,
            vectorized=vectorized,
            static_hamiltonian=static_hamiltonian,
            hamiltonian_operators=hamiltonian_operators,
            static_dissipators=static_dissipators,
            dissipator_operators=dissipator_operators,
        )

        self._hamiltonian_signals = None
        self._dissipator_signals = None
        self.signals = (hamiltonian_signals, dissipator_signals)
        super().__init__(array_library=array_library)

    @classmethod
    def from_hamiltonian(
        cls,
        hamiltonian,
        static_dissipators=None,
        dissipator_operators=None,
        dissipator_signals=None,
        array_library: Optional[str] = None,
        vectorized: bool = False,
    ) -> "LindbladModel":
        """Construct from a :class:`HamiltonianModel` plus dissipator terms."""
        in_frame_basis = hamiltonian.in_frame_basis
        hamiltonian.in_frame_basis = False
        static_hamiltonian = hamiltonian.static_operator
        hamiltonian_operators = hamiltonian.operators
        hamiltonian.in_frame_basis = in_frame_basis

        return cls(
            static_hamiltonian=static_hamiltonian,
            hamiltonian_operators=hamiltonian_operators,
            hamiltonian_signals=hamiltonian.signals,
            static_dissipators=static_dissipators,
            dissipator_operators=dissipator_operators,
            dissipator_signals=dissipator_signals,
            rotating_frame=hamiltonian.rotating_frame,
            in_frame_basis=in_frame_basis,
            array_library=array_library,
            vectorized=vectorized,
        )

    # --- properties ----------------------------------------------------------
    @property
    def dim(self) -> int:
        oc = self._operator_collection
        if oc.static_hamiltonian is not None:
            return oc.static_hamiltonian.shape[-1]
        if oc.hamiltonian_operators is not None:
            return oc.hamiltonian_operators[0].shape[-1]
        if oc.static_dissipators is not None:
            return oc.static_dissipators[0].shape[-1]
        return oc.dissipator_operators[0].shape[-1]

    @property
    def vectorized(self) -> bool:
        """Whether the model evaluates in column-stacked vectorized form."""
        return self._vectorized

    @property
    def rotating_frame(self) -> RotatingFrame:
        return self._rotating_frame

    @property
    def in_frame_basis(self) -> bool:
        return self._in_frame_basis

    @in_frame_basis.setter
    def in_frame_basis(self, in_frame_basis: bool):
        self._in_frame_basis = in_frame_basis

    @property
    def static_hamiltonian(self):
        """Static Hamiltonian term."""
        if self._operator_collection.static_hamiltonian is None:
            return None
        if self._in_frame_basis:
            return self._operator_collection.static_hamiltonian
        return self._rotating_frame.operator_out_of_frame_basis(
            self._operator_collection.static_hamiltonian
        )

    @property
    def hamiltonian_operators(self):
        """Hamiltonian operator stack."""
        if self._operator_collection.hamiltonian_operators is None:
            return None
        if self._in_frame_basis:
            return self._operator_collection.hamiltonian_operators
        return self._rotating_frame.operator_out_of_frame_basis(
            self._operator_collection.hamiltonian_operators
        )

    @property
    def static_dissipators(self):
        """Static dissipator stack."""
        if self._operator_collection.static_dissipators is None:
            return None
        if self._in_frame_basis:
            return self._operator_collection.static_dissipators
        return self._rotating_frame.operator_out_of_frame_basis(
            self._operator_collection.static_dissipators
        )

    @property
    def dissipator_operators(self):
        """Dissipator operator stack."""
        if self._operator_collection.dissipator_operators is None:
            return None
        if self._in_frame_basis:
            return self._operator_collection.dissipator_operators
        return self._rotating_frame.operator_out_of_frame_basis(
            self._operator_collection.dissipator_operators
        )

    @property
    def signals(self) -> Tuple[Optional[SignalList], Optional[SignalList]]:
        """Tuple of (hamiltonian signals, dissipator signals)."""
        return (self._hamiltonian_signals, self._dissipator_signals)

    @signals.setter
    def signals(self, new_signals):
        hamiltonian_signals, dissipator_signals = new_signals

        if hamiltonian_signals is None:
            self._hamiltonian_signals = None
        else:
            if self.hamiltonian_operators is None:
                raise DynamicsError(
                    "Hamiltonian signals must be None if hamiltonian_operators is None."
                )
            if isinstance(hamiltonian_signals, list):
                hamiltonian_signals = SignalList(hamiltonian_signals)
            if not isinstance(hamiltonian_signals, SignalList):
                raise DynamicsError("Hamiltonian signals specified in unaccepted format.")
            ops = self.hamiltonian_operators
            len_ops = len(ops) if isinstance(ops, list) else ops.shape[0]
            if len(hamiltonian_signals) != len_ops:
                raise DynamicsError(
                    "Hamiltonian signals need to have the same length as Hamiltonian operators."
                )
            self._hamiltonian_signals = hamiltonian_signals

        if dissipator_signals is None:
            self._dissipator_signals = None
        else:
            if self.dissipator_operators is None:
                raise DynamicsError(
                    "Dissipator signals must be None if dissipator_operators is None."
                )
            if isinstance(dissipator_signals, list):
                dissipator_signals = SignalList(dissipator_signals)
            if not isinstance(dissipator_signals, SignalList):
                raise DynamicsError("Dissipator signals specified in unaccepted format.")
            ops = self.dissipator_operators
            len_ops = len(ops) if isinstance(ops, list) else ops.shape[0]
            if len(dissipator_signals) != len_ops:
                raise DynamicsError(
                    "Dissipator signals need to have the same length as dissipator operators."
                )
            self._dissipator_signals = dissipator_signals

    # --- evaluation --------------------------------------------------------
    def evaluate_hamiltonian(self, time):
        """Evaluate the Hamiltonian matrix at a time (frame-transformed)."""
        ham_sig_vals = (
            self._hamiltonian_signals(time) if self._hamiltonian_signals is not None else None
        )
        ham = self._operator_collection.evaluate_hamiltonian(ham_sig_vals)
        if self._rotating_frame.frame_diag is not None:
            ham = self._rotating_frame.operator_into_frame(
                time,
                ham,
                operator_in_frame_basis=True,
                return_in_frame_basis=self._in_frame_basis,
                vectorized_operators=self._vectorized,
            )
        return ham

    def _signal_values(self, time):
        ham_sig_vals = None
        if self._hamiltonian_signals is not None:
            ham_sig_vals = self._hamiltonian_signals(time)
        elif self._operator_collection.hamiltonian_operators is not None:
            raise DynamicsError(
                f"{type(self).__name__} with non-empty hamiltonian operators cannot be "
                "evaluated without hamiltonian signals."
            )
        dis_sig_vals = None
        if self._dissipator_signals is not None:
            dis_sig_vals = self._dissipator_signals(time)
        elif self._operator_collection.dissipator_operators is not None:
            raise DynamicsError(
                f"{type(self).__name__} with non-empty dissipator operators cannot be "
                "evaluated without dissipator signals."
            )
        return ham_sig_vals, dis_sig_vals

    def evaluate(self, time):
        """Evaluate the vectorized generator (vectorized mode only)."""
        ham_sig_vals, dis_sig_vals = self._signal_values(time)
        if self._vectorized:
            out = self._operator_collection.evaluate(ham_sig_vals, dis_sig_vals)
            return self._rotating_frame.vectorized_map_into_frame(
                time, out, operator_in_frame_basis=True, return_in_frame_basis=self._in_frame_basis
            )
        raise NotImplementedError(
            "Non-vectorized Lindblad models cannot be represented without a given state."
        )

    def evaluate_rhs(self, time, y):
        """Evaluate the Lindblad RHS on a density matrix (or vectorized state)."""
        ham_sig_vals, dis_sig_vals = self._signal_values(time)
        if self._rotating_frame.frame_diag is not None:
            rhs = self._rotating_frame.operator_out_of_frame(
                time,
                y,
                operator_in_frame_basis=self._in_frame_basis,
                return_in_frame_basis=True,
                vectorized_operators=self._vectorized,
            )
            rhs = self._operator_collection.evaluate_rhs(ham_sig_vals, dis_sig_vals, rhs)
            rhs = self._rotating_frame.operator_into_frame(
                time,
                rhs,
                operator_in_frame_basis=True,
                return_in_frame_basis=self._in_frame_basis,
                vectorized_operators=self._vectorized,
            )
            return rhs
        return self._operator_collection.evaluate_rhs(ham_sig_vals, dis_sig_vals, y)

    # --- pytree protocol --------------------------------------------------
    def tree_flatten(self):
        leaves = (
            self._operator_collection,
            self._hamiltonian_signals,
            self._dissipator_signals,
            self._rotating_frame,
        )
        return leaves, (self._vectorized, self._in_frame_basis, self._array_library)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj._vectorized, obj._in_frame_basis, obj._array_library = aux
        (
            obj._operator_collection,
            obj._hamiltonian_signals,
            obj._dissipator_signals,
            obj._rotating_frame,
        ) = leaves
        return obj


def _get_lindblad_operator_collection(
    array_library,
    vectorized,
    static_hamiltonian,
    hamiltonian_operators,
    static_dissipators,
    dissipator_operators,
):
    """Pick the Lindblad collection implementation."""
    kwargs = {
        "static_hamiltonian": static_hamiltonian,
        "hamiltonian_operators": hamiltonian_operators,
        "static_dissipators": static_dissipators,
        "dissipator_operators": dissipator_operators,
    }
    if array_library == "scipy_sparse":
        if vectorized:
            return ScipySparseVectorizedLindbladCollection(**kwargs)
        return ScipySparseLindbladCollection(**kwargs)
    if array_library == "jax_sparse" and jax.default_backend() not in ("cpu",):
        warn("Using sparse mode with JAX is primarily recommended for use on CPU.", stacklevel=2)
    if vectorized:
        return VectorizedLindbladCollection(**kwargs, array_library=array_library)
    return LindbladCollection(**kwargs, array_library=array_library)


register_pytree_node(LindbladModel, LindbladModel.tree_flatten, LindbladModel.tree_unflatten)
