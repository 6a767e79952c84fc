"""Hamiltonian model: Schrodinger-equation generator ``G(t) = -i H(t)``.

Reference: ``/root/reference/qiskit_dynamics/models/hamiltonian_model.py``.
Stores ``-i H`` internally (so all generator machinery applies unchanged);
the public ``static_operator`` / ``operators`` properties undo the ``-i``.
"""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import jax.numpy as jnp

from ..unified import unp
from jax.tree_util import register_pytree_node

from ..exceptions import DynamicsError
from ..signals import Signal, SignalList
from .rotating_frame import RotatingFrame
from .generator_model import GeneratorModel, is_hermitian

__all__ = ["HamiltonianModel", "is_hermitian"]


class HamiltonianModel(GeneratorModel):
    r"""Model for ``H(t) = H_d + Sigma_j s_j(t) H_j`` with Hermitian operators.

    Evaluation methods return the generator ``-i H`` form, i.e.
    ``evaluate(t)`` is anti-Hermitian (consistent with the reference).
    """

    def __init__(
        self,
        static_operator=None,
        operators=None,
        signals: Optional[Union[SignalList, List[Signal]]] = None,
        rotating_frame: Optional[Union[RotatingFrame, np.ndarray]] = None,
        in_frame_basis: bool = False,
        array_library: Optional[str] = None,
        validate: bool = True,
    ):
        from ..unified import dequtip

        static_operator = dequtip(static_operator)
        operators = dequtip(operators)
        if static_operator is not None:
            if validate and not is_hermitian(static_operator):
                raise DynamicsError("HamiltonianModel static_operator must be Hermitian.")
            static_operator = -1j * unp.asarray(static_operator)
        if operators is not None:
            if validate and any(not is_hermitian(op) for op in operators):
                raise DynamicsError("HamiltonianModel operators must be Hermitian.")
            if array_library == "scipy_sparse":
                operators = [-1j * unp.asarray(op) for op in operators]
            else:
                operators = -1j * unp.asarray(operators)

        super().__init__(
            static_operator=static_operator,
            operators=operators,
            signals=signals,
            rotating_frame=rotating_frame,
            in_frame_basis=in_frame_basis,
            array_library=array_library,
        )

    @property
    def static_operator(self):
        """The static Hamiltonian (Hermitian form)."""
        if self._operator_collection.static_operator is None:
            return None
        if self.in_frame_basis:
            return self._operator_collection.static_operator
        return 1j * self.rotating_frame.operator_out_of_frame_basis(
            self._operator_collection.static_operator
        )

    @property
    def operators(self):
        """The Hamiltonian operators (Hermitian form)."""
        if self._operator_collection.operators is None:
            return None
        if self.in_frame_basis:
            ops = self._operator_collection.operators
        else:
            ops = self.rotating_frame.operator_out_of_frame_basis(
                self._operator_collection.operators
            )
        if isinstance(ops, list):
            return [1j * op for op in ops]
        return 1j * ops


register_pytree_node(
    HamiltonianModel, HamiltonianModel.tree_flatten, HamiltonianModel.tree_unflatten
)
