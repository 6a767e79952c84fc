"""Utilities for the pulse-simulator backend measurement pipeline.

Reference behavior: ``/root/reference/qiskit_dynamics/backend/backend_utils.py``.
All host-side numpy: dressed-state decomposition, memory-slot probability
mapping, multinomial sampling, counts, and Gaussian IQ-cloud generation.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ..exceptions import DynamicsError
from ..models import HamiltonianModel, LindbladModel
from ..quantum_info import Statevector, DensityMatrix

__all__ = [
    "_get_dressed_state_decomposition",
    "_get_lab_frame_static_hamiltonian",
    "_get_memory_slot_probabilities",
    "_sample_probability_dict",
    "_get_counts_from_samples",
    "_get_iq_data",
    "_probabilities_dict",
]


def _get_dressed_state_decomposition(
    operator, rtol: float = 1e-8, atol: float = 1e-5
) -> Tuple[np.ndarray, np.ndarray]:
    """Eigendecomposition of a nearly-diagonal Hermitian operator with
    eigenvectors sorted by their dominant elementary-basis component
    (``argmax(abs(evec))``), validated unique."""
    operator = np.asarray(operator)
    if not np.allclose(operator, operator.conj().T, rtol=rtol, atol=atol):
        raise DynamicsError("_get_dressed_state_decomposition received non-Hermitian operator.")

    evals, evecs = np.linalg.eigh(operator)

    dressed_evals = np.zeros_like(evals)
    dressed_states = np.zeros_like(evecs)
    found_positions = set()
    for eigval, evec in zip(evals, evecs.T):
        position = int(np.argmax(np.abs(evec)))
        if position in found_positions:
            raise DynamicsError(
                "Dressed-state sorting failed due to non-unique argmax(abs(evec)) "
                "for eigenvectors."
            )
        found_positions.add(position)
        dressed_states[:, position] = evec
        dressed_evals[position] = eigval
    return dressed_evals, dressed_states


def _get_lab_frame_static_hamiltonian(model: Union[HamiltonianModel, LindbladModel]) -> np.ndarray:
    """Static Hamiltonian in the lab frame and standard basis."""
    if isinstance(model, HamiltonianModel):
        static_hamiltonian = np.asarray(model.static_operator)
    else:
        static_hamiltonian = np.asarray(model.static_hamiltonian)
    return np.asarray(
        1j * model.rotating_frame.generator_out_of_frame(t=0.0, operator=-1j * static_hamiltonian)
    )


def _probabilities_dict(
    probabilities: np.ndarray, dims: Tuple[int, ...], qargs: Optional[List[int]] = None
) -> Dict[str, float]:
    """Outcome-string probability dict, marginalized onto ``qargs``.

    Key convention matches qiskit: the right-most digit corresponds to
    ``qargs[0]``. Zero-probability outcomes are omitted.
    """
    n = len(dims)
    if qargs is None:
        qargs = list(range(n))
    tensor = np.asarray(probabilities).reshape(tuple(reversed(dims)))
    keep_axes = [n - 1 - q for q in qargs]
    sum_axes = tuple(i for i in range(n) if i not in keep_axes)
    marg = tensor.sum(axis=sum_axes) if sum_axes else tensor
    remaining = sorted(keep_axes)
    desired = [n - 1 - q for q in reversed(qargs)]
    marg = np.transpose(marg, [remaining.index(a) for a in desired])

    out: Dict[str, float] = {}
    for idx in np.ndindex(marg.shape):
        p = float(marg[idx])
        if p != 0.0:
            out["".join(str(d) for d in idx)] = p
    return out


def _get_memory_slot_probabilities(
    probability_dict: Dict[str, float],
    memory_slot_indices: List[int],
    num_memory_slots: Optional[int] = None,
    max_outcome_value: Optional[int] = None,
) -> Dict[str, float]:
    """Map state-level outcome probabilities into memory-slot outcome
    probabilities (digits above ``max_outcome_value`` rounded down)."""
    num_memory_slots = num_memory_slots or (max(memory_slot_indices) + 1)
    memory_slot_probs: Dict[str, float] = {}
    for level_str, prob in probability_dict.items():
        result = ["0"] * num_memory_slots
        for idx, level in zip(memory_slot_indices, reversed(level_str)):
            if max_outcome_value and int(level) > max_outcome_value:
                level = str(max_outcome_value)
            result[-(idx + 1)] = level
        key = "".join(result)
        memory_slot_probs[key] = memory_slot_probs.get(key, 0.0) + prob
    return memory_slot_probs


def _sample_probability_dict(
    probability_dict: Dict[str, float],
    shots: int,
    normalize_probabilities: bool = True,
    seed: Optional[int] = None,
) -> List[str]:
    """Sample outcome strings from a probability dict."""
    rng = np.random.default_rng(seed=seed)
    alphabet, probs = zip(*probability_dict.items())
    probs = np.array(probs)
    if normalize_probabilities:
        probs = probs / probs.sum()
    # sample INDICES then map — rng.choice on a unicode array pays fancy
    # string indexing per shot; the index stream is identical
    idx = rng.choice(len(alphabet), size=shots, replace=True, p=probs)
    return [alphabet[i] for i in idx]


def _sample_outcomes(
    probability_dict: Dict[str, float],
    shots: int,
    normalize_probabilities: bool = True,
    seed: Optional[int] = None,
    with_memory: bool = True,
):
    """One index draw -> (ordered sample list or None, counts dict).

    Same random stream as :func:`_sample_probability_dict` (identical index
    draws); counts come from a bincount over the indices instead of a
    unique/sort over per-shot strings — the measured hot spot of the
    per-experiment measurement pipeline."""
    rng = np.random.default_rng(seed=seed)
    alphabet, probs = zip(*probability_dict.items())
    probs = np.array(probs)
    if normalize_probabilities:
        probs = probs / probs.sum()
    idx = rng.choice(len(alphabet), size=shots, replace=True, p=probs)
    counts_arr = np.bincount(idx, minlength=len(alphabet))
    counts = {str(a): int(c) for a, c in zip(alphabet, counts_arr) if c}
    samples = [alphabet[i] for i in idx] if with_memory else None
    return samples, counts


def _get_counts_from_samples(samples: list) -> Dict[str, int]:
    """Count occurrences in a sample list."""
    keys, counts = np.unique(samples, return_counts=True)
    return {str(k): int(c) for k, c in zip(keys, counts)}


def _get_subsystem_probabilities(probability_tensor: np.ndarray, sub_idx: int) -> np.ndarray:
    """Marginal probability of a single subsystem (reverse-indexed axes)."""
    ndim = probability_tensor.ndim
    sub_axis = ndim - 1 - sub_idx
    sum_axis = tuple(i for i in range(ndim) if i != sub_axis)
    if sum_axis:
        return probability_tensor.sum(axis=sum_axis)
    return probability_tensor


def _default_iq_centers(subsystem_dims) -> List[List[tuple]]:
    """Default IQ centroid layout: each subsystem's levels equally spaced on
    the unit circle (level j of a dim-d subsystem at angle 2*pi*j/d) — the
    reference's default when the ``iq_centers`` option is unset
    (``/root/reference/qiskit_dynamics/backend/dynamics_backend.py:528-536``).
    """
    centers = []
    for dim in subsystem_dims:
        angles = 2 * np.pi * np.arange(dim) / dim
        centers.append(list(zip(np.cos(angles), np.sin(angles))))
    return centers


def _get_iq_data(
    state: Union[Statevector, DensityMatrix],
    measurement_subsystems: List[int],
    iq_centers: List[List[List[float]]],
    iq_width: float,
    shots: int,
    memory_slot_indices: List[int],
    num_memory_slots: Optional[int] = None,
    seed: Optional[int] = None,
) -> np.ndarray:
    """Gaussian IQ clouds per measured subsystem:
    ``out[shot, memory_slot] = [I, Q]``."""
    rng = np.random.default_rng(seed)
    subsystem_dims = [d for d in state.dims() if d != 1]
    probabilities = state.probabilities()
    tensor = probabilities.reshape(list(reversed(subsystem_dims)))

    full_i, full_q = [], []
    for sub_idx in measurement_subsystems:
        sub_probability = _get_subsystem_probabilities(tensor, sub_idx=sub_idx)
        counts_n = rng.multinomial(shots, sub_probability / sub_probability.sum(), size=1).T
        if len(counts_n) != len(iq_centers[sub_idx]):
            raise DynamicsError(
                f"Number of centers {len(iq_centers[sub_idx])} not equal to number of "
                f"levels {len(counts_n)}"
            )
        sub_i, sub_q = [], []
        for idx, count_i in enumerate(counts_n):
            sub_i.append(rng.normal(loc=iq_centers[sub_idx][idx][0], scale=iq_width, size=count_i))
            sub_q.append(rng.normal(loc=iq_centers[sub_idx][idx][1], scale=iq_width, size=count_i))
        full_i.append(np.concatenate(sub_i))
        full_q.append(np.concatenate(sub_q))
    full_iq = np.array([full_i, full_q]).T

    num_memory_slots = num_memory_slots or (max(memory_slot_indices) + 1)
    mem_slot_iq = np.zeros((shots, num_memory_slots, 2))
    for idx, mem_idx in enumerate(memory_slot_indices):
        mem_slot_iq[:, mem_idx, :] = full_iq[:, idx, :]
    return mem_slot_iq
