"""Rotating-wave approximation (RWA).

Reference: ``/root/reference/qiskit_dynamics/models/rotating_wave_approximation.py``.
Masks operator entries whose effective frequency (carrier +/- frame frequency
difference) exceeds the cutoff, producing a model with 2k operators
``(G_i^+ + G_i^-)/2`` and ``i(G_i^+ - G_i^-)/2`` driven by the original
signals and phase-shifted (-pi/2) copies.

Host-side construction (not jit-traceable), but the returned model is fully
jit/grad-compatible — same contract as the reference (docstring
``rotating_wave_approximation.py:60-94``).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from ..signals import Signal, SignalSum, SignalList
from .generator_model import GeneratorModel
from .hamiltonian_model import HamiltonianModel
from .lindblad_model import LindbladModel

__all__ = ["rotating_wave_approximation"]


def _to_dense(x):
    if x is None:
        return None
    if type(x).__name__ == "BCOO":
        return x.todense()
    if isinstance(x, list):
        return np.asarray([_to_dense(op) for op in x])
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


def rotating_wave_approximation(
    model: Union[GeneratorModel, LindbladModel],
    cutoff_freq: float,
    return_signal_map: bool = False,
):
    """Apply the RWA to a model, returning a model with 2x the operators.

    If ``return_signal_map`` is True, also return the function mapping pre-RWA
    signals to post-RWA signals (needed to update signals on the RWA model).
    """
    n = model.dim

    if model.rotating_frame is None or model.rotating_frame.frame_diag is None:
        frame_freqs = np.zeros((n, n))
    else:
        diag = np.asarray(model.rotating_frame.frame_diag)
        diff_matrix = diag[None, :] * np.ones((n, n)) - diag[:, None] * np.ones((n, n))
        # effective frequency nu_jk = Im[-d_j + d_k] / 2pi
        frame_freqs = diff_matrix.imag / (2 * np.pi)

    if model.rotating_frame.frame_diag is not None:
        frame_shift = np.diag(model.rotating_frame.frame_diag)
        if isinstance(model, (HamiltonianModel, LindbladModel)):
            frame_shift = 1j * frame_shift
    else:
        frame_shift = np.zeros((n, n), dtype=complex)

    low_pass = (np.abs(frame_freqs) < cutoff_freq).astype(float)

    if isinstance(model, GeneratorModel):
        if model.signals is None and model.operators is not None:
            raise ValueError("Model must have nontrivial signals to perform the RWA.")

        cur_drift = _to_dense(model._operator_collection.static_operator)
        if isinstance(model, HamiltonianModel) and cur_drift is not None:
            cur_drift = 1j * cur_drift
        if cur_drift is not None:
            cur_drift = cur_drift + frame_shift
            rwa_drift = cur_drift * low_pass
            rwa_drift = model.rotating_frame.operator_out_of_frame_basis(rwa_drift)
        else:
            rwa_drift = None

        operators = _to_dense(model._operator_collection.operators)
        if isinstance(model, HamiltonianModel) and operators is not None:
            operators = 1j * operators

        rwa_operators = get_rwa_operators(
            operators, model.signals, model.rotating_frame, frame_freqs, cutoff_freq
        )
        rwa_signals = get_rwa_signals(model.signals)

        rwa_model = model.__class__(
            static_operator=rwa_drift,
            operators=rwa_operators,
            signals=rwa_signals,
            rotating_frame=model.rotating_frame,
            in_frame_basis=model.in_frame_basis,
            array_library=model.array_library,
        )
        if return_signal_map:
            return rwa_model, get_rwa_signals
        return rwa_model

    if isinstance(model, LindbladModel):
        if model.signals[0] is None and model.hamiltonian_operators is not None:
            raise ValueError(
                "Model must have nontrivial Hamiltonian signals to perform the RWA."
            )
        if model.signals[1] is None and model.dissipator_operators is not None:
            raise ValueError(
                "Model must have nontrivial dissipator signals to perform the RWA."
            )

        cur_drift = _to_dense(model._operator_collection.static_hamiltonian) + frame_shift
        rwa_drift = cur_drift * low_pass
        rwa_drift = model.rotating_frame.operator_out_of_frame_basis(rwa_drift)

        cur_static_dis = _to_dense(model._operator_collection.static_dissipators)
        rwa_static_dis = None
        if cur_static_dis is not None:
            rwa_static_dis = model.rotating_frame.operator_out_of_frame_basis(
                cur_static_dis * low_pass
            )

        cur_ham_sig, cur_dis_sig = model.signals
        rwa_ham_ops = get_rwa_operators(
            _to_dense(model._operator_collection.hamiltonian_operators),
            cur_ham_sig,
            model.rotating_frame,
            frame_freqs,
            cutoff_freq,
        )
        rwa_dis_ops = get_rwa_operators(
            _to_dense(model._operator_collection.dissipator_operators),
            cur_dis_sig,
            model.rotating_frame,
            frame_freqs,
            cutoff_freq,
        )

        rwa_model = LindbladModel(
            static_hamiltonian=rwa_drift,
            hamiltonian_operators=rwa_ham_ops,
            hamiltonian_signals=get_rwa_signals(cur_ham_sig),
            static_dissipators=rwa_static_dis,
            dissipator_operators=rwa_dis_ops,
            dissipator_signals=get_rwa_signals(cur_dis_sig),
            rotating_frame=model.rotating_frame,
            in_frame_basis=model.in_frame_basis,
            array_library=model.array_library,
            vectorized=model.vectorized,
        )
        if return_signal_map:
            return rwa_model, lambda a: (get_rwa_signals(a[0]), get_rwa_signals(a[1]))
        return rwa_model

    raise TypeError("rotating_wave_approximation got an unsupported model type.")


def get_rwa_operators(
    current_ops,
    current_sigs: SignalList,
    rotating_frame,
    frame_freqs,
    cutoff_freq: float,
):
    """Mask an operator stack into the post-RWA ``(2k, n, n)`` stack."""
    if current_ops is None:
        return None
    current_ops = np.asarray(current_ops)

    current_sigs = current_sigs.flatten()
    carrier_freqs = np.array(
        [float(np.asarray(sig_sum.components[0].carrier_freq))
         if not isinstance(sig_sum, SignalSum) or len(sig_sum) > 0
         else 0.0
         for sig_sum in current_sigs.components]
    )

    k = len(carrier_freqs)
    n = current_ops.shape[-1]
    frame_freqs = np.broadcast_to(frame_freqs, (k, n, n))
    carrier_freqs = carrier_freqs.reshape((k, 1, 1))

    pos_terms = current_ops * (np.abs(carrier_freqs + frame_freqs) < cutoff_freq).astype(float)
    neg_terms = current_ops * (np.abs(-carrier_freqs + frame_freqs) < cutoff_freq).astype(float)

    real_component = pos_terms / 2 + neg_terms / 2
    imag_component = 1j * pos_terms / 2 - 1j * neg_terms / 2

    return rotating_frame.operator_out_of_frame_basis(
        np.concatenate([real_component, imag_component], axis=0)
    )


def get_rwa_signals(curr_signal_list) -> Optional[SignalList]:
    """Map pre-RWA signals to post-RWA signals (originals + phase -pi/2 copies)."""
    if curr_signal_list is None:
        return None
    if not isinstance(curr_signal_list, SignalList):
        curr_signal_list = SignalList(curr_signal_list)
    curr_signal_list = curr_signal_list.flatten()

    real_components = []
    imag_components = []
    for sig_sum in curr_signal_list.components:
        sig = sig_sum.components[0] if isinstance(sig_sum, SignalSum) else sig_sum
        real_components.append(sig)
        imag_components.append(
            SignalSum(Signal(sig._envelope, sig.carrier_freq, sig.phase - np.pi / 2))
        )
    return SignalList(real_components + imag_components)
