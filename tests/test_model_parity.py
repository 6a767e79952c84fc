"""Dense / sparse / vectorized model parity sweeps.

Reference pattern: ``test_array_backends`` stamps each model test out per
array library (``/root/reference/test/dynamics/common.py:212-248``). Here
the same parity is enforced directly: for every model family, every array
library must produce identical ``evaluate``/``evaluate_rhs`` values across
frames and times, and vectorized Lindblad evolution must match the
non-vectorized form.
"""
import numpy as np
import pytest

from qiskit_dynamics_tpu import Signal
from qiskit_dynamics_tpu.models import (
    GeneratorModel,
    HamiltonianModel,
    LindbladModel,
    RotatingFrame,
)
from qiskit_dynamics_tpu.solvers import solve_lmde

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Y = np.array([[0.0, -1j], [1j, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)

ARRAY_LIBRARIES = [None, "jax", "jax_sparse", "scipy_sparse"]
FRAMES = [
    None,
    np.diag(-1j * 2 * np.pi * np.array([1.0, -1.0])),
    -1j * 2 * np.pi * (0.5 * Z + 0.1 * X),
]
TIMES = [0.0, 0.31, 1.7]


def _dense(x):
    """Sparse evaluate() results stay sparse by design; densify to compare."""
    if hasattr(x, "todense"):
        return np.asarray(x.todense())
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


def _sigs():
    return [Signal(0.4, carrier_freq=1.0), Signal(0.2, carrier_freq=2.3, phase=0.4)]


def _dense_generator_model(frame):
    return GeneratorModel(
        static_operator=-1j * 2 * np.pi * Z / 2,
        operators=[-1j * 2 * np.pi * X / 2, -1j * 2 * np.pi * Y / 2],
        signals=_sigs(),
        rotating_frame=frame,
    )


class TestGeneratorModelParity:
    @pytest.mark.parametrize("lib", ARRAY_LIBRARIES)
    @pytest.mark.parametrize("frame_idx", range(len(FRAMES)))
    def test_evaluate_and_rhs(self, lib, frame_idx):
        frame = FRAMES[frame_idx]
        ref = _dense_generator_model(frame)
        model = GeneratorModel(
            static_operator=-1j * 2 * np.pi * Z / 2,
            operators=[-1j * 2 * np.pi * X / 2, -1j * 2 * np.pi * Y / 2],
            signals=_sigs(),
            rotating_frame=frame,
            array_library=lib,
        )
        y = np.array([0.6, 0.8j], dtype=complex)
        for t in TIMES:
            # CSR collections round stored entries (reference semantics:
            # operator_collections.py:167-174) -> compare at the 1e-8 bar
            np.testing.assert_allclose(_dense(model(t)), _dense(ref(t)), atol=1e-8)
            np.testing.assert_allclose(
                np.asarray(model(t, y)), np.asarray(ref(t, y)), atol=1e-8
            )

    @pytest.mark.parametrize("lib", ARRAY_LIBRARIES)
    def test_dim(self, lib):
        model = GeneratorModel(
            static_operator=-1j * 2 * np.pi * Z / 2, array_library=lib
        )
        assert model.dim == 2

    @pytest.mark.parametrize("lib", ARRAY_LIBRARIES)
    def test_in_frame_basis_parity(self, lib):
        frame = FRAMES[2]
        model = GeneratorModel(
            static_operator=-1j * 2 * np.pi * Z / 2,
            operators=[-1j * 2 * np.pi * X / 2],
            signals=[Signal(0.4, carrier_freq=1.0)],
            rotating_frame=frame,
            array_library=lib,
        )
        ref = GeneratorModel(
            static_operator=-1j * 2 * np.pi * Z / 2,
            operators=[-1j * 2 * np.pi * X / 2],
            signals=[Signal(0.4, carrier_freq=1.0)],
            rotating_frame=frame,
        )
        model.in_frame_basis = True
        ref.in_frame_basis = True
        y = np.array([1.0, -0.5j], dtype=complex)
        np.testing.assert_allclose(
            np.asarray(model(0.42, y)), np.asarray(ref(0.42, y)), atol=1e-12
        )


class TestHamiltonianModelParity:
    @pytest.mark.parametrize("lib", ARRAY_LIBRARIES)
    @pytest.mark.parametrize("frame_idx", range(len(FRAMES)))
    def test_evaluate_rhs(self, lib, frame_idx):
        frame = FRAMES[frame_idx]
        kwargs = dict(
            static_operator=2 * np.pi * Z / 2,
            operators=[2 * np.pi * X / 2, 2 * np.pi * Y / 2],
            signals=_sigs(),
            rotating_frame=frame,
        )
        ref = HamiltonianModel(**kwargs)
        model = HamiltonianModel(**kwargs, array_library=lib)
        y = np.array([0.6, 0.8j], dtype=complex)
        for t in TIMES:
            np.testing.assert_allclose(
                np.asarray(model(t, y)), np.asarray(ref(t, y)), atol=1e-8
            )


def _lindblad_kwargs(frame, vectorized):
    return dict(
        static_hamiltonian=2 * np.pi * Z / 2,
        hamiltonian_operators=[2 * np.pi * X / 2],
        hamiltonian_signals=[Signal(0.3, carrier_freq=1.0)],
        static_dissipators=[0.2 * np.array([[0, 1], [0, 0]], dtype=complex)],
        dissipator_operators=[0.1 * np.array([[1, 0], [0, -1]], dtype=complex)],
        dissipator_signals=[Signal(0.5, carrier_freq=0.0)],
        rotating_frame=frame,
        vectorized=vectorized,
    )


class TestLindbladModelParity:
    @pytest.mark.parametrize("lib", ARRAY_LIBRARIES)
    @pytest.mark.parametrize("frame_idx", range(len(FRAMES)))
    def test_rhs_parity_dense_vs_libs(self, lib, frame_idx):
        frame = FRAMES[frame_idx]
        ref = LindbladModel(**_lindblad_kwargs(frame, False))
        model = LindbladModel(**_lindblad_kwargs(frame, False), array_library=lib)
        rho = np.array([[0.7, 0.2 - 0.1j], [0.2 + 0.1j, 0.3]], dtype=complex)
        for t in TIMES:
            np.testing.assert_allclose(
                np.asarray(model(t, rho)), np.asarray(ref(t, rho)), atol=1e-8
            )

    @pytest.mark.parametrize("lib", [None, "scipy_sparse"])
    @pytest.mark.parametrize("frame_idx", range(len(FRAMES)))
    def test_vectorized_matches_unvectorized(self, lib, frame_idx):
        frame = FRAMES[frame_idx]
        plain = LindbladModel(**_lindblad_kwargs(frame, False))
        vec = LindbladModel(**_lindblad_kwargs(frame, True), array_library=lib)
        rho = np.array([[0.7, 0.2 - 0.1j], [0.2 + 0.1j, 0.3]], dtype=complex)
        for t in TIMES:
            rhs_plain = np.asarray(plain(t, rho))
            rhs_vec = np.asarray(vec(t, rho.ravel(order="F")))
            np.testing.assert_allclose(
                rhs_vec.reshape((2, 2), order="F"), rhs_plain, atol=1e-12
            )

    @pytest.mark.parametrize("frame_idx", range(len(FRAMES)))
    def test_solve_parity_vectorized(self, frame_idx):
        """Density-matrix evolution: vectorized and plain must agree."""
        frame = FRAMES[frame_idx]
        plain = LindbladModel(**_lindblad_kwargs(frame, False))
        vec = LindbladModel(**_lindblad_kwargs(frame, True))
        rho0 = np.array([[1.0, 0.0], [0.0, 0.0]], dtype=complex)
        res_p = solve_lmde(
            plain, t_span=[0.0, 1.2], y0=rho0, method="DOP853", atol=1e-12, rtol=1e-12
        )
        res_v = solve_lmde(
            vec, t_span=[0.0, 1.2], y0=rho0.ravel(order="F"), method="DOP853",
            atol=1e-12, rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(res_v.y[-1]).reshape((2, 2), order="F"),
            np.asarray(res_p.y[-1]),
            atol=1e-9,
        )

    def test_trace_preservation_all_libs(self):
        rho0 = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=complex)
        for lib in ARRAY_LIBRARIES:
            model = LindbladModel(**_lindblad_kwargs(FRAMES[1], False), array_library=lib)
            res = solve_lmde(
                model, t_span=[0.0, 2.0], y0=rho0, method="DOP853",
                atol=1e-11, rtol=1e-11,
            )
            rho_f = model.rotating_frame.operator_out_of_frame(2.0, np.asarray(res.y[-1]))
            np.testing.assert_allclose(np.trace(np.asarray(rho_f)), 1.0, atol=1e-8)
