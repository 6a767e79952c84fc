"""RotatingFrame tests: transforms validated against explicit expm conjugation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.linalg import expm

from qiskit_dynamics_tpu.models import RotatingFrame
from qiskit_dynamics_tpu.exceptions import DynamicsError

rng = np.random.default_rng(7)


def random_hermitian(d):
    m = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    return m + m.conj().T


@pytest.fixture(params=[2, 4])
def dim(request):
    return request.param


def test_none_frame():
    rf = RotatingFrame(None)
    y = np.array([1.0, 2.0])
    np.testing.assert_allclose(rf.state_into_frame(1.0, y), y)
    np.testing.assert_allclose(rf.operator_into_frame(1.0, np.eye(2)), np.eye(2))
    assert rf.frame_diag is None


def test_hermitian_converted_to_antihermitian(dim):
    H = random_hermitian(dim)
    rf = RotatingFrame(H)
    # frame_diag should be -1j * eigenvalues of H
    evals = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(np.sort(np.imag(rf.frame_diag)), np.sort(-evals), atol=1e-10)
    np.testing.assert_allclose(np.real(rf.frame_diag), 0.0, atol=1e-10)


def test_invalid_frame_raises():
    with pytest.raises(DynamicsError):
        RotatingFrame(np.array([[0.0, 1.0], [0.0, 0.0]]))


def test_state_into_frame_vs_expm(dim):
    H = random_hermitian(dim)
    F = -1j * H
    rf = RotatingFrame(H)
    y = rng.normal(size=dim) + 1j * rng.normal(size=dim)
    t = 0.37
    expected = expm(-t * F) @ y
    np.testing.assert_allclose(rf.state_into_frame(t, y), expected, atol=1e-10)
    expected_out = expm(t * F) @ y
    np.testing.assert_allclose(rf.state_out_of_frame(t, y), expected_out, atol=1e-10)


def test_operator_into_frame_vs_expm(dim):
    H = random_hermitian(dim)
    F = -1j * H
    rf = RotatingFrame(H)
    G = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    t = 0.21
    expected = expm(-t * F) @ G @ expm(t * F)
    np.testing.assert_allclose(rf.operator_into_frame(t, G), expected, atol=1e-10)
    np.testing.assert_allclose(rf.operator_out_of_frame(t, G), expm(t * F) @ G @ expm(-t * F), atol=1e-10)


def test_generator_into_frame_vs_expm(dim):
    H = random_hermitian(dim)
    F = -1j * H
    rf = RotatingFrame(H)
    G = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    t = 0.11
    expected = expm(-t * F) @ G @ expm(t * F) - F
    np.testing.assert_allclose(rf.generator_into_frame(t, G), expected, atol=1e-10)
    expected_out = expm(t * F) @ G @ expm(-t * F) + F
    np.testing.assert_allclose(rf.generator_out_of_frame(t, G), expected_out, atol=1e-10)


def test_diagonal_frame():
    diag = np.array([1.0, 2.0, 3.0])  # Hermitian diagonal
    rf = RotatingFrame(diag)
    np.testing.assert_allclose(rf.frame_diag, -1j * diag)
    assert rf.frame_basis is None
    y = rng.normal(size=3)
    t = 0.5
    np.testing.assert_allclose(rf.state_into_frame(t, y), np.exp(1j * t * diag) * y)


def test_stacked_operators(dim):
    H = random_hermitian(dim)
    F = -1j * H
    rf = RotatingFrame(H)
    ops = rng.normal(size=(3, dim, dim)) + 1j * rng.normal(size=(3, dim, dim))
    t = 0.3
    out = rf.operator_into_frame(t, ops)
    for k in range(3):
        np.testing.assert_allclose(out[k], expm(-t * F) @ ops[k] @ expm(t * F), atol=1e-10)


def test_vectorized_operators_column_stacking(dim):
    H = random_hermitian(dim)
    F = -1j * H
    rf = RotatingFrame(H)
    G = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    t = 0.17
    vec = G.flatten(order="F")
    out_vec = rf.operator_into_frame(t, vec, vectorized_operators=True)
    expected = (expm(-t * F) @ G @ expm(t * F)).flatten(order="F")
    np.testing.assert_allclose(out_vec, expected, atol=1e-10)


def test_vectorized_map_into_frame(dim):
    H = random_hermitian(dim)
    F = -1j * H
    rf = RotatingFrame(H)
    S = rng.normal(size=(dim**2, dim**2)) + 1j * rng.normal(size=(dim**2, dim**2))
    t = 0.23
    U = expm(t * F)
    Uinv = expm(-t * F)
    # column-stacking: map M -> e^{-tF} M e^{tF} has superoperator e^{tF}.T (x) e^{-tF}
    left = np.kron(U.T, Uinv)
    right = np.kron(Uinv.T, U)
    expected = left @ S @ right
    np.testing.assert_allclose(rf.vectorized_map_into_frame(t, S), expected, atol=1e-9)


def test_jit_and_grad_through_frame(dim):
    H = random_hermitian(dim)
    rf = RotatingFrame(H)
    y = jnp.asarray(rng.normal(size=dim) + 1j * rng.normal(size=dim))

    @jax.jit
    def f(t):
        return jnp.real(jnp.sum(jnp.abs(rf.state_into_frame(t, y)) ** 2))

    g = jax.grad(f)(0.4)
    assert np.isfinite(g)
    # norm preserved by unitary frame rotation -> gradient ~ 0
    np.testing.assert_allclose(g, 0.0, atol=1e-8)


def test_frame_as_pytree(dim):
    H = random_hermitian(dim)
    rf = RotatingFrame(H)

    @jax.jit
    def apply(frame, t, y):
        return frame.state_into_frame(t, y)

    y = jnp.asarray(rng.normal(size=dim))
    np.testing.assert_allclose(apply(rf, 0.3, y), rf.state_into_frame(0.3, y), atol=1e-12)


def test_traced_invalid_frame_nan_poisons():
    @jax.jit
    def build(m):
        rf = RotatingFrame(m)
        return rf.frame_diag

    bad = jnp.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
    out = build(bad)
    assert np.all(np.isnan(np.real(out)))


class TestSparseFrameTransforms:
    """Sparse operators through frame transforms (CSR stays CSR, BCOO stays
    BCOO, under the rank-1 phase conjugation; full-frame basis changes
    densify)."""

    def _setup(self):
        rng = np.random.default_rng(2)
        dim = 4
        diag = -1j * 2 * np.pi * rng.standard_normal(dim)
        frame = RotatingFrame(np.diag(diag))
        dense = rng.standard_normal((dim, dim)) + 1j * rng.standard_normal((dim, dim))
        dense[np.abs(dense) < 1.2] = 0.0  # sparsify
        return frame, dense

    def test_csr_conjugation_matches_dense(self):
        from scipy.sparse import csr_matrix, issparse

        frame, dense = self._setup()
        t = 0.37
        out_sparse = frame.operator_into_frame(
            t, csr_matrix(dense), operator_in_frame_basis=True,
            return_in_frame_basis=True,
        )
        assert issparse(out_sparse)
        out_dense = frame.operator_into_frame(
            t, dense, operator_in_frame_basis=True, return_in_frame_basis=True
        )
        np.testing.assert_allclose(out_sparse.toarray(), np.asarray(out_dense), atol=1e-12)

    def test_bcoo_conjugation_matches_dense(self):
        from jax.experimental import sparse as jsparse

        frame, dense = self._setup()
        t = 0.37
        out_sparse = frame.operator_into_frame(
            t, jsparse.BCOO.fromdense(jnp.asarray(dense)),
            operator_in_frame_basis=True, return_in_frame_basis=True,
        )
        assert isinstance(out_sparse, jsparse.BCOO)
        out_dense = frame.operator_into_frame(
            t, dense, operator_in_frame_basis=True, return_in_frame_basis=True
        )
        np.testing.assert_allclose(
            np.asarray(out_sparse.todense()), np.asarray(out_dense), atol=1e-6
        )

    def test_generator_into_frame_sparse(self):
        """generator_into_frame subtracts the frame diagonal — the sparse
        path must match the dense one including the added diagonal."""
        from scipy.sparse import csr_matrix

        frame, dense = self._setup()
        t = 0.81
        out_sparse = frame.generator_into_frame(
            t, csr_matrix(dense), operator_in_frame_basis=True,
            return_in_frame_basis=True,
        )
        out_dense = frame.generator_into_frame(
            t, dense, operator_in_frame_basis=True, return_in_frame_basis=True
        )
        out_sparse = out_sparse.toarray() if hasattr(out_sparse, "toarray") else out_sparse
        np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(out_dense), atol=1e-12)

    def test_full_frame_densifies(self):
        from scipy.sparse import csr_matrix

        rng = np.random.default_rng(3)
        H = rng.standard_normal((3, 3))
        H = H + H.T
        frame = RotatingFrame(-1j * H)
        dense = np.diag([1.0, 2.0, 3.0]).astype(complex)
        out = frame.operator_into_frame(0.5, csr_matrix(dense))
        ref = frame.operator_into_frame(0.5, dense)
        out = out.toarray() if hasattr(out, "toarray") else np.asarray(out)
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-12)


class TestRoundTripsAndVariants:
    """Inverse-transform identities and constructor variants (reference
    analog: test_rotating_frame.py round-trip/typing cases)."""

    def _frame(self, dim, rng):
        H = rng.standard_normal((dim, dim)) + 1j * rng.standard_normal((dim, dim))
        return RotatingFrame(-1j * (H + H.conj().T) / 2)

    def test_state_roundtrip_all_signatures(self):
        rng = np.random.default_rng(0)
        rf = self._frame(4, rng)
        y = rng.standard_normal(4) + 1j * rng.standard_normal(4)
        t = 0.37
        for basis in (True, False):
            back = rf.state_out_of_frame(
                t, rf.state_into_frame(t, y, return_in_frame_basis=basis),
                y_in_frame_basis=basis,
            )
            np.testing.assert_allclose(np.asarray(back), y, atol=1e-12)

    def test_operator_roundtrip(self):
        rng = np.random.default_rng(1)
        rf = self._frame(3, rng)
        op = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
        t = 1.1
        back = rf.operator_out_of_frame(t, rf.operator_into_frame(t, op))
        np.testing.assert_allclose(np.asarray(back), op, atol=1e-12)

    def test_generator_roundtrip(self):
        rng = np.random.default_rng(2)
        rf = self._frame(3, rng)
        gen = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
        t = 0.9
        back = rf.generator_out_of_frame(t, rf.generator_into_frame(t, gen))
        np.testing.assert_allclose(np.asarray(back), gen, atol=1e-12)

    def test_1d_frame_operator_is_diagonal(self):
        diag = np.array([1.0, -2.0, 0.5])
        rf = RotatingFrame(-1j * diag)
        # diagonal frames skip the eigendecomposition entirely
        assert rf.frame_basis is None
        np.testing.assert_allclose(np.imag(np.asarray(rf.frame_diag)), -diag)
        y = np.array([1.0, 1.0, 1.0], dtype=complex)
        out = rf.state_into_frame(0.5, y)
        np.testing.assert_allclose(
            np.asarray(out), np.exp(1j * diag * 0.5), atol=1e-12
        )

    def test_none_frame_passthrough_everywhere(self):
        rf = RotatingFrame(None)
        y = np.array([1.0, 2.0j])
        op = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        np.testing.assert_allclose(np.asarray(rf.state_into_frame(1.0, y)), y)
        np.testing.assert_allclose(np.asarray(rf.operator_into_frame(1.0, op)), op)
        np.testing.assert_allclose(np.asarray(rf.generator_into_frame(1.0, op)), op)
        assert rf.dim is None

    def test_vectorized_basis_consistency(self):
        """vectorized_frame_basis diagonalizes the vectorized frame operator:
        column-stacking vec of U^dag A U equals the vectorized-basis action."""
        rng = np.random.default_rng(3)
        rf = self._frame(3, rng)
        A = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
        vec_direct = np.asarray(
            rf.operator_into_frame_basis(A)
        ).ravel(order="F")
        vec_via_basis = np.asarray(rf.vectorized_frame_basis_adjoint) @ A.ravel(
            order="F"
        )
        np.testing.assert_allclose(vec_direct, vec_via_basis, atol=1e-12)


# ---------------------------------------------------------------------------
# Frame-basis flag battery (ref: TestRotatingFrame pseudo-random cases with
# all basis-flag combinations, /root/reference/test/dynamics/models/
# test_rotating_frame.py:160-438). Expected values are built directly from
# the eigendecomposition F = U diag(d) U^dagger:
#   state_into_frame  = [U] diag(e^{-d t}) [U^dagger] y
#   operator_into_frame = [U] diag(e^{-d t}) U^dag G U diag(e^{d t}) [U^dag]
#   generator_into_frame = same - diag(d) (frame-basis) / - F (outer basis)
# with the bracketed factors dropped by the corresponding flag.
# ---------------------------------------------------------------------------

FLAGS = [(False, False), (False, True), (True, False), (True, True)]


class TestBasisFlagBattery:
    def setup_method(self, method):
        d = 5
        H = random_hermitian(d)
        self.F = -1j * H
        self.frame = RotatingFrame(self.F)
        self.d_diag, self.U = np.linalg.eigh(1j * np.asarray(self.F))
        self.d_diag = -1j * self.d_diag
        # re-derive U consistently with the frame's own basis (eigh phase
        # freedom): use the frame's stored basis for expected values
        self.U = np.asarray(self.frame.frame_basis)
        self.d_diag = np.asarray(self.frame.frame_diag)
        self.t = 0.37
        self.y = rng.normal(size=(d,)) + 1j * rng.normal(size=(d,))
        self.G = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))

    def _phase(self, sign):
        return np.diag(np.exp(sign * self.d_diag * self.t))

    @pytest.mark.parametrize("y_in_fb,ret_in_fb", FLAGS)
    def test_state_into_frame_flags(self, y_in_fb, ret_in_fb):
        out = self.frame.state_into_frame(
            self.t, self.y, y_in_frame_basis=y_in_fb, return_in_frame_basis=ret_in_fb
        )
        expected = self._phase(-1) @ (
            self.y if y_in_fb else self.U.conj().T @ self.y
        )
        if not ret_in_fb:
            expected = self.U @ expected
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    @pytest.mark.parametrize("y_in_fb,ret_in_fb", FLAGS)
    def test_state_out_of_frame_flags(self, y_in_fb, ret_in_fb):
        out = self.frame.state_out_of_frame(
            self.t, self.y, y_in_frame_basis=y_in_fb, return_in_frame_basis=ret_in_fb
        )
        expected = self._phase(+1) @ (
            self.y if y_in_fb else self.U.conj().T @ self.y
        )
        if not ret_in_fb:
            expected = self.U @ expected
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    @pytest.mark.parametrize("op_in_fb,ret_in_fb", FLAGS)
    def test_operator_into_frame_flags(self, op_in_fb, ret_in_fb):
        out = self.frame.operator_into_frame(
            self.t, self.G,
            operator_in_frame_basis=op_in_fb, return_in_frame_basis=ret_in_fb,
        )
        g_fb = self.G if op_in_fb else self.U.conj().T @ self.G @ self.U
        expected = self._phase(-1) @ g_fb @ self._phase(+1)
        if not ret_in_fb:
            expected = self.U @ expected @ self.U.conj().T
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-11)

    @pytest.mark.parametrize("op_in_fb,ret_in_fb", FLAGS)
    def test_generator_into_frame_flags(self, op_in_fb, ret_in_fb):
        out = self.frame.generator_into_frame(
            self.t, self.G,
            operator_in_frame_basis=op_in_fb, return_in_frame_basis=ret_in_fb,
        )
        g_fb = self.G if op_in_fb else self.U.conj().T @ self.G @ self.U
        expected = self._phase(-1) @ g_fb @ self._phase(+1) - np.diag(self.d_diag)
        if not ret_in_fb:
            expected = self.U @ expected @ self.U.conj().T
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-11)

    @pytest.mark.parametrize("op_in_fb,ret_in_fb", FLAGS)
    def test_generator_out_of_frame_flags(self, op_in_fb, ret_in_fb):
        out = self.frame.generator_out_of_frame(
            self.t, self.G,
            operator_in_frame_basis=op_in_fb, return_in_frame_basis=ret_in_fb,
        )
        g_fb = self.G if op_in_fb else self.U.conj().T @ self.G @ self.U
        expected = self._phase(+1) @ g_fb @ self._phase(-1) + np.diag(self.d_diag)
        if not ret_in_fb:
            expected = self.U @ expected @ self.U.conj().T
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-11)

    def test_into_out_of_frame_inverse(self):
        mid = self.frame.operator_into_frame(self.t, self.G)
        back = self.frame.operator_out_of_frame(self.t, mid)
        np.testing.assert_allclose(np.asarray(back), self.G, atol=1e-11)

    def test_basis_change_only(self):
        fb = self.frame.operator_into_frame_basis(self.G)
        np.testing.assert_allclose(
            np.asarray(fb), self.U.conj().T @ self.G @ self.U, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(self.frame.operator_out_of_frame_basis(fb)), self.G, atol=1e-11
        )

    def test_batched_states_flags(self):
        """(k, dim) state stacks broadcast through the flag combinations."""
        ys = rng.normal(size=(3, 5)) + 1j * rng.normal(size=(3, 5))
        out = self.frame.state_into_frame(self.t, ys.T)
        expected = self.U @ self._phase(-1) @ self.U.conj().T @ ys.T
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)
