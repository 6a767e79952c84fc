"""Operator-collection edge battery.

Reference analog: ``/root/reference/test/dynamics/models/
test_operator_collections.py`` — static-only/operators-only configurations,
batched states, sparse ``decimals`` rounding, 1d-vs-2d y paths, and
cross-collection agreement on random models.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.models.operator_collections import (
    OperatorCollection,
    ScipySparseOperatorCollection,
    LindbladCollection,
    ScipySparseLindbladCollection,
    VectorizedLindbladCollection,
    ScipySparseVectorizedLindbladCollection,
)

RNG = np.random.default_rng(1234)


def _rand(n):
    return RNG.normal(size=(n, n)) + 1j * RNG.normal(size=(n, n))


class TestOperatorCollectionEdges:
    def test_static_only(self):
        G0 = _rand(3)
        coll = OperatorCollection(static_operator=G0)
        np.testing.assert_allclose(np.asarray(coll.evaluate(None)), G0)
        y = RNG.normal(size=3) + 0j
        np.testing.assert_allclose(np.asarray(coll.evaluate_rhs(None, y)), G0 @ y)

    def test_operators_only(self):
        ops = np.array([_rand(3), _rand(3)])
        coll = OperatorCollection(operators=ops)
        c = np.array([0.5, -1.5 + 0.3j])
        np.testing.assert_allclose(
            np.asarray(coll.evaluate(c)), np.tensordot(c, ops, axes=1), atol=1e-12
        )

    def test_empty_raises_on_evaluate(self):
        coll = OperatorCollection()
        with pytest.raises(Exception):
            coll.evaluate(None)

    def test_batched_y(self):
        """2d y (matrix state) and batched matmul agree with per-column."""
        ops = np.array([_rand(4)])
        coll = OperatorCollection(static_operator=_rand(4), operators=ops)
        c = np.array([0.7])
        Y = RNG.normal(size=(4, 5)) + 0j
        out = np.asarray(coll.evaluate_rhs(c, Y))
        G = np.asarray(coll.evaluate(c))
        np.testing.assert_allclose(out, G @ Y, atol=1e-12)

    def test_traced_coefficients(self):
        ops = np.array([_rand(2), _rand(2)])
        coll = OperatorCollection(operators=ops)
        y = np.array([1.0, 1j])
        f = jax.jit(lambda c: jnp.abs(coll.evaluate_rhs(c, y)) ** 2)
        out = f(jnp.array([0.3, 0.4]))
        np.testing.assert_allclose(
            np.asarray(out),
            np.abs(np.tensordot([0.3, 0.4], ops, axes=1) @ y) ** 2,
            atol=1e-12,
        )


class TestScipySparseEdges:
    def test_decimals_rounding(self):
        """Entries below the `decimals` threshold are pruned to hard zeros."""
        op = np.array([[1.0, 1e-14], [1e-14, -1.0]])
        coll = ScipySparseOperatorCollection(static_operator=op, decimals=10)
        mat = coll.static_operator
        assert mat.nnz == 2

    def test_1d_vs_2d_y_paths(self):
        """1d y uses mult-first; 2d assembles the generator — same answer."""
        ops = np.array([_rand(3), _rand(3)])
        G0 = _rand(3)
        coll = ScipySparseOperatorCollection(static_operator=G0, operators=ops)
        dense = OperatorCollection(static_operator=G0, operators=ops)
        c = np.array([0.2, -0.9])
        y1 = RNG.normal(size=3) + 1j * RNG.normal(size=3)
        y2 = RNG.normal(size=(3, 3)) + 0j
        np.testing.assert_allclose(
            np.asarray(coll.evaluate_rhs(c, y1)),
            np.asarray(dense.evaluate_rhs(c, y1)),
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(coll.evaluate_rhs(c, y2)),
            np.asarray(dense.evaluate_rhs(c, y2)),
            atol=1e-10,
        )


def _rand_lindblad(n, k_h=2, k_d=2):
    return dict(
        static_hamiltonian=(h := _rand(n)) + h.conj().T,
        hamiltonian_operators=np.array([(x := _rand(n)) + x.conj().T for _ in range(k_h)]),
        static_dissipators=np.array([_rand(n) for _ in range(1)]),
        dissipator_operators=np.array([_rand(n) for _ in range(k_d)]),
    )


def _explicit_lindblad_rhs(spec, hc, dc, rho):
    H = spec["static_hamiltonian"] + np.tensordot(hc, spec["hamiltonian_operators"], axes=1)
    out = -1j * (H @ rho - rho @ H)
    for L in spec["static_dissipators"]:
        out += L @ rho @ L.conj().T - 0.5 * (L.conj().T @ L @ rho + rho @ L.conj().T @ L)
    for g, L in zip(dc, spec["dissipator_operators"]):
        out += g * (L @ rho @ L.conj().T - 0.5 * (L.conj().T @ L @ rho + rho @ L.conj().T @ L))
    return out


class TestLindbladCollectionEdges:
    @pytest.mark.parametrize(
        "cls",
        [
            LindbladCollection,
            ScipySparseLindbladCollection,
            VectorizedLindbladCollection,
            ScipySparseVectorizedLindbladCollection,
        ],
    )
    def test_vs_explicit_random(self, cls):
        n = 3
        spec = _rand_lindblad(n)
        coll = cls(**spec)
        hc = np.array([0.4, -0.2])
        dc = np.array([0.8, 1.3])
        rho = _rand(n)
        rho = rho @ rho.conj().T
        rho = rho / np.trace(rho)
        expected = _explicit_lindblad_rhs(spec, hc, dc, rho)
        out = coll.evaluate_rhs(
            hc, dc, rho.flatten(order="F") if "Vectorized" in cls.__name__ else rho
        )
        if "Vectorized" in cls.__name__:
            out = np.asarray(out).reshape(n, n, order="F")
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-10)

    def test_no_dissipator_signals(self):
        """dissipator_operators=None: only static parts contribute."""
        n = 2
        spec = _rand_lindblad(n)
        spec_min = dict(
            static_hamiltonian=spec["static_hamiltonian"],
            hamiltonian_operators=spec["hamiltonian_operators"],
            static_dissipators=spec["static_dissipators"],
        )
        coll = LindbladCollection(**spec_min)
        rho = np.diag([0.5, 0.5]).astype(complex)
        hc = np.array([0.1, 0.2])
        expected = _explicit_lindblad_rhs(
            {**spec_min, "dissipator_operators": []}, hc, [], rho
        )
        np.testing.assert_allclose(
            np.asarray(coll.evaluate_rhs(hc, None, rho)), expected, atol=1e-10
        )

    def test_batched_density_matrices(self):
        """(k, n, n) batched rho through the non-vectorized collection."""
        n = 2
        spec = _rand_lindblad(n)
        coll = LindbladCollection(**spec)
        hc = np.array([0.4, -0.2])
        dc = np.array([0.8, 1.3])
        rhos = np.stack([np.diag([1.0, 0.0]), np.diag([0.3, 0.7])]).astype(complex)
        out = np.asarray(coll.evaluate_rhs(hc, dc, rhos))
        for i in range(2):
            np.testing.assert_allclose(
                out[i], _explicit_lindblad_rhs(spec, hc, dc, rhos[i]), atol=1e-10
            )

    def test_evaluate_hamiltonian(self):
        n = 3
        spec = _rand_lindblad(n)
        coll = LindbladCollection(**spec)
        hc = np.array([0.5, 0.5])
        expected = spec["static_hamiltonian"] + np.tensordot(
            hc, spec["hamiltonian_operators"], axes=1
        )
        np.testing.assert_allclose(
            np.asarray(coll.evaluate_hamiltonian(hc)), expected, atol=1e-10
        )

    def test_vectorized_evaluate_superoperator(self):
        """Vectorized evaluate() returns the (n^2, n^2) superoperator whose
        action matches the non-vectorized RHS."""
        n = 2
        spec = _rand_lindblad(n)
        vec = VectorizedLindbladCollection(**spec)
        dense = LindbladCollection(**spec)
        hc = np.array([0.4, -0.2])
        dc = np.array([0.8, 1.3])
        S = np.asarray(vec.evaluate(hc, dc))
        rho = np.diag([0.25, 0.75]).astype(complex)
        np.testing.assert_allclose(
            (S @ rho.flatten(order="F")).reshape(n, n, order="F"),
            np.asarray(dense.evaluate_rhs(hc, dc, rho)),
            atol=1e-10,
        )


class TestCollectionJaxTransforms:
    """jit/grad through collection evaluation (reference:
    test_operator_collections.py:119-147, 516-550)."""

    def test_operator_collection_jit_grad(self):
        ops = np.array([_rand(3), _rand(3)])
        coll = OperatorCollection(static_operator=_rand(3), operators=ops)
        y = _rand(3)

        def f(sig):
            return jnp.sum(jnp.real(coll(sig, jnp.asarray(y))) ** 2)

        sig0 = jnp.array([0.3, -0.2])
        v = float(jax.jit(f)(sig0))
        assert np.isfinite(v)
        g = np.asarray(jax.grad(f)(sig0))
        eps = 1e-6
        fd = (f(sig0 + jnp.array([eps, 0.0])) - f(sig0 - jnp.array([eps, 0.0]))) / (2 * eps)
        np.testing.assert_allclose(g[0], float(fd), rtol=1e-5)

    def test_lindblad_collection_jit_grad(self):
        H = _rand(3)
        H = H + H.conj().T
        L = _rand(3)
        coll = LindbladCollection(
            static_hamiltonian=H,
            hamiltonian_operators=np.array([_rand(3) + _rand(3).conj().T]),
            dissipator_operators=np.array([L]),
        )
        rho = np.eye(3, dtype=complex) / 3

        def f(params):
            ham_sig, dis_sig = params[:1], params[1:] ** 2  # positive rates
            return jnp.sum(jnp.real(coll(ham_sig, dis_sig, jnp.asarray(rho))) ** 2)

        p0 = jnp.array([0.4, 0.8])
        assert np.isfinite(float(jax.jit(f)(p0)))
        g = np.asarray(jax.grad(f)(p0))
        eps = 1e-6
        fd = (f(p0 + jnp.array([0.0, eps])) - f(p0 - jnp.array([0.0, eps]))) / (2 * eps)
        np.testing.assert_allclose(g[1], float(fd), rtol=1e-5)

    def test_vectorized_lindblad_jit(self):
        H = _rand(3)
        coll = VectorizedLindbladCollection(
            static_hamiltonian=H + H.conj().T,
            dissipator_operators=np.array([_rand(3)]),
        )
        rho_vec = np.eye(3, dtype=complex).flatten(order="F")

        @jax.jit
        def f(dis_sig):
            return coll(None, dis_sig, jnp.asarray(rho_vec))

        out = np.asarray(f(jnp.array([0.5])))
        assert out.shape == (9,)
        assert np.isfinite(out).all()


class TestConstructionTypes:
    """Input type coercion (reference: test_operator_collections.py:477-515,
    201-230): quantum_info Operator objects and plain lists construct."""

    def test_operator_objects(self):
        from qiskit_dynamics_tpu.quantum_info import Operator

        X = Operator(np.array([[0.0, 1.0], [1.0, 0.0]]))
        Z = Operator(np.array([[1.0, 0.0], [0.0, -1.0]]))
        coll = OperatorCollection(static_operator=Z, operators=[X, Z])
        y = np.eye(2, dtype=complex)
        out = np.asarray(coll(np.array([1.0, 2.0]), y))
        expected = np.asarray(Z.data) + 1.0 * np.asarray(X.data) + 2.0 * np.asarray(Z.data)
        np.testing.assert_allclose(out, expected @ y, atol=1e-14)

    def test_nested_list_operators(self):
        coll = OperatorCollection(operators=[[[0.0, 1.0], [1.0, 0.0]]])
        out = np.asarray(coll(np.array([2.0]), np.eye(2, dtype=complex)))
        np.testing.assert_allclose(out, 2.0 * np.array([[0.0, 1.0], [1.0, 0.0]]), atol=1e-14)

    def test_scipy_sparse_list_construction(self):
        from scipy.sparse import csr_matrix

        ops = [csr_matrix(np.array([[0.0, 1.0], [1.0, 0.0]]))]
        coll = ScipySparseOperatorCollection(operators=ops)
        out = coll(np.array([3.0]), np.array([1.0, 0.0], dtype=complex))
        np.testing.assert_allclose(np.asarray(out), [0.0, 3.0], atol=1e-12)


@pytest.mark.parametrize(
    "cls",
    [
        OperatorCollection,
        ScipySparseOperatorCollection,
    ],
)
def test_empty_collection_raises(cls):
    """Evaluating a fully-empty collection raises (reference:
    test_operator_collections.py:53-59, 151-160, 273-281)."""
    coll = cls()
    with pytest.raises(Exception):
        np.asarray(coll(np.array([]), np.eye(2, dtype=complex))) * 1.0


@pytest.mark.parametrize(
    "cls", [LindbladCollection, ScipySparseLindbladCollection]
)
def test_empty_lindblad_collection_raises(cls):
    with pytest.raises(Exception):
        coll = cls()
        np.asarray(
            coll(np.array([]), np.array([]), np.eye(2, dtype=complex))
        ) * 1.0
