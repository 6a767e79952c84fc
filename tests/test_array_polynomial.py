"""Tests for ArrayPolynomial: evaluation, array methods, algebra identities."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.perturbation import ArrayPolynomial
from qiskit_dynamics_tpu.exceptions import DynamicsError


def _random_poly(rng, shape=(3, 3), labels=((0,), (1,), (0, 1), (1, 1)), const=True):
    coeffs = rng.standard_normal((len(labels),) + shape) + 1j * rng.standard_normal(
        (len(labels),) + shape
    )
    c = rng.standard_normal(shape) + 1j * rng.standard_normal(shape) if const else None
    return ArrayPolynomial(
        constant_term=c, array_coefficients=coeffs, monomial_labels=list(labels)
    )


def _direct_eval(ap, c):
    out = 0 if ap.constant_term is None else np.asarray(ap.constant_term).copy()
    for label, coeff in zip(ap.monomial_labels, np.asarray(ap.array_coefficients)):
        out = out + np.prod([c[i] for i in label]) * coeff
    return out


class TestEvaluation:
    def test_monomials(self):
        ap = ArrayPolynomial(
            array_coefficients=np.ones((3, 2, 2)),
            monomial_labels=[[0], [0, 1], [1, 1]],
        )
        c = np.array([2.0, 3.0])
        np.testing.assert_allclose(ap.compute_monomials(c), [2.0, 6.0, 9.0])

    def test_monomials_batched(self):
        ap = ArrayPolynomial(
            array_coefficients=np.ones((2, 2, 2)), monomial_labels=[[0], [0, 1]]
        )
        c = np.array([[2.0, 4.0], [3.0, 5.0]])  # (r=2, batch=2)
        np.testing.assert_allclose(ap.compute_monomials(c), [[2.0, 4.0], [6.0, 20.0]])

    def test_call_matches_direct(self):
        rng = np.random.default_rng(5)
        ap = _random_poly(rng)
        c = rng.standard_normal(2)
        np.testing.assert_allclose(ap(c), _direct_eval(ap, c), atol=1e-12)

    def test_constant_only(self):
        A = np.eye(2)
        ap = ArrayPolynomial(constant_term=A)
        np.testing.assert_allclose(ap(), A)

    def test_jit_and_grad(self):
        rng = np.random.default_rng(6)
        ap = _random_poly(rng, shape=(2, 2))

        @jax.jit
        def f(c):
            return jnp.real(jnp.sum(ap(c)))

        c = jnp.array([0.3, 0.4])
        expected = np.real(np.sum(_direct_eval(ap, np.array([0.3, 0.4]))))
        np.testing.assert_allclose(float(f(c)), expected, atol=1e-12)
        g = jax.grad(f)(c)
        assert g.shape == (2,)

    def test_validation(self):
        with pytest.raises(DynamicsError):
            ArrayPolynomial()
        with pytest.raises(DynamicsError):
            ArrayPolynomial(array_coefficients=np.ones((2, 2, 2)), monomial_labels=[[0]])


class TestArrayMethods:
    def setup_method(self, method):
        rng = np.random.default_rng(7)
        self.ap = _random_poly(rng)
        self.c = rng.standard_normal(2)

    def test_transpose(self):
        np.testing.assert_allclose(self.ap.transpose()(self.c), self.ap(self.c).T, atol=1e-12)

    def test_conj(self):
        np.testing.assert_allclose(self.ap.conj()(self.c), self.ap(self.c).conj(), atol=1e-12)

    def test_trace(self):
        np.testing.assert_allclose(
            self.ap.trace()(self.c), np.trace(self.ap(self.c)), atol=1e-12
        )

    def test_sum(self):
        np.testing.assert_allclose(
            self.ap.sum(axis=0)(self.c), self.ap(self.c).sum(axis=0), atol=1e-12
        )

    def test_real(self):
        np.testing.assert_allclose(self.ap.real(self.c), self.ap(self.c).real, atol=1e-12)

    def test_getitem(self):
        np.testing.assert_allclose(self.ap[0, 1](self.c), self.ap(self.c)[0, 1], atol=1e-12)

    def test_len(self):
        assert len(self.ap) == 5


class TestAlgebra:
    def setup_method(self, method):
        rng = np.random.default_rng(8)
        self.ap1 = _random_poly(rng, labels=((0,), (1,), (0, 1)))
        self.ap2 = _random_poly(rng, labels=((0,), (0, 0)))
        self.c = rng.standard_normal(2)

    def test_add(self):
        out = self.ap1 + self.ap2
        np.testing.assert_allclose(out(self.c), self.ap1(self.c) + self.ap2(self.c), atol=1e-12)

    def test_add_array(self):
        A = np.ones((3, 3))
        np.testing.assert_allclose((self.ap1 + A)(self.c), self.ap1(self.c) + A, atol=1e-12)

    def test_add_broadcast_shapes(self):
        # different-but-broadcastable coefficient shapes: (3, 3) + (1, 3)
        rng = np.random.default_rng(11)
        row = _random_poly(rng, shape=(1, 3), labels=((0,), (1, 1)))
        out = self.ap1 + row
        np.testing.assert_allclose(out(self.c), self.ap1(self.c) + row(self.c), atol=1e-12)
        out2 = row + self.ap1
        np.testing.assert_allclose(out2(self.c), self.ap1(self.c) + row(self.c), atol=1e-12)

    def test_sub(self):
        out = self.ap1 - self.ap2
        np.testing.assert_allclose(out(self.c), self.ap1(self.c) - self.ap2(self.c), atol=1e-12)

    def test_matmul(self):
        out = self.ap1 @ self.ap2
        np.testing.assert_allclose(out(self.c), self.ap1(self.c) @ self.ap2(self.c), atol=1e-11)

    def test_matmul_array(self):
        A = np.arange(9.0).reshape(3, 3)
        np.testing.assert_allclose((self.ap1 @ A)(self.c), self.ap1(self.c) @ A, atol=1e-11)
        np.testing.assert_allclose((A @ self.ap1)(self.c), A @ self.ap1(self.c), atol=1e-11)

    def test_mul(self):
        out = self.ap1 * self.ap2
        np.testing.assert_allclose(out(self.c), self.ap1(self.c) * self.ap2(self.c), atol=1e-11)

    def test_scalar_mul(self):
        np.testing.assert_allclose((2.0 * self.ap1)(self.c), 2.0 * self.ap1(self.c), atol=1e-12)

    def test_neg(self):
        np.testing.assert_allclose((-self.ap1)(self.c), -self.ap1(self.c), atol=1e-12)

    def test_matmul_truncated(self):
        # degree <= 2 truncation: matches full product with high-degree
        # monomials dropped
        out = self.ap1.matmul(self.ap2, monomial_filter=lambda m: len(m) <= 2)
        assert all(len(m) <= 2 for m in out.monomial_labels)
        full = self.ap1 @ self.ap2
        expected = np.asarray(full.constant_term).copy()
        for label, coeff in zip(full.monomial_labels, np.asarray(full.array_coefficients)):
            if len(label) <= 2:
                expected = expected + np.prod([self.c[i] for i in label]) * coeff
        np.testing.assert_allclose(out(self.c), expected, atol=1e-11)

    def test_matmul_identity_of_truncation(self):
        # (ap1 @ ap2)(c) equality checked degree-by-degree via direct expansion
        full = self.ap1 @ self.ap2
        direct = {}
        pairs = [((), np.asarray(self.ap1.constant_term))] + list(
            zip(self.ap1.monomial_labels, np.asarray(self.ap1.array_coefficients))
        )
        pairs2 = [((), np.asarray(self.ap2.constant_term))] + list(
            zip(self.ap2.monomial_labels, np.asarray(self.ap2.array_coefficients))
        )
        for l1, a1 in pairs:
            for l2, a2 in pairs2:
                key = tuple(sorted(l1 + l2))
                direct[key] = direct.get(key, 0) + a1 @ a2
        for label, coeff in zip(full.monomial_labels, np.asarray(full.array_coefficients)):
            np.testing.assert_allclose(coeff, direct[label], atol=1e-11)
        np.testing.assert_allclose(np.asarray(full.constant_term), direct[()], atol=1e-11)


class TestAlgebraProperties:
    """Distributivity / filter / label-handling battery (reference analog:
    test_array_polynomial.py:113-575 parametrized distributive cases)."""

    def _check_pointwise(self, result, direct_fn, c):
        np.testing.assert_allclose(
            np.asarray(result(jnp.asarray(c))), direct_fn(c), atol=1e-12
        )

    def test_add_non_overlapping_labels(self):
        rng = np.random.default_rng(0)
        a = _random_poly(rng, labels=((0,), (0, 0)))
        b = _random_poly(rng, labels=((1,), (1, 1)))
        c = rng.standard_normal(2)
        s = a.add(b)
        assert {tuple(m) for m in s.monomial_labels} == {(0,), (0, 0), (1,), (1, 1)}
        self._check_pointwise(s, lambda c: _direct_eval(a, c) + _direct_eval(b, c), c)

    def test_distributive_identities(self):
        rng = np.random.default_rng(1)
        a = _random_poly(rng)
        b = _random_poly(rng, labels=((1,), (0, 0)))
        c = rng.standard_normal(2)
        for op, direct in (
            ("matmul", lambda c: _direct_eval(a, c) @ _direct_eval(b, c)),
            ("mul", lambda c: _direct_eval(a, c) * _direct_eval(b, c)),
        ):
            full_labels = getattr(a, op)(b)
            # without a filter the result must match the raw product up to
            # the maximum combined degree
            self._check_pointwise(full_labels, direct, c)

    def test_matmul_filter_truncates_degree(self):
        rng = np.random.default_rng(2)
        a = _random_poly(rng)
        b = _random_poly(rng, labels=((1,), (0, 0)))
        keep = lambda m: len(m) <= 2
        truncated = a.matmul(b, monomial_filter=keep)
        assert all(len(m) <= 2 for m in truncated.monomial_labels)
        full = a.matmul(b)
        dropped = [m for m in full.monomial_labels if len(m) > 2]
        assert dropped  # the filter actually removed something
        # matching terms agree
        for m in truncated.monomial_labels:
            i_t = truncated.monomial_labels.index(m)
            i_f = full.monomial_labels.index(m)
            np.testing.assert_allclose(
                np.asarray(truncated.array_coefficients)[i_t],
                np.asarray(full.array_coefficients)[i_f],
                atol=1e-12,
            )

    def test_add_monomial_filter(self):
        rng = np.random.default_rng(3)
        a = _random_poly(rng, labels=((0,), (0, 1)))
        b = _random_poly(rng, labels=((1,), (1, 1)))
        only_first_order = a.add(b, monomial_filter=lambda m: len(m) <= 1)
        assert {tuple(m) for m in only_first_order.monomial_labels} == {(0,), (1,)}

    def test_mul_with_array_and_scalar(self):
        rng = np.random.default_rng(4)
        a = _random_poly(rng)
        arr = rng.standard_normal((3, 3))
        c = rng.standard_normal(2)
        self._check_pointwise(a.mul(arr), lambda c: _direct_eval(a, c) * arr, c)
        self._check_pointwise(2.5 * a, lambda c: 2.5 * _direct_eval(a, c), c)

    def test_matmul_with_array_both_sides(self):
        rng = np.random.default_rng(5)
        a = _random_poly(rng)
        arr = rng.standard_normal((3, 3))
        c = rng.standard_normal(2)
        self._check_pointwise(a @ arr, lambda c: _direct_eval(a, c) @ arr, c)
        self._check_pointwise(arr @ a, lambda c: arr @ _direct_eval(a, c), c)


class TestArrayMethodEdges:
    def test_shape_ndim_properties(self):
        rng = np.random.default_rng(6)
        ap = _random_poly(rng, shape=(2, 4))
        assert ap.shape == (2, 4)
        assert ap.ndim == 2

    def test_sum_with_axis(self):
        rng = np.random.default_rng(7)
        ap = _random_poly(rng, shape=(2, 4))
        c = rng.standard_normal(2)
        summed = ap.sum(axis=1)
        assert summed.shape == (2,)
        np.testing.assert_allclose(
            np.asarray(summed(jnp.asarray(c))), _direct_eval(ap, c).sum(axis=1), atol=1e-12
        )

    def test_trace_requires_2d(self):
        ap = ArrayPolynomial(
            array_coefficients=np.ones((1, 3)), monomial_labels=[[0]]
        )
        with pytest.raises((DynamicsError, ValueError)):
            ap.trace()

    def test_compute_monomials_skipped_variable(self):
        """Labels that never use variable 1 still evaluate correctly."""
        ap = ArrayPolynomial(
            array_coefficients=np.ones((2, 2, 2)),
            monomial_labels=[[0], [0, 0, 2]],
        )
        c = np.array([2.0, 99.0, 3.0])
        np.testing.assert_allclose(ap.compute_monomials(c), [2.0, 12.0])

    def test_transpose_with_axes(self):
        rng = np.random.default_rng(8)
        ap = _random_poly(rng, shape=(2, 4))
        c = rng.standard_normal(2)
        np.testing.assert_allclose(
            np.asarray(ap.transpose()(jnp.asarray(c))), _direct_eval(ap, c).T, atol=1e-12
        )

    def test_conj_composes_with_call(self):
        rng = np.random.default_rng(9)
        ap = _random_poly(rng)
        c = rng.standard_normal(2)
        np.testing.assert_allclose(
            np.asarray(ap.conj()(jnp.asarray(c))), np.conj(_direct_eval(ap, c)), atol=1e-12
        )


class TestMonomialFilterCases:
    """Filter semantics on add (reference: test_array_polynomial.py:197-291).

    Labels here are canonical sorted tuples (multiset_utils.Multiset); the
    result's labels are in canonical (size, lex) order.
    """

    def _pair(self, rng):
        ap1 = ArrayPolynomial(
            array_coefficients=rng.standard_normal((3, 4, 5)),
            monomial_labels=[[0], [1], [2]],
            constant_term=rng.standard_normal((4, 5)),
        )
        ap2 = ArrayPolynomial(
            array_coefficients=rng.standard_normal((3, 4, 5)),
            monomial_labels=[[0], [3], [2, 2]],
            constant_term=rng.standard_normal((4, 5)),
        )
        return ap1, ap2

    def test_first_order_filter(self):
        rng = np.random.default_rng(10)
        ap1, ap2 = self._pair(rng)
        result = ap1.add(ap2, monomial_filter=lambda x: len(x) <= 1)
        assert result.monomial_labels == [(0,), (1,), (2,), (3,)]
        c1, c2 = np.asarray(ap1.array_coefficients), np.asarray(ap2.array_coefficients)
        np.testing.assert_allclose(
            np.asarray(result.array_coefficients),
            [c1[0] + c2[0], c1[1], c1[2], c2[1]],
            atol=1e-14,
        )
        np.testing.assert_allclose(
            np.asarray(result.constant_term),
            np.asarray(ap1.constant_term) + np.asarray(ap2.constant_term),
            atol=1e-14,
        )

    def test_submultiset_filter(self):
        from qiskit_dynamics_tpu.perturbation.multiset_utils import is_submultiset

        rng = np.random.default_rng(11)
        ap1 = ArrayPolynomial(
            array_coefficients=rng.standard_normal((3, 4, 5)),
            monomial_labels=[[0], [0, 0, 0], [0, 0, 0, 0]],
            constant_term=rng.standard_normal((4, 5)),
        )
        _, ap2 = self._pair(rng)
        keep = lambda x: len(x) <= 2 or is_submultiset(x, (0, 0, 0))
        result = ap1.add(ap2, monomial_filter=keep)
        # canonical order: size 1 first, then size 2, then size 3
        assert result.monomial_labels == [(0,), (3,), (2, 2), (0, 0, 0)]
        c1, c2 = np.asarray(ap1.array_coefficients), np.asarray(ap2.array_coefficients)
        np.testing.assert_allclose(
            np.asarray(result.array_coefficients),
            [c1[0] + c2[0], c2[1], c2[2], c1[1]],
            atol=1e-14,
        )

    def test_membership_filter_drops_constant(self):
        rng = np.random.default_rng(12)
        ap1 = ArrayPolynomial(
            array_coefficients=rng.standard_normal((3, 4, 5)),
            monomial_labels=[[0], [0, 0, 0], [0, 0, 0, 0]],
            constant_term=rng.standard_normal((4, 5)),
        )
        _, ap2 = self._pair(rng)
        result = ap1.add(ap2, monomial_filter=lambda x: x in [(0, 0, 0)])
        assert result.monomial_labels == [(0, 0, 0)]
        assert result.constant_term is None
        np.testing.assert_allclose(
            np.asarray(result.array_coefficients),
            [np.asarray(ap1.array_coefficients)[1]],
            atol=1e-14,
        )

    @pytest.mark.parametrize("op", ["matmul", "mul"])
    def test_distributive_filter_evaluates_truncated(self, op):
        """A degree filter on matmul/mul equals evaluating the full product
        and dropping higher-degree monomials."""
        rng = np.random.default_rng(13)
        ap1 = _random_poly(rng, shape=(3, 3), labels=((0,), (1,)))
        ap2 = _random_poly(rng, shape=(3, 3), labels=((0,), (0, 1)))
        full = getattr(ap1, op)(ap2)
        trunc = getattr(ap1, op)(ap2, monomial_filter=lambda x: len(x) <= 2)
        assert all(len(m) <= 2 for m in trunc.monomial_labels)
        # matching labels carry identical coefficients
        for m in trunc.monomial_labels:
            i_t = trunc.monomial_labels.index(m)
            i_f = full.monomial_labels.index(m)
            np.testing.assert_allclose(
                np.asarray(trunc.array_coefficients)[i_t],
                np.asarray(full.array_coefficients)[i_f],
                atol=1e-13,
            )


class TestAlgebraConstantEdges:
    """Only-constant / only-coefficient operand combinations
    (reference: test_array_polynomial.py:83-112, 325-341)."""

    def test_add_only_constants(self):
        a = np.array([[1.0, 2.0], [3.0, 4.0]])
        b = np.array([[5.0, 6.0], [7.0, 8.0]])
        out = ArrayPolynomial(constant_term=a) + ArrayPolynomial(constant_term=b)
        assert out.array_coefficients is None
        np.testing.assert_allclose(np.asarray(out.constant_term), a + b)

    def test_add_constant_to_coefficients_only(self):
        rng = np.random.default_rng(14)
        ap = _random_poly(rng, const=False)
        const = rng.standard_normal((3, 3))
        out = ap + const  # array coerces to constant polynomial
        np.testing.assert_allclose(np.asarray(out.constant_term), const)
        c = rng.standard_normal(2)
        np.testing.assert_allclose(
            np.asarray(out(jnp.asarray(c))), _direct_eval(ap, c) + const, atol=1e-12
        )

    def test_radd_rsub_scalar_like(self):
        rng = np.random.default_rng(15)
        ap = _random_poly(rng)
        c = rng.standard_normal(2)
        arr = rng.standard_normal((3, 3))
        np.testing.assert_allclose(
            np.asarray((arr + ap)(jnp.asarray(c))), arr + _direct_eval(ap, c), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray((arr - ap)(jnp.asarray(c))), arr - _direct_eval(ap, c), atol=1e-12
        )

    @pytest.mark.parametrize("op", ["matmul", "mul"])
    def test_distributive_only_constants(self, op):
        rng = np.random.default_rng(16)
        a = rng.standard_normal((3, 3))
        b = rng.standard_normal((3, 3))
        out = getattr(ArrayPolynomial(constant_term=a), op)(
            ArrayPolynomial(constant_term=b)
        )
        expected = a @ b if op == "matmul" else a * b
        assert out.array_coefficients is None
        np.testing.assert_allclose(np.asarray(out.constant_term), expected, atol=1e-13)

    def test_add_type_error(self):
        with pytest.raises(DynamicsError, match="castable|supported"):
            ArrayPolynomial(constant_term=np.eye(2)).add("not a polynomial")

    def test_add_shape_error(self):
        with pytest.raises(DynamicsError, match="[Bb]roadcast"):
            ArrayPolynomial(constant_term=np.ones((2, 3))).add(
                ArrayPolynomial(constant_term=np.ones((4, 5)))
            )


class TestDistributiveProductIdentity:
    """(ap1 op ap2)(c) == op(ap1(c), ap2(c)) on multi-variable labels —
    the defining property of the distributive product
    (reference: test_array_polynomial.py:292-407)."""

    @pytest.mark.parametrize("op", ["matmul", "mul"])
    def test_product_identity_second_order(self, op):
        rng = np.random.default_rng(17)
        ap1 = _random_poly(rng, labels=((0,), (1,), (0, 0)))
        ap2 = _random_poly(rng, labels=((1,), (0, 1)))
        prod = getattr(ap1, op)(ap2)
        for _ in range(3):
            c = rng.standard_normal(2)
            v1, v2 = _direct_eval(ap1, c), _direct_eval(ap2, c)
            expected = v1 @ v2 if op == "matmul" else v1 * v2
            np.testing.assert_allclose(
                np.asarray(prod(jnp.asarray(c))), expected, atol=1e-11
            )

    @pytest.mark.parametrize("op", ["matmul", "mul"])
    def test_product_with_array_both_sides(self, op):
        rng = np.random.default_rng(18)
        ap = _random_poly(rng)
        arr = rng.standard_normal((3, 3))
        c = rng.standard_normal(2)
        v = _direct_eval(ap, c)
        if op == "matmul":
            np.testing.assert_allclose(
                np.asarray((ap @ arr)(jnp.asarray(c))), v @ arr, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray((arr @ ap)(jnp.asarray(c))), arr @ v, atol=1e-12
            )
        else:
            np.testing.assert_allclose(
                np.asarray((ap * arr)(jnp.asarray(c))), v * arr, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray((arr * ap)(jnp.asarray(c))), arr * v, atol=1e-12
            )

    def test_scalar_multiplication(self):
        rng = np.random.default_rng(19)
        ap = _random_poly(rng)
        c = rng.standard_normal(2)
        np.testing.assert_allclose(
            np.asarray((2.5 * ap)(jnp.asarray(c))), 2.5 * _direct_eval(ap, c), atol=1e-12
        )


class TestComputeMonomialsCases:
    """compute_monomials case matrix
    (reference: test_array_polynomial.py:822-1024)."""

    def test_medium_case(self):
        ap = ArrayPolynomial(
            array_coefficients=np.ones((6, 1)),
            monomial_labels=[[0], [1], [0, 1], [0, 0, 1], [1, 1, 1], [0, 0, 1, 1]],
        )
        c = np.array([3.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(ap.compute_monomials(c)),
            [3.0, 2.0, 6.0, 18.0, 8.0, 36.0],
        )

    def test_vectorized_over_batch(self):
        ap = ArrayPolynomial(
            array_coefficients=np.ones((3, 1)),
            monomial_labels=[[0], [1], [0, 1]],
        )
        c = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]).T  # (vars, batch)
        out = np.asarray(ap.compute_monomials(jnp.asarray(c)))
        np.testing.assert_allclose(out, [[1.0, 3.0, 5.0], [2.0, 4.0, 6.0], [2.0, 12.0, 30.0]])

    def test_only_first_order(self):
        ap = ArrayPolynomial(
            array_coefficients=np.ones((2, 1)), monomial_labels=[[0], [1]]
        )
        c = np.array([7.0, 11.0])
        np.testing.assert_allclose(np.asarray(ap.compute_monomials(c)), [7.0, 11.0])

    def test_incomplete_label_list(self):
        """High-order labels without their lower-order factors present."""
        ap = ArrayPolynomial(
            array_coefficients=np.ones((2, 1)),
            monomial_labels=[[0, 0, 1], [1, 1]],
        )
        c = np.array([2.0, 3.0])
        np.testing.assert_allclose(np.asarray(ap.compute_monomials(c)), [12.0, 9.0])

    def test_extra_variables_ignored(self):
        ap = ArrayPolynomial(
            array_coefficients=np.ones((1, 1)), monomial_labels=[[2]]
        )
        c = np.array([99.0, 98.0, 4.0, 97.0])
        np.testing.assert_allclose(np.asarray(ap.compute_monomials(c)), [4.0])


class TestValidationCases:
    """Constructor validation (reference: test_array_polynomial.py:634-650)."""

    def test_no_args_raises(self):
        with pytest.raises(DynamicsError, match="constant_term"):
            ArrayPolynomial()

    def test_negative_label_raises(self):
        with pytest.raises(DynamicsError, match="non-negative"):
            ArrayPolynomial(
                array_coefficients=np.ones((1, 2)), monomial_labels=[[-1]]
            )

    def test_label_length_mismatch_raises(self):
        with pytest.raises(DynamicsError, match="matching lengths"):
            ArrayPolynomial(
                array_coefficients=np.ones((2, 2)), monomial_labels=[[0]]
            )

    def test_trace_on_scalar_raises(self):
        with pytest.raises((DynamicsError, ValueError)):
            ArrayPolynomial(constant_term=np.array(1.0)).trace()


class TestAlgebraJaxTransforms:
    """jit/grad through polynomial algebra then evaluation
    (reference: test_array_polynomial.py:573-605)."""

    @pytest.mark.parametrize("op", ["add", "matmul", "mul"])
    def test_jit_grad_through_algebra(self, op):
        rng = np.random.default_rng(20)
        ap1 = _random_poly(rng, labels=((0,), (1,)))
        ap2 = _random_poly(rng, labels=((1,), (0, 1)))
        combined = getattr(ap1, op)(ap2)

        def f(c):
            return jnp.sum(jnp.real(combined(c)) ** 2)

        c0 = jnp.array([0.3, -0.7])
        v = float(jax.jit(f)(c0))
        assert np.isfinite(v)
        g = np.asarray(jax.grad(f)(c0))
        eps = 1e-6
        fd = (f(c0 + jnp.array([eps, 0.0])) - f(c0 - jnp.array([eps, 0.0]))) / (2 * eps)
        np.testing.assert_allclose(g[0], float(fd), rtol=1e-4)
