"""Tests for the perturbation module: multisets, compiled ops, Dyson/Magnus.

Validation strategy mirrors the reference's
``test/dynamics/perturbation/test_solve_lmde_perturbation.py``: compare
computed terms against independently-coded explicit nested integrals and
exponentiation identities.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.linalg import expm

from qiskit_dynamics_tpu.perturbation import (
    solve_lmde_perturbation,
    to_multiset,
    clean_multisets,
    get_all_submultisets,
    CustomMatmul,
    magnus_from_dyson,
)
from qiskit_dynamics_tpu.perturbation.multiset_utils import (
    submultisets_and_complements,
    is_submultiset,
    multiset_complement,
)
from qiskit_dynamics_tpu.perturbation.custom_dot import compile_rule, CustomMul


class TestMultisetUtils:
    def test_to_multiset_forms(self):
        assert to_multiset([1, 0, 0]) == (0, 0, 1)
        assert to_multiset({0: 2, 1: 1}) == (0, 0, 1)
        assert to_multiset(3) == (3,)

    def test_ordering(self):
        # (0,0,1) < (0,1,1): canonical ordering by size then expanded lexicographic
        out = clean_multisets([{0: 1, 1: 2}, {0: 2, 1: 1}, [1], [0]])
        assert out == [(0,), (1,), (0, 0, 1), (0, 1, 1)]

    def test_submultisets_and_complements(self):
        subs, comps = submultisets_and_complements((0, 0, 1))
        assert ((0,) in subs) and ((1,) in subs) and ((0, 0) in subs) and ((0, 1) in subs)
        for s, c in zip(subs, comps):
            assert tuple(sorted(s + c)) == (0, 0, 1)

    def test_closure(self):
        out = get_all_submultisets([(0, 1, 2)])
        assert out == [
            (0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2),
        ]

    def test_sub_and_complement(self):
        assert is_submultiset((0, 1), (0, 1, 1))
        assert not is_submultiset((0, 0), (0, 1, 1))
        assert multiset_complement((0, 1, 1), (1,)) == (0, 1)


class TestCustomDot:
    def test_matmul_rule_numpy_vs_jax(self):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((3, 4, 4)) + 1j * rng.standard_normal((3, 4, 4))
        B = rng.standard_normal((2, 4, 4)) + 1j * rng.standard_normal((2, 4, 4))
        # out0 = 2 A0@B1 + 3 A2@B0 ; out1 = A1@B1
        rule = [
            (np.array([2.0, 3.0]), np.array([[0, 1], [2, 0]])),
            (np.array([1.0]), np.array([[1, 1]])),
        ]
        cm = CustomMatmul(rule)
        expected = np.stack([2 * A[0] @ B[1] + 3 * A[2] @ B[0], A[1] @ B[1]])
        np.testing.assert_allclose(cm(A, B), expected, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(jax.jit(cm)(jnp.asarray(A), jnp.asarray(B))), expected, atol=1e-12
        )

    def test_mul_rule(self):
        A = np.arange(8.0).reshape(2, 2, 2)
        B = np.ones((1, 2, 2))
        rule = [(np.array([1.0, -1.0]), np.array([[0, 0], [1, 0]]))]
        out = CustomMul(rule)(A, B)
        np.testing.assert_allclose(out[0], A[0] - A[1])

    def test_padding(self):
        rule = [(np.array([1.0]), np.array([[0, 0]]))]
        c = compile_rule(rule, unique_evaluation_len=4, linear_combo_len=3)
        assert c.pairs.shape == (4, 2) and c.coeffs.shape == (1, 3)


def _2x2_ops():
    X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
    Y = np.array([[0.0, -1j], [1j, 0.0]], dtype=complex)
    Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
    return X, Y, Z


class TestDysonMagnusConstant:
    """Constant perturbations with zero generator: closed forms."""

    def setup_method(self, method):
        X, Y, _ = _2x2_ops()
        self.A0, self.A1 = -1j * X, -1j * Y
        self.T = 0.8

    def test_dyson_orders(self):
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.A0, lambda t: self.A1],
            t_span=[0.0, self.T],
            expansion_method="dyson",
            expansion_order=3,
            atol=1e-12, rtol=1e-12,
        )
        data = res.perturbation_data
        T = self.T
        np.testing.assert_allclose(
            data.get_item([0])[-1], self.A0 * T, atol=1e-8
        )
        np.testing.assert_allclose(
            data.get_item([0, 0])[-1], self.A0 @ self.A0 * T**2 / 2, atol=1e-8
        )
        np.testing.assert_allclose(
            data.get_item([0, 1])[-1],
            (self.A0 @ self.A1 + self.A1 @ self.A0) * T**2 / 2,
            atol=1e-8,
        )
        np.testing.assert_allclose(
            data.get_item([0, 0, 0])[-1], self.A0 @ self.A0 @ self.A0 * T**3 / 6, atol=1e-8
        )

    def test_magnus_higher_orders_vanish(self):
        # constant generator: Omega(T) = (c0 A0 + c1 A1) T exactly, so all
        # Magnus terms of order >= 2 vanish
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.A0, lambda t: self.A1],
            t_span=[0.0, self.T],
            expansion_method="magnus",
            expansion_order=2,
            atol=1e-12, rtol=1e-12,
        )
        data = res.perturbation_data
        np.testing.assert_allclose(data.get_item([0])[-1], self.A0 * self.T, atol=1e-8)
        for label in [[0, 0], [0, 1], [1, 1]]:
            np.testing.assert_allclose(
                data.get_item(label)[-1], np.zeros((2, 2)), atol=1e-8
            )


class TestDysonMagnusTimeDependent:
    """Time-dependent coefficients: explicit nested integrals + exponentiation."""

    def setup_method(self, method):
        X, Y, _ = _2x2_ops()
        self.A, self.B = -1j * X, -1j * Y
        self.f = lambda t: np.cos(2.0 * t)
        self.g = lambda t: np.sin(t) + t**2
        self.T = 0.7

    def _nested2(self, h1, h2):
        # int_0^T dt1 h1(t1) int_0^t1 dt2 h2(t2) via high-res Simpson
        from scipy.integrate import quad

        inner = lambda t1: quad(h2, 0.0, t1, limit=200)[0]
        return quad(lambda t1: h1(t1) * inner(t1), 0.0, self.T, limit=200)[0]

    def test_dyson_second_order_cross(self):
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.f(t) * self.A, lambda t: self.g(t) * self.B],
            t_span=[0.0, self.T],
            expansion_method="dyson",
            expansion_order=2,
            atol=1e-13, rtol=1e-13,
        )
        c_fg = self._nested2(self.f, self.g)
        c_gf = self._nested2(self.g, self.f)
        expected = c_fg * self.A @ self.B + c_gf * self.B @ self.A
        np.testing.assert_allclose(
            res.perturbation_data.get_item([0, 1])[-1], expected, atol=1e-8
        )

    def test_magnus_second_order_cross(self):
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.f(t) * self.A, lambda t: self.g(t) * self.B],
            t_span=[0.0, self.T],
            expansion_method="magnus",
            expansion_order=2,
            atol=1e-13, rtol=1e-13,
        )
        c_fg = self._nested2(self.f, self.g)
        c_gf = self._nested2(self.g, self.f)
        comm = self.A @ self.B - self.B @ self.A
        expected = 0.5 * (c_fg - c_gf) * comm
        np.testing.assert_allclose(
            res.perturbation_data.get_item([0, 1])[-1], expected, atol=1e-8
        )

    def test_magnus_exponentiation(self):
        # exp(sum_k c^k O_k)(T) matches the direct solve to O(c^4)
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.f(t) * self.A],
            t_span=[0.0, self.T],
            expansion_method="magnus",
            expansion_order=3,
            atol=1e-13, rtol=1e-13,
        )
        data = res.perturbation_data
        c = 0.05
        Om = (
            c * data.get_item([0])[-1]
            + c**2 * data.get_item([0, 0])[-1]
            + c**3 * data.get_item([0, 0, 0])[-1]
        )
        from qiskit_dynamics_tpu import solve_ode

        direct = solve_ode(
            rhs=lambda t, y: c * self.f(t) * self.A @ y,
            t_span=[0.0, self.T],
            y0=np.eye(2, dtype=complex),
            method="DOP853", atol=1e-13, rtol=1e-13,
        ).y[-1]
        np.testing.assert_allclose(expm(Om), direct, atol=5e-7)

    def test_dyson_like_ordering(self):
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.f(t) * self.A, lambda t: self.g(t) * self.B],
            t_span=[0.0, self.T],
            expansion_method="dyson_like",
            expansion_order=2,
            atol=1e-13, rtol=1e-13,
        )
        c_fg = self._nested2(self.f, self.g)
        expected = c_fg * self.A @ self.B
        np.testing.assert_allclose(
            res.perturbation_data.get_item([0, 1])[-1], expected, atol=1e-8
        )

    def _nested3(self, h1, h2, h3, n=20001):
        """int_0^T dt1 h1(t1) int_0^t1 dt2 h2(t2) int_0^t2 dt3 h3(t3):
        explicitly-coded triple integral on a fine cumulative-trapezoid grid
        (reference pattern: test_solve_lmde_perturbation.py nested integrals)."""
        from scipy.integrate import cumulative_trapezoid

        ts = np.linspace(0.0, self.T, n)
        c1 = cumulative_trapezoid(h3(ts), ts, initial=0.0)
        c2 = cumulative_trapezoid(h2(ts) * c1, ts, initial=0.0)
        return cumulative_trapezoid(h1(ts) * c2, ts, initial=0.0)[-1]

    def test_dyson_third_order_mixed(self):
        """Multiset [0,0,1] Dyson term == sum of the 3 ordered triple integrals."""
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.f(t) * self.A, lambda t: self.g(t) * self.B],
            t_span=[0.0, self.T],
            expansion_method="dyson",
            expansion_order=3,
            atol=1e-13, rtol=1e-13,
        )
        f, g, A, B = self.f, self.g, self.A, self.B
        expected = (
            self._nested3(f, f, g) * A @ A @ B
            + self._nested3(f, g, f) * A @ B @ A
            + self._nested3(g, f, f) * B @ A @ A
        )
        np.testing.assert_allclose(
            res.perturbation_data.get_item([0, 0, 1])[-1], expected, atol=1e-7
        )

    def test_dyson_third_order_pure(self):
        """Multiset [1,1,1] Dyson term == the single ordered triple integral."""
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.f(t) * self.A, lambda t: self.g(t) * self.B],
            t_span=[0.0, self.T],
            expansion_method="dyson",
            expansion_order=3,
            atol=1e-13, rtol=1e-13,
        )
        expected = self._nested3(self.g, self.g, self.g) * self.B @ self.B @ self.B
        np.testing.assert_allclose(
            res.perturbation_data.get_item([1, 1, 1])[-1], expected, atol=1e-7
        )

    def test_dyson_like_third_order_sequence(self):
        """dyson_like: a LIST label [1,0,0] is one specific ordered integral."""
        res = solve_lmde_perturbation(
            perturbations=[lambda t: self.f(t) * self.A, lambda t: self.g(t) * self.B],
            t_span=[0.0, self.T],
            expansion_method="dyson_like",
            expansion_order=3,
            atol=1e-13, rtol=1e-13,
        )
        expected = self._nested3(self.g, self.f, self.f) * self.B @ self.A @ self.A
        np.testing.assert_allclose(
            res.perturbation_data.get_item([1, 0, 0])[-1], expected, atol=1e-7
        )

    def test_jax_matches_numpy(self):
        kwargs = dict(
            perturbations=[lambda t: jnp.cos(2.0 * t) * jnp.asarray(self.A),
                           lambda t: (jnp.sin(t) + t**2) * jnp.asarray(self.B)],
            t_span=[0.0, self.T],
            expansion_order=2,
        )
        res_np = solve_lmde_perturbation(
            expansion_method="magnus", integration_method="DOP853",
            atol=1e-12, rtol=1e-12, **kwargs,
        )
        res_jax = solve_lmde_perturbation(
            expansion_method="magnus", integration_method="tpu_dopri5",
            atol=1e-12, rtol=1e-12, **kwargs,
        )
        for label in [[0], [1], [0, 0], [0, 1], [1, 1]]:
            np.testing.assert_allclose(
                np.asarray(res_jax.perturbation_data.get_item(label)[-1]),
                res_np.perturbation_data.get_item(label)[-1],
                atol=1e-7,
            )


class TestWithFrameGenerator:
    def test_dyson_in_frame_consistency(self):
        X, Y, Z = _2x2_ops()
        G0 = -1j * Z
        pert = lambda t: -1j * np.cos(t) * X
        common = dict(
            perturbations=[pert],
            t_span=[0.0, 0.5],
            expansion_method="dyson",
            expansion_order=1,
            generator=lambda t: G0,
            atol=1e-13, rtol=1e-13,
        )
        in_frame = solve_lmde_perturbation(dyson_in_frame=True, **common)
        out_frame = solve_lmde_perturbation(dyson_in_frame=False, **common)
        V = in_frame.y[-1]
        np.testing.assert_allclose(
            out_frame.perturbation_data.get_item([0])[-1],
            V @ in_frame.perturbation_data.get_item([0])[-1],
            atol=1e-9,
        )
        # first-order term = int V(t)^-1 Gp(t) V(t) dt
        from scipy.integrate import quad

        def integrand(t):
            Vt = expm(G0 * t)
            return np.linalg.inv(Vt) @ pert(t) @ Vt

        num = np.zeros((2, 2), dtype=complex)
        for i in range(2):
            for j in range(2):
                num[i, j] = (
                    quad(lambda t: integrand(t)[i, j].real, 0, 0.5, limit=200)[0]
                    + 1j * quad(lambda t: integrand(t)[i, j].imag, 0, 0.5, limit=200)[0]
                )
        np.testing.assert_allclose(
            in_frame.perturbation_data.get_item([0])[-1], num, atol=1e-8
        )

    def test_y0_columns(self):
        X, _, _ = _2x2_ops()
        y0 = np.array([1.0, 0.0], dtype=complex)
        res = solve_lmde_perturbation(
            perturbations=[lambda t: -1j * X],
            t_span=[0.0, 0.3],
            expansion_method="dyson",
            expansion_order=1,
            y0=y0,
            dyson_in_frame=False,
            atol=1e-12, rtol=1e-12,
        )
        np.testing.assert_allclose(
            res.perturbation_data.get_item([0])[-1],
            (-1j * X * 0.3) @ y0[:, None],
            atol=1e-8,
        )


class TestValidation:
    def test_no_order_or_labels(self):
        from qiskit_dynamics_tpu.exceptions import DynamicsError

        with pytest.raises(DynamicsError):
            solve_lmde_perturbation(
                perturbations=[lambda t: np.eye(2)],
                t_span=[0, 1],
                expansion_method="dyson",
            )

    def test_magnus_y0_rejected(self):
        from qiskit_dynamics_tpu.exceptions import DynamicsError

        with pytest.raises(DynamicsError):
            solve_lmde_perturbation(
                perturbations=[lambda t: np.eye(2)],
                t_span=[0, 1],
                expansion_method="magnus",
                expansion_order=1,
                y0=np.eye(2),
            )

    def test_bad_method(self):
        from qiskit_dynamics_tpu.exceptions import DynamicsError

        with pytest.raises(DynamicsError):
            solve_lmde_perturbation(
                perturbations=[lambda t: np.eye(2)],
                t_span=[0, 1],
                expansion_method="born",
                expansion_order=1,
            )


class TestCompositePerturbationLabels:
    """Generator power series with higher-order labels: G(t,c) = c G_a(t) + c^2 G_b(t)."""

    def test_dyson_power_series_labels(self):
        X, Y, _ = _2x2_ops()
        Ga = -1j * X
        Gb = -1j * Y
        T = 0.5
        res = solve_lmde_perturbation(
            perturbations=[lambda t: Ga, lambda t: Gb],
            perturbation_labels=[(0,), (0, 0)],
            t_span=[0.0, T],
            expansion_method="dyson",
            expansion_order=2,
            atol=1e-13, rtol=1e-13,
        )
        data = res.perturbation_data
        # first order: D_(0) = Ga T
        np.testing.assert_allclose(data.get_item([0])[-1], Ga * T, atol=1e-9)
        # second order: D_(0,0) = Gb T + Ga^2 T^2/2 (direct term + nested Ga)
        np.testing.assert_allclose(
            data.get_item([0, 0])[-1], Gb * T + Ga @ Ga * T**2 / 2, atol=1e-9
        )
        # exponential consistency: U(c) ~ I + c D0 + c^2 D00 + O(c^3)
        from qiskit_dynamics_tpu import solve_ode

        c = 0.01
        direct = solve_ode(
            rhs=lambda t, y: (c * Ga + c**2 * Gb) @ y,
            t_span=[0.0, T], y0=np.eye(2, dtype=complex),
            method="DOP853", atol=1e-13, rtol=1e-13,
        ).y[-1]
        series = (
            np.eye(2)
            + c * data.get_item([0])[-1]
            + c**2 * data.get_item([0, 0])[-1]
        )
        np.testing.assert_allclose(series, direct, atol=5e-6)

    def test_duplicate_labels_rejected(self):
        from qiskit_dynamics_tpu.exceptions import DynamicsError

        with pytest.raises(DynamicsError):
            solve_lmde_perturbation(
                perturbations=[lambda t: np.eye(2), lambda t: np.eye(2)],
                perturbation_labels=[(0,), [0]],
                t_span=[0, 1],
                expansion_method="dyson",
                expansion_order=1,
            )

    def test_dyson_like_explicit_labels(self):
        X, Y, _ = _2x2_ops()
        A, B = -1j * X, -1j * Y
        T = 0.4
        res = solve_lmde_perturbation(
            perturbations=[lambda t: A, lambda t: B],
            t_span=[0.0, T],
            expansion_method="dyson_like",
            expansion_labels=[[1, 0, 1]],
            atol=1e-13, rtol=1e-13,
        )
        # D_[1,0,1] = B A B T^3/6 for constants
        np.testing.assert_allclose(
            res.perturbation_data.get_item([1, 0, 1])[-1],
            B @ A @ B * T**3 / 6,
            atol=1e-9,
        )
        # completion includes the tail terms
        assert [0, 1] in res.perturbation_data.labels
        assert [1] in res.perturbation_data.labels


class TestDysonTermsViaAutodiff:
    """Independent order-4 verification: Dyson terms are the Taylor
    coefficients of the propagator in the perturbation amplitudes,
    so nested ``jax.jacfwd`` through a scan-RK4 solve of
    ``y' = (G0 + c0 A0(t) + c1 A1(t)) y`` must reproduce them —
    a fully independent check of the whole engine at any order
    (reference analog: explicitly-coded symmetric-Dyson cases in
    ``test_solve_lmde_perturbation.py``)."""

    def setup_method(self, method):
        import jax.numpy as jnp

        X, Y, Z = _2x2_ops()
        self.G0 = -1j * 2.0 * np.pi * 0.8 * Z / 2
        self.A0 = lambda t: -1j * jnp.cos(2.0 * t) * jnp.asarray(X) / 2
        self.A1 = lambda t: -1j * (jnp.sin(t) + 0.3) * jnp.asarray(Y) / 2
        self.T = 0.5
        self.n_steps = 400

    def _propagator(self, c):
        """scan-RK4 solve (forward-mode differentiable) of the full LMDE."""
        import jax.numpy as jnp
        from jax import lax

        h = self.T / self.n_steps
        G0 = jnp.asarray(self.G0)

        def rhs(t, y):
            G = G0 + c[0] * self.A0(t) + c[1] * self.A1(t)
            return G @ y

        def step(y, i):
            t = i * h
            k1 = rhs(t, y)
            k2 = rhs(t + h / 2, y + h / 2 * k1)
            k3 = rhs(t + h / 2, y + h / 2 * k2)
            k4 = rhs(t + h, y + h * k3)
            return y + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4), None

        y, _ = lax.scan(step, jnp.eye(2, dtype=complex), jnp.arange(self.n_steps))
        return y

    def test_terms_to_order_4(self):
        import jax
        import jax.numpy as jnp

        res = solve_lmde_perturbation(
            perturbations=[self.A0, self.A1],
            t_span=[0.0, self.T],
            expansion_method="dyson",
            expansion_order=4,
            generator=lambda t: jnp.asarray(self.G0),
            atol=1e-13,
            rtol=1e-13,
        )

        zero = jnp.zeros(2)
        Vinv = jnp.linalg.inv(self._propagator(zero))
        f = lambda c: Vinv @ self._propagator(c)  # = I + sum_I c^I D_I

        d1 = jax.jacfwd(f, holomorphic=False)
        d2 = jax.jacfwd(d1)
        d3 = jax.jacfwd(d2)
        d4 = jax.jacfwd(d3)
        # partials evaluated at c = 0; trailing axes index the c components
        j1 = np.asarray(d1(zero))
        j2 = np.asarray(d2(zero))
        j3 = np.asarray(d3(zero))
        j4 = np.asarray(d4(zero))

        import math

        def expected(multiset):
            """mixed partial / prod(multiplicities!) for the given multiset."""
            js = {1: j1, 2: j2, 3: j3, 4: j4}[len(multiset)]
            part = js[(...,) + tuple(multiset)]
            mult = math.prod(
                math.factorial(multiset.count(v)) for v in set(multiset)
            )
            return part / mult

        for label in (
            [0], [1], [0, 0], [0, 1], [1, 1],
            [0, 0, 1], [0, 1, 1], [0, 0, 0],
            [0, 0, 1, 1], [0, 0, 0, 1], [1, 1, 1, 1],
        ):
            term = np.asarray(res.perturbation_data.get_item(label)[-1])
            np.testing.assert_allclose(
                term, expected(label), atol=5e-7,
                err_msg=f"Dyson term {label} mismatch vs AD Taylor coefficient",
            )


class TestMagnusTermsViaAutodiff:
    """Same AD strategy for Magnus: Omega(c) = log(V^-1 U(c)) has the Magnus
    terms as its Taylor coefficients. A truncated mercator series
    log(I+E) = E - E^2/2 + ... is exact for partials up to its truncation
    order (E = O(c)), making the log forward-mode differentiable."""

    def test_terms_to_order_3(self):
        import math

        import jax
        import jax.numpy as jnp

        X, Y, Z = _2x2_ops()
        G0 = -1j * 2.0 * np.pi * 0.8 * Z / 2
        A0 = lambda t: -1j * jnp.cos(2.0 * t) * jnp.asarray(X) / 2
        A1 = lambda t: -1j * (jnp.sin(t) + 0.3) * jnp.asarray(Y) / 2
        T, n_steps = 0.5, 400

        res = solve_lmde_perturbation(
            perturbations=[A0, A1],
            t_span=[0.0, T],
            expansion_method="magnus",
            expansion_order=3,
            generator=lambda t: jnp.asarray(G0),
            atol=1e-13,
            rtol=1e-13,
        )

        h = T / n_steps

        def propagator(c):
            from jax import lax

            G0j = jnp.asarray(G0)

            def rhs(t, y):
                return (G0j + c[0] * A0(t) + c[1] * A1(t)) @ y

            def step(y, i):
                t = i * h
                k1 = rhs(t, y)
                k2 = rhs(t + h / 2, y + h / 2 * k1)
                k3 = rhs(t + h / 2, y + h / 2 * k2)
                k4 = rhs(t + h, y + h * k3)
                return y + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4), None

            y, _ = lax.scan(step, jnp.eye(2, dtype=complex), jnp.arange(n_steps))
            return y

        zero = jnp.zeros(2)
        Vinv = jnp.linalg.inv(propagator(zero))

        def omega(c):
            E = Vinv @ propagator(c) - jnp.eye(2, dtype=complex)
            # mercator series to degree 5 — exact for partials of order <= 5
            out = jnp.zeros_like(E)
            Ek = jnp.eye(2, dtype=complex)
            for kk in range(1, 6):
                Ek = Ek @ E
                out = out + ((-1.0) ** (kk + 1) / kk) * Ek
            return out

        d1 = jax.jacfwd(omega)
        d2 = jax.jacfwd(d1)
        d3 = jax.jacfwd(d2)
        j = {1: np.asarray(d1(zero)), 2: np.asarray(d2(zero)), 3: np.asarray(d3(zero))}

        for label in ([0], [1], [0, 0], [0, 1], [1, 1], [0, 0, 1], [0, 0, 0], [0, 1, 1]):
            part = j[len(label)][(...,) + tuple(label)]
            mult = math.prod(math.factorial(label.count(v)) for v in set(label))
            term = np.asarray(res.perturbation_data.get_item(label)[-1])
            np.testing.assert_allclose(
                term, part / mult, atol=5e-7,
                err_msg=f"Magnus term {label} mismatch vs AD log-Taylor coefficient",
            )
