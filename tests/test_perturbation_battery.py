"""Extended perturbation-theory battery.

Behaviors modeled on the reference suite
(``/root/reference/test/dynamics/perturbation/test_solve_lmde_perturbation.py``):
label-order invariance, t_eval evaluation, validation errors, y0 columns for
dyson_like, the in-frame/out-of-frame Dyson relation, and jit/grad through
the jax integration path. All checks are against independently-computed
closed forms or cross-method agreement — no reference code is used.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiskit_dynamics_tpu.exceptions import DynamicsError
from qiskit_dynamics_tpu.perturbation import solve_lmde_perturbation


def _ops():
    X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
    Y = np.array([[0.0, -1j], [1j, 0.0]], dtype=complex)
    Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
    return X, Y, Z


class TestLabelOrderInvariance:
    """Explicit expansion_labels in arbitrary order produce the same terms
    as the order-derived run (ref: test_dyson_analytic_case1_1d_relabeled /
    _reverse_order_labeled)."""

    def setup_method(self, method):
        X, Y, _ = _ops()
        self.pert = [
            lambda t: np.cos(2.0 * t) * (-1j) * X,
            lambda t: (np.sin(t) + t**2) * (-1j) * Y,
        ]
        self.T = 0.6

    def _solve(self, **kw):
        return solve_lmde_perturbation(
            perturbations=self.pert,
            t_span=[0.0, self.T],
            atol=1e-12,
            rtol=1e-12,
            **kw,
        ).perturbation_data

    @pytest.mark.parametrize("method", ["dyson", "magnus"])
    def test_shuffled_labels_match_order(self, method):
        by_order = self._solve(expansion_method=method, expansion_order=2)
        shuffled = [[1, 1], [0], [0, 1], [1], [0, 0]]
        by_labels = self._solve(expansion_method=method, expansion_labels=shuffled)
        for label in shuffled:
            np.testing.assert_allclose(
                by_labels.get_item(label)[-1],
                by_order.get_item(label)[-1],
                atol=1e-10,
                rtol=0.0,
            )

    def test_unsorted_multiset_entry_canonicalized(self):
        # a label written as [1, 0] addresses the same term as [0, 1]
        data = self._solve(expansion_method="dyson", expansion_order=2)
        np.testing.assert_allclose(
            data.get_item([1, 0])[-1], data.get_item([0, 1])[-1], atol=0.0
        )

    def test_dyson_like_explicit_label_order(self):
        # dyson_like labels are ORDERED: [0, 1] and [1, 0] are distinct terms
        data = self._solve(expansion_method="dyson_like", expansion_order=2)
        a = data.get_item([0, 1])[-1]
        b = data.get_item([1, 0])[-1]
        assert np.max(np.abs(a - b)) > 1e-4


class TestTEval:
    """t_eval intermediate times match independent solves to each time."""

    def test_dyson_t_eval_matches_separate_solves(self):
        X, Y, _ = _ops()
        pert = [
            lambda t: np.cos(t) * (-1j) * X,
            lambda t: t * (-1j) * Y,
        ]
        times = [0.25, 0.5, 0.75]
        res = solve_lmde_perturbation(
            perturbations=pert,
            t_span=[0.0, 0.75],
            expansion_method="dyson",
            expansion_order=2,
            t_eval=times,
            atol=1e-12,
            rtol=1e-12,
        )
        np.testing.assert_allclose(np.asarray(res.t, dtype=float), times, atol=1e-12)
        for i, t in enumerate(times):
            sub = solve_lmde_perturbation(
                perturbations=pert,
                t_span=[0.0, t],
                expansion_method="dyson",
                expansion_order=2,
                atol=1e-12,
                rtol=1e-12,
            )
            for label in [[0], [1], [0, 0], [0, 1], [1, 1]]:
                np.testing.assert_allclose(
                    res.perturbation_data.get_item(label)[i],
                    sub.perturbation_data.get_item(label)[-1],
                    atol=1e-8,
                )


class TestInOutOfFrame:
    """dyson_in_frame=False multiplies every term by the unperturbed
    propagator V(t): D_out(t) = V(t) @ D_in(t)."""

    def test_frame_relation(self):
        from scipy.linalg import expm

        X, Y, Z = _ops()
        g0 = -1j * 2 * np.pi * Z
        pert = [lambda t: np.cos(2.0 * t) * (-1j) * X]
        T = 0.4
        common = dict(
            perturbations=pert,
            t_span=[0.0, T],
            expansion_method="dyson",
            expansion_order=2,
            generator=lambda t: g0,
            atol=1e-13,
            rtol=1e-13,
        )
        res_in = solve_lmde_perturbation(dyson_in_frame=True, **common)
        res_out = solve_lmde_perturbation(dyson_in_frame=False, **common)
        V = expm(g0 * T)  # constant generator: V(T) = e^{G0 T}
        for label in [[0], [0, 0]]:
            np.testing.assert_allclose(
                res_out.perturbation_data.get_item(label)[-1],
                V @ res_in.perturbation_data.get_item(label)[-1],
                atol=1e-8,
            )


class TestY0DysonLike:
    """y0 passed to dyson_like: terms act on the columns of y0."""

    def test_y0_columns(self):
        X, Y, _ = _ops()
        pert = [lambda t: np.cos(t) * (-1j) * X]
        T = 0.5
        y0 = np.array([[1.0, 0.0], [1.0, 1.0]], dtype=complex)
        res_id = solve_lmde_perturbation(
            perturbations=pert,
            t_span=[0.0, T],
            expansion_method="dyson_like",
            expansion_order=2,
            dyson_in_frame=False,
            atol=1e-12,
            rtol=1e-12,
        )
        res_y0 = solve_lmde_perturbation(
            perturbations=pert,
            t_span=[0.0, T],
            expansion_method="dyson_like",
            expansion_order=2,
            y0=y0,
            dyson_in_frame=False,
            atol=1e-12,
            rtol=1e-12,
        )
        for label in [[0], [0, 0]]:
            np.testing.assert_allclose(
                res_y0.perturbation_data.get_item(label)[-1],
                res_id.perturbation_data.get_item(label)[-1] @ y0,
                atol=1e-8,
            )


class TestValidationExtra:
    """Error cases (ref: Testsolve_lmde_perturbation_errors)."""

    def _run(self, **kw):
        X, _, _ = _ops()
        base = dict(
            perturbations=[lambda t: -1j * X],
            t_span=[0.0, 0.1],
            expansion_method="dyson",
            expansion_order=1,
        )
        base.update(kw)
        return solve_lmde_perturbation(**base)

    def test_negative_multiset_label(self):
        with pytest.raises(DynamicsError, match="non-negative"):
            self._run(expansion_labels=[[-1]], expansion_order=None)

    def test_duplicate_perturbation_labels(self):
        X, Y, _ = _ops()
        with pytest.raises(DynamicsError, match="duplicates"):
            solve_lmde_perturbation(
                perturbations=[lambda t: -1j * X, lambda t: -1j * Y],
                t_span=[0.0, 0.1],
                expansion_method="dyson",
                expansion_order=1,
                perturbation_labels=[[0], [0]],
            )

    def test_perturbation_labels_dyson_like_rejected(self):
        with pytest.raises(DynamicsError, match="dyson_like"):
            self._run(
                expansion_method="dyson_like", perturbation_labels=[[0]]
            )

    def test_y0_dyson_like_in_frame_rejected(self):
        with pytest.raises(DynamicsError, match="dyson_in_frame"):
            self._run(
                expansion_method="dyson_like",
                y0=np.eye(2, dtype=complex),
                dyson_in_frame=True,
            )

    def test_y0_magnus_rejected(self):
        with pytest.raises(DynamicsError, match="magnus"):
            self._run(expansion_method="magnus", y0=np.eye(2, dtype=complex))


class TestJaxTransformations:
    """jit + grad through solve_lmde_perturbation with a jax integration
    method (ref: Testsolve_lmde_perturbationJAXTransformations)."""

    def _dyson_term(self, c, method):
        X, Y, _ = _ops()
        res = solve_lmde_perturbation(
            perturbations=[
                lambda t: c * jnp.cos(2.0 * t) * jnp.asarray(-1j * X),
                lambda t: jnp.sin(t) * jnp.asarray(-1j * Y),
            ],
            t_span=[0.0, 0.5],
            expansion_method=method,
            expansion_order=2,
            integration_method="tpu_dopri5",
            atol=1e-11,
            rtol=1e-11,
        )
        return res.perturbation_data

    @pytest.mark.parametrize("method", ["dyson", "magnus", "dyson_like"])
    def test_jit_grad(self, method):
        label = [0, 1] if method != "dyson_like" else [1, 0]

        def obj(c):
            return jnp.sum(jnp.abs(self._dyson_term(c, method).get_item(label)[-1]) ** 2)

        v0 = jax.jit(obj)(1.0)
        # first-order terms in perturbation 0 scale linearly in c; the
        # cross second-order term picks up one factor of c, so obj ~ c^2
        v2 = jax.jit(obj)(2.0)
        np.testing.assert_allclose(v2, 4.0 * v0, rtol=1e-6)
        g = jax.grad(obj)(1.0)
        eps = 1e-5
        fd = (obj(1.0 + eps) - obj(1.0 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4)
