"""Unit tests for the Dyson/Magnus rule-construction internals.

Behaviors modeled on the reference rule-construction suite
(``/root/reference/test/dynamics/perturbation/test_dyson_magnus.py``); the
expected sparse rules and Magnus/Dyson algebraic relations are derived by
hand (log-series identities), not taken from reference code.
"""

import numpy as np
import pytest

from qiskit_dynamics_tpu.perturbation.dyson_magnus import (
    _dyson_like_lmult_rule,
    _dyson_lmult_rule,
    _required_dyson_generator_indices,
    complete_dyson_like_terms,
    magnus_from_dyson,
)


def _assert_rule_equal(rule, expected):
    assert len(rule) == len(expected)
    for (c, p), (ec, ep) in zip(rule, expected):
        np.testing.assert_allclose(c, ec)
        np.testing.assert_array_equal(np.asarray(p), np.asarray(ep))


class TestCompletion:
    def test_tail_closure(self):
        out = complete_dyson_like_terms([[2, 1, 0]])
        assert out == [[0], [1, 0], [2, 1, 0]]

    def test_merges_multiple_chains(self):
        out = complete_dyson_like_terms([[1, 0], [0, 1]])
        assert out == [[0], [1], [0, 1], [1, 0]]

    def test_generator_indices(self):
        assert _required_dyson_generator_indices([[0], [2, 0], [1]]) == [0, 1, 2]


class TestLmultRules:
    def test_dyson_like_rule_first_order(self):
        rule = _dyson_like_lmult_rule([[0], [1]], [0, 1])
        expected = [
            (np.array([1.0]), [[-1, -1]]),          # dV = G V
            (np.ones(2), [[-1, 0], [0, -1]]),        # dD0V = G D0V + G0 V
            (np.ones(2), [[-1, 1], [1, -1]]),        # dD1V = G D1V + G1 V
        ]
        _assert_rule_equal(rule, expected)

    def test_dyson_like_rule_chained(self):
        terms = [[0], [1], [1, 0]]
        rule = _dyson_like_lmult_rule(terms, [0, 1])
        # d(D_{10}V) = G (D_{10}V) + G_1 (D_{0}V)
        _assert_rule_equal(
            [rule[3]], [(np.ones(2), [[-1, 2], [1, 0]])]
        )

    def test_dyson_multiset_rule_cross(self):
        multisets = [(0,), (1,), (0, 1)]
        rule = _dyson_lmult_rule(multisets)
        expected = [
            (np.array([1.0]), [[-1, -1]]),
            (np.ones(2), [[-1, 0], [0, -1]]),
            (np.ones(2), [[-1, 1], [1, -1]]),
            # d(D_{01}V) = G D_{01}V + G_0 D_{1}V + G_1 D_{0}V
            (np.ones(3), [[-1, 2], [0, 1], [1, 0]]),
        ]
        _assert_rule_equal(rule, expected)

    def test_dyson_multiset_rule_repeated(self):
        multisets = [(0,), (0, 0)]
        rule = _dyson_lmult_rule(multisets)
        expected = [
            (np.array([1.0]), [[-1, -1]]),
            (np.ones(2), [[-1, 0], [0, -1]]),
            # d(D_{00}V) = G D_{00}V + G_0 D_{0}V
            (np.ones(2), [[-1, 1], [0, 0]]),
        ]
        _assert_rule_equal(rule, expected)

    def test_dyson_rule_restricted_perturbation_labels(self):
        """Only listed perturbation labels may appear as left factors —
        composite labels (power-series perturbations) enter directly."""
        multisets = [(0,), (0, 0)]
        rule = _dyson_lmult_rule(multisets, perturbation_labels=[(0,), (0, 0)])
        # (0,0) is itself a perturbation: G_{00} V appears as a left factor
        _assert_rule_equal(
            [rule[2]], [(np.ones(3), [[-1, 1], [0, 0], [1, -1]])]
        )


class TestMagnusFromDyson:
    """Magnus terms from Dyson terms must satisfy the log-series identities
    Omega_1 = D_0; Omega_2 = D_00 - D_0^2/2;
    Omega_3 = D_000 - (D_0 D_00 + D_00 D_0)/2 + D_0^3/3  (single variable),
    and Omega_01 = D_01 - (D_0 D_1 + D_1 D_0)/2 (cross)."""

    def setup_method(self, method):
        rng = np.random.default_rng(31)
        self.rand = lambda: rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))

    @pytest.mark.parametrize("use_jax", [False, True])
    def test_single_variable_orders(self, use_jax):
        D0, D00, D000 = self.rand(), self.rand(), self.rand()
        terms = np.array([D0, D00, D000])
        out = np.asarray(
            magnus_from_dyson([(0,), (0, 0), (0, 0, 0)], terms, use_jax=use_jax)
        )
        np.testing.assert_allclose(out[0], D0, atol=1e-13)
        np.testing.assert_allclose(out[1], D00 - D0 @ D0 / 2, atol=1e-12)
        np.testing.assert_allclose(
            out[2],
            D000 - (D0 @ D00 + D00 @ D0) / 2 + D0 @ D0 @ D0 / 3,
            atol=1e-12,
        )

    @pytest.mark.parametrize("use_jax", [False, True])
    def test_cross_term(self, use_jax):
        D0, D1, D01 = self.rand(), self.rand(), self.rand()
        out = np.asarray(
            magnus_from_dyson(
                [(0,), (1,), (0, 1)], np.array([D0, D1, D01]), use_jax=use_jax
            )
        )
        np.testing.assert_allclose(out[0], D0, atol=1e-13)
        np.testing.assert_allclose(out[1], D1, atol=1e-13)
        np.testing.assert_allclose(
            out[2], D01 - (D0 @ D1 + D1 @ D0) / 2, atol=1e-12
        )

    def test_first_order_only_is_identity(self):
        D0, D1 = self.rand(), self.rand()
        terms = np.array([D0, D1])
        out = np.asarray(magnus_from_dyson([(0,), (1,)], terms))
        np.testing.assert_allclose(out, terms, atol=0.0)

    def test_time_axis_broadcast(self):
        """Terms carry a leading time axis: conversion is pointwise."""
        T = 4
        D0 = np.stack([self.rand() for _ in range(T)])
        D00 = np.stack([self.rand() for _ in range(T)])
        out = np.asarray(magnus_from_dyson([(0,), (0, 0)], np.array([D0, D00])))
        for t in range(T):
            np.testing.assert_allclose(
                out[1, t], D00[t] - D0[t] @ D0[t] / 2, atol=1e-12
            )
