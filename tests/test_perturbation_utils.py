"""Multiset + expansion-order/label merging utilities battery.

Behaviors modeled on the reference suites
(``/root/reference/test/dynamics/perturbation/test_multiset_utils.py`` and
``test_perturbation_utils.py``); expectations computed by hand.
"""

import numpy as np
import pytest

from qiskit_dynamics_tpu.exceptions import DynamicsError
from qiskit_dynamics_tpu.perturbation.multiset_utils import (
    clean_multisets,
    get_all_submultisets,
    is_submultiset,
    multiset_complement,
    sorted_multisets,
    submultiset_filter,
    submultisets_and_complements,
    to_multiset,
)
from qiskit_dynamics_tpu.perturbation.perturbation_utils import (
    _ordered_partitions,
    merge_list_expansion_order_labels,
    merge_multiset_expansion_order_labels,
)


class TestMultisetForms:
    def test_int(self):
        assert to_multiset(2) == (2,)

    def test_dict_counts(self):
        assert to_multiset({0: 2, 3: 1}) == (0, 0, 3)

    def test_unsorted_sequence(self):
        assert to_multiset([3, 1, 1]) == (1, 1, 3)

    def test_zero_count_dropped(self):
        assert to_multiset({0: 1, 2: 0}) == (0,)

    def test_negative_rejected(self):
        with pytest.raises(DynamicsError):
            to_multiset([-2])

    def test_negative_count_rejected(self):
        with pytest.raises(DynamicsError):
            to_multiset({1: -1})


class TestOrderingAndCleaning:
    def test_sorted_by_size_then_lex(self):
        out = sorted_multisets([(1, 2), (0,), (2,), (0, 0, 1), (0, 2)])
        assert out == [(0,), (2,), (0, 2), (1, 2), (0, 0, 1)]

    def test_clean_dedups_and_sorts(self):
        out = clean_multisets([[1, 0], [0, 1], [2], [0, 1, 1]])
        assert out == [(2,), (0, 1), (0, 1, 1)]


class TestSubmultisetAlgebra:
    def test_is_submultiset_counts(self):
        assert is_submultiset((0,), (0, 1))
        assert is_submultiset((0, 0), (0, 0, 1))
        assert not is_submultiset((0, 0), (0, 1))
        assert is_submultiset((), (0,))

    def test_complement(self):
        assert multiset_complement((0, 0, 1, 2), (0, 1)) == (0, 2)

    def test_complement_requires_containment(self):
        with pytest.raises(DynamicsError):
            multiset_complement((0, 1), (2,))

    def test_filter(self):
        out = submultiset_filter([(0,), (1,), (0, 0)], [(0, 0, 1)])
        assert out == [(0,), (1,), (0, 0)]
        out = submultiset_filter([(0,), (1, 1)], [(0, 1)])
        assert out == [(0,)]

    def test_submultisets_and_complements_full(self):
        subs, comps = submultisets_and_complements((0, 0, 1))
        for s, c in zip(subs, comps):
            combined = to_multiset(list(s) + list(c))
            assert combined == (0, 0, 1)
        # strict submultisets exclude the empty set and the full set
        assert () not in subs and (0, 0, 1) not in subs

    def test_submultisets_size_bound(self):
        subs, _ = submultisets_and_complements((0, 0, 1), 2)
        assert all(len(s) <= 1 for s in subs)

    def test_closure(self):
        out = get_all_submultisets([(0, 0, 1)])
        assert out == [(0,), (1,), (0, 0), (0, 1), (0, 0, 1)]


class TestOrderedPartitions:
    def test_length_one(self):
        assert _ordered_partitions(3, 1) == [[3]]

    def test_counts(self):
        parts = _ordered_partitions(2, 3)
        assert len(parts) == 6  # C(2+3-1, 3-1)
        assert all(sum(p) == 2 and len(p) == 3 for p in parts)
        assert [2, 0, 0] in parts and [0, 1, 1] in parts


class TestMergeMultisetLabels:
    def test_order_only(self):
        out = merge_multiset_expansion_order_labels([(0,), (1,)], expansion_order=2)
        assert out == [(0, 0), (0, 1), (1, 1)]

    def test_labels_only(self):
        out = merge_multiset_expansion_order_labels(
            [(0,), (1,)], expansion_labels=[[1, 0], [0]]
        )
        assert out == [(0,), (0, 1)]

    def test_order_and_labels_merge(self):
        out = merge_multiset_expansion_order_labels(
            [(0,), (1,)], expansion_order=2, expansion_labels=[[0, 0, 0]]
        )
        assert out == [(0, 0), (0, 1), (1, 1), (0, 0, 0)]

    def test_non_contiguous_elements(self):
        # elements are those appearing in perturbation_labels, not range()
        out = merge_multiset_expansion_order_labels([(0,), (2,)], expansion_order=2)
        assert out == [(0, 0), (0, 2), (2, 2)]

    def test_neither_raises(self):
        with pytest.raises(DynamicsError):
            merge_multiset_expansion_order_labels([(0,)])


class TestMergeListLabels:
    def test_order_only(self):
        out = merge_list_expansion_order_labels(2, expansion_order=2)
        assert out == [[0, 0], [0, 1], [1, 0], [1, 1]]

    def test_labels_only(self):
        out = merge_list_expansion_order_labels(2, expansion_labels=[[1, 0, 1]])
        assert out == [[1, 0, 1]]

    def test_merge_sorts_by_length_then_string(self):
        out = merge_list_expansion_order_labels(
            2, expansion_order=1, expansion_labels=[[1, 1], [0]]
        )
        assert out == [[0], [1], [1, 1]]

    def test_neither_raises(self):
        with pytest.raises(DynamicsError):
            merge_list_expansion_order_labels(2)
