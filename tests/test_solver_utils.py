"""solver_utils merge/trim unit battery.

Reference analog: ``/root/reference/test/dynamics/solvers/test_solver_utils.py``
— t_span/t_eval bookkeeping including the duplicate-endpoint midpoint hack in
the jit-compilable variants (ref ``solver_utils.py:122-227``; here
``solvers/solver_utils.py:42-131``) and NaN-poison error signaling.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.solvers.results import OdeResult
from qiskit_dynamics_tpu.solvers.solver_utils import (
    merge_t_args,
    trim_t_results,
    merge_t_args_jax,
    trim_t_results_jax,
)


class TestMergeHost:
    def test_none_passthrough(self):
        np.testing.assert_allclose(merge_t_args([0.0, 1.0]), [0.0, 1.0])

    def test_merge_interior(self):
        np.testing.assert_allclose(
            merge_t_args([0.0, 1.0], [0.25, 0.5]), [0.0, 0.25, 0.5, 1.0]
        )

    def test_merge_backwards(self):
        np.testing.assert_allclose(
            merge_t_args([1.0, 0.0], [0.75, 0.25]), [1.0, 0.75, 0.25, 0.0]
        )

    def test_2d_t_eval_raises(self):
        with pytest.raises(ValueError):
            merge_t_args([0.0, 1.0], [[0.5]])

    def test_outside_span_raises(self):
        with pytest.raises(ValueError):
            merge_t_args([0.0, 1.0], [1.5])

    def test_wrong_direction_raises(self):
        with pytest.raises(ValueError):
            merge_t_args([0.0, 1.0], [0.75, 0.25])
        with pytest.raises(ValueError):
            merge_t_args([1.0, 0.0], [0.25, 0.75])

    def test_trim_roundtrip(self):
        t_eval = np.array([0.25, 0.5])
        merged = merge_t_args([0.0, 1.0], t_eval)
        res = OdeResult(t=merged, y=np.asarray(merged) * 2.0)
        trimmed = trim_t_results(res, t_eval)
        np.testing.assert_allclose(trimmed.t, t_eval)
        np.testing.assert_allclose(trimmed.y, t_eval * 2.0)


class TestMergeTrimJax:
    def test_merge_interior(self):
        out = np.asarray(merge_t_args_jax([0.0, 1.0], [0.25, 0.5]))
        np.testing.assert_allclose(out, [0.0, 0.25, 0.5, 1.0])

    def test_outside_span_nan_poisons(self):
        out = np.asarray(merge_t_args_jax([0.0, 1.0], [1.5]))
        assert np.all(np.isnan(out))

    def test_wrong_direction_nan_poisons(self):
        out = np.asarray(merge_t_args_jax([0.0, 1.0], [0.75, 0.25]))
        assert np.all(np.isnan(out))

    def test_duplicate_start_shifted_to_midpoint(self):
        """t_eval[0] == t_span[0]: the duplicate is moved to the midpoint so
        adaptive steppers never see a zero-length interval."""
        out = np.asarray(merge_t_args_jax([0.0, 1.0], [0.0, 0.5]))
        np.testing.assert_allclose(out, [0.0, 0.25, 0.5, 1.0])

    def test_duplicate_end_shifted_to_midpoint(self):
        out = np.asarray(merge_t_args_jax([0.0, 1.0], [0.5, 1.0]))
        np.testing.assert_allclose(out, [0.0, 0.5, 0.75, 1.0])

    def test_trim_plain(self):
        t_eval = jnp.array([0.25, 0.5])
        merged = merge_t_args_jax([0.0, 1.0], t_eval)
        res = OdeResult(t=merged, y=jnp.asarray(merged) * 3.0)
        trimmed = trim_t_results_jax(res, t_eval)
        np.testing.assert_allclose(np.asarray(trimmed.t), [0.25, 0.5])
        np.testing.assert_allclose(np.asarray(trimmed.y), [0.75, 1.5])

    @pytest.mark.parametrize(
        "t_eval",
        [[0.0, 0.5], [0.5, 1.0], [0.0, 0.5, 1.0], [0.0, 1.0]],
    )
    def test_trim_with_endpoint_duplicates(self, t_eval):
        """Merged-midpoint results trim back to exactly t_eval's values.

        y(t) = 2t stands in for the solution, so after trimming y must equal
        2 * t_eval regardless of which endpoints were duplicated."""
        t_eval = jnp.asarray(t_eval)
        merged = merge_t_args_jax([0.0, 1.0], t_eval)
        res = OdeResult(t=merged, y=2.0 * jnp.asarray(merged))
        trimmed = trim_t_results_jax(res, t_eval)
        np.testing.assert_allclose(np.asarray(trimmed.t), np.asarray(t_eval))
        np.testing.assert_allclose(np.asarray(trimmed.y), 2.0 * np.asarray(t_eval))

    def test_degenerate_span(self):
        """t_span[0] == t_span[1]: output y pinned to y0."""
        res = OdeResult(t=jnp.array([1.0, 1.0]), y=jnp.array([5.0, 123.0]))
        trimmed = trim_t_results_jax(res, None)
        np.testing.assert_allclose(np.asarray(trimmed.y), [5.0, 5.0])
