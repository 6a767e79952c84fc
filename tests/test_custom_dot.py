"""Tests for perturbation/custom_dot.py — the compiled sparse linear-combo
binary op underlying the Dyson/Magnus recursions.

Coverage mirrors the reference's dedicated module
(/root/reference/test/dynamics/perturbation/test_custom_binary_op.py): rule
evaluation for matmul/mul on both the numpy (concrete) and jax (traced/device)
paths, batched leading dimensions, unequal operand shapes, jit/grad, and the
host compiler's table construction (dedup, padding, index offset).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.perturbation.custom_dot import (
    CompiledRule,
    CustomMatmul,
    CustomMul,
    compile_rule,
)

MATMUL = lambda a, b: a @ b
MUL = lambda a, b: a * b


def rule_three_rows():
    """Three output entries over a 3-array stack; pair (0,2) and (1,1) reused."""
    return [
        (np.array([1.0, 2.0, 3.0]), np.array([[0, 2], [1, 1], [2, 0]])),
        (np.array([1.0]), np.array([[0, 2]])),
        (np.array([3.0]), np.array([[1, 1]])),
    ]


def rule_repeated_pairs():
    """One output entry with the same pair appearing twice: coefficients on
    the SAME unique evaluation must both contribute."""
    return [(np.array([1.0, 2.0, 3.0]), np.array([[0, 2], [0, 0], [0, 0]]))]


def brute_force(rule, A, B, binary_op):
    out = []
    for coeffs, pairs in rule:
        acc = sum(c * binary_op(A[j], B[k]) for c, (j, k) in zip(coeffs, pairs))
        out.append(acc)
    return np.array(out)


@pytest.mark.parametrize("op_cls,binary_op", [(CustomMatmul, MATMUL), (CustomMul, MUL)])
class TestEvaluation:
    def test_three_row_rule(self, op_cls, binary_op):
        rng = np.random.default_rng(41)
        A = rng.standard_normal((3, 4, 4)) + 1j * rng.standard_normal((3, 4, 4))
        B = rng.standard_normal((3, 4, 4)) + 1j * rng.standard_normal((3, 4, 4))
        expected = brute_force(rule_three_rows(), A, B, binary_op)
        out = op_cls(rule_three_rows())(A, B)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-13, rtol=0)

    def test_repeated_pair_accumulates(self, op_cls, binary_op):
        rng = np.random.default_rng(42)
        A = rng.standard_normal((3, 4, 4))
        B = rng.standard_normal((3, 4, 4))
        expected = brute_force(rule_repeated_pairs(), A, B, binary_op)
        out = op_cls(rule_repeated_pairs())(A, B)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-13, rtol=0)

    def test_numpy_and_jax_paths_agree(self, op_cls, binary_op):
        rng = np.random.default_rng(43)
        A = rng.standard_normal((3, 4, 4)) + 1j * rng.standard_normal((3, 4, 4))
        B = rng.standard_normal((3, 4, 4))
        op = op_cls(rule_three_rows())
        host = op(A, B)  # numpy arrays -> host loop
        dev = op(jnp.asarray(A), jnp.asarray(B))  # jax arrays -> gather/einsum
        assert isinstance(np.asarray(host), np.ndarray)
        np.testing.assert_allclose(np.asarray(host), np.asarray(dev), atol=1e-13)

    def test_batched_leading_dims(self, op_cls, binary_op):
        """Evaluation broadcasts over trailing batch axes of the operands."""
        rng = np.random.default_rng(44)
        A = rng.standard_normal((3, 7, 4, 4))
        B = rng.standard_normal((3, 7, 4, 4))
        if op_cls is CustomMatmul:
            expected = brute_force(rule_three_rows(), A, B, lambda a, b: a @ b)
        else:
            expected = brute_force(rule_three_rows(), A, B, MUL)
        out = op_cls(rule_three_rows())(jnp.asarray(A), jnp.asarray(B))
        assert out.shape == (3, 7, 4, 4)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-13)


class TestUnequalShapes:
    def test_matmul_rectangular(self):
        rng = np.random.default_rng(45)
        A = rng.standard_normal((3, 5, 10))
        B = rng.standard_normal((3, 10, 7))
        expected = brute_force(rule_three_rows(), A, B, MATMUL)
        out = CustomMatmul(rule_three_rows())(jnp.asarray(A), jnp.asarray(B))
        assert out.shape == (3, 5, 7)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-13)

    def test_mul_broadcast(self):
        rng = np.random.default_rng(46)
        A = rng.standard_normal((3, 5, 1))
        B = rng.standard_normal((3, 1, 7))
        expected = brute_force(rule_three_rows(), A, B, MUL)
        out = CustomMul(rule_three_rows())(jnp.asarray(A), jnp.asarray(B))
        assert out.shape == (3, 5, 7)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-13)


class TestJaxTransforms:
    @pytest.mark.parametrize("op_cls", [CustomMatmul, CustomMul])
    def test_jit_and_grad(self, op_cls):
        rng = np.random.default_rng(47)
        A = rng.standard_normal((3, 4, 4))
        B = rng.standard_normal((3, 4, 4))
        op = op_cls(rule_three_rows())

        def loss(a):
            return jnp.sum(jnp.real(op(a, jnp.asarray(B))) ** 2)

        jl = jax.jit(loss)
        assert np.isfinite(float(jl(jnp.asarray(A))))
        g = jax.grad(loss)(jnp.asarray(A))
        # finite-difference check on one entry
        eps = 1e-6
        dA = np.zeros_like(A)
        dA[1, 2, 3] = eps
        fd = (float(loss(jnp.asarray(A + dA))) - float(loss(jnp.asarray(A - dA)))) / (2 * eps)
        np.testing.assert_allclose(float(g[1, 2, 3]), fd, rtol=1e-5)

    def test_vmap_over_batch(self):
        rng = np.random.default_rng(48)
        A = rng.standard_normal((6, 3, 4, 4))
        B = rng.standard_normal((6, 3, 4, 4))
        op = CustomMatmul(rule_three_rows())
        out = jax.vmap(lambda a, b: op(a, b))(jnp.asarray(A), jnp.asarray(B))
        assert out.shape == (6, 3, 4, 4)
        for i in range(6):
            np.testing.assert_allclose(
                np.asarray(out[i]),
                brute_force(rule_three_rows(), A[i], B[i], MATMUL),
                atol=1e-13,
            )


class TestCompileRule:
    def test_unique_pair_dedup(self):
        rule = compile_rule(rule_three_rows())
        # pairs (0,2), (1,1), (2,0) — each appears once despite reuse
        assert rule.pairs.shape == (3, 2)
        assert {tuple(p) for p in rule.pairs} == {(0, 2), (1, 1), (2, 0)}

    def test_linear_combo_tables(self):
        rule = compile_rule(rule_three_rows())
        # row widths padded to the max (3); padded coeffs 0, padded idx -1
        assert rule.coeffs.shape == (3, 3)
        assert rule.idx.shape == (3, 3)
        np.testing.assert_allclose(rule.coeffs[1], [1.0, 0.0, 0.0])
        assert rule.idx[1][0] == rule.idx[0][0]  # same unique pair (0, 2)
        assert list(rule.idx[1][1:]) == [-1, -1]

    def test_explicit_padding(self):
        rule = compile_rule(
            rule_three_rows(), unique_evaluation_len=8, linear_combo_len=5
        )
        assert rule.pairs.shape == (8, 2)
        assert np.all(rule.pairs[3:] == -1)
        assert rule.coeffs.shape == (3, 5)
        assert rule.idx.shape == (3, 5)
        # padded table still evaluates identically
        rng = np.random.default_rng(49)
        A = rng.standard_normal((3, 4, 4))
        B = rng.standard_normal((3, 4, 4))
        out = CustomMatmul(rule)(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(
            np.asarray(out), brute_force(rule_three_rows(), A, B, MATMUL), atol=1e-13
        )

    def test_index_offset(self):
        # offset +1 shifts all indices: rule written against {-1, 0, 1}
        # evaluates against stacks where entry 0 holds the "-1" operand
        shifted = [(np.array([1.0]), np.array([[-1, 0]]))]
        rule = compile_rule(shifted, index_offset=1)
        assert tuple(rule.pairs[0]) == (0, 1)
        rng = np.random.default_rng(50)
        A = rng.standard_normal((2, 4, 4))
        B = rng.standard_normal((2, 4, 4))
        out = CustomMatmul(shifted, index_offset=1)(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(out[0]), A[0] @ B[1], atol=1e-13)

    def test_precompiled_rule_passthrough(self):
        compiled = compile_rule(rule_three_rows())
        op = CustomMatmul(compiled)
        assert op.compiled_rule is compiled
        # tuple form (pairs, (coeffs, idx)) also accepted
        op2 = CustomMatmul(compiled.astuple())
        rng = np.random.default_rng(51)
        A = rng.standard_normal((3, 4, 4))
        B = rng.standard_normal((3, 4, 4))
        np.testing.assert_allclose(
            np.asarray(op(jnp.asarray(A), jnp.asarray(B))),
            np.asarray(op2(jnp.asarray(A), jnp.asarray(B))),
            atol=1e-14,
        )
