"""Fused expm-chain kernel (ops/expm_chain_pallas.py) vs the XLA chain.

The fused kernel evaluates the IDENTICAL Paterson-Stockmeyer polynomial as
``expm_taylor`` (same coefficients, same evaluation order), so in f64
interpret mode it must agree with ``benchmarks.expm_chain`` to roundoff.
"""
import numpy as np
import pytest

import jax

from qiskit_dynamics_tpu.benchmarks import expm_chain
from qiskit_dynamics_tpu.ops.expm_chain_pallas import expm_chain_fused


def _random_chain(T, b, n, m, seed, herm=False):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(T, b, n, n)) + 1j * rng.normal(size=(T, b, n, n))
    if herm:
        G = -0.5j * (G + np.conj(np.swapaxes(G, -1, -2)))
    # keep ||G dt|| of order one (the expm_taylor accuracy regime)
    G = G / np.linalg.norm(G, axis=(-2, -1), keepdims=True) * 2.0
    y0 = rng.normal(size=(b, n, m)) + 1j * rng.normal(size=(b, n, m))
    return G, y0


class TestExpmChainFused:
    def test_matches_xla_chain(self):
        G, y0 = _random_chain(T=7, b=3, n=8, m=8, seed=0)
        ref = expm_chain(G, 0.9, y0)
        out = expm_chain_fused(G, 0.9, y0, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12, atol=1e-12)

    def test_propagator_chain_unitary(self):
        # anti-Hermitian generators (-iH): the chained propagator is unitary
        G, _ = _random_chain(T=11, b=2, n=8, m=8, seed=1, herm=True)
        eye = np.broadcast_to(np.eye(8, dtype=complex), (2, 8, 8))
        U = np.asarray(expm_chain_fused(G, 0.5, eye, interpret=True))
        for Ub in U:
            np.testing.assert_allclose(Ub @ Ub.conj().T, np.eye(8), atol=1e-12)
        ref = np.asarray(expm_chain(G, 0.5, eye))
        np.testing.assert_allclose(U, ref, atol=1e-12)

    def test_unbatched_and_rect_y(self):
        G, y0 = _random_chain(T=5, b=1, n=8, m=4, seed=2)
        ref = np.asarray(expm_chain(G, 0.7, y0))[0]
        out = np.asarray(expm_chain_fused(G[:, 0], 0.7, y0[0], interpret=True))
        assert out.shape == (8, 4)
        np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)

    @pytest.mark.parametrize("order,squarings", [(6, 0), (9, 1), (12, 2), (16, 3)])
    def test_order_squaring_grid(self, order, squarings):
        G, y0 = _random_chain(T=3, b=2, n=8, m=8, seed=3)
        ref = expm_chain(G, 1.1, y0, order=order, squarings=squarings)
        out = expm_chain_fused(
            G, 1.1, y0, order=order, squarings=squarings, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12, atol=1e-12)

    def test_accuracy_vs_exact(self):
        # single 2x2 analytic check: expm(-i theta X) rotation chain
        X = np.array([[0, 1], [1, 0]], dtype=complex)
        T, theta = 6, 0.3
        G = np.broadcast_to(-1j * theta * X, (T, 1, 2, 2))
        y0 = np.array([[[1.0], [0.0]]], dtype=complex)
        out = np.asarray(expm_chain_fused(G, 1.0, y0, interpret=True))[0]
        tot = T * theta
        np.testing.assert_allclose(
            out[:, 0], [np.cos(tot), -1j * np.sin(tot)], atol=1e-12
        )

    def test_validation(self):
        G, y0 = _random_chain(T=3, b=2, n=8, m=8, seed=4)
        with pytest.raises(ValueError, match="order"):
            expm_chain_fused(G, 1.0, y0, order=4, interpret=True)
        with pytest.raises(ValueError, match="generators"):
            expm_chain_fused(G[0], 1.0, y0, interpret=True)


@pytest.mark.parametrize("block_b", [1, 2, 4])
def test_block_b_variants_match(block_b):
    """The batch-interleaved kernel (block_b > 1) is a pure scheduling
    change: results must be bit-identical to the per-element kernel."""
    from qiskit_dynamics_tpu.ops.expm_chain_pallas import expm_chain_fused

    rng = np.random.default_rng(5)
    T, b, n = 3, 4, 8
    A = rng.normal(size=(T, b, n, n)) + 1j * rng.normal(size=(T, b, n, n))
    A = -0.5j * (A + np.conj(np.swapaxes(A, -1, -2)))
    y0 = np.broadcast_to(np.eye(n, dtype=complex), (b, n, n))
    ref = expm_chain_fused(A, 0.1, y0, interpret=True, block_b=1)
    out = expm_chain_fused(A, 0.1, y0, interpret=True, block_b=block_b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
