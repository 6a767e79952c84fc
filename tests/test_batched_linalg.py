"""Tests for the batch-on-lanes Pallas kernels (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
from scipy.linalg import expm as scipy_expm

from qiskit_dynamics_tpu.ops.batched_linalg import (
    matmul_bol,
    expm_taylor_bol,
    to_bol,
    from_bol,
)


def _random_batch(rng, B, n, scale=1.0):
    return scale * (
        rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
    ).astype(np.complex64)


class TestMatmulBol:
    def test_matches_einsum(self):
        rng = np.random.default_rng(0)
        B, n = 256, 16
        A = _random_batch(rng, B, n)
        Bm = _random_batch(rng, B, n)
        Ar, Ai = to_bol(jnp.asarray(A))
        Br, Bi = to_bol(jnp.asarray(Bm))
        Cr, Ci = matmul_bol(Ar, Ai, Br, Bi, interpret=True, tile_b=128)
        C = np.asarray(from_bol(Cr, Ci))
        expected = A @ Bm
        np.testing.assert_allclose(C, expected, atol=1e-4, rtol=1e-4)

    def test_roundtrip_layout(self):
        rng = np.random.default_rng(1)
        A = _random_batch(rng, 8, 4)
        Ar, Ai = to_bol(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(from_bol(Ar, Ai)), A, atol=1e-7)


class TestExpmBol:
    def test_matches_scipy(self):
        rng = np.random.default_rng(2)
        B, n = 128, 8
        X = _random_batch(rng, B, n, scale=0.2)
        Xr, Xi = to_bol(jnp.asarray(X))
        Pr, Pi = expm_taylor_bol(Xr, Xi, order=10, squarings=1, interpret=True, tile_b=128)
        P = np.asarray(from_bol(Pr, Pi))
        expected = np.stack([scipy_expm(x.astype(np.complex128)) for x in X])
        np.testing.assert_allclose(P, expected, atol=2e-5, rtol=2e-4)

    def test_identity_at_zero(self):
        n, B = 4, 128
        Xr = jnp.zeros((n, n, B), dtype=jnp.float32)
        Pr, Pi = expm_taylor_bol(Xr, Xr, order=6, squarings=0, interpret=True, tile_b=128)
        P = np.asarray(from_bol(Pr, Pi))
        np.testing.assert_allclose(P, np.broadcast_to(np.eye(n), (B, n, n)), atol=1e-6)
