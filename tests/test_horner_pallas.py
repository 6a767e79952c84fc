"""VMEM-resident Horner expm-action kernel (ops/horner_pallas.py) and its
integration as the poly engine's ``horner="pallas"`` mode.

The kernel computes the identical Taylor/Horner polynomial as the einsum
path, so interpret-mode parity is exact-class (x64: 1e-12); the on-chip
win (2.2x at the dim-256 row shape) is recorded in scripts/horner_ab.py
and BENCHMARKS.md.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qiskit_dynamics_tpu.ops.horner_pallas import (
    horner_apply_bm,
    horner_apply_bm_ad,
    horner_twin_bm,
    _pick_block_b,
)
from qiskit_dynamics_tpu.ops.polynomial_sweep import sweep_expm_magnus_poly


def _random_planes(B, n, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    MTr = jnp.asarray(rng.standard_normal((B, n, n)) * scale)
    MTi = jnp.asarray(rng.standard_normal((B, n, n)) * scale)
    vr = jnp.asarray(rng.standard_normal((B, n)))
    vi = jnp.asarray(rng.standard_normal((B, n)))
    return MTr, MTi, vr, vi


class TestHornerKernel:
    @pytest.mark.parametrize("B,n,order", [(4, 8, 8), (6, 16, 5), (3, 8, 1)])
    def test_matches_twin(self, B, n, order):
        args = _random_planes(B, n, seed=B + n)
        ur, ui = horner_apply_bm(*args, order=order, interpret=True)
        tr, ti = horner_twin_bm(*args, order=order)
        np.testing.assert_allclose(np.asarray(ur), np.asarray(tr), atol=1e-12)
        np.testing.assert_allclose(np.asarray(ui), np.asarray(ti), atol=1e-12)

    def test_matches_dense_expm_action(self):
        """order-12 Horner on a small-norm matrix ~ exact expm action."""
        from scipy.linalg import expm

        B, n = 3, 8
        MTr, MTi, vr, vi = _random_planes(B, n, seed=7, scale=0.02)
        ur, ui = horner_apply_bm(MTr, MTi, vr, vi, order=12, interpret=True)
        for b in range(B):
            M = (np.asarray(MTr[b]) + 1j * np.asarray(MTi[b])).T
            want = expm(M) @ (np.asarray(vr[b]) + 1j * np.asarray(vi[b]))
            got = np.asarray(ur[b]) + 1j * np.asarray(ui[b])
            np.testing.assert_allclose(got, want, atol=1e-13)

    @pytest.mark.parametrize("order", [1, 5, 8])
    def test_loop_body_bit_identical_to_unrolled(self, order):
        """The fori_loop body (compile-time fix: 2 compiled dots instead of
        bb*order*2) must be BIT-identical to the unrolled body — the 1/k
        reciprocal rounds identically whether folded or divided."""
        args = _random_planes(6, 16, seed=order)
        u_lp = horner_apply_bm(
            *args, order=order, block_b=3, interpret=True, body="loop"
        )
        u_un = horner_apply_bm(
            *args, order=order, block_b=3, interpret=True, body="unrolled"
        )
        for a, b in zip(u_lp, u_un):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_block_b_clamps_to_divisor_and_vmem(self):
        assert _pick_block_b(12, 8, 8) == 6  # largest divisor of 12 <= 8
        assert _pick_block_b(2048, 256, 8) == 8
        # VMEM cap: n=512 f64 slab is 2 MB/member -> cap 3 -> divisor 2
        assert _pick_block_b(2048, 512, 8) <= 4
        assert 2048 % _pick_block_b(2048, 512, 8) == 0

    def test_grad_matches_twin(self):
        args = _random_planes(5, 8, seed=3)

        def loss_k(MTr, MTi, vr, vi):
            ur, ui = horner_apply_bm_ad(MTr, MTi, vr, vi, 6, 8, True)
            return jnp.sum(ur**2 + ui * ur)

        def loss_t(MTr, MTi, vr, vi):
            ur, ui = horner_twin_bm(MTr, MTi, vr, vi, order=6)
            return jnp.sum(ur**2 + ui * ur)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(*args)
        gt = jax.grad(loss_t, argnums=(0, 1, 2, 3))(*args)
        for a, b in zip(gk, gt):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


class TestPolyEnginePallasMode:
    def _setup(self, n=8, k=1, B=4, T=20, magnus_order=2, seed=0):
        rng = np.random.default_rng(seed)
        d_im = rng.standard_normal(n)
        ham = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        ham = ham + ham.conj().T
        static_op = -1j * (ham * 0.3)
        ops = []
        for _ in range(k):
            h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
            ops.append(-1j * 0.2 * (h + h.conj().T))
        n_gauss = 2 if magnus_order == 2 else 3
        coeffs = rng.standard_normal((T, n_gauss, k, B)) * 0.5
        y0 = rng.standard_normal((B, n, 1)) + 1j * rng.standard_normal((B, n, 1))
        return static_op, np.asarray(ops), 1j * d_im, coeffs, y0

    @pytest.mark.parametrize("mo", [2, 3])
    def test_pallas_matches_einsum(self, mo):
        args = self._setup(magnus_order=mo, seed=mo)
        kw = dict(dt=0.05, order=8, magnus_order=mo)
        out_p = sweep_expm_magnus_poly(*args, horner="pallas", interpret=True, **kw)
        out_e = sweep_expm_magnus_poly(*args, horner="einsum", **kw)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_e), atol=1e-12, rtol=0
        )

    def test_pallas_trajectories_match_einsum(self):
        args = self._setup(T=10)
        kw = dict(dt=0.05, order=8, magnus_order=2, eval_slots=[-1, 0, -1, 1, -1, -1, -1, -1, -1, 2])
        yf_p, tr_p = sweep_expm_magnus_poly(*args, horner="pallas", interpret=True, **kw)
        yf_e, tr_e = sweep_expm_magnus_poly(*args, horner="einsum", **kw)
        np.testing.assert_allclose(np.asarray(yf_p), np.asarray(yf_e), atol=1e-12)
        np.testing.assert_allclose(np.asarray(tr_p), np.asarray(tr_e), atol=1e-12)

    def test_pallas_grad_matches_einsum(self):
        static_op, ops, fd, coeffs, y0 = self._setup(T=8)

        def loss(c, horner):
            out = sweep_expm_magnus_poly(
                static_op, ops, fd, c, y0, dt=0.05, order=6,
                magnus_order=2, horner=horner,
                interpret=(horner == "pallas"),
            )
            return jnp.sum(jnp.abs(out) ** 2)

        g_p = jax.grad(lambda c: loss(c, "pallas"))(jnp.asarray(coeffs))
        g_e = jax.grad(lambda c: loss(c, "einsum"))(jnp.asarray(coeffs))
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_e), atol=1e-10)

    def test_pallas_rejects_matrix_states(self):
        static_op, ops, fd, coeffs, _ = self._setup()
        y0_mat = np.ones((4, 8, 3), dtype=complex)
        with pytest.raises(ValueError, match="single-column"):
            sweep_expm_magnus_poly(
                static_op, ops, fd, coeffs, y0_mat, dt=0.05,
                horner="pallas", interpret=True,
            )

    def test_fused_sweep_poly_horner_pallas(self):
        """poly_horner='pallas' through fused_sweep_solve (vectorized
        Lindblad, density-matrix y0 -> single vectorized column) matches the
        einsum path bit-for-bit-class."""
        from qiskit_dynamics_tpu import Signal
        from qiskit_dynamics_tpu.models import LindbladModel
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve

        dim = 4
        a_op = np.diag(np.sqrt(np.arange(1, dim)), 1)
        N_op = np.diag(np.arange(dim, dtype=float))
        H0 = 2 * np.pi * (5.0 * N_op - 0.33 / 2 * (N_op @ N_op - N_op))
        Hd = 2 * np.pi * 0.02 * (a_op + a_op.conj().T)
        model = LindbladModel(
            static_hamiltonian=H0, hamiltonian_operators=[Hd],
            static_dissipators=[np.sqrt(0.01) * a_op],
            rotating_frame=np.diag(H0), vectorized=True,
        )
        rho0 = np.zeros((dim, dim), dtype=complex)
        rho0[1, 1] = 1.0
        sig = lambda amp: ([Signal(lambda t: amp, carrier_freq=5.0)], None)
        amps = jnp.linspace(0.2, 1.0, 3)
        kw = dict(
            t_span=(0.0, 2.0), max_dt=0.05, y0=rho0, magnus_order=3,
            sweep_engine="poly",
        )
        out_p = fused_sweep_solve(
            model, sig, amps, poly_horner="pallas", interpret=True, **kw
        )
        out_e = fused_sweep_solve(model, sig, amps, poly_horner="einsum", **kw)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_e), atol=1e-12, rtol=0
        )

    def test_auto_is_einsum_off_tpu(self):
        """horner='auto' must not select the pallas path on CPU (the suite's
        backend) — it is TPU-gated; einsum result returned unchanged."""
        args = self._setup(T=5)
        out_a = sweep_expm_magnus_poly(*args, dt=0.05, horner="auto")
        out_e = sweep_expm_magnus_poly(*args, dt=0.05, horner="einsum")
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_e), atol=0)
