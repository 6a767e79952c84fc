"""Stepper-selection tests for the native adaptive RK solvers.

``tpu_rk_solve`` has two time-loop constructs (``solvers/adaptive.py``): an
early-exit ``lax.while_loop`` (runtime ~ steps taken, forward-only) and a
bounded ``lax.scan`` (reverse-mode differentiable, always pays ``max_steps``
masked iterations). ``stepper="auto"`` must pick the while loop on eager
calls and the scan inside any user trace — including ``grad`` traces whose
tracers enter only through the RHS closure (the reference analog,
``jax.experimental.ode.odeint``, is while-loop-based with a custom adjoint:
``/root/reference/qiskit_dynamics/solvers/jax_odeint.py:57-64``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.solvers.adaptive import _compiled_rk, tpu_rk_solve

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
G = -1j * 2 * np.pi * (0.3 * X + 0.4 * Z) / 2
Y0 = np.array([0.6, 0.8j], dtype=complex)


def _rhs(t, y):
    return jnp.asarray(G) @ y


class TestStepperEquivalence:
    @pytest.mark.parametrize("method", ["dopri5", "dop853"])
    def test_while_matches_scan(self, method):
        r_w = tpu_rk_solve(_rhs, (0.0, 1.7), Y0, method=method, stepper="while")
        r_s = tpu_rk_solve(_rhs, (0.0, 1.7), Y0, method=method, stepper="scan")
        np.testing.assert_allclose(np.asarray(r_w.y), np.asarray(r_s.y), atol=1e-14, rtol=0)
        assert int(r_w.nfev) == int(r_s.nfev)

    def test_while_matches_scan_t_eval(self):
        te = np.linspace(0.0, 1.7, 9)
        r_w = tpu_rk_solve(_rhs, (0.0, 1.7), Y0, t_eval=te, stepper="while")
        r_s = tpu_rk_solve(_rhs, (0.0, 1.7), Y0, t_eval=te, stepper="scan")
        np.testing.assert_allclose(np.asarray(r_w.y), np.asarray(r_s.y), atol=1e-14, rtol=0)

    def test_while_backwards(self):
        fwd = tpu_rk_solve(_rhs, (0.0, 1.0), Y0, rtol=1e-10, atol=1e-10, stepper="while")
        back = tpu_rk_solve(
            _rhs, (1.0, 0.0), np.asarray(fwd.y[-1]), rtol=1e-10, atol=1e-10,
            stepper="while",
        )
        np.testing.assert_allclose(np.asarray(back.y[-1]), Y0, atol=1e-8, rtol=0)

    def test_invalid_stepper_raises(self):
        with pytest.raises(ValueError, match="stepper"):
            tpu_rk_solve(_rhs, (0.0, 1.0), Y0, stepper="for")


class TestAutoSelection:
    def test_grad_through_closure_uses_scan(self):
        """grad of a parameter entering only via the RHS closure: auto must
        fall back to the scan path (while_loop has no transpose)."""

        def loss(a):
            res = tpu_rk_solve(
                lambda t, y: a * jnp.asarray(G) @ y, (0.0, 1.0),
                jnp.asarray(Y0), rtol=1e-8, max_steps=1024,
            )
            return jnp.abs(res.y[-1][1]) ** 2

        g = jax.grad(loss)(1.0)
        eps = 1e-6
        fd = (loss(1.0 + eps) - loss(1.0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)

    def test_vmap_of_while_masks_finished_lanes(self):
        """vmapped while runs until ALL lanes finish; per-lane masking must
        keep early finishers' outputs frozen."""
        vm = jax.jit(
            jax.vmap(
                lambda sc: tpu_rk_solve(
                    lambda t, y: sc * jnp.asarray(G) @ y, (0.0, 1.0),
                    jnp.asarray(Y0), rtol=1e-8, max_steps=1024,
                    auto_jit=False, stepper="while",
                ).y[-1]
            )
        )
        out = np.asarray(vm(jnp.array([0.3, 1.0, 2.5])))
        for i, sc in enumerate([0.3, 1.0, 2.5]):
            ref = tpu_rk_solve(
                lambda t, y, sc=sc: sc * jnp.asarray(G) @ y, (0.0, 1.0), Y0,
                rtol=1e-8,
            )
            np.testing.assert_allclose(out[i], np.asarray(ref.y[-1]), atol=1e-9, rtol=0)

    def test_eager_compile_cache_hits(self):
        """Repeat eager solves with the same rhs object reuse the compiled
        entry (the pre-round-4 path rebuilt a closure per call and paid a
        full retrace+compile every time)."""
        _compiled_rk.cache_clear()
        tpu_rk_solve(_rhs, (0.0, 1.0), Y0)
        assert _compiled_rk.cache_info().misses == 1
        tpu_rk_solve(_rhs, (0.0, 1.5), Y0)
        assert _compiled_rk.cache_info().hits == 1

    def test_budget_exhaustion_nan_poisons_while(self):
        res = tpu_rk_solve(
            _rhs, (0.0, 100.0), Y0, rtol=1e-12, atol=1e-12, max_steps=8,
            stepper="while",
        )
        assert not bool(res.success)
        assert np.all(np.isnan(np.asarray(res.y[-1])))
