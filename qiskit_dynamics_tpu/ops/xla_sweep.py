r"""Batch-major XLA engine for fixed-step Magnus-2 sweeps (large dimensions).

Same semantics as :func:`~qiskit_dynamics_tpu.ops.sweep_solver.sweep_expm_magnus2`
(identical Magnus-2 + Horner-Taylor polynomial, same step rule), but built on
``(B, n, n)`` batch-major complex matmuls under one ``lax.scan`` over time —
the MXU path. The Pallas batch-on-lanes kernel (row-looped above n = 16)
compiles up to n = 64 within the VMEM budget but, measured on-chip, only
ties this engine above n ~ 32 (fori rows lose the unrolled ILP); this engine
compiles in seconds at ANY ``n`` and lets XLA tile the batched matmuls onto
the MXU. ``solvers.fused_sweep_solve`` auto-selects it for
``solve_dim > 32`` (vectorized Lindblad models reach ``n = dim^2`` quickly).

Reference math: Magnus-2 Gauss-point commutator rule
(``/root/reference/qiskit_dynamics/solvers/fixed_step_solvers.py:321-403``).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .sweep_solver import (
    _GAUSS3_D1,
    _GAUSS3_D2,
    _GAUSS3_D3,
    _GAUSS_C1,
    _GAUSS_C2,
    _M3_C0,
    _M3_C1,
    _P2,
)
from .trig_reduce import reduced_phase, split_const, step_time_df

__all__ = ["sweep_expm_magnus2_xla"]


def sweep_expm_magnus2_xla(
    static_op, operators, frame_omega, coefficients, y0,
    dt, t0=0.0, order=8, hermitian=False, eval_slots=None,
    frame_omega_lo=None, magnus_order=2,
):
    """Public shim over :func:`_sweep_expm_magnus2_xla_jit`: splits the frame
    frequency matrix into an f32 (hi, lo) pair host-side (see
    :func:`.sweep_solver.split_omega_host`). Arguments documented below."""
    if frame_omega_lo is None:
        from .sweep_solver import split_omega_host

        frame_omega, frame_omega_lo = split_omega_host(frame_omega)
    return _sweep_expm_magnus2_xla_jit(
        static_op, operators, frame_omega, frame_omega_lo, coefficients, y0,
        dt=dt, t0=t0, order=order, hermitian=hermitian, eval_slots=eval_slots,
        magnus_order=magnus_order,
    )


@functools.partial(
    jax.jit,
    static_argnames=("dt", "t0", "order", "hermitian", "eval_slots", "magnus_order"),
)
def _sweep_expm_magnus2_xla_jit(
    static_op,
    operators,
    frame_omega,
    frame_omega_lo,
    coefficients,
    y0,
    dt: float,
    t0: float = 0.0,
    order: int = 8,
    hermitian: bool = False,
    eval_slots=None,
    magnus_order: int = 2,
):
    r"""Fixed-step Magnus-2 sweep solve, batch-major XLA implementation.

    Args/returns match :func:`~qiskit_dynamics_tpu.ops.sweep_solver.sweep_expm_magnus2`
    (``coefficients`` ``(T, n_gauss, k, B)`` with ``n_gauss = magnus_order``
    Gauss-point samples per step, ``y0``/result ``(n, B)`` complex in the
    frame basis, optional static ``eval_slots`` tuple producing an
    ``(n_eval, n, B)`` trajectory second output); no ``tile_b`` — XLA picks
    the tiling. ``magnus_order`` 2 (4th order, 2-point Gauss) or 3 (6th
    order, 3-point Gauss).

    ``y0`` may alternatively be 3d ``(B, n, m)`` batch-major — ``m`` state
    columns per sweep member sharing one generator (unitary/propagator
    sweeps): the O(n^3) generator/commutator work is then done ONCE per
    member instead of per column, and outputs are ``(B, n, m)``
    (+ ``(n_eval, B, n, m)`` trajectory).
    """
    if magnus_order not in (2, 3):
        raise ValueError(f"magnus_order must be 2 or 3, got {magnus_order!r}")
    cplx = jnp.complex64 if not jax.config.jax_enable_x64 else jnp.complex128
    real = jnp.float32 if not jax.config.jax_enable_x64 else jnp.float64
    static = jnp.asarray(static_op).astype(cplx)
    ops = jnp.asarray(operators).astype(cplx)
    omega = jnp.asarray(frame_omega).astype(real)
    omega_lo = jnp.asarray(frame_omega_lo).astype(real)
    coef = jnp.asarray(coefficients).astype(real)
    T = coef.shape[0]
    y0 = jnp.asarray(y0).astype(cplx)
    batch_major = y0.ndim == 3
    if batch_major:
        y = y0  # (B, n, m)
    else:
        y = jnp.swapaxes(y0, 0, 1)[..., None]  # (B, n, 1)

    f32_mode = real == jnp.float32

    def frame_phase(idx, gauss_c):
        """(n, n) frame phase ``omega * tau`` at ``tau = t0 + (idx+c) dt``.

        f32: EFT step time + mod-2pi reduction (ops/trig_reduce.py) — same
        treatment as the Pallas kernels, so large absolute phases keep f32
        trig accurate (and the AD-adjoint replay matches the primal)."""
        if f32_mode:
            return reduced_phase(
                (omega, omega_lo),
                step_time_df(
                    idx.astype(real), split_const(dt), split_const(t0 + gauss_c * dt)
                ),
            )
        return omega * (t0 + (idx.astype(real) + gauss_c) * dt)

    def generator(coef_step, ph):
        """(k, B) coefficients + (n, n) phase -> (B, n, n) rotated generator."""
        A = static[None] + jnp.einsum("kb,kij->bij", coef_step.astype(cplx), ops)
        phase = jnp.exp(1j * ph.astype(cplx))  # (n, n)
        return A * phase[None]

    c1 = 0.5 * dt
    c2 = _P2 * dt * dt

    n_eval = 0
    slots = None
    if eval_slots is not None:
        from .sweep_solver import _validate_eval_slots

        n_eval = _validate_eval_slots(eval_slots, T)
        slots = jnp.asarray(np.asarray(eval_slots, dtype=np.int32))

    def comm(A, B):
        """[A, B]; with anti-Hermitian operands AB = (BA)^dagger, so one
        batched matmul + a conj-transpose replaces two matmuls."""
        P = A @ B
        if hermitian:
            return P - jnp.conj(jnp.swapaxes(P, -1, -2))
        return P - B @ A

    def magnus_matrix(idx, coef_step):
        if magnus_order == 2:
            G1 = generator(coef_step[0], frame_phase(idx, _GAUSS_C1))
            G2 = generator(coef_step[1], frame_phase(idx, _GAUSS_C2))
            return c1 * (G1 + G2) + c2 * comm(G2, G1)
        # order 3 (6th order; Blanes et al., same rule as
        # fixed_step_solvers.get_exponential_take_step magnus_order=3)
        G1 = generator(coef_step[0], frame_phase(idx, _GAUSS3_D1))
        G2 = generator(coef_step[1], frame_phase(idx, _GAUSS3_D2))
        G3 = generator(coef_step[2], frame_phase(idx, _GAUSS3_D3))
        a1 = dt * G2
        a2 = (_M3_C0 * dt) * (G3 - G1)
        a3 = (_M3_C1 * dt) * (G3 - 2.0 * G2 + G1)
        C1 = comm(a1, a2)
        C2 = comm(2.0 * a3 + C1, a1) / 60.0
        return a1 + a3 / 12.0 + comm(-20.0 * a1 - a3 + C1, a2 + C2) / 240.0

    def step(carry, xs):
        y, evals = carry
        idx, coef_step = xs
        M = magnus_matrix(idx, coef_step)
        # y <- expm(M) y, Horner mat-vec Taylor (same polynomial as the
        # Pallas kernel)
        v = y
        for kk in range(order, 0, -1):
            v = y + jnp.einsum("bij,bjm->bim", M, v) / kk
        if n_eval > 0:
            slot = slots[idx]
            updated = jax.lax.dynamic_update_index_in_dim(
                evals, v, jnp.maximum(slot, 0), axis=0
            )
            evals = jnp.where(slot >= 0, updated, evals)
        return (v, evals), None

    evals0 = (
        jnp.zeros((n_eval,) + y.shape, dtype=y.dtype) if n_eval > 0 else jnp.zeros(())
    )
    # checkpoint the step: under reverse-mode AD only the per-step carry
    # is stored — the (B, n, n) generators/M are recomputed in the
    # backward pass instead of being saved T-fold in HBM
    (y, evals), _ = jax.lax.scan(
        jax.checkpoint(step), (y, evals0), (jnp.arange(T), coef)
    )
    if batch_major:
        if n_eval > 0:
            return y, evals  # (B, n, m), (n_eval, B, n, m)
        return y
    y = jnp.swapaxes(y[..., 0], 0, 1)  # (n, B)
    if n_eval > 0:
        return y, jnp.moveaxis(evals[..., 0], 2, 1)  # (n_eval, n, B)
    return y
