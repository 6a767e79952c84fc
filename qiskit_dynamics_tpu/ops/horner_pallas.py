r"""VMEM-resident Horner ``expm``-action kernel for batch-major step matrices.

The polynomial-expanded Magnus engine (:mod:`.polynomial_sweep`) applies
``y <- expm(M_b) y_b`` per step with an order-``p`` Horner mat-vec recursion

.. math:: u \leftarrow v + M u / k,\qquad k = p, \dots, 1 .

Expressed in XLA, every one of the ``p`` iterations re-reads the whole
``(B, n, n)`` step-matrix stack from HBM: measured on chip at the dim-256
bench row shape (B=2048, T=125, p=8), the batched-GEMV einsum and a
VPU broadcast-multiply-reduce both sit at the identical ~1.46 s — the 8x
HBM re-read floor (~735 GB/s effective), not an MXU-padding artifact
(``scripts/horner_ab.py``). This kernel removes the re-reads: each grid
step DMAs a ``block_b``-member slab of the (transposed) step matrices into
VMEM once and runs all ``p`` iterations there, with the per-member mat-vec
as a sublane-stacked ``(2, n) @ (n, n)`` MXU product (real/imag rows share
the two matrix passes; transposed input makes the row-vector form compute
``M u``, not ``M^T u``).

Inputs are the TRANSPOSED matrices ``MT[b] = M_b^T`` — the caller gets the
transpose for free by transposing its host-side expansion matrices before
flattening (``polynomial_sweep``), so no device-side transpose exists on
this path.

Gradient support: :func:`horner_apply_bm_ad` wraps the kernel in a
``custom_vjp`` whose backward differentiates an XLA twin of the identical
polynomial (the repo's standard Pallas-AD pattern,
``batched_linalg._expm_bol_ad_bwd``).

Reference context: the reference's fixed-step solvers materialize per-step
propagators with ``jax.scipy.linalg.expm``
(``/root/reference/qiskit_dynamics/solvers/fixed_step_solvers.py:321-403``);
the action-only Horner apply and its VMEM residency are TPU-native design
with no reference counterpart.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["horner_apply_bm", "horner_apply_bm_ad", "horner_twin_bm"]


def _horner_kernel(order, bb, mtr_ref, mti_ref, vr_ref, vi_ref, or_ref, oi_ref):
    """Per grid step: ``bb`` members' matrices resident in VMEM, all
    ``order`` Horner iterations in-register.

    ``u2`` stacks the real and imaginary state rows as ``(2, n)`` so each
    iteration costs two MXU passes over the member's matrix planes:
    with ``a = u2 @ MTr`` and ``b = u2 @ MTi`` (row-form == ``M u`` because
    the input is transposed),

    ``re(M u) = a[re] - b[im]``, ``im(M u) = b[re] + a[im]``.
    """
    for m in range(bb):
        mtr = mtr_ref[m]
        mti = mti_ref[m]
        v2 = jnp.concatenate(
            [vr_ref[m : m + 1, :], vi_ref[m : m + 1, :]], axis=0
        )
        u2 = v2
        for k in range(order, 0, -1):
            a = jax.lax.dot(u2, mtr, precision=jax.lax.Precision.HIGHEST)
            b = jax.lax.dot(u2, mti, precision=jax.lax.Precision.HIGHEST)
            t2 = jnp.concatenate(
                [a[0:1, :] - b[1:2, :], b[0:1, :] + a[1:2, :]], axis=0
            )
            u2 = v2 + t2 * (1.0 / k)
        or_ref[m : m + 1, :] = u2[0:1, :]
        oi_ref[m : m + 1, :] = u2[1:2, :]


def _horner_kernel_loop(
    order, bb, mtr_ref, mti_ref, vr_ref, vi_ref, or_ref, oi_ref
):
    """Loop-form twin of :func:`_horner_kernel` (identical arithmetic).

    The unrolled body costs Mosaic ``bb * order * 2`` distinct dots to
    compile (~26.5 min at dim 256); here both loops are ``fori_loop`` so
    the compiled body holds TWO dots regardless of ``bb``/``order`` —
    measured cold compile 377 s at the dim-256 bench shape (4.2x faster)
    at runtime parity (30.3 vs 28.7-32.9 ms/call across sessions) and
    BIT-identical output on chip (``scripts/horner_body_ab.py``).
    The reciprocal ``1/k`` is an f32 division of the same real value the
    unrolled form folds to a constant — bit-identical rounding.
    """

    def member_body(m, _):
        mtr = mtr_ref[m]
        mti = mti_ref[m]
        v2 = jnp.concatenate(
            [vr_ref[pl.dslice(m, 1), :], vi_ref[pl.dslice(m, 1), :]], axis=0
        )

        def k_body(i, u2):
            k = (order - i).astype(u2.dtype)
            a = jax.lax.dot(u2, mtr, precision=jax.lax.Precision.HIGHEST)
            b = jax.lax.dot(u2, mti, precision=jax.lax.Precision.HIGHEST)
            t2 = jnp.concatenate(
                [a[0:1, :] - b[1:2, :], b[0:1, :] + a[1:2, :]], axis=0
            )
            return v2 + t2 * (1.0 / k)

        u2 = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(order), k_body, v2, unroll=False
        )
        or_ref[pl.dslice(m, 1), :] = u2[0:1, :]
        oi_ref[pl.dslice(m, 1), :] = u2[1:2, :]
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(bb), member_body, 0, unroll=False)


def _pick_block_b(B: int, n: int, block_b: int) -> int:
    """Largest divisor of ``B`` that is <= ``block_b`` and keeps the
    double-buffered matrix slab under ~12 MB of VMEM."""
    vmem_cap = max(1, int(6 * 2**20 // max(1, n * n * 8)))
    cap = max(1, min(block_b, vmem_cap))
    bb = min(cap, B)
    while B % bb != 0:
        bb -= 1
    return bb


@functools.partial(
    jax.jit, static_argnames=("order", "block_b", "interpret", "body")
)
def horner_apply_bm(
    MTr, MTi, vr, vi, order: int = 8, block_b: int = 8, interpret: bool = False,
    body: str = "loop",
):
    """Batched ``u = sum_{j<=order} M^j v / j!`` action on real/imag planes.

    Args:
        MTr, MTi: ``(B, n, n)`` real/imag planes of the TRANSPOSED step
            matrices (``MT[b] = M_b^T``).
        vr, vi: ``(B, n)`` real/imag state rows.
        order: Horner Taylor order.
        block_b: members per grid step (auto-clamped to a divisor of ``B``
            that fits VMEM).
        interpret: run in the Pallas interpreter (CPU tests).
        body: ``"loop"`` (default; ``fori_loop`` member/order body — two
            compiled dots, 377 s cold Mosaic compile at dim 256 vs ~26.5
            min unrolled, runtime parity) or ``"unrolled"`` (fully
            unrolled dots). Bit-identical arithmetic, A/B in
            ``scripts/horner_body_ab.py``.

    Returns:
        ``(ur, ui)``: ``(B, n)`` real/imag planes of the result.
    """
    B, n, _ = MTr.shape
    bb = _pick_block_b(B, n, block_b)
    grid = (B // bb,)
    mspec = pl.BlockSpec((bb, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((bb, n), lambda b: (b, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _horner_kernel_loop if body == "loop" else _horner_kernel, order, bb
    )
    return tuple(
        pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[mspec, mspec, vspec, vspec],
            out_specs=[vspec, vspec],
            out_shape=[jax.ShapeDtypeStruct((B, n), MTr.dtype)] * 2,
            interpret=interpret,
        )(MTr, MTi, vr, vi)
    )


def horner_twin_bm(MTr, MTi, vr, vi, order: int = 8):
    """XLA twin of :func:`horner_apply_bm` (identical polynomial, identical
    transposed-input contract); the custom-VJP backward path."""
    MT = (MTr + 1j * MTi).astype(
        jnp.complex128 if MTr.dtype == jnp.float64 else jnp.complex64
    )
    v = (vr + 1j * vi).astype(MT.dtype)[:, None, :]
    u = v
    for k in range(order, 0, -1):
        u = v + jnp.matmul(u, MT) / k
    u = u[:, 0, :]
    return jnp.real(u).astype(MTr.dtype), jnp.imag(u).astype(MTr.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def horner_apply_bm_ad(
    MTr, MTi, vr, vi, order: int = 8, block_b: int = 8, interpret: bool = False,
    body: str = "loop",
):
    """:func:`horner_apply_bm` with an XLA-twin backward pass."""
    return horner_apply_bm(
        MTr, MTi, vr, vi, order=order, block_b=block_b, interpret=interpret,
        body=body,
    )


def _horner_ad_fwd(MTr, MTi, vr, vi, order, block_b, interpret, body):
    out = horner_apply_bm(
        MTr, MTi, vr, vi, order=order, block_b=block_b, interpret=interpret,
        body=body,
    )
    return out, (MTr, MTi, vr, vi)


def _horner_ad_bwd(order, block_b, interpret, body, res, cts):
    MTr, MTi, vr, vi = res
    _, pullback = jax.vjp(
        lambda a, b, c, d: horner_twin_bm(a, b, c, d, order=order), MTr, MTi, vr, vi
    )
    return pullback(cts)


horner_apply_bm_ad.defvjp(_horner_ad_fwd, _horner_ad_bwd)
