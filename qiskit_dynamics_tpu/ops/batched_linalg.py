r"""Batch-on-lanes linear algebra kernels for large sweeps of small matrices.

TPU tiles pad the minormost two dims to (8, 128); a batched stack of
``(B, n, n)`` complex matrices with ``n <= 32`` therefore wastes up to 8x
memory and runs the MXU at a few percent utilization (measured on the CR-gate
benchmark: batched-expm wall time is dispatch/padding bound, not FLOPs).

These kernels transpose the problem: matrices are stored "structure-of-
arrays" as ``(n, n, B)`` with the sweep batch on the **lane** dimension, and a
batched matmul becomes ``n^2 * n`` vector multiply-adds on ``(n, TILE_B)``
blocks — full (8, 128) tiles, zero padding, executed by the VPU. Complex
arithmetic is carried as separate real/imag planes (TPU has no native complex
vector ops).

Kernels (Pallas; ``interpret=True`` supported for CPU tests):

- :func:`matmul_bol` — ``C_b = A_b @ B_b`` on ``(n, n, B)`` stacks.
- :func:`expm_taylor_bol` — fixed-order Taylor scaling-and-squaring ``expm``
  on ``(n, n, B)`` stacks (same math as :func:`.expm.expm_taylor`).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "matmul_bol",
    "expm_taylor_bol",
    "expm_taylor_bol_ad",
    "expm_taylor_bol_bwd",
    "to_bol",
    "from_bol",
]


def to_bol(A):
    """(B, n, n) complex -> ((n, n, B) real, (n, n, B) imag)."""
    A = jnp.moveaxis(A, 0, -1)
    return jnp.real(A), jnp.imag(A)


def from_bol(Ar, Ai):
    """((n, n, B), (n, n, B)) -> (B, n, n) complex."""
    return jnp.moveaxis(Ar + 1j * Ai, -1, 0)


def _matmul_kernel(n: int, ar_ref, ai_ref, br_ref, bi_ref, cr_ref, ci_ref):
    """C = A @ B per lane: C[i,j,:] = sum_k A[i,k,:] * B[k,j,:] (complex)."""
    for i in range(n):
        acc_r = jnp.zeros_like(cr_ref[i])
        acc_i = jnp.zeros_like(ci_ref[i])
        for k in range(n):
            ar = ar_ref[i, k][None, :]
            ai = ai_ref[i, k][None, :]
            br = br_ref[k]
            bi = bi_ref[k]
            acc_r += ar * br - ai * bi
            acc_i += ar * bi + ai * br
        cr_ref[i] = acc_r
        ci_ref[i] = acc_i


def _block_specs(n: int, tile_b: int):
    spec = pl.BlockSpec((n, n, tile_b), lambda b: (0, 0, b), memory_space=pltpu.VMEM)
    return spec


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b"))
def matmul_bol(Ar, Ai, Br, Bi, interpret: bool = False, tile_b: int = 512):
    """Batched complex matmul on (n, n, B) real/imag planes.

    Returns ``(Cr, Ci)`` with ``C_b = A_b @ B_b``. ``B`` must be a multiple of
    ``tile_b`` (pad upstream; 128-aligned tiles required).
    """
    n, _, B = Ar.shape
    if B % tile_b != 0:
        raise ValueError(f"batch {B} must be a multiple of tile_b={tile_b}")
    grid = (B // tile_b,)
    spec = _block_specs(n, tile_b)
    out_shape = [jax.ShapeDtypeStruct((n, n, B), Ar.dtype)] * 2
    kernel = functools.partial(_matmul_kernel, n)
    return tuple(
        pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * 4,
            out_specs=[spec] * 2,
            out_shape=out_shape,
            interpret=interpret,
        )(Ar, Ai, Br, Bi)
    )


def _expm_kernel(n: int, order: int, squarings: int, xr_ref, xi_ref, pr_ref, pi_ref, sr, si, tr, ti):
    """P = expm(X) per lane via Horner Taylor + squarings, in VMEM scratch."""
    scale = 1.0 / (2.0**squarings)

    # sr/si <- scaled X
    for i in range(n):
        sr[i] = xr_ref[i] * scale
        si[i] = xi_ref[i] * scale

    # tr/ti <- I + X/order
    for i in range(n):
        tr[i] = sr[i] / order
        ti[i] = si[i] / order
        tr[i, i] += 1.0

    # Horner: t <- I + (X @ t) / k
    for k in range(order - 1, 0, -1):
        inv_k = 1.0 / k
        for i in range(n):
            acc_r = jnp.zeros_like(tr[i])
            acc_i = jnp.zeros_like(ti[i])
            for m in range(n):
                xr = sr[i, m][None, :]
                xi = si[i, m][None, :]
                acc_r += xr * tr[m] - xi * ti[m]
                acc_i += xr * ti[m] + xi * tr[m]
            pr_ref[i] = acc_r * inv_k
            pi_ref[i] = acc_i * inv_k
        for i in range(n):
            tr[i] = pr_ref[i]
            ti[i] = pi_ref[i]
            tr[i, i] += 1.0

    # squarings: t <- t @ t
    for _ in range(squarings):
        for i in range(n):
            acc_r = jnp.zeros_like(tr[i])
            acc_i = jnp.zeros_like(ti[i])
            for m in range(n):
                xr = tr[i, m][None, :]
                xi = ti[i, m][None, :]
                acc_r += xr * tr[m] - xi * ti[m]
                acc_i += xr * ti[m] + xi * tr[m]
            pr_ref[i] = acc_r
            pi_ref[i] = acc_i
        for i in range(n):
            tr[i] = pr_ref[i]
            ti[i] = pi_ref[i]

    for i in range(n):
        pr_ref[i] = tr[i]
        pi_ref[i] = ti[i]


@functools.partial(
    jax.jit, static_argnames=("order", "squarings", "interpret", "tile_b")
)
def expm_taylor_bol(
    Xr, Xi, order: int = 8, squarings: int = 0, interpret: bool = False, tile_b: int = 512
):
    """Batched complex ``expm`` on (n, n, B) real/imag planes.

    Fixed-order Taylor + static squarings (see :func:`.expm.expm_taylor` for
    the error bound); the whole batch stays in VMEM per tile with no (8, 128)
    padding waste.
    """
    n, _, B = Xr.shape
    if B % tile_b != 0:
        raise ValueError(f"batch {B} must be a multiple of tile_b={tile_b}")
    grid = (B // tile_b,)
    spec = _block_specs(n, tile_b)
    out_shape = [jax.ShapeDtypeStruct((n, n, B), Xr.dtype)] * 2
    kernel = functools.partial(_expm_kernel, n, order, squarings)
    return tuple(
        pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * 2,
            out_specs=[spec] * 2,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((n, n, tile_b), Xr.dtype)] * 4,
            interpret=interpret,
        )(Xr, Xi)
    )


def _largest_divisor_leq(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def _expm_bwd_kernel(
    n: int,
    order: int,
    squarings: int,
    xr_ref, xi_ref, ctr_ref, cti_ref, gxr_ref, gxi_ref,
    st_r, st_i, sr, si, gr, gi, wr, wi, tcr, tci,
):
    """VJP of :func:`_expm_kernel` per lane tile.

    Recomputes the forward Horner+squarings recursion storing every stage
    operand in VMEM scratch, then runs the reverse sweep in the same
    batch-on-lanes layout. Matmul forms used:

    - ``C = A @ B``: rows ``C[i] = sum_m A[i,m] * B[m]``,
    - ``C = A^H @ B``: rows ``C[i] = sum_m conj(A[m,i]) * B[m]``
      (operand read transposed — scalar-indexed on the leading dims),
    - ``C = A @ B^H``: via an explicit conjugate-transpose copy of ``B``
      (n^2 vector copies — one matmul's worth of traffic).
    """
    scale = 1.0 / (2.0**squarings)

    def mm(ar, ai, br, bi, outr, outi, coef=1.0, accumulate=False):
        # out (+)= coef * (A @ B)
        for i in range(n):
            acc_r = ar[i, 0][None, :] * br[0]
            acc_i = ar[i, 0][None, :] * bi[0]
            acc_r = acc_r - ai[i, 0][None, :] * bi[0]
            acc_i = acc_i + ai[i, 0][None, :] * br[0]
            for m in range(1, n):
                xr_ = ar[i, m][None, :]
                xi_ = ai[i, m][None, :]
                acc_r += xr_ * br[m] - xi_ * bi[m]
                acc_i += xr_ * bi[m] + xi_ * br[m]
            if accumulate:
                outr[i] += acc_r * coef
                outi[i] += acc_i * coef
            else:
                outr[i] = acc_r * coef
                outi[i] = acc_i * coef

    def mm_ah_b(ar, ai, br, bi, outr, outi, coef=1.0, accumulate=False):
        # out (+)= coef * (A^H @ B): A read [m, i] with conjugation
        for i in range(n):
            acc_r = ar[0, i][None, :] * br[0]
            acc_i = ar[0, i][None, :] * bi[0]
            acc_r = acc_r + ai[0, i][None, :] * bi[0]
            acc_i = acc_i - ai[0, i][None, :] * br[0]
            for m in range(1, n):
                xr_ = ar[m, i][None, :]
                xi_ = ai[m, i][None, :]
                acc_r += xr_ * br[m] + xi_ * bi[m]
                acc_i += xr_ * bi[m] - xi_ * br[m]
            if accumulate:
                outr[i] += acc_r * coef
                outi[i] += acc_i * coef
            else:
                outr[i] = acc_r * coef
                outi[i] = acc_i * coef

    def conj_t(ar, ai, outr, outi):
        # out = A^H (element copies, scalar-indexed on the leading dims)
        for i in range(n):
            for j in range(n):
                outr[i, j] = ar[j, i]
                outi[i, j] = -ai[j, i]

    # ---- forward recompute, storing stage operands --------------------
    for i in range(n):
        sr[i] = xr_ref[i] * scale
        si[i] = xi_ref[i] * scale

    # t lives in (gr, gi) during the forward recompute
    for i in range(n):
        gr[i] = sr[i] / order
        gi[i] = si[i] / order
        gr[i, i] += 1.0

    idx = 0
    for k in range(order - 1, 0, -1):
        for i in range(n):
            st_r[idx, i] = gr[i]
            st_i[idx, i] = gi[i]
        mm(sr, si, gr, gi, wr, wi, coef=1.0 / k)
        for i in range(n):
            gr[i] = wr[i]
            gi[i] = wi[i]
            gr[i, i] += 1.0
        idx += 1
    for _ in range(squarings):
        for i in range(n):
            st_r[idx, i] = gr[i]
            st_i[idx, i] = gi[i]
        mm(gr, gi, gr, gi, wr, wi)
        for i in range(n):
            gr[i] = wr[i]
            gi[i] = wi[i]
        idx += 1

    # ---- reverse sweep -------------------------------------------------
    # g <- ct
    for i in range(n):
        gr[i] = ctr_ref[i]
        gi[i] = cti_ref[i]

    # squarings: y = stage; g <- g @ y^H + y^H @ g
    for _ in range(squarings):
        idx -= 1
        # w = y^H @ g (the stage is read transposed in place)
        mm_ah_b(st_r[idx], st_i[idx], gr, gi, wr, wi)
        # tc <- y^H
        conj_t(st_r[idx], st_i[idx], tcr, tci)
        # w += g @ y^H
        mm(gr, gi, tcr, tci, wr, wi, accumulate=True)
        for i in range(n):
            gr[i] = wr[i]
            gi[i] = wi[i]

    # s-bar accumulates in the output refs
    for i in range(n):
        gxr_ref[i] = jnp.zeros_like(gxr_ref[i])
        gxi_ref[i] = jnp.zeros_like(gxi_ref[i])

    # Horner reverse: k = 1 .. order-1, stage idx descending
    for k in range(1, order):
        idx -= 1
        # s-bar += (g @ t_{k+1}^H) / k
        conj_t(st_r[idx], st_i[idx], tcr, tci)
        mm(gr, gi, tcr, tci, gxr_ref, gxi_ref, coef=1.0 / k, accumulate=True)
        # g <- (s^H @ g) / k
        mm_ah_b(sr, si, gr, gi, wr, wi, coef=1.0 / k)
        for i in range(n):
            gr[i] = wr[i]
            gi[i] = wi[i]

    # top of the recursion: t_order = s / order + I
    for i in range(n):
        gxr_ref[i] += gr[i] / order
        gxi_ref[i] += gi[i] / order

    # X-bar = s-bar * scale
    for i in range(n):
        gxr_ref[i] *= scale
        gxi_ref[i] *= scale


@functools.partial(
    jax.jit, static_argnames=("order", "squarings", "interpret", "tile_b")
)
def expm_taylor_bol_bwd(
    Xr, Xi, CTr, CTi, order: int = 8, squarings: int = 0,
    interpret: bool = False, tile_b: int = 256,
):
    """Pallas VJP of :func:`expm_taylor_bol`: returns ``(d/dX)^*``-pulled
    cotangents ``(GXr, GXi)`` for output cotangents ``(CTr, CTi)``.

    One pass per lane tile: forward recompute with all stage operands
    resident in VMEM, then the reverse sweep — no HBM intermediates at all
    (the XLA-twin fallback is HBM-bound on the stage tensors).
    """
    n, _, B = Xr.shape
    if B % tile_b != 0:
        raise ValueError(f"batch {B} must be a multiple of tile_b={tile_b}")
    grid = (B // tile_b,)
    spec = _block_specs(n, tile_b)
    out_shape = [jax.ShapeDtypeStruct((n, n, B), Xr.dtype)] * 2
    n_stages = (order - 1) + squarings
    kernel = functools.partial(_expm_bwd_kernel, n, order, squarings)
    scratch = [pltpu.VMEM((n_stages, n, n, tile_b), Xr.dtype)] * 2 + [
        pltpu.VMEM((n, n, tile_b), Xr.dtype)
    ] * 8
    return tuple(
        pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * 4,
            out_specs=[spec] * 2,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(Xr, Xi, CTr, CTi)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def expm_taylor_bol_ad(
    Xr, Xi, order: int = 8, squarings: int = 0, interpret: bool = False, tile_b: int = 512
):
    """Differentiable :func:`expm_taylor_bol`.

    Both directions are Pallas: the primal is the batch-on-lanes Taylor
    kernel; the backward (:func:`expm_taylor_bol_bwd`) recomputes the
    IDENTICAL Horner+squarings recursion per lane tile with every stage
    operand resident in VMEM and runs the reverse sweep in place — no HBM
    linearization intermediates at all. Cross-checked to machine precision
    against ``jax.vjp`` of an XLA re-evaluation of the same recursion
    (:func:`_xla_twin_vjp`, kept as the oracle).

    This is what makes ``MagnusSolver.solve_sweep`` differentiable
    end-to-end (the per-step propagator is ``Udt @ expm(polynomial)``).
    """
    return expm_taylor_bol(Xr, Xi, order, squarings, interpret, tile_b)


def _expm_bol_ad_fwd(Xr, Xi, order, squarings, interpret, tile_b):
    return expm_taylor_bol(Xr, Xi, order, squarings, interpret, tile_b), (Xr, Xi)


def _xla_twin_vjp(Xr, Xi, ct_r, ct_i, order, squarings):
    """Reference VJP: jax.vjp through an XLA re-evaluation of the kernel's
    exact Horner+squarings recursion, in the same (n, n, L) layout.

    Layout note (measured): per-lane "matmuls" here are written as
    broadcast-multiply-reduce, NOT einsum/dot_general — dot_general makes
    XLA transpose lanes to a leading batch axis and pad the (n, n) minors
    onto (8, 128) tiles (1.6x memory expansion, OOM at full width, 100x
    slower); the reduce form keeps lanes minor and fuses on the VPU (771
    ns/lane at n=10, HBM-bound on the stage tensors). Used as the
    cross-check oracle for :func:`expm_taylor_bol_bwd` and as the CPU-path
    fallback; the production backward is the Pallas kernel (fully
    VMEM-resident, no HBM intermediates).
    """
    n = Xr.shape[0]

    def _rmm(a, b):
        return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)

    def _cmul(ar, ai, br, bi):
        return _rmm(ar, br) - _rmm(ai, bi), _rmm(ar, bi) + _rmm(ai, br)

    def xla_twin(xr, xi):
        scale = 1.0 / (2.0**squarings)
        sr, si = xr * scale, xi * scale
        eye = jnp.eye(n, dtype=xr.dtype)[:, :, None]
        tr, ti = sr / order + eye, si / order
        for k in range(order - 1, 0, -1):
            pr, pi = _cmul(sr, si, tr, ti)
            tr, ti = pr / k + eye, pi / k
        for _ in range(squarings):
            tr, ti = _cmul(tr, ti, tr, ti)
        return tr, ti

    _, vjp = jax.vjp(xla_twin, Xr, Xi)
    return vjp((ct_r, ct_i))


def _expm_bol_ad_bwd(order, squarings, interpret, tile_b, res, cotangents):
    Xr, Xi = res
    ct_r, ct_i = cotangents
    n, _, L = Xr.shape
    # the backward kernel keeps (order - 1 + squarings) stage operands in
    # VMEM, so it runs a smaller lane tile than the primal
    bwd_tile = tile_b if tile_b <= 256 or L % 256 != 0 else 256
    return expm_taylor_bol_bwd(
        Xr, Xi, ct_r, ct_i, order, squarings, interpret=interpret, tile_b=bwd_tile
    )


expm_taylor_bol_ad.defvjp(_expm_bol_ad_fwd, _expm_bol_ad_bwd)
