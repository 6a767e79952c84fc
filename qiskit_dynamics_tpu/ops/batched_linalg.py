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

__all__ = ["matmul_bol", "expm_taylor_bol", "expm_taylor_bol_ad", "to_bol", "from_bol"]


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def expm_taylor_bol_ad(
    Xr, Xi, order: int = 8, squarings: int = 0, interpret: bool = False, tile_b: int = 512
):
    """Differentiable :func:`expm_taylor_bol`.

    The repo's standard Pallas/XLA pairing: the primal is the batch-on-lanes
    Pallas kernel; the backward recomputes the IDENTICAL Horner+squarings
    recursion as an XLA twin in the same (n, n, L) layout — per-lane
    matmuls written as broadcast-multiply-reduce so lanes stay on the minor
    axis (see the layout note inside ``_expm_bol_ad_bwd``) — and pulls the
    cotangent through its VJP. The recomputation is lane-chunked to a fixed
    element budget so linearization intermediates stay bounded while chunks
    stay as large (hence as few and as sequential-``lax.map``-cheap) as
    memory allows.

    This is what makes ``MagnusSolver.solve_sweep`` differentiable
    end-to-end (the per-step propagator is ``Udt @ expm(polynomial)``).
    """
    return expm_taylor_bol(Xr, Xi, order, squarings, interpret, tile_b)


def _expm_bol_ad_fwd(Xr, Xi, order, squarings, interpret, tile_b):
    return expm_taylor_bol(Xr, Xi, order, squarings, interpret, tile_b), (Xr, Xi)


def _expm_bol_ad_bwd(order, squarings, interpret, tile_b, res, cotangents):
    Xr, Xi = res
    ct_r, ct_i = cotangents
    n, _, L = Xr.shape
    # lane budget: ~16M matrix elements per chunk (~256 MB of f32 planes of
    # linearization residue); cap the sequential chunk count at 64 for
    # pathological divisors
    budget = max(1, (1 << 24) // (n * n))
    chunk = _largest_divisor_leq(L, budget)
    if L // chunk > 64:
        chunk = L // _largest_divisor_leq(L, 64)
    n_chunks = L // chunk

    # The twin evaluates the kernel's EXACT Horner+squarings recursion in the
    # same (n, n, L) batch-on-lanes layout, with per-lane "matmuls" written
    # as broadcast-multiply-reduce. Crucial on TPU: einsum/dot_general here
    # makes XLA transpose lanes to a leading batch axis and pad the (n, n)
    # minors onto (8, 128) tiles (measured 1.6x memory expansion and a 100x
    # slowdown + OOM at full width); the reduce form keeps lanes on the
    # minor axis and compiles to fused VPU multiply-adds (measured 771
    # ns/lane for the full VJP at n=10 — HBM-bound).
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

    def one_chunk(args):
        xr, xi, cr, ci = args
        _, vjp = jax.vjp(xla_twin, xr, xi)
        return vjp((cr, ci))

    if n_chunks == 1:
        return one_chunk((Xr, Xi, ct_r, ct_i))

    split = lambda a: jnp.moveaxis(a.reshape(n, n, n_chunks, L // n_chunks), 2, 0)
    gr, gi = jax.lax.map(
        one_chunk, (split(Xr), split(Xi), split(ct_r), split(ct_i))
    )
    join = lambda g: jnp.moveaxis(g, 0, 2).reshape(n, n, L)
    return join(gr), join(gi)


expm_taylor_bol_ad.defvjp(_expm_bol_ad_fwd, _expm_bol_ad_bwd)
