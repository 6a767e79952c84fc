r"""Fused expm-propagator chains: the whole step in VMEM.

``benchmarks.expm_chain`` (north-star metric 2, BASELINE.md) steps
``y <- expm(G_t dt) @ y`` under one ``lax.scan``; its cost at dim 256 is 8
complex matmuls per step (5 Paterson-Stockmeyer + 2 squarings + 1 apply,
:mod:`.expm`). Under XLA each ``dot`` round-trips its operands/result
through HBM — ~0.75 MB per matmul, comparable to the matmul's own MXU time
at ``n = 256`` — so the measured chain rate (~20 TFLOP/s-real,
BENCHMARKS.md "dim-256 expm" section) sits well below the f32-true MXU
ceiling. This kernel fuses the ENTIRE step: one Pallas program per batch
element holds the scaled generator, its Paterson-Stockmeyer powers, the
propagator, and the running state in VMEM scratch across the whole time
loop; per step the only HBM traffic is the ``(n, n)`` generator block
(auto-pipelined by the Pallas grid machinery while the previous step
computes).

Layout: grid ``(b, T)`` with the time axis minor — the TPU grid executes
sequentially, so the ``(n, m)`` state scratch carries across the time steps
of one batch element and resets at ``t = 0``. Complex matmuls use the
wide-product real form (one ``(2n, n, 2m)`` f32 MXU pass per complex
product, as in :mod:`.member_sweep`). The Taylor/Paterson-Stockmeyer
polynomial is the SAME as :func:`.expm.expm_taylor` (identical coefficients
and evaluation order), so results agree with ``benchmarks.expm_chain`` to
f32 matmul roundoff.

Reference context: the reference evaluates propagators with scipy/jax
``expm`` per step (``/root/reference/qiskit_dynamics/solvers/fixed_step_solvers.py:321-403``);
there is no fused-chain counterpart there.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["expm_chain_fused"]


def _kernel(n, m, T, bb, scale, order, squarings, coeff, s, *refs):
    (
        gr_ref, gi_ref,            # (1, bb, n, n) this step's generators
        y0r_ref, y0i_ref,          # (bb, n, m)
        outr_ref, outi_ref,        # (bb, n, m)
        yr, yi,                    # (bb, n, m) running states
        powr, powi,                # (bb, s, n, n) X^1..X^s per element
        tall,                      # (2n, n) wide-product operands
        wide_n,                    # (n, 2n)
        wide_y,                    # (n, 2m)
    ) = refs
    f = yr.dtype
    n2 = 2 * n
    t = pl.program_id(1)

    def cprod(ar, ai, br, bi, mm, wide):
        """Complex product (ar + i ai) @ (br + i bi) via ONE real MXU pass."""
        tall[0:n, :] = ar
        tall[n:n2, :] = ai
        wide[:, 0:mm] = br
        wide[:, mm : 2 * mm] = bi
        W = jnp.dot(tall[...], wide[...], preferred_element_type=f)
        return (
            W[0:n, 0:mm] - W[n:n2, mm : 2 * mm],
            W[0:n, mm : 2 * mm] + W[n:n2, 0:mm],
        )

    @pl.when(t == 0)
    def _init():
        yr[...] = y0r_ref[...]
        yi[...] = y0i_ref[...]

    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(f)

    # The bb batch elements of this program are interleaved stage-by-stage:
    # consecutive MXU dots then belong to INDEPENDENT elements, so the
    # systolic pipeline never stalls on a data dependency (the PS/Horner/
    # squaring chain is inherently serial within one element).
    for e in range(bb):
        powr[e, 0] = gr_ref[0, e] * scale
        powi[e, 0] = gi_ref[0, e] * scale
    for i in range(1, s):
        for e in range(bb):
            r_, i_ = cprod(
                powr[e, i - 1], powi[e, i - 1], powr[e, 0], powi[e, 0], n, wide_n
            )
            powr[e, i] = r_
            powi[e, i] = i_

    def block(e, j):
        """B_j = sum_i c_{js+i} X^i (i < s): VPU combos, no matmul.

        Same block structure as ``expm_taylor`` — X^0 contributes to the
        real part only.
        """
        br = coeff[s * j] * eye
        bi = None
        for i in range(1, s):
            k = s * j + i
            if k > order:
                break
            br = br + coeff[k] * powr[e, i - 1]
            term_i = coeff[k] * powi[e, i - 1]
            bi = term_i if bi is None else bi + term_i
        if bi is None:
            bi = jnp.zeros((n, n), f)
        return br, bi

    # Horner in X^s (identical to expm_taylor's PS evaluation order)
    mtop0 = -(-(order + 1) // s) - 1
    ps = [None] * bb
    for e in range(bb):
        mtop = mtop0
        if s * mtop == order:
            br, bi = block(e, mtop - 1)
            ps[e] = (br + coeff[order] * powr[e, s - 1],
                     bi + coeff[order] * powi[e, s - 1])
            mtop -= 1
        else:
            ps[e] = block(e, mtop)
    mtop0 = mtop0 - 1 if s * mtop0 == order else mtop0
    for j in range(mtop0 - 1, -1, -1):
        for e in range(bb):
            pr, pi = ps[e]
            qr, qi = cprod(powr[e, s - 1], powi[e, s - 1], pr, pi, n, wide_n)
            br, bi = block(e, j)
            ps[e] = (br + qr, bi + qi)

    for _ in range(squarings):
        for e in range(bb):
            pr, pi = ps[e]
            ps[e] = cprod(pr, pi, pr, pi, n, wide_n)

    for e in range(bb):
        pr, pi = ps[e]
        new_r, new_i = cprod(pr, pi, yr[e], yi[e], m, wide_y)
        yr[e] = new_r
        yi[e] = new_i

    @pl.when(t == T - 1)
    def _out():
        outr_ref[...] = yr[...]
        outi_ref[...] = yi[...]


@functools.partial(
    jax.jit, static_argnames=("dt", "order", "squarings", "interpret", "block_b")
)
def _expm_chain_fused_jit(
    generators, y0, dt: float, order: int, squarings: int, interpret: bool,
    block_b: int,
):
    T, b, n, _ = generators.shape
    m = y0.shape[-1]
    f = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    gr = jnp.real(generators).astype(f)
    gi = jnp.imag(generators).astype(f)
    y0r = jnp.real(y0).astype(f)
    y0i = jnp.imag(y0).astype(f)

    s = max(2, math.isqrt(order))
    # clamp block_b to the Mosaic scoped-VMEM stack budget (~16 MB on v5e;
    # measured: bb=8 at n=m=256 requested 42.6 MB and failed to compile).
    # Conservative per-element estimate: powers (2 s n^2) + state scratch
    # (2 n m) + generator block (2 n^2) + y0/out blocks (4 n m) + the live
    # propagator values (2 n^2), f32 each.
    per_bb = 4 * (2 * s * n * n + 2 * n * m + 2 * n * n + 4 * n * m + 2 * n * n)
    fixed = 4 * (2 * n * n + 2 * n * n + 2 * n * m) + (2 << 20)
    bb_budget = max(1, int(((14 << 20) - fixed) // per_bb))
    bb = max(1, min(int(block_b), b, bb_budget))
    while b % bb:
        bb -= 1
    coeff = tuple(1.0 / math.factorial(k) for k in range(order + 1))
    kernel = functools.partial(
        _kernel, n, m, T, bb, float(dt) / (2.0**squarings), int(order),
        int(squarings), coeff, s,
    )
    g_spec = pl.BlockSpec(
        (1, bb, n, n), lambda bi_, tt: (tt, bi_, 0, 0), memory_space=pltpu.VMEM
    )
    y_spec = pl.BlockSpec(
        (bb, n, m), lambda bi_, tt: (bi_, 0, 0), memory_space=pltpu.VMEM
    )
    outr, outi = pl.pallas_call(
        kernel,
        grid=(b // bb, T),
        in_specs=[g_spec, g_spec, y_spec, y_spec],
        out_specs=[y_spec, y_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, m), f)] * 2,
        scratch_shapes=[
            pltpu.VMEM((bb, n, m), f),
            pltpu.VMEM((bb, n, m), f),
            pltpu.VMEM((bb, s, n, n), f),
            pltpu.VMEM((bb, s, n, n), f),
            pltpu.VMEM((2 * n, n), f),
            pltpu.VMEM((n, 2 * n), f),
            pltpu.VMEM((n, 2 * m), f),
        ],
        interpret=interpret,
    )(gr, gi, y0r, y0i)
    return outr + 1j * outi


def expm_chain_fused(
    generators, dt: float, y0, order: int = 12, squarings: int = 2,
    interpret: bool = False, block_b: int = 1,
):
    """Fused-VMEM expm-propagator chain ``y <- expm(G_t dt) @ y`` over steps.

    Drop-in fused alternative to :func:`..benchmarks.expm_chain` (same
    polynomial as :func:`.expm.expm_taylor`, same step semantics): one
    Pallas program per batch element keeps the propagator computation and
    the running state in VMEM across all ``T`` steps.

    Args:
        generators: ``(T, b, n, n)`` or ``(T, n, n)`` complex per-step
            generators.
        dt: step size.
        y0: ``(b, n, m)`` / ``(n, m)`` states or propagators matching
            ``generators``' batching.
        order: Taylor order (>= 6; the small-order Horner fallback of
            ``expm_taylor`` is not replicated here).
        squarings: static scaling-and-squaring steps.
        interpret: Pallas interpreter mode (CPU tests).
        block_b: batch elements per Pallas program (clipped to a divisor of
            ``b`` and to the scoped-VMEM budget). Within a program the
            elements' stages are INTERLEAVED so consecutive MXU dots are
            data-independent. Measured on chip at n=256 (squarings=1 chain):
            block_b=1 76.8 us/step vs block_b=2 85.5 — the extra VMEM
            pressure costs more than the pipeline bubbles it hides, so 1 is
            the default and >1 is an experiment knob (results bit-identical).

    Returns:
        ``(b, n, m)`` / ``(n, m)`` final states, complex.
    """
    if order < 6:
        raise ValueError("expm_chain_fused requires order >= 6.")
    generators = jnp.asarray(generators)
    y0 = jnp.asarray(y0)
    unbatched = generators.ndim == 3
    if unbatched:
        generators = generators[:, None]
        y0 = y0[None]
    if y0.ndim != 3 or generators.ndim != 4:
        raise ValueError(
            "expected generators (T, b, n, n) with y0 (b, n, m) "
            f"(or unbatched); got {generators.shape} / {y0.shape}."
        )
    out = _expm_chain_fused_jit(
        generators, y0, dt=float(dt), order=int(order),
        squarings=int(squarings), interpret=bool(interpret),
        block_b=int(block_b),
    )
    return out[0] if unbatched else out
