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


def _kernel(n, m, T, scale, order, squarings, coeff, s, *refs):
    (
        gr_ref, gi_ref,            # (1, 1, n, n) this step's generator
        y0r_ref, y0i_ref,          # (1, n, m)
        outr_ref, outi_ref,        # (1, n, m)
        yr, yi,                    # (n, m) running state
        powr, powi,                # (s, n, n) X^1..X^s
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
        yr[...] = y0r_ref[0]
        yi[...] = y0i_ref[0]

    # scaled step generator X = G dt / 2^squarings and its powers X^2..X^s
    powr[0] = gr_ref[0, 0] * scale
    powi[0] = gi_ref[0, 0] * scale
    for i in range(1, s):
        r_, i_ = cprod(powr[i - 1], powi[i - 1], powr[0], powi[0], n, wide_n)
        powr[i] = r_
        powi[i] = i_

    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(f)

    def block(j):
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
            br = br + coeff[k] * powr[i - 1]
            term_i = coeff[k] * powi[i - 1]
            bi = term_i if bi is None else bi + term_i
        if bi is None:
            bi = jnp.zeros((n, n), f)
        return br, bi

    # Horner in X^s (identical to expm_taylor's PS evaluation order)
    mtop = -(-(order + 1) // s) - 1
    if s * mtop == order:
        br, bi = block(mtop - 1)
        pr = br + coeff[order] * powr[s - 1]
        pi = bi + coeff[order] * powi[s - 1]
        mtop -= 1
    else:
        pr, pi = block(mtop)
    for j in range(mtop - 1, -1, -1):
        qr, qi = cprod(powr[s - 1], powi[s - 1], pr, pi, n, wide_n)
        br, bi = block(j)
        pr = br + qr
        pi = bi + qi

    for _ in range(squarings):
        pr, pi = cprod(pr, pi, pr, pi, n, wide_n)

    new_r, new_i = cprod(pr, pi, yr[...], yi[...], m, wide_y)
    yr[...] = new_r
    yi[...] = new_i

    @pl.when(t == T - 1)
    def _out():
        outr_ref[0] = yr[...]
        outi_ref[0] = yi[...]


@functools.partial(
    jax.jit, static_argnames=("dt", "order", "squarings", "interpret")
)
def _expm_chain_fused_jit(
    generators, y0, dt: float, order: int, squarings: int, interpret: bool
):
    T, b, n, _ = generators.shape
    m = y0.shape[-1]
    f = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    gr = jnp.real(generators).astype(f)
    gi = jnp.imag(generators).astype(f)
    y0r = jnp.real(y0).astype(f)
    y0i = jnp.imag(y0).astype(f)

    s = max(2, math.isqrt(order))
    coeff = tuple(1.0 / math.factorial(k) for k in range(order + 1))
    kernel = functools.partial(
        _kernel, n, m, T, float(dt) / (2.0**squarings), int(order),
        int(squarings), coeff, s,
    )
    g_spec = pl.BlockSpec(
        (1, 1, n, n), lambda bb, tt: (tt, bb, 0, 0), memory_space=pltpu.VMEM
    )
    y_spec = pl.BlockSpec(
        (1, n, m), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    outr, outi = pl.pallas_call(
        kernel,
        grid=(b, T),
        in_specs=[g_spec, g_spec, y_spec, y_spec],
        out_specs=[y_spec, y_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, m), f)] * 2,
        scratch_shapes=[
            pltpu.VMEM((n, m), f),
            pltpu.VMEM((n, m), f),
            pltpu.VMEM((s, n, n), f),
            pltpu.VMEM((s, n, n), f),
            pltpu.VMEM((2 * n, n), f),
            pltpu.VMEM((n, 2 * n), f),
            pltpu.VMEM((n, 2 * m), f),
        ],
        interpret=interpret,
    )(gr, gi, y0r, y0i)
    return outr + 1j * outi


def expm_chain_fused(
    generators, dt: float, y0, order: int = 12, squarings: int = 2,
    interpret: bool = False,
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
    )
    return out[0] if unbatched else out
