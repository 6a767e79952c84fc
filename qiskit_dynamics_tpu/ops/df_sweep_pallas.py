r"""Fused Pallas kernel for the double-float32 Magnus sweep.

Same math as :func:`.df_sweep.sweep_expm_magnus_df` (order-4/-6 Magnus step
rules in compensated double-float32), but executed as one Pallas program per
``(lane-tile, step)`` grid cell with ALL intermediates VMEM-resident.

Why: the XLA formulation is HBM-bound — the broadcast df matmul
materializes ``(n, n, n, B)`` temporaries, and the measured bandwidth on the
CR benchmark sits at ~80% of HBM peak while the VPU idles. In-kernel, the
same matmuls run on VMEM-resident ``(n, n, TILE_B)`` planes with zero HBM
round trips between operations; only the per-step signal coefficients and
phase tables stream in.

Layout mirrors :mod:`.chain_apply`: grid ``(B/TILE_B, T)`` with the step
axis innermost; the df state lives in the revisited output window
(4 planes: re_hi, re_lo, im_hi, im_lo). The df arithmetic helpers are the
contraction-immune EFTs of :mod:`.df32` — validated inside Mosaic by
``tests/test_df32.py`` (two_sum exact, two_prod error O(eps^2)).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df32
from .df_sweep import MAGNUS_NODES, _P2

__all__ = ["sweep_expm_magnus_df_pallas"]


def _split_f64(x: float):
    """Host split of a float64 scalar into (hi, lo) float32 python floats."""
    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    return float(hi), float(lo)


def _c_of(refs, idx=...):
    """Load a complex df value from 4 planes (re_hi, re_lo, im_hi, im_lo)."""
    return (refs[0][idx], refs[1][idx]), (refs[2][idx], refs[3][idx])


def _store_c(refs, idx, z):
    refs[0][idx] = z[0][0]
    refs[1][idx] = z[0][1]
    refs[2][idx] = z[1][0]
    refs[3][idx] = z[1][1]


def _tree_sum(z, axis: int):
    """Pairwise compensated sum of a complex df value over ``axis``."""

    def take(x, sl):
        idx = (slice(None),) * axis + (sl,)
        return x[idx]

    size = z[0][0].shape[axis]
    while size > 1:
        half = size // 2
        a = jax.tree_util.tree_map(lambda x: take(x, slice(0, half)), z)
        b = jax.tree_util.tree_map(lambda x: take(x, slice(half, 2 * half)), z)
        s = df32.cadd(a, b)
        if size % 2:
            rest = jax.tree_util.tree_map(lambda x: take(x, slice(2 * half, size)), z)
            s = jax.tree_util.tree_map(
                lambda u, v: jnp.concatenate([u, v], axis=axis), s, rest
            )
        z = s
        size = half + size % 2
    return jax.tree_util.tree_map(lambda x: jnp.squeeze(x, axis=axis), z)


def _kernel(
    n: int,
    k: int,
    n_nodes: int,
    order: int,
    magnus_order: int,
    unroll: bool,
    consts,  # dict of (hi, lo) python-float pairs
    # inputs
    statr_h, statr_l, stati_h, stati_l,          # (n, n)
    opsr_h, opsr_l, opsi_h, opsi_l,              # (k, n, n)
    cos_h, cos_l, sin_h, sin_l,                  # (1, n_nodes, n, n)
    c_h, c_l,                                    # (1, n_nodes, k, TILE)
    y0r_h, y0r_l, y0i_h, y0i_l,                  # (n, TILE)
    # outputs (revisited df state planes)
    outr_h, outr_l, outi_h, outi_l,              # (n, TILE)
    # scratch: per complex matrix, 4 planes of (n, n, TILE)
    *scratch,
):
    t = pl.program_id(1)
    out = (outr_h, outr_l, outi_h, outi_l)

    @pl.when(t == 0)
    def _():
        outr_h[...] = y0r_h[...]
        outr_l[...] = y0r_l[...]
        outi_h[...] = y0i_h[...]
        outi_l[...] = y0i_l[...]

    mats = [tuple(scratch[4 * i : 4 * i + 4]) for i in range(len(scratch) // 4)]
    g_mats = mats[:n_nodes]
    tmp1, tmp2, m_mat = mats[n_nodes : n_nodes + 3]

    def const(name):
        # (1, 1) vectors, not scalars: Mosaic's bitcast (used by the df32
        # split) is vector-only
        hi, lo = consts[name]
        return (jnp.full((1, 1), hi, jnp.float32), jnp.full((1, 1), lo, jnp.float32))

    def build_generator(node, dst):
        """dst <- P(tau_node) * (static + sum_j c_j ops_j), df complex."""
        acc_re = (statr_h[...][..., None], statr_l[...][..., None])
        acc_im = (stati_h[...][..., None], stati_l[...][..., None])
        for j in range(k):
            c = (c_h[0, node, j][None, None, :], c_l[0, node, j][None, None, :])
            op_re = (opsr_h[j][..., None], opsr_l[j][..., None])
            op_im = (opsi_h[j][..., None], opsi_l[j][..., None])
            acc_re = df32.add(acc_re, df32.mul(op_re, c))
            acc_im = df32.add(acc_im, df32.mul(op_im, c))
        cos_b = (cos_h[0, node][..., None], cos_l[0, node][..., None])
        sin_b = (sin_h[0, node][..., None], sin_l[0, node][..., None])
        g_re = df32.sub(df32.mul(acc_re, cos_b), df32.mul(acc_im, sin_b))
        g_im = df32.add(df32.mul(acc_re, sin_b), df32.mul(acc_im, cos_b))
        _store_c(dst, ..., (g_re, g_im))

    def cmatmul_into(a, b, dst, scale=None, accumulate=False, negate=False):
        """dst (+)= [scale *] (A @ B), all df complex (n, n, TILE) scratch."""

        def row(i, _):
            a_row = _c_of(a, (i,))  # (n, TILE)
            a_b = jax.tree_util.tree_map(lambda x: x[:, None, :], a_row)
            prod = df32.cmul(a_b, _c_of(b))  # (n, n, TILE)
            val = _tree_sum(prod, axis=0)  # (n, TILE)
            if scale is not None:
                val = df32.cmul_real(val, const(scale))
            if negate:
                val = df32.cneg(val)
            if accumulate:
                val = df32.cadd(_c_of(dst, (i,)), val)
            _store_c(dst, (i,), val)
            return 0

        if unroll:
            for i in range(n):
                row(i, 0)
        else:
            jax.lax.fori_loop(0, n, row, 0)

    def axpy_mats(dst, srcs_scales):
        """dst <- sum of scale*src over (src, scale-name|None) pairs."""

        def row(i, _):
            acc = None
            for src, scale in srcs_scales:
                v = _c_of(src, (i,))
                if scale is not None:
                    v = df32.cmul_real(v, const(scale))
                acc = v if acc is None else df32.cadd(acc, v)
            _store_c(dst, (i,), acc)
            return 0

        jax.lax.fori_loop(0, n, row, 0)

    for node in range(n_nodes):
        build_generator(node, g_mats[node])

    if magnus_order == 2:
        # tmp1 <- [G2, G1]; M <- (dt/2)(G1+G2) + p2 dt^2 tmp1
        cmatmul_into(g_mats[1], g_mats[0], tmp1)
        cmatmul_into(g_mats[0], g_mats[1], tmp1, accumulate=True, negate=True)
        axpy_mats(
            m_mat,
            [(g_mats[0], "half_dt"), (g_mats[1], "half_dt"), (tmp1, "p2_dt2")],
        )
    else:
        # order-6 rule (same combination as df_sweep._df_scan):
        # a1 = dt g2, a2 = c0dt (g3-g1), a3 = c1dt (g3-2g2+g1)
        # reuse: g1 <- a1, g2 <- a2, g3 <- a3 (computed from rows in place is
        # unsafe; go through tmp per row instead)
        def alphas(i, _):
            g1 = _c_of(g_mats[0], (i,))
            g2 = _c_of(g_mats[1], (i,))
            g3 = _c_of(g_mats[2], (i,))
            a1 = df32.cmul_real(g2, const("dt"))
            a2 = df32.cmul_real(df32.csub(g3, g1), const("c0dt"))
            a3 = df32.cmul_real(
                df32.cadd(df32.csub(g3, g2), df32.csub(g1, g2)), const("c1dt")
            )
            _store_c(g_mats[0], (i,), a1)
            _store_c(g_mats[1], (i,), a2)
            _store_c(g_mats[2], (i,), a3)
            return 0

        jax.lax.fori_loop(0, n, alphas, 0)
        a1, a2, a3 = g_mats[0], g_mats[1], g_mats[2]

        # tmp1 <- comm1 = [a1, a2]
        cmatmul_into(a1, a2, tmp1)
        cmatmul_into(a2, a1, tmp1, accumulate=True, negate=True)
        # tmp2 <- (2 a3 + comm1)
        axpy_mats(tmp2, [(a3, "two"), (tmp1, None)])
        # m <- [tmp2, a1] / 60  -> store comm2 into m_mat temporarily
        cmatmul_into(tmp2, a1, m_mat)
        cmatmul_into(a1, tmp2, m_mat, accumulate=True, negate=True)

        # tmp2 <- right = a2 + comm2/60 ; then left into a2's slot:
        def right_rows(i, _):
            comm2 = df32.cmul_real(_c_of(m_mat, (i,)), const("inv60"))
            _store_c(tmp2, (i,), df32.cadd(_c_of(a2, (i,)), comm2))
            return 0

        jax.lax.fori_loop(0, n, right_rows, 0)

        # a2 <- left = comm1 - (20 a1 + a3)
        def left_rows(i, _):
            val = df32.csub(
                _c_of(tmp1, (i,)),
                df32.cadd(
                    df32.cmul_real(_c_of(a1, (i,)), const("twenty")),
                    _c_of(a3, (i,)),
                ),
            )
            _store_c(a2, (i,), val)
            return 0

        jax.lax.fori_loop(0, n, left_rows, 0)

        # tmp1 <- [left, right]
        cmatmul_into(a2, tmp2, tmp1)
        cmatmul_into(tmp2, a2, tmp1, accumulate=True, negate=True)
        # M <- a1 + a3/12 + tmp1/240
        axpy_mats(m_mat, [(a1, None), (a3, "inv12"), (tmp1, "inv240")])

    # y <- expm(M) y via Horner mat-vec Taylor (unrolled; constants static)
    y = _c_of(out)
    v = y
    for j in range(order, 0, -1):
        # prod[i, m] = M[i, m] * v[m]; sum over m (axis 1)
        prod = df32.cmul(_c_of(m_mat), jax.tree_util.tree_map(lambda x: x[None], v))
        mv = _tree_sum(prod, axis=1)
        inv_hi, inv_lo = _split_f64(1.0 / j)
        inv = (jnp.full((1, 1), inv_hi, jnp.float32), jnp.full((1, 1), inv_lo, jnp.float32))
        v = df32.cadd(y, df32.cmul_real(mv, inv))
    _store_c(out, ..., v)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dt", "t0", "magnus_order", "order", "tile_b", "interpret", "unroll"
    ),
)
def _pallas_df_sweep(
    statd, opsd, phases, coefs, y0d, dt, t0, magnus_order, order, tile_b, interpret,
    unroll,
):
    """Jitted wrapper: all inputs are df plane tuples (see caller)."""
    n = statd[0].shape[0]
    k = opsd[0].shape[0]
    T, n_nodes = coefs[0].shape[0], coefs[0].shape[1]
    B = y0d[0].shape[-1]

    consts = {
        "half_dt": _split_f64(np.float64(dt) / 2),
        "p2_dt2": _split_f64(_P2 * np.float64(dt) ** 2),
        "dt": _split_f64(np.float64(dt)),
        "c0dt": _split_f64(np.sqrt(15.0) / 3 * np.float64(dt)),
        "c1dt": _split_f64(10.0 / 3 * np.float64(dt)),
        "two": _split_f64(2.0),
        "twenty": _split_f64(20.0),
        "inv12": _split_f64(1.0 / 12),
        "inv60": _split_f64(1.0 / 60),
        "inv240": _split_f64(1.0 / 240),
    }

    grid = (B // tile_b, T)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, t: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    phase_spec = pl.BlockSpec(
        (1, n_nodes, n, n), lambda b, t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    coef_spec = pl.BlockSpec(
        (1, n_nodes, k, tile_b), lambda b, t: (t, 0, 0, b), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec((n, tile_b), lambda b, t: (0, b), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, n, k, n_nodes, order, magnus_order, unroll, consts
    )
    n_scratch_mats = n_nodes + 3
    scratch = [pltpu.VMEM((n, n, tile_b), jnp.float32)] * (4 * n_scratch_mats)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [full(statd[0])] * 4
            + [full(opsd[0])] * 4
            + [phase_spec] * 4
            + [coef_spec] * 2
            + [state_spec] * 4
        ),
        out_specs=[state_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((n, B), jnp.float32)] * 4,
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        *statd, *opsd, phases[0][0], phases[0][1], phases[1][0], phases[1][1],
        coefs[0], coefs[1], *y0d,
    )
    return outs


def sweep_expm_magnus_df_pallas(
    static_op,
    operators,
    frame_omega,
    coefficients,
    y0,
    dt: float,
    t0: float = 0.0,
    magnus_order: int = 3,
    order: int = 12,
    tile_b: int = 128,
    interpret: bool = False,
    unroll: bool = True,
):
    r"""Pallas-fused df32 Magnus sweep (drop-in for
    :func:`.df_sweep.sweep_expm_magnus_df`, plus ``tile_b``/``interpret``).

    Host-facing float64 I/O; ``B`` is padded to a multiple of ``tile_b``
    internally. See the module docstring for the performance rationale.
    """
    if magnus_order not in MAGNUS_NODES:
        raise ValueError(f"magnus_order must be one of {sorted(MAGNUS_NODES)}.")
    static_op = np.asarray(static_op, dtype=np.complex128)
    operators = np.asarray(operators, dtype=np.complex128)
    frame_omega = np.asarray(frame_omega, dtype=np.float64)
    coefficients = np.asarray(coefficients, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.complex128)
    T, n_nodes, k, B = coefficients.shape
    n = y0.shape[0]
    nodes = MAGNUS_NODES[magnus_order]
    if n_nodes != len(nodes):
        raise ValueError(
            f"coefficients have {n_nodes} node samples; magnus_order="
            f"{magnus_order} needs {len(nodes)}."
        )

    pad = (-B) % tile_b
    if pad:
        coefficients = np.concatenate(
            [coefficients, np.repeat(coefficients[..., :1], pad, axis=-1)], axis=-1
        )
        y0 = np.concatenate([y0, np.repeat(y0[:, :1], pad, axis=-1)], axis=-1)

    tau = t0 + dt * (np.arange(T)[:, None] + nodes[None, :])
    ph = frame_omega[None, None] * tau[:, :, None, None]
    phases = (df32.from_f64(np.cos(ph)), df32.from_f64(np.sin(ph)))

    def c4(x):
        (rh, rl), (ih, il) = df32.cfrom_f64(x)
        return (rh, rl, ih, il)

    outs = _pallas_df_sweep(
        c4(static_op), c4(operators), phases, df32.from_f64(coefficients),
        c4(y0), float(dt), float(t0), int(magnus_order), int(order),
        int(tile_b), bool(interpret), bool(unroll),
    )
    re = np.asarray(outs[0], np.float64) + np.asarray(outs[1], np.float64)
    im = np.asarray(outs[2], np.float64) + np.asarray(outs[3], np.float64)
    out = re + 1j * im
    return out[:, :B]
