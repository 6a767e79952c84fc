r"""Fused Pallas sweep solver: one kernel for an entire fixed-step LMDE sweep.

The standard sweep path (``jit(vmap(solve))``) issues hundreds of small
batched ops per solve; even with batched generators, TPU pads ``(B, n, n)``
complex stacks 8x on the minormost tile and every step costs several kernel
dispatches. This module instead runs the ENTIRE fixed-step solve for a tile
of sweep members inside one Pallas program:

- layout is batch-on-lanes: every matrix quantity is ``(n, n, TILE_B)`` /
  state ``(n, TILE_B)`` with the sweep batch on the lane dimension — full
  (8, 128) tiles, zero padding waste;
- per step, the frame-basis generator is assembled in VMEM from the operator
  stack and per-step signal coefficients, rotated by the frame phase matrix
  (``cos/sin`` of a precomputed frequency-difference matrix — reference math:
  ``rotating_frame.py:286-370``), combined with the Magnus-2 commutator rule
  (Gauss points, reference ``fixed_step_solvers.py:321-403``), and applied
  to the state via a branch-free Horner mat-vec Taylor ``expm(M) y`` — the
  propagator matrix is never formed;
- the time loop is a ``fori_loop`` over VMEM-resident buffers: per B-tile the
  whole trajectory runs with ZERO HBM round-trips for intermediates.

Used by the CR-sweep benchmark; validated against the generic solver path.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trig_reduce import reduced_phase, split_const, step_time_df

__all__ = ["sweep_expm_magnus2"]

_GAUSS_C1 = 0.5 - np.sqrt(3) / 6
_GAUSS_C2 = 0.5 + np.sqrt(3) / 6
_P2 = np.sqrt(3) / 12

# 3-point Gauss-Legendre nodes + Magnus order-3 (6th-order) combination
# coefficients (Blanes et al. 2009; same rule as
# solvers/fixed_step_solvers.get_exponential_take_step magnus_order=3)
_GAUSS3_D1 = 0.5 - np.sqrt(15) / 10
_GAUSS3_D2 = 0.5
_GAUSS3_D3 = 0.5 + np.sqrt(15) / 10
_M3_C0 = np.sqrt(15) / 3
_M3_C1 = 10.0 / 3

# row loops are Python-unrolled up to this n, fori_loop'd beyond (compile size)
_UNROLL_N = 16


def _make_rows(n: int):
    """Row-loop strategy shared by the batch-on-lanes kernels.

    Returns ``rows(body)`` running ``body(i)`` for every row i. Small n:
    Python-unrolled (the benchmarked shape — full VPU ILP). Large n: a
    ``fori_loop`` with dynamic row indexing — O(n) program size instead of
    O(n^2), which keeps Mosaic compile time sane up to n = dim^2 = 64
    (measured: dim-27 adaptive kernel compile 260 s -> 54 s at identical
    runtime); the inner length-n reductions stay unrolled."""
    if n <= _UNROLL_N:
        def rows(body):
            for i in range(n):
                body(i)
    else:
        def rows(body):
            jax.lax.fori_loop(0, n, lambda i, c: (body(i), 0)[1], 0)
    return rows


def _validate_eval_slots(eval_slots, T: int) -> int:
    """Validate a trajectory slot table; returns ``n_eval``.

    The non-negative entries must be exactly a permutation of
    ``range(n_eval)`` — a duplicate or gapped slot would leave trajectory
    slots unwritten (uninitialized VMEM in the Pallas kernel, silent zeros
    in the XLA engine) with no NaN-poison to flag it.
    """
    if len(eval_slots) != T:
        raise ValueError(f"eval_slots must have length T={T}")
    marked = sorted(int(s) for s in eval_slots if int(s) >= 0)
    if not marked:
        raise ValueError("eval_slots must mark at least one step")
    if marked != list(range(len(marked))):
        raise ValueError(
            "the non-negative eval_slots values must be exactly a "
            f"permutation of range(n_eval); got {marked}."
        )
    return len(marked)


def _kernel(
    n: int,
    k: int,
    T: int,
    dt: float,
    t0: float,
    order: int,
    mode: str,
    n_eval: int,
    # refs (with ``n_eval > 0``, ``slot_ref`` (T, 1) int32 follows coef_ref
    # and trajectory outputs (n_eval, n, TILE_B) follow outr/outi):
    *refs_and_scratch,
):
    """One B-tile: full T-step Magnus-2 propagation in VMEM."""
    refs = refs_and_scratch
    statr_ref, stati_ref = refs[0], refs[1]   # (n, n) static (frame basis)
    opsr_ref, opsi_ref = refs[2], refs[3]     # (k, n, n) signal operators
    omega_ref = refs[4]                       # (n, n) frame freq differences
    omegal_ref = refs[5]                      # (n, n) f32-split lo half
    coef_ref = refs[6]                        # (T, 2, k, TILE_B) Gauss signals
    pos = 7
    slot_ref = None
    if n_eval > 0:
        slot_ref = refs[pos]                  # (T, 1) int32 step -> eval slot
        pos += 1
    y0r_ref, y0i_ref = refs[pos], refs[pos + 1]    # (n, TILE_B)
    outr_ref, outi_ref = refs[pos + 2], refs[pos + 3]  # (n, TILE_B) final
    pos += 4
    evalr_ref = evali_ref = None
    if n_eval > 0:
        evalr_ref, evali_ref = refs[pos], refs[pos + 1]  # (n_eval, n, TILE_B)
        pos += 2
    scratch = refs[pos:]
    cosb, sinb = scratch[-2], scratch[-1]  # (n, n) frame phase tables
    scratch = scratch[:-2]
    if mode == "matvec":
        g1r, g1i, g2r, g2i = scratch[:4]
        yr, yi, vr, vi, u1r, u1i, u2r, u2i, t1r, t1i = scratch[4:]
    else:
        g1r, g1i, g2r, g2i, mr, mi = scratch[:6]
        vr, vi, wr, wi, yr, yi = scratch[6:]

    rows = _make_rows(n)

    def build_generator(step, gauss_idx, gauss_c, out_r, out_i):
        """out <- P(tau) * (static + sum_j c_j ops_j); tau = t0 + (step+c) dt."""
        # match the scratch/ref dtype (f32 on chip; f64 under x64 interpret —
        # a hard f32 cast here silently truncated the static op in f64 tests)
        ftype = statr_ref.dtype
        # frame phase tables ONCE per Gauss point as a full (n, n) EFT+trig,
        # hoisted out of the row loop (per-row EFT ops multiply the Mosaic
        # program size ~n-fold — measured 10x cold-compile regression on the
        # adaptive twin before hoisting)
        if ftype == jnp.float32:
            # f32: form tau as an EFT (hi, lo) pair and reduce the frame
            # phase mod 2pi — a plain f32 product loses ulp(|omega tau|) rad
            # (see ops/trig_reduce.py; the dominant error at large phases)
            tau_pair = step_time_df(
                step.astype(ftype),
                split_const(dt),
                split_const(t0 + gauss_c * dt),
            )
            ph = reduced_phase((omega_ref[...], omegal_ref[...]), tau_pair)
        else:
            tau = t0 + (step.astype(ftype) + gauss_c) * dt
            ph = omega_ref[...] * tau
        cosb[...] = jnp.cos(ph)
        sinb[...] = jnp.sin(ph)

        def row(i):
            # combo over operators; coefficients vary along lanes
            acc_r = jnp.broadcast_to(statr_ref[i][:, None], out_r.shape[1:]).astype(ftype)
            acc_i = jnp.broadcast_to(stati_ref[i][:, None], out_i.shape[1:]).astype(ftype)
            for j in range(k):
                c = coef_ref[step, gauss_idx, j][None, :]  # (1, TILE_B)
                acc_r = acc_r + c * opsr_ref[j, i][:, None]
                acc_i = acc_i + c * opsi_ref[j, i][:, None]
            # frame rotation: multiply by exp(i omega[i,:] tau) elementwise
            cos_p = cosb[i][:, None]
            sin_p = sinb[i][:, None]
            out_r[i] = acc_r * cos_p - acc_i * sin_p
            out_i[i] = acc_r * sin_p + acc_i * cos_p

        rows(row)

    def matmul_into(ar, ai, br, bi, cr, ci, alpha=1.0, beta=0.0):
        """C <- beta*C + alpha * A @ B (complex, batch on lanes)."""

        def row(i):
            acc_r = jnp.zeros(cr.shape[1:], cr.dtype)
            acc_i = jnp.zeros(ci.shape[1:], ci.dtype)
            for m in range(n):
                xr = ar[i, m][None, :]
                xi = ai[i, m][None, :]
                acc_r += xr * br[m] - xi * bi[m]
                acc_i += xr * bi[m] + xi * br[m]
            if beta == 0.0:
                cr[i] = alpha * acc_r
                ci[i] = alpha * acc_i
            else:
                cr[i] = beta * cr[i] + alpha * acc_r
                ci[i] = beta * ci[i] + alpha * acc_i

        rows(row)

    def matvec_into(ar, ai, xr, xi, outr, outi):
        """out <- A @ x (complex mat-vec, batch on lanes; out must not alias x)."""

        def row(i):
            acc_r = jnp.zeros(outr.shape[1:], outr.dtype)
            acc_i = jnp.zeros(outi.shape[1:], outi.dtype)
            for m in range(n):
                cr_ = ar[i, m]
                ci_ = ai[i, m]
                acc_r += cr_ * xr[m] - ci_ * xi[m]
                acc_i += cr_ * xi[m] + ci_ * xr[m]
            outr[i] = acc_r
            outi[i] = acc_i

        rows(row)

    def body_matvec(step, _):
        """Commutator-free step: M is never formed. Each Horner term applies
        M v = dt/2 (G1 v + G2 v) + p2 dt^2 (G2 (G1 v) - G1 (G2 v)) as four
        mat-vecs — O(4 order n^2 B) per step vs O(2 n^3 B) for the
        commutator matmuls, the win for large n (vectorized Lindblad,
        n = dim^2). Identical Magnus-2 polynomial as the matrix modes."""
        build_generator(step, 0, _GAUSS_C1, g1r, g1i)
        build_generator(step, 1, _GAUSS_C2, g2r, g2i)
        c1 = 0.5 * dt
        c2 = _P2 * dt * dt
        vr[...] = yr[...]
        vi[...] = yi[...]
        for kk in range(order, 0, -1):
            inv = 1.0 / kk
            matvec_into(g1r, g1i, vr, vi, u1r, u1i)   # u1 = G1 v
            matvec_into(g2r, g2i, vr, vi, u2r, u2i)   # u2 = G2 v
            matvec_into(g2r, g2i, u1r, u1i, t1r, t1i)  # t1 = G2 u1

            # v <- y + inv * (c1 (u1+u2) + c2 (t1 - G1 u2)), G1 u2 inline
            def row(i):
                acc_r = jnp.zeros(yr.shape[1:], yr.dtype)
                acc_i = jnp.zeros(yi.shape[1:], yi.dtype)
                for m in range(n):
                    cr_ = g1r[i, m]
                    ci_ = g1i[i, m]
                    acc_r += cr_ * u2r[m] - ci_ * u2i[m]
                    acc_i += cr_ * u2i[m] + ci_ * u2r[m]
                vr[i] = yr[i] + inv * (
                    c1 * (u1r[i] + u2r[i]) + c2 * (t1r[i] - acc_r)
                )
                vi[i] = yi[i] + inv * (
                    c1 * (u1i[i] + u2i[i]) + c2 * (t1i[i] - acc_i)
                )

            rows(row)
        yr[...] = vr[...]
        yi[...] = vi[...]
        return 0

    def body(step, _):
        # two Gauss-point generator samples
        build_generator(step, 0, _GAUSS_C1, g1r, g1i)
        build_generator(step, 1, _GAUSS_C2, g2r, g2i)

        # Magnus-2: M = dt (G1 + G2)/2 + p2 dt^2 (G2 G1 - G1 G2)
        if mode == "matrix_herm":
            # anti-Hermitian generators (G = -iH, frame rotation preserves):
            # G1 G2 = (G2 G1)^dagger, so the commutator is P - P^dagger with
            # P = G2 G1 — ONE matmul instead of two (the dominant O(n^3 B)
            # cost per step halves).
            matmul_into(g2r, g2i, g1r, g1i, mr, mi)  # P = G2 @ G1
            c2 = _P2 * dt * dt
            g1r[...] = g1r[...] + g2r[...]  # G1+G2 (G1 no longer needed)
            g1i[...] = g1i[...] + g2i[...]

            def herm_row(i):
                for m in range(n):
                    g2r[i, m] = (0.5 * dt) * g1r[i, m] + c2 * (mr[i, m] - mr[m, i])
                    g2i[i, m] = (0.5 * dt) * g1i[i, m] + c2 * (mi[i, m] + mi[m, i])

            rows(herm_row)
            Mr, Mi = g2r, g2i
        else:
            matmul_into(g2r, g2i, g1r, g1i, mr, mi, alpha=_P2 * dt * dt)
            matmul_into(g1r, g1i, g2r, g2i, mr, mi, alpha=-_P2 * dt * dt, beta=1.0)
            mr[...] = mr[...] + (0.5 * dt) * (g1r[...] + g2r[...])
            mi[...] = mi[...] + (0.5 * dt) * (g1i[...] + g2i[...])
            Mr, Mi = mr, mi

        # y <- expm(M) y via Horner MAT-VEC: v = y; for j = order..1:
        # v = y + (M v)/j. The propagator is never formed — each lane carries
        # a single state column, so this is O(order n^2 B) where the matrix
        # Taylor was O(order n^3 B) (measured ~2x kernel speedup at n=16;
        # identical polynomial, same step rule; measured on-chip: 50k ->
        # 89.5k sims/s on the 10k-point CR sweep).
        vr[...] = yr[...]
        vi[...] = yi[...]
        for kk in range(order, 0, -1):
            inv = 1.0 / kk
            matvec_into(Mr, Mi, vr, vi, wr, wi)
            vr[...] = yr[...] + inv * wr[...]
            vi[...] = yi[...] + inv * wi[...]
        yr[...] = vr[...]
        yi[...] = vi[...]
        return 0

    yr[...] = y0r_ref[...]
    yi[...] = y0i_ref[...]

    step_fn = body_matvec if mode == "matvec" else body

    def step_and_store(step, c):
        step_fn(step, c)
        if n_eval > 0:
            # trajectory output: after step s the state is y(t0 + (s+1) dt);
            # slot_ref maps the step index to its t_eval slot (-1: not kept)
            slot = slot_ref[step, 0]

            @pl.when(slot >= 0)
            def _store():
                def row(i):
                    evalr_ref[slot, i] = yr[i]
                    evali_ref[slot, i] = yi[i]

                rows(row)
        return 0

    jax.lax.fori_loop(0, T, step_and_store, 0)

    outr_ref[...] = yr[...]
    outi_ref[...] = yi[...]


def split_omega_host(frame_omega):
    """f32 (hi, lo) split of a frequency array, host-side when possible.

    Must be called BEFORE the jit boundary: without x64 JAX casts f64 inputs
    to f32 at the boundary, losing exactly the bits the lo half preserves
    (the representation error ``w 2^-24 t`` dominates large-phase trig).
    Under x64, or for traced values (bits already gone), lo is zero.
    """
    if jax.config.jax_enable_x64:
        om = jnp.asarray(frame_omega)
        return om, jnp.zeros_like(om)
    try:
        om = np.asarray(frame_omega)
    except Exception:  # traced value
        om = jnp.asarray(frame_omega).astype(jnp.float32)
        return om, jnp.zeros_like(om)
    from .trig_reduce import split_array

    hi, lo = split_array(om)
    return jnp.asarray(hi), jnp.asarray(lo)


def sweep_expm_magnus2(
    static_op, operators, frame_omega, coefficients, y0,
    dt, t0=0.0, order=8, tile_b=512, interpret=False, hermitian=False,
    mode="auto", eval_slots=None, frame_omega_lo=None,
):
    """Public shim over :func:`_sweep_expm_magnus2_jit` — splits the frame
    frequency matrix into an f32 (hi, lo) pair host-side (see
    :func:`split_omega_host`) then dispatches to the jitted kernel. All
    arguments are documented on the jitted function below."""
    if frame_omega_lo is None:
        frame_omega, frame_omega_lo = split_omega_host(frame_omega)
    return _sweep_expm_magnus2_jit(
        static_op, operators, frame_omega, frame_omega_lo, coefficients, y0,
        dt=dt, t0=t0, order=order, tile_b=tile_b, interpret=interpret,
        hermitian=hermitian, mode=mode, eval_slots=eval_slots,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "dt", "t0", "order", "tile_b", "interpret", "hermitian", "mode",
        "eval_slots",
    ),
)
def _sweep_expm_magnus2_jit(
    static_op,
    operators,
    frame_omega,
    frame_omega_lo,
    coefficients,
    y0,
    dt: float,
    t0: float = 0.0,
    order: int = 8,
    tile_b: int = 512,
    interpret: bool = False,
    hermitian: bool = False,
    mode: str = "auto",
    eval_slots=None,
):
    r"""Fixed-step Magnus-2 sweep solve, fused into one Pallas kernel.

    Solves ``y' = G_b(t) y`` for every sweep member ``b`` with
    ``G_b(t) = P(t) \circ (static + \sum_j c_{b,j}(t) ops_j)`` where
    ``P(t)[i,m] = exp(i omega[i,m] t)`` is the frame phase matrix.

    Args:
        static_op: (n, n) complex static generator in the frame basis (frame
            diagonal already subtracted).
        operators: (k, n, n) complex signal operators in the frame basis.
        frame_omega: (n, n) real frequency-difference matrix
            ``Im(d_m) - Im(d_i)`` of the frame diagonal.
        coefficients: (T, 2, k, B) real signal values at the two Gauss points
            of every step.
        y0: (n, B) complex initial states in the frame basis.
        dt: step size; ``T`` steps are taken.
        t0: initial time (frame phases use absolute time; the signal
            coefficient tables must be sampled at ``t0 + (step + c_g) dt``).
        order: Taylor order of the in-kernel expm.
        tile_b: lane-tile size (B must be a multiple).
        interpret: run in interpreter mode (CPU tests).
        hermitian: the generators are anti-Hermitian (``G = -iH``, Hamiltonian
            dynamics) — the Magnus-2 commutator then costs one matmul instead
            of two (``G1 G2 = (G2 G1)^\dagger``). The caller must guarantee
            this; results are silently wrong otherwise (the glue in
            ``solvers/fused_sweep.py`` auto-detects from the host operator
            data).
        mode: Magnus-2 evaluation strategy — all produce the identical
            polynomial, differing only in matmul count per step:

            - ``"matrix"``: form M with the 2-matmul commutator, then
              ``order`` Horner mat-vecs (``2 n^3 B + order n^2 B``);
            - ``"matrix_herm"``: 1-matmul commutator via
              ``G1 G2 = (G2 G1)^\dagger`` (requires ``hermitian``);
            - ``"matvec"``: commutator-free — each Horner term applies
              ``M v`` as 4 mat-vecs (``4 order n^2 B``, no ``n^3`` term;
              the win for large ``n``, e.g. vectorized Lindblad);
            - ``"auto"`` (default): pick by the matmul cost model.
        eval_slots: optional length-T TUPLE of ints (static): after
            step ``s`` (state at ``t0 + (s+1) dt``) the state is stored into
            trajectory slot ``eval_slots[s]`` if ``>= 0``. Slot values must
            be ``-1`` or a unique index in ``[0, n_eval)`` where
            ``n_eval = max(eval_slots) + 1``.

    Returns:
        (n, B) complex final states in the frame basis at ``t = T dt``;
        with ``eval_slots``, a tuple ``(final, trajectory)`` where
        ``trajectory`` is (n_eval, n, B) complex (frame basis).
    """
    T, _, k, B = coefficients.shape
    n = y0.shape[0]
    if B % tile_b != 0:
        raise ValueError(f"sweep batch {B} must be a multiple of tile_b={tile_b}")

    f32 = jnp.float32 if not jax.config.jax_enable_x64 else jnp.float64
    statr = jnp.real(static_op).astype(f32)
    stati = jnp.imag(static_op).astype(f32)
    opsr = jnp.real(operators).astype(f32)
    opsi = jnp.imag(operators).astype(f32)
    omega = jnp.asarray(frame_omega).astype(f32)
    omegal = jnp.asarray(frame_omega_lo).astype(f32)
    coef = jnp.asarray(coefficients).astype(f32)
    y0r = jnp.real(y0).astype(f32)
    y0i = jnp.imag(y0).astype(f32)

    grid = (B // tile_b,)
    # replicated (whole-array) inputs
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    # lane-tiled inputs
    coef_spec = pl.BlockSpec((T, 2, k, tile_b), lambda b: (0, 0, 0, b), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((n, tile_b), lambda b: (0, b), memory_space=pltpu.VMEM)

    if mode == "auto":
        # per-step matmul cost in n^2 B units: matrix modes pay the
        # commutator ((1|2) n) + order mat-vecs; matvec mode pays 4 order
        mat_cost = (n if hermitian else 2 * n) + order
        mode = "matvec" if 4 * order < mat_cost else (
            "matrix_herm" if hermitian else "matrix"
        )
    if mode == "matrix_herm" and not hermitian:
        raise ValueError('mode="matrix_herm" requires hermitian=True')
    if mode not in ("matrix", "matrix_herm", "matvec"):
        raise ValueError(f"unknown mode {mode!r}")

    n_eval = 0
    if eval_slots is not None:
        n_eval = _validate_eval_slots(eval_slots, T)

    kernel = functools.partial(
        _kernel, n, k, T, float(dt), float(t0), order, mode, n_eval
    )
    scratch_mat = pltpu.VMEM((n, n, tile_b), f32)
    scratch_vec = pltpu.VMEM((n, tile_b), f32)
    phase_mat = pltpu.VMEM((n, n), f32)
    if mode == "matvec":
        scratch = [scratch_mat] * 4 + [scratch_vec] * 10
    else:
        scratch = [scratch_mat] * 6 + [scratch_vec] * 6
    scratch += [phase_mat, phase_mat]

    in_specs = [
        full(statr), full(stati), full(opsr), full(opsi), full(omega),
        full(omegal), coef_spec,
    ]
    inputs = [statr, stati, opsr, opsi, omega, omegal, coef]
    out_specs = [y_spec, y_spec]
    out_shape = [jax.ShapeDtypeStruct((n, B), f32)] * 2
    if n_eval > 0:
        slots = jnp.asarray(np.asarray(eval_slots, dtype=np.int32)[:, None])
        in_specs.append(full(slots))
        inputs.append(slots)
        eval_spec = pl.BlockSpec(
            (n_eval, n, tile_b), lambda b: (0, 0, b), memory_space=pltpu.VMEM
        )
        out_specs += [eval_spec, eval_spec]
        out_shape += [jax.ShapeDtypeStruct((n_eval, n, B), f32)] * 2
    in_specs += [y_spec, y_spec]
    inputs += [y0r, y0i]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    if n_eval > 0:
        outr, outi, evalr, evali = outs
        return outr + 1j * outi, evalr + 1j * evali
    outr, outi = outs
    return outr + 1j * outi
