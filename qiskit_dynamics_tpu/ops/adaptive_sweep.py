r"""Fused lockstep-adaptive Dormand-Prince sweep kernel.

Companion to :mod:`.sweep_solver` for ADAPTIVE stepping: solves
``y'_b = G_b(t) y_b`` for a sweep of lanes with a SHARED adaptive time grid —
a step is accepted when the max error over all lanes of the tile passes the
tolerance, so every lane advances together ("lockstep"). For parameter sweeps
of one model this is as accurate as per-member adaptivity (the error control
follows the stiffest lane) while keeping the whole solve inside one Pallas
program: state, stages, and generators live in VMEM; there are zero per-step
kernel dispatches.

Signal model (what the kernel can evaluate at arbitrary times in-kernel):
constant-envelope signals ``c_j(t, b) = Re[A_j(b) e^{i(2 pi nu_j t)}]`` with a
per-lane complex amplitude — the standard always-on-drive parameter sweep —
or piecewise-constant per-lane envelope TABLES (``(k, S, B)`` + ``env_dt``).
In table mode steps are clipped to envelope-cell boundaries and every stage
of a step reads the cell at the step midpoint: the RHS is smooth within each
step, so dopri5 keeps its full order across sample discontinuities (measured
16x accuracy gain on Gaussian-schedule solves vs naive per-stage lookup), at
the cost of taking at least S steps.
Generators are frame-basis: ``G(t) = P(t) * (static + sum_j c_j(t) ops_j)``
with ``P(t)[i,m] = exp(i omega[i,m] t)`` (same conventions as
:func:`.sweep_solver.sweep_expm_magnus2`).

Error control follows ``tpu_dopri5`` (solvers/adaptive.py): rms over state
entries of ``err/scale`` with ``scale = atol + rtol*max(|y|,|y_new|)``, max
over lanes; step factor ``clip(0.9 err^(-1/5), 0.2, 10)`` (shrink-only on
rejection), a small-step stall guard, and FSAL reuse of the 7th stage. If the
step budget is exhausted before ``tf``, the output is NaN-poisoned (the
in-graph error convention used across the framework).

Precision: the kernel runs in float32 regardless of ``jax_enable_x64`` (VPU
vector ops), with phase arguments formed by EFT products and reduced mod
2pi (``ops/trig_reduce.py``) so large absolute phases cost no accuracy.
Tolerances are honored down to ~1e-7-class; below ~3e-8 the error estimate
is f32-roundoff-dominated.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rk_tableaus import (
    DOPRI5_A as _A,        # (6, 5) stage coefficients (explicit)
    DOPRI5_B as _B,        # (6,) solution weights
    DOPRI5_C as _C,        # (6,) stage times
    DOPRI5_E as _E,        # (7,) error weights (incl. FSAL stage)
    DOPRI5_N_STAGES as _N_STAGES,
)
from .sweep_solver import _UNROLL_N, _make_rows
from .trig_reduce import (
    reduced_phase,
    split_array,
    split_const,
    time_add,
    time_add_df,
)

__all__ = ["sweep_dopri5_lockstep"]


def _kernel(
    n: int,
    k: int,
    n_env: int,
    env_dt: float,
    t0_pair: tuple,
    dur_pair: tuple,
    atol: float,
    rtol: float,
    max_steps: int,
    h0: float,
    n_eval: int,
    record_steps: bool,
    # refs (with ``n_eval > 0``, ``eval_ref`` (n_eval, 1) f32 elapsed times
    # follows envi_ref and trajectory outputs (n_eval, n, TILE_B) follow
    # outr/outi; with ``record_steps``, ``rec_ref`` (max_steps, 1) f32 is the
    # LAST output):
    *refs,
):
    statr_ref, stati_ref = refs[0], refs[1]       # (n, n)
    opsr_ref, opsi_ref = refs[2], refs[3]         # (k, n, n)
    omega_ref = refs[4]                           # (n, n)
    omegal_ref = refs[5]                          # (n, n) f32-split lo half
    freq_ref = refs[6]                            # (2, k) angular carriers (hi, lo)
    envr_ref, envi_ref = refs[7], refs[8]         # (k, n_env, TILE_B)
    pos = 9
    eval_ref = None
    if n_eval > 0:
        eval_ref = refs[pos]                      # (n_eval, 1) elapsed times
        pos += 1
    y0r_ref, y0i_ref = refs[pos], refs[pos + 1]   # (n, TILE_B)
    outr_ref, outi_ref = refs[pos + 2], refs[pos + 3]
    pos += 4
    evalr_ref = evali_ref = None
    if n_eval > 0:
        evalr_ref, evali_ref = refs[pos], refs[pos + 1]  # (n_eval, n, TILE_B)
        pos += 2
    rec_ref = None
    if record_steps:
        # (max_steps, 1) accepted step sizes, 0-padded (VMEM; writes go
        # through (1, 1) dynamic-slice stores — Mosaic rejects scalar VMEM
        # stores, and SMEM blocks lane-pad 128x past the 1 MB budget)
        rec_ref = refs[pos]
        pos += 1
    # scratch
    (
        gr, gi,                    # (n, n, TILE_B) generator
        kr, ki,                    # (7, n, TILE_B) RK stages
        yr, yi,                    # (n, TILE_B) current state
        wr, wi,                    # (n, TILE_B) work state (stage arg / y_new)
        cosb, sinb,                # (n, n) frame phase tables (per stage)
    ) = refs[pos:]
    inv_env_dt = 1.0 / env_dt
    # the loop variable s runs over [0, tf - t0] and is tracked as an f32
    # (hi, lo) pair (double-float, ~2^-48 relative); absolute time =
    # t0 + s (signals and frame phases use absolute time, envelope tables
    # are indexed by elapsed time). Phase arguments ``w t`` / ``omega t``
    # are reduced mod 2pi with EFT products (trig_reduce.reduced_phase) —
    # a plain f32 product loses ~ulp(|w t|) rad, the measured 1.3e-4
    # accuracy floor at frame phases ~600 rad (dim-27 serving config).
    dur_hi = jnp.float32(dur_pair[0])
    dur_lo = jnp.float32(dur_pair[1])
    t0_df = (jnp.float32(t0_pair[0]), jnp.float32(t0_pair[1]))

    rows = _make_rows(n)

    def signal_coeff(j, s_pair, idx):
        # c_j(t, :) = Re[E_j(t) e^{i w t}] with E the piecewise-constant
        # per-lane complex envelope (n_env == 1: constant envelope). ``idx``
        # is the step's shared envelope cell: steps are clipped to cell
        # boundaries, so every stage of a step sees ONE envelope value and
        # the RHS is smooth within the step (full dopri5 order across sample
        # discontinuities).
        if n_env == 1:
            er = envr_ref[j, 0]
            ei = envi_ref[j, 0]
        else:
            er = envr_ref[j, idx]
            ei = envi_ref[j, idx]
        w_pair = (freq_ref[0, j], freq_ref[1, j])
        ph = reduced_phase(w_pair, time_add_df(t0_df, s_pair))
        return er * jnp.cos(ph) - ei * jnp.sin(ph)

    def build_generator(s_pair, idx):
        """gr/gi <- P(t) * (static + sum_j c_j(t) ops_j); t = t0 + s."""
        t_abs = time_add_df(t0_df, s_pair)
        coeffs = [signal_coeff(j, s_pair, idx) for j in range(k)]
        # frame phase tables ONCE per stage as a full (n, n) EFT+trig —
        # hoisted out of the row loop (per-row reduction ops multiplied the
        # Mosaic program size ~n-fold: measured 54 s -> 605 s cold compile
        # on the dim-27 serving kernel before hoisting)
        ph = reduced_phase((omega_ref[...], omegal_ref[...]), t_abs)  # (n, n)
        cosb[...] = jnp.cos(ph)
        sinb[...] = jnp.sin(ph)

        def row(i):
            # ref dtype, not a hard f32 cast (f64 under x64 interpret)
            acc_r = jnp.broadcast_to(statr_ref[i][:, None], gr.shape[1:]).astype(statr_ref.dtype)
            acc_i = jnp.broadcast_to(stati_ref[i][:, None], gi.shape[1:]).astype(stati_ref.dtype)
            for j in range(k):
                c = coeffs[j][None, :]
                acc_r = acc_r + c * opsr_ref[j, i][:, None]
                acc_i = acc_i + c * opsi_ref[j, i][:, None]
            cos_p = cosb[i][:, None]
            sin_p = sinb[i][:, None]
            gr[i] = acc_r * cos_p - acc_i * sin_p
            gi[i] = acc_r * sin_p + acc_i * cos_p

        rows(row)

    def rhs_into_stage(s, s_pair, idx):
        """kr/ki[s] <- G(t) @ w (current work state in wr/wi)."""
        build_generator(s_pair, idx)

        def row(i):
            acc_r = jnp.zeros(wr.shape[1:], wr.dtype)
            acc_i = jnp.zeros(wi.shape[1:], wi.dtype)
            for m in range(n):
                ur = gr[i, m]
                ui = gi[i, m]
                acc_r += ur * wr[m] - ui * wi[m]
                acc_i += ur * wi[m] + ui * wr[m]
            kr[s, i] = acc_r
            ki[s, i] = acc_i

        rows(row)

    def body(carry):
        # (s_hi, s_lo) = elapsed time; aidx = accepted-step count (recording)
        s_hi, s_lo, h_prop, steps, bad, eidx, aidx = carry
        s_pair = (s_hi, s_lo)
        t = s_hi  # f32 view of the elapsed time (cells, guards, comparisons)
        # remaining duration, df-accurate: dur_hi - s_hi is exact (operands
        # converge), the lo terms restore the sub-ulp remainder — the final
        # step lands on tf to ~2^-48 relative rather than f32 ulp
        gap = (dur_hi - s_hi) + (dur_lo - s_lo)
        h = jnp.minimum(h_prop, gap)
        if n_eval > 0:
            # clip the step to the next trajectory time so an accepted step
            # lands exactly on it (same mechanism as envelope-cell clipping)
            target = eval_ref[jnp.minimum(eidx, n_eval - 1), 0]
            have_target = eidx < n_eval
            h = jnp.where(
                have_target, jnp.minimum(h, jnp.maximum(target - t, 0.0)), h
            )
        if n_env > 1:
            # clip the step to the next envelope-cell boundary, and give all
            # stages the SAME envelope cell (looked up at the step midpoint):
            # the RHS is then smooth within every step, so dopri5 keeps its
            # order across the piecewise-constant envelope discontinuities.
            # The +1e-4 nudge tolerates t rounding epsilon below a boundary
            # (the misattributed sliver is O(eps) wide — negligible).
            cell_f = jnp.floor(t * inv_env_dt + 1e-4)
            boundary = (cell_f + 1.0) * jnp.float32(env_dt)
            h = jnp.minimum(h, boundary - t)
            step_cell = jnp.clip(
                ((t + 0.5 * h) * inv_env_dt).astype(jnp.int32), 0, n_env - 1
            )
        else:
            step_cell = jnp.int32(0)

        # stage 0 = f(t, y) is already in kr/ki[0]: computed before the loop
        # for the first step, maintained by the FSAL copy on accepted steps
        # (recomputed when an accepted step crossed an envelope-cell
        # boundary), and unchanged (same (t, y)) after rejected steps.

        # stages 1..5
        for s in range(1, _N_STAGES):

            def stage_row(i, s=s):
                acc_r = yr[i]
                acc_i = yi[i]
                for q in range(s):
                    a = float(_A[s, q])
                    if a != 0.0:
                        acc_r = acc_r + (h * a) * kr[q, i]
                        acc_i = acc_i + (h * a) * ki[q, i]
                wr[i] = acc_r
                wi[i] = acc_i

            rows(stage_row)
            rhs_into_stage(s, time_add(s_pair, float(_C[s]) * h), step_cell)

        # 5th-order solution y_new into wr/wi
        def ynew_row(i):
            acc_r = yr[i]
            acc_i = yi[i]
            for s in range(_N_STAGES):
                b = float(_B[s])
                if b != 0.0:
                    acc_r = acc_r + (h * b) * kr[s, i]
                    acc_i = acc_i + (h * b) * ki[s, i]
            wr[i] = acc_r
            wi[i] = acc_i

        rows(ynew_row)
        # FSAL stage: f(t+h, y_new) -> stage 6 (used only in the error
        # estimate). At a cell boundary this is the left-limit envelope —
        # correct for integrating over [t, t+h].
        s_next = time_add(s_pair, h)
        rhs_into_stage(6, s_next, step_cell)

        # error estimate and shared norm
        def err_term(i):
            er = jnp.zeros(yr.shape[1:], yr.dtype)
            ei = jnp.zeros(yi.shape[1:], yi.dtype)
            for s in range(_N_STAGES + 1):
                e = float(_E[s])
                if e != 0.0:
                    er = er + (h * e) * kr[s, i]
                    ei = ei + (h * e) * ki[s, i]
            abs_y = jnp.sqrt(yr[i] ** 2 + yi[i] ** 2)
            abs_w = jnp.sqrt(wr[i] ** 2 + wi[i] ** 2)
            scale = atol + rtol * jnp.maximum(abs_y, abs_w)
            return (er**2 + ei**2) / (scale**2)

        if n <= _UNROLL_N:
            err_sq_sum = jnp.zeros(yr.shape[1:], yr.dtype)
            for i in range(n):
                err_sq_sum = err_sq_sum + err_term(i)
        else:
            err_sq_sum = jax.lax.fori_loop(
                0, n, lambda i, acc: acc + err_term(i),
                jnp.zeros(yr.shape[1:], yr.dtype),
            )
        err_norm = jnp.sqrt(jnp.max(err_sq_sum) / n)  # rms over state, max over lanes

        # stall guard: a step within a few ulps of t cannot be refined
        # further (t + h would round to t) — accept it rather than burn the
        # budget. Threshold = 4 ulps of t (f32 eps scaling). If such a forced
        # step is wildly out of tolerance the result is untrustworthy: flag
        # it and NaN-poison the output (in-graph error convention).
        stalled = h <= (4.0 * 1.1920929e-7) * jnp.maximum(1.0, t)
        accept = (err_norm <= 1.0) | stalled
        bad = bad | (stalled & (err_norm > 1.0) & (err_norm > 100.0))
        def accept_row(i):
            yr[i] = jnp.where(accept, wr[i], yr[i])
            yi[i] = jnp.where(accept, wi[i], yi[i])
            # FSAL: on accept, stage 6 = f(t+h, y_new) becomes next stage 0
            kr[0, i] = jnp.where(accept, kr[6, i], kr[0, i])
            ki[0, i] = jnp.where(accept, ki[6, i], ki[0, i])

        rows(accept_row)
        if record_steps:
            # the accepted-step record drives the AD replay (the backward
            # pass re-integrates the exact primal grid with XLA ops)
            @pl.when(accept)
            def _record():
                rec_ref[pl.ds(aidx, 1), :] = jnp.full((1, 1), h, rec_ref.dtype)

            aidx = aidx + jnp.where(accept, 1, 0)
        s_hi_new = jnp.where(accept, s_next[0], s_hi)
        s_lo_new = jnp.where(accept, s_next[1], s_lo)
        t_new = s_hi_new

        if n_env > 1:
            # FSAL stage 6 was evaluated with the OLD cell's envelope; when
            # the accepted step landed on a cell boundary the next step's
            # stage 0 must use the NEW cell — recompute it. (wr/wi hold
            # y_new == yr/yi on accept, so rhs_into_stage reads the right
            # state.) Scalar predicate: shared across the tile.
            new_cell = jnp.clip(
                jnp.floor(t_new * inv_env_dt + 1e-4).astype(jnp.int32), 0, n_env - 1
            )
            crossed = (
                accept
                & (new_cell != step_cell)
                & (((dur_hi - s_hi_new) + (dur_lo - s_lo_new)) > 0.0)
            )

            @pl.when(crossed)
            def _recompute_fsal():
                rhs_into_stage(0, (s_hi_new, s_lo_new), new_cell)

        # err_norm**(-1/5) via exp/log (Mosaic cannot legalize math.powf);
        # growth capped at 10 on accept, shrink-only on reject (same policy
        # as solvers/adaptive.py tpu_rk_solve)
        if n_eval > 0:
            # store the state when an accepted step landed on the current
            # trajectory time (the clipping above makes steps land exactly,
            # up to f32 rounding — hence the ulp-scaled tolerance)
            eps = (4.0 * 1.1920929e-7) * jnp.maximum(1.0, target)
            reached = have_target & accept & (t_new >= target - eps)

            @pl.when(reached)
            def _store_eval():
                def row(i):
                    evalr_ref[eidx, i] = yr[i]
                    evali_ref[eidx, i] = yi[i]

                rows(row)

            eidx = jnp.where(reached, eidx + 1, eidx)

        safe_err = jnp.maximum(err_norm, jnp.float32(1e-10))
        factor = jnp.clip(0.9 * jnp.exp(-0.2 * jnp.log(safe_err)), 0.2, 10.0)
        factor = jnp.where(accept, factor, jnp.minimum(factor, 1.0))
        h_new = h * factor
        if n_env > 1 or n_eval > 0:
            # don't let a boundary-clipped (small) accepted step shrink the
            # controller's proposal: keep at least the pre-clip proposal
            h_new = jnp.where(accept & (h < h_prop), jnp.maximum(h_prop, h_new), h_new)
        return s_hi_new, s_lo_new, h_new, steps + 1, bad, eidx, aidx

    def cond(carry):
        s_hi, s_lo, h, steps, _, _, _ = carry
        return (((dur_hi - s_hi) + (dur_lo - s_lo)) > 0.0) & (steps < max_steps)

    yr[...] = y0r_ref[...]
    yi[...] = y0i_ref[...]
    wr[...] = y0r_ref[...]
    wi[...] = y0i_ref[...]
    # initial FSAL stage at elapsed time 0
    rhs_into_stage(0, (jnp.float32(0.0), jnp.float32(0.0)), jnp.int32(0))
    if record_steps:
        rec_ref[...] = jnp.zeros((max_steps, 1), dtype=rec_ref.dtype)

    s_hi_f, s_lo_f, _, _, bad_f, eidx_f, _ = jax.lax.while_loop(
        cond, body,
        (
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(h0),
            jnp.int32(0), False, jnp.int32(0), jnp.int32(0),
        ),
    )

    # NaN-poison if the budget ran out before reaching tf, a stalled step
    # was force-accepted with err >> tolerance, or (with trajectories) any
    # eval time was missed
    ok = (((dur_hi - s_hi_f) + (dur_lo - s_lo_f)) <= 0.0) & jnp.logical_not(bad_f)
    if n_eval > 0:
        ok = ok & (eidx_f >= n_eval)
    poison = jnp.where(ok, 1.0, jnp.nan).astype(jnp.float32)
    outr_ref[...] = yr[...] * poison
    outi_ref[...] = yi[...] * poison
    if n_eval > 0:
        evalr_ref[...] = evalr_ref[...] * poison
        evali_ref[...] = evali_ref[...] * poison


def sweep_dopri5_lockstep(
    static_op, operators, frame_omega, signal_freqs, signal_amps, y0,
    tf, t0=0.0, atol=1e-6, rtol=1e-6, max_steps=4096, h0=1e-2, tile_b=512,
    interpret=False, env_dt=0.0, eval_ts=None, record_steps=False,
):
    """Public shim over :func:`_sweep_dopri5_lockstep_jit`: splits the frame
    frequency matrix and carrier frequencies into f32 (hi, lo) pairs
    host-side (the representation bits must be captured before the jit
    boundary casts f64 to f32). Unlike the fixed-step kernel this one runs
    f32 even under x64, so the split is unconditional. All arguments are
    documented on the jitted function below."""

    def _split(x):
        try:
            arr = np.asarray(x)
        except Exception:  # traced value — the f64 bits are already gone
            arr = jnp.asarray(x).astype(jnp.float32)
            return arr, jnp.zeros_like(arr)
        hi, lo = split_array(arr)
        return jnp.asarray(hi), jnp.asarray(lo)

    omega_hi, omega_lo = _split(frame_omega)
    freq_hi, freq_lo = _split(signal_freqs)
    return _sweep_dopri5_lockstep_jit(
        static_op, operators, omega_hi, omega_lo, freq_hi, freq_lo,
        signal_amps, y0, tf=tf, t0=t0, atol=atol, rtol=rtol,
        max_steps=max_steps, h0=h0, tile_b=tile_b, interpret=interpret,
        env_dt=env_dt, eval_ts=eval_ts, record_steps=record_steps,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "t0", "tf", "atol", "rtol", "max_steps", "h0", "tile_b", "interpret",
        "env_dt", "eval_ts", "record_steps",
    ),
)
def _sweep_dopri5_lockstep_jit(
    static_op,
    operators,
    frame_omega,
    frame_omega_lo,
    signal_freqs,
    signal_freqs_lo,
    signal_amps,
    y0,
    tf: float,
    t0: float = 0.0,
    atol: float = 1e-6,
    rtol: float = 1e-6,
    max_steps: int = 4096,
    h0: float = 1e-2,
    tile_b: int = 512,
    interpret: bool = False,
    env_dt: float = 0.0,
    eval_ts=None,
    record_steps: bool = False,
):
    r"""Lockstep-adaptive dopri5 sweep over ``[t0, tf]``, one fused kernel.

    Args:
        static_op: (n, n) complex static generator (frame basis, diag removed).
        operators: (k, n, n) complex signal operators (frame basis).
        frame_omega: (n, n) real frame frequency-difference matrix.
        signal_freqs: (k,) real angular carrier frequencies (``2 pi nu_j``).
        signal_amps: per-lane complex envelopes: (k, B) for constant envelopes
            (``c_j(t,b) = Re[A_jb e^{i w_j t}]``) or (k, S, B) for
            piecewise-constant envelopes sampled every ``env_dt``
            (``c_j(t,b) = Re[E_j[floor(t/env_dt)]_b e^{i w_j t}]``).
        y0: (n, B) complex initial states (frame basis).
        tf: final time; integration runs over [t0, tf]. Envelope tables
            cover [t0, tf] and are indexed by elapsed time.
        atol/rtol: tolerances (error controlled at the worst lane per tile).
        max_steps: step budget; exhausted -> NaN output.
        h0: initial step size.
        tile_b: lane-tile size (B must be a multiple).
        interpret: interpreter mode for CPU tests.
        env_dt: envelope sample width (required when signal_amps is 3d).
        eval_ts: optional static tuple of ELAPSED trajectory times (relative
            to ``t0``), strictly increasing, each in ``(0, tf - t0]``: steps
            clip to these boundaries and the state at each is stored.
        record_steps: additionally return each tile's accepted step sizes as
            an (n_tiles, max_steps) f32 array (zero-padded) — the input to
            the AD replay (``ops/adaptive_replay.py``).

    Returns:
        (n, B) complex final states (frame basis); with ``eval_ts``, a tuple
        ``(final, trajectory)`` where ``trajectory`` is
        (len(eval_ts), n, B) complex. With ``record_steps``, the result is
        wrapped as ``(result, step_record)``.
    """
    k, n, _ = operators.shape
    B = y0.shape[-1]
    if B % tile_b != 0:
        raise ValueError(f"sweep batch {B} must be a multiple of tile_b={tile_b}")
    if signal_amps.ndim == 2:
        signal_amps = signal_amps[:, None, :]
        env_dt = float(tf - t0)  # any positive value; index is always 0
    elif env_dt <= 0.0:
        raise ValueError("env_dt must be set when passing (k, S, B) envelope tables.")
    n_env = signal_amps.shape[1]

    f32 = jnp.float32
    statr = jnp.real(static_op).astype(f32)
    stati = jnp.imag(static_op).astype(f32)
    opsr = jnp.real(operators).astype(f32)
    opsi = jnp.imag(operators).astype(f32)
    omega = jnp.asarray(frame_omega).astype(f32)
    omegal = jnp.asarray(frame_omega_lo).astype(f32)
    freqs = jnp.stack(
        [
            jnp.asarray(signal_freqs).astype(f32).reshape(k),
            jnp.asarray(signal_freqs_lo).astype(f32).reshape(k),
        ]
    )  # (2, k)
    envr = jnp.real(signal_amps).astype(f32)
    envi = jnp.imag(signal_amps).astype(f32)
    y0r = jnp.real(y0).astype(f32)
    y0i = jnp.imag(y0).astype(f32)

    grid = (B // tile_b,)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    lane2 = lambda rows: pl.BlockSpec((rows, tile_b), lambda b: (0, b), memory_space=pltpu.VMEM)
    env_spec = pl.BlockSpec((k, n_env, tile_b), lambda b: (0, 0, b), memory_space=pltpu.VMEM)

    n_eval = 0
    if eval_ts is not None:
        ts = np.asarray(eval_ts, dtype=np.float64)
        if ts.ndim != 1 or ts.size == 0:
            raise ValueError("eval_ts must be a non-empty 1d tuple of times.")
        if np.any(ts <= 0) or np.any(ts > (tf - t0) * (1 + 1e-9)):
            raise ValueError("eval_ts must lie in (0, tf - t0].")
        if ts.size > 1 and np.any(np.diff(ts) <= 0):
            raise ValueError("eval_ts must be strictly increasing.")
        n_eval = ts.size

    kernel = functools.partial(
        _kernel, n, k, int(n_env), float(env_dt), split_const(float(t0)),
        split_const(float(tf) - float(t0)), float(atol),
        float(rtol), int(max_steps), float(h0), n_eval, bool(record_steps),
    )
    mat = pltpu.VMEM((n, n, tile_b), f32)
    stages = pltpu.VMEM((_N_STAGES + 1, n, tile_b), f32)
    vec = pltpu.VMEM((n, tile_b), f32)
    phase_mat = pltpu.VMEM((n, n), f32)

    in_specs = [
        full(statr), full(stati), full(opsr), full(opsi), full(omega),
        full(omegal), full(freqs), env_spec, env_spec,
    ]
    inputs = [statr, stati, opsr, opsi, omega, omegal, freqs, envr, envi]
    out_specs = [lane2(n), lane2(n)]
    out_shape = [jax.ShapeDtypeStruct((n, B), f32)] * 2
    if n_eval > 0:
        ts_arr = jnp.asarray(ts.astype(np.float32)[:, None])
        in_specs.append(full(ts_arr))
        inputs.append(ts_arr)
        eval_spec = pl.BlockSpec(
            (n_eval, n, tile_b), lambda b: (0, 0, b), memory_space=pltpu.VMEM
        )
        out_specs += [eval_spec, eval_spec]
        out_shape += [jax.ShapeDtypeStruct((n_eval, n, B), f32)] * 2
    n_tiles = B // tile_b
    if record_steps:
        # per-tile accepted-step record: block row-range [b*max_steps, ...)
        out_specs.append(
            pl.BlockSpec((max_steps, 1), lambda b: (b, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((n_tiles * max_steps, 1), f32))
    in_specs += [lane2(n), lane2(n)]
    inputs += [y0r, y0i]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            mat, mat, stages, stages, vec, vec, vec, vec, phase_mat, phase_mat,
        ],
        interpret=interpret,
    )(*inputs)
    outs = list(outs)
    rec = None
    if record_steps:
        rec = outs.pop().reshape(n_tiles, max_steps)
    if n_eval > 0:
        outr, outi, evalr, evali = outs
        result = (outr + 1j * outi, evalr + 1j * evali)
    else:
        outr, outi = outs
        result = outr + 1j * outi
    if record_steps:
        return result, rec
    return result
