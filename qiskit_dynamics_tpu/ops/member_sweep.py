r"""Member-major MXU Pallas engine for fixed-step Magnus-2 sweeps, large dims.

The batch-on-lanes kernel (:mod:`.sweep_solver`) wins at small ``n`` by
putting the sweep batch on the VPU lane dimension, but its matmuls are
broadcast-multiply-sum VPU loops — ``O(n^3 B)`` VPU flops — and the
batch-major XLA engine (:mod:`.xla_sweep`) is HBM-bound re-reading the
``(B, n, n)`` Magnus matrices from HBM every Horner iteration (~2.7 GB/step
at ``n = 64``; BENCHMARKS.md "Large-dim" section). This engine takes the
third layout point (VERDICT r2 item 5): **grid over sweep members** — each
program holds a small block of members' ``(n, n)`` matrices entirely in VMEM
for the whole time loop, so per step and member the HBM traffic is ~zero
(only the per-step signal coefficients stream in).

Complex products use the **wide-product real form**: with tall
``[Ar; Ai] (2n, n)`` and wide ``[Br | Bi] (n, 2n)`` operands, ONE real
matmul of shape ``(2n, n, 2n)`` yields all four real block-products of
``A @ B`` — full MXU shape utilization at ``n >= 64`` (vs four ``n^3``
matmuls at ~(n/128)^2 utilization). The Magnus matrix is then assembled
once per member and step. The whole solve runs in TRANSPOSED space (the
host ships ``static^T``/``ops^T``/``omega^T`` and flips the commutator
sign — ``[G2, G1]^T = -[G2^T, G1^T]``), so the scratch holds the
transposed real representation ``(M_rr)^T = [[Mr^T, Mi^T], [-Mi^T, Mr^T]]``
and states are ``(bm, 2n)`` rows ``[yr | yi]`` (Mosaic requires blocked
minor dims to be 128-divisible, so the member block must ride the leading
dim). Two Horner ``expm`` mat-vec variants:

- ``horner="mxu"``: one row-side ``(1, 2n) @ (2n, 2n)`` MXU pass per
  Taylor iteration (one pass instead of the four quarter-shape passes of
  the first-generation kernel).
- ``horner="vpu"``: elementwise multiply + sublane reduction on the VPU —
  no MXU pass at all; costs one row->column vector relayout per iteration.

Same Magnus-2 + Horner mat-vec Taylor polynomial as the other engines
(reference math: ``/root/reference/qiskit_dynamics/solvers/fixed_step_solvers.py:321-403``),
same frame-phase treatment (EFT-reduced trig, :mod:`.trig_reduce`), so
results agree with ``sweep_expm_magnus2`` / ``sweep_expm_magnus2_xla`` to
f32 roundoff.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep_solver import (
    _GAUSS3_D1,
    _GAUSS3_D2,
    _GAUSS3_D3,
    _GAUSS_C1,
    _GAUSS_C2,
    _M3_C0,
    _M3_C1,
    _P2,
    split_omega_host,
)
from .trig_reduce import reduced_phase, split_const, step_time_df

__all__ = ["sweep_expm_magnus2_member"]


def _kernel(
    n: int,
    k: int,
    T: int,
    dt: float,
    t0: float,
    order: int,
    bm: int,
    hermitian: bool,
    horner: str,
    c2_sign: float,
    resident: bool,
    hoist: bool,
    build: str,
    magnus: int,
    *refs,
):
    (
        statr_ref, stati_ref,          # (n, n)
        opsr_ref, opsi_ref,            # (k, n, n)
        omh_ref, oml_ref,              # (n, n) frame freqs (hi, lo)
        coef_ref,                      # (bm, T, 2*k): member on the blocked
                                       # leading dim (blocked lane dims must
                                       # be 128-divisible in Mosaic, so the
                                       # member block can't ride a minor
                                       # dim), the dynamic step index on the
                                       # SUBLANE dim, gauss*k+j static lanes
                                       # (a lane-major (bm, 2k, T) layout
                                       # would kill the 32x lane padding but
                                       # Mosaic rejects dynamic LANE-indexed
                                       # scalar loads; SMEM placement pads
                                       # identically and exceeds its 1 MB)
        y0_ref,                        # (bm, 2n) real row states [yr | yi]
        out_ref,                       # (bm, 2n)
        g1r, g1i, g2r, g2i,            # (bm or 1, n, n) scratch
        mrr,                           # (bm or 1, 2n, 2n) transposed-real-rep
        tall_s,                        # (2n, n) wide-product operand
        wide_s,                        # (n, 2n)
        cos1, sin1, cos2, sin2,        # (n, n) Gauss-point phase scratch
        rsr, rsi,                      # (2(k+1), n, n) hoisted rotated
                                       # tables (or (1,1,1) dummies): static
                                       # at gauss*(k+1), ops after
        y_s, v_s,                      # (bm, 2n) state scratch
        cb_s,                          # (bm, 1, n) coefficient staging (or
                                       # (1, 1, 1) dummy): materializes the
                                       # lane-broadcast half of the member-
                                       # scalar broadcast so Mosaic never
                                       # sees a joint sublane+lane broadcast
        g3r, g3i, t1r, t1i, t2r, t2i,  # magnus=3 scratch: third Gauss-point
        car, cai,                      # generator + a2/a3/C1 staging
                                       # ((1,1,1) dummies for magnus=2)
    ) = refs
    f = statr_ref.dtype
    n2 = 2 * n

    def phase_tables(step, gauss_c, cosb, sinb):
        """cosb/sinb <- frame phase rotation at tau = t0 + (step+c) dt."""
        if f == jnp.float32:
            tau_pair = step_time_df(
                step.astype(f), split_const(dt), split_const(t0 + gauss_c * dt)
            )
            ph = reduced_phase((omh_ref[...], oml_ref[...]), tau_pair)
        else:
            tau = t0 + (step.astype(f) + gauss_c) * dt
            ph = omh_ref[...] * tau
        cosb[...] = jnp.cos(ph)
        sinb[...] = jnp.sin(ph)

    def rotate_tables(gauss_idx, cosb, sinb):
        """Frame-rotate the SHARED static + op tables once per step/Gauss
        point into ``rsr``/``rsi`` — the rotation is elementwise-linear, so
        ``rot(stat + sum_j c_j ops_j) = rot(stat) + sum_j c_j rot(ops_j)``
        and the per-member build below reduces to ``k`` fused
        multiply-adds (the first-generation kernel paid the 6-op rotation
        PER MEMBER; with ``bm > k + 1`` members sharing the tables this
        removes most of the VPU build work the tuning campaign measured
        as the bottleneck)."""
        base = gauss_idx * (k + 1)
        rsr[base] = statr_ref[...] * cosb[...] - stati_ref[...] * sinb[...]
        rsi[base] = statr_ref[...] * sinb[...] + stati_ref[...] * cosb[...]
        for j in range(k):
            rsr[base + 1 + j] = opsr_ref[j] * cosb[...] - opsi_ref[j] * sinb[...]
            rsi[base + 1 + j] = opsr_ref[j] * sinb[...] + opsi_ref[j] * cosb[...]

    def build_one(step, gauss_idx, m, slot, out_r, out_i, cosb, sinb):
        """Member ``m``'s frame-rotated generator into scratch index ``slot``
        (``m`` may be a traced index — it rides the untiled leading dim)."""
        if hoist:
            base = gauss_idx * (k + 1)
            acc_r = rsr[base]
            acc_i = rsi[base]
            for j in range(k):
                c = coef_ref[m, step, gauss_idx * k + j]
                acc_r = acc_r + c * rsr[base + 1 + j]
                acc_i = acc_i + c * rsi[base + 1 + j]
            out_r[slot] = acc_r
            out_i[slot] = acc_i
            return
        acc_r = statr_ref[...]
        acc_i = stati_ref[...]
        for j in range(k):
            c = coef_ref[m, step, gauss_idx * k + j]
            acc_r = acc_r + c * opsr_ref[j]
            acc_i = acc_i + c * opsi_ref[j]
        out_r[slot] = acc_r * cosb[...] - acc_i * sinb[...]
        out_i[slot] = acc_r * sinb[...] + acc_i * cosb[...]

    c1 = 0.5 * dt
    c2 = c2_sign * _P2 * dt * dt

    def wide_product(ar_ref, ai_ref, br_ref, bi_ref, slot):
        """(pr, pi) of A @ B via one (2n, n, 2n) MXU pass."""
        tall_s[0:n, :] = ar_ref[slot]
        tall_s[n:n2, :] = ai_ref[slot]
        wide_s[:, 0:n] = br_ref[slot]
        wide_s[:, n:n2] = bi_ref[slot]
        W = jnp.dot(tall_s[...], wide_s[...], preferred_element_type=f)
        pr = W[0:n, 0:n] - W[n:n2, n:n2]
        pi = W[0:n, n:n2] + W[n:n2, 0:n]
        return pr, pi

    def assemble_mrr(slot):
        """Commutator + Magnus assembly for the generator pair in ``slot``.

        Transposed-space inputs: the computed blocks ARE Mr^T/Mi^T, so this
        assembles (M_rr)^T = [[Mr^T, Mi^T], [-Mi^T, Mr^T]]."""
        pr, pi = wide_product(g2r, g2i, g1r, g1i, slot)
        if hermitian:
            # anti-Hermitian generators: G1 G2 = (G2 G1)^dagger
            comm_r = pr - pr.T
            comm_i = pi + pi.T
        else:
            qr, qi = wide_product(g1r, g1i, g2r, g2i, slot)
            comm_r = pr - qr
            comm_i = pi - qi
        m_r = c1 * (g1r[slot] + g2r[slot]) + c2 * comm_r
        m_i = c1 * (g1i[slot] + g2i[slot]) + c2 * comm_i
        mrr[slot, 0:n, 0:n] = m_r
        mrr[slot, 0:n, n:n2] = m_i
        mrr[slot, n:n2, 0:n] = -m_i
        mrr[slot, n:n2, n:n2] = m_r

    def horner_iter(slot, m, inv, use_mxu):
        """One Taylor iteration v[m] <- y[m] + M v[m] / kk:
        w[i] = sum_j M_rr[i, j] v[j] = sum_j v[j] (M_rr)^T[j, i].
        ``m`` may be traced (dynamic sublane slice)."""
        row = pl.ds(m, 1)
        if use_mxu:
            w = jnp.dot(
                v_s[row, :], mrr[slot], preferred_element_type=f
            )  # (1, 2n) row-side MXU pass
        else:
            # elementwise multiply + sublane reduction, no MXU pass
            prod = mrr[slot] * v_s[row, :].reshape(n2, 1)
            w = jnp.sum(prod, axis=0, keepdims=True)  # (1, 2n)
        v_s[row, :] = y_s[row, :] + inv * w

    def build_all(step, gauss_idx, out_r, out_i, cosb, sinb):
        """Whole-block generator build: ONE broadcast FMA chain over
        ``(bm, n, n)`` per operator instead of ``bm`` separate per-member
        chains (gen-2 layout — the tuning campaign measured the per-member
        VPU build/assembly op stream, not its flops, as the plateau)."""
        def member_scalars(j):
            # (bm,) coefficients staged to (bm, n, n) in TWO single-axis
            # broadcasts with a VMEM store in between: Mosaic rejects the
            # joint (bm, 1, 1) -> (bm, n, n) vector.broadcast ("Broadcast in
            # both sublanes and lanes"), and the canonicalizer fuses two
            # back-to-back vector.broadcasts into that joint form (measured
            # on real Mosaic, round 4) — the store/load through ``cb_s``
            # is a real memory op it cannot elide.
            c = coef_ref[:, step, gauss_idx * k + j].reshape(bm, 1, 1)
            cb_s[...] = jnp.broadcast_to(c, (bm, 1, n))  # lane broadcast
            return jnp.broadcast_to(cb_s[...], (bm, n, n))  # sublane broadcast

        if hoist:
            base = gauss_idx * (k + 1)
            acc_r = jnp.broadcast_to(rsr[base][None], (bm, n, n))
            acc_i = jnp.broadcast_to(rsi[base][None], (bm, n, n))
            for j in range(k):
                c = member_scalars(j)
                acc_r = acc_r + c * rsr[base + 1 + j][None]
                acc_i = acc_i + c * rsi[base + 1 + j][None]
            out_r[...] = acc_r
            out_i[...] = acc_i
            return
        acc_r = jnp.broadcast_to(statr_ref[...][None], (bm, n, n))
        acc_i = jnp.broadcast_to(stati_ref[...][None], (bm, n, n))
        for j in range(k):
            c = member_scalars(j)
            acc_r = acc_r + c * opsr_ref[j][None]
            acc_i = acc_i + c * opsi_ref[j][None]
        out_r[...] = acc_r * cosb[...][None] - acc_i * sinb[...][None]
        out_i[...] = acc_r * sinb[...][None] + acc_i * cosb[...][None]

    def assemble_all():
        """Whole-block Magnus assembly: per-member MXU wide products stay a
        loop (they pipeline behind VPU work), but the linear part, the
        commutator finish, and the quadrant writes run batched over
        ``(bm, n, n)``. The G blocks are dead after their products, so the
        commutators stage in-place into ``g1``."""
        mrr[:, 0:n, 0:n] = c1 * (g1r[...] + g2r[...])
        mrr[:, 0:n, n:n2] = c1 * (g1i[...] + g2i[...])
        if hermitian:
            for m in range(bm):
                pr, pi = wide_product(g2r, g2i, g1r, g1i, m)
                g1r[m] = pr
                g1i[m] = pi
            comm_r = g1r[...] - jnp.swapaxes(g1r[...], -1, -2)
            comm_i = g1i[...] + jnp.swapaxes(g1i[...], -1, -2)
        else:
            for m in range(bm):
                pr, pi = wide_product(g2r, g2i, g1r, g1i, m)
                qr, qi = wide_product(g1r, g1i, g2r, g2i, m)
                g1r[m] = pr - qr
                g1i[m] = pi - qi
            comm_r = g1r[...]
            comm_i = g1i[...]
        mrr[:, 0:n, 0:n] = mrr[:, 0:n, 0:n] + c2 * comm_r
        mrr[:, 0:n, n:n2] = mrr[:, 0:n, n:n2] + c2 * comm_i
        mrr[:, n:n2, 0:n] = -mrr[:, 0:n, n:n2]
        mrr[:, n:n2, n:n2] = mrr[:, 0:n, 0:n]

    def comm_t_vals(Ar, Ai, Br, Bi, m):
        """[A, B] for member ``m`` of two transposed-space scratch blocks."""
        pr, pi = wide_product(Ar, Ai, Br, Bi, m)
        if hermitian:
            # anti-Hermitian operands: A B = (B A)^dagger
            return pr - pr.T, pi + pi.T
        qr, qi = wide_product(Br, Bi, Ar, Ai, m)
        return pr - qr, pi - qi

    c0dt = _M3_C0 * dt
    c1dt = _M3_C1 * dt

    def assemble_m3():
        """Magnus order-3 (6th order) assembly, transposed space.

        True-space rule (Blanes et al.; matches
        ``fixed_step_solvers.get_exponential_take_step`` magnus_order=3):
        ``a1 = h g2; a2 = (sqrt(15)/3) h (g3-g1); a3 = (10/3) h (g3-2g2+g1);
        C1 = [a1,a2]; C2 = [2a3+C1, a1]/60;
        Omega = a1 + a3/12 + [-20a1-a3+C1, a2+C2]/240``.
        Every commutator transposes as ``[X, Y]^T = [Y^T, X^T]``, so with
        tilde = transposed-space values each bracket below is computed
        operand-swapped. Register plan (g1/g3 die after a2/a3 form):
        g2 <- a1, t1 <- a2, t2 <- a3, ca <- C1, g1 <- Y, g3 <- X,
        t2 <- C2, t1 <- Z. Linear combos run whole-block on the VPU;
        the commutator wide products loop members (MXU)."""
        t1r[...] = c0dt * (g3r[...] - g1r[...])
        t1i[...] = c0dt * (g3i[...] - g1i[...])
        t2r[...] = c1dt * (g3r[...] - 2.0 * g2r[...] + g1r[...])
        t2i[...] = c1dt * (g3i[...] - 2.0 * g2i[...] + g1i[...])
        g2r[...] = dt * g2r[...]
        g2i[...] = dt * g2i[...]
        for m in range(bm):  # C1~ = [a2~, a1~]
            cr, ci = comm_t_vals(t1r, t1i, g2r, g2i, m)
            car[m] = cr
            cai[m] = ci
        mrr[:, 0:n, 0:n] = g2r[...] + (1.0 / 12.0) * t2r[...]
        mrr[:, 0:n, n:n2] = g2i[...] + (1.0 / 12.0) * t2i[...]
        g1r[...] = -20.0 * g2r[...] - t2r[...] + car[...]  # Y~
        g1i[...] = -20.0 * g2i[...] - t2i[...] + cai[...]
        g3r[...] = 2.0 * t2r[...] + car[...]  # X~
        g3i[...] = 2.0 * t2i[...] + cai[...]
        for m in range(bm):  # C2~ = [a1~, X~]/60
            cr, ci = comm_t_vals(g2r, g2i, g3r, g3i, m)
            t2r[m] = (1.0 / 60.0) * cr
            t2i[m] = (1.0 / 60.0) * ci
        t1r[...] = t1r[...] + t2r[...]  # Z~ = a2~ + C2~
        t1i[...] = t1i[...] + t2i[...]
        for m in range(bm):  # Omega~ += [Z~, Y~]/240
            fr, fi = comm_t_vals(t1r, t1i, g1r, g1i, m)
            mrr[m, 0:n, 0:n] = mrr[m, 0:n, 0:n] + (1.0 / 240.0) * fr
            mrr[m, 0:n, n:n2] = mrr[m, 0:n, n:n2] + (1.0 / 240.0) * fi
        mrr[:, n:n2, 0:n] = -mrr[:, 0:n, n:n2]
        mrr[:, n:n2, n:n2] = mrr[:, 0:n, 0:n]

    def body(step, _):
        if magnus == 3:
            targets = ((g1r, g1i), (g2r, g2i), (g3r, g3i))
            for g_idx, gc in enumerate((_GAUSS3_D1, _GAUSS3_D2, _GAUSS3_D3)):
                # one cos/sin pair reused per Gauss point: builds for point
                # g happen right after its rotation/phase
                phase_tables(step, gc, cos1, sin1)
                if hoist:
                    rotate_tables(g_idx, cos1, sin1)
                tr, ti = targets[g_idx]
                if build == "batched":
                    build_all(step, g_idx, tr, ti, cos1, sin1)
                else:
                    for m in range(bm):
                        build_one(step, g_idx, m, m, tr, ti, cos1, sin1)
            assemble_m3()
            v_s[...] = y_s[...]
            for kk in range(order, 0, -1):
                inv = 1.0 / kk
                for m in range(bm):
                    horner_iter(m, m, inv, horner == "mxu")
            y_s[...] = v_s[...]
            return 0
        phase_tables(step, _GAUSS_C1, cos1, sin1)
        phase_tables(step, _GAUSS_C2, cos2, sin2)
        if hoist:
            rotate_tables(0, cos1, sin1)
            rotate_tables(1, cos2, sin2)
        if resident:
            # all bm members' M matrices live at once; the Horner loop
            # interleaves members within each Taylor iteration so the MXU
            # pipelines independent mat-vec passes
            if build == "batched":
                build_all(step, 0, g1r, g1i, cos1, sin1)
                build_all(step, 1, g2r, g2i, cos2, sin2)
                assemble_all()
            else:
                for m in range(bm):
                    build_one(step, 0, m, m, g1r, g1i, cos1, sin1)
                    build_one(step, 1, m, m, g2r, g2i, cos2, sin2)
                for m in range(bm):
                    assemble_mrr(m)
            v_s[...] = y_s[...]
            if horner == "bvpu":
                # ALL members' mat-vecs in one fused multiply + sublane
                # reduction per Taylor iteration: w[m,i] = sum_j v[m,j]
                # (M_rr)^T[m,j,i] — replaces bm separate (1, 2n) MXU
                # passes (pass-overhead-bound at these shapes) with a
                # single (bm, 2n, 2n) VPU contraction and ONE
                # row->sublane relayout of v per iteration instead of bm
                for kk in range(order, 0, -1):
                    prod = mrr[...] * v_s[...][:, :, None]
                    w = jnp.sum(prod, axis=1)  # (bm, 2n)
                    v_s[...] = y_s[...] + (1.0 / kk) * w
            else:
                for kk in range(order, 0, -1):
                    inv = 1.0 / kk
                    for m in range(bm):
                        use_mxu = horner == "mxu" or (
                            horner == "hybrid" and m % 2 == 0
                        )
                        horner_iter(m, m, inv, use_mxu)
        else:
            # large n: one member's scratch at a time (VMEM-bounded); the
            # serialized mat-vec chain is throughput-bound at large K so
            # losing the cross-member interleave costs little. The member
            # loop is a fori_loop (traced m, dynamic slices) — unrolling it
            # at n >= 256 is a Mosaic compile hazard (>20 min observed).
            def member_body(m, _):
                build_one(step, 0, m, 0, g1r, g1i, cos1, sin1)
                build_one(step, 1, m, 0, g2r, g2i, cos2, sin2)
                assemble_mrr(0)
                row = pl.ds(m, 1)
                v_s[row, :] = y_s[row, :]
                for kk in range(order, 0, -1):
                    horner_iter(0, m, 1.0 / kk, horner != "vpu")
                return 0

            jax.lax.fori_loop(0, bm, member_body, 0)
        y_s[...] = v_s[...]
        return 0

    y_s[...] = y0_ref[...]
    jax.lax.fori_loop(0, T, body, 0)
    out_ref[...] = y_s[...]


def sweep_expm_magnus2_member(
    static_op, operators, frame_omega, coefficients, y0,
    dt, t0=0.0, order=8, block_m=8, interpret=False, hermitian=False,
    frame_omega_lo=None, horner="mxu", resident=None, hoist_rotation=None,
    build="member", magnus=2,
):
    """Public shim (host-side frequency split, see
    :func:`.sweep_solver.split_omega_host`) over the jitted member-major
    kernel. Args/returns match
    :func:`~qiskit_dynamics_tpu.ops.sweep_solver.sweep_expm_magnus2`
    (``coefficients`` (T, 2, k, B); ``y0``/result (n, B) complex, frame
    basis); ``block_m`` = members per Pallas program; ``horner`` = "mxu"
    (real-rep MXU mat-vec) or "vpu" (transposed-space sublane-reduce
    mat-vec, see module docstring); ``resident`` = keep all ``block_m``
    members' matrices in VMEM at once (defaults to ``n <= 64``; above that
    the ~16 MB scoped-VMEM budget forces the one-member-at-a-time path);
    ``hoist_rotation`` = frame-rotate the shared static/op tables once per
    step instead of per member (defaults to on whenever the rotated-table
    scratch fits ~4 MB VMEM; identical polynomial, f32-reassociation-level
    result differences only)."""
    if horner not in ("mxu", "vpu", "hybrid", "bvpu"):
        raise ValueError(
            f"horner must be 'mxu', 'vpu', 'hybrid' or 'bvpu', got {horner!r}"
        )
    if build not in ("member", "batched"):
        raise ValueError(f"build must be 'member' or 'batched', got {build!r}")
    if magnus not in (2, 3):
        raise ValueError(f"magnus must be 2 or 3, got {magnus!r}")
    if resident is None:
        resident = jnp.shape(y0)[0] <= 64
    if horner == "bvpu" and not resident:
        raise ValueError(
            "horner='bvpu' batches the Horner mat-vec across the resident "
            "member block; use 'mxu'/'vpu' in non-resident mode."
        )
    if build == "batched" and not resident:
        raise ValueError(
            "build='batched' builds the whole resident member block at once; "
            "use build='member' in non-resident mode."
        )
    if magnus == 3 and not resident:
        raise ValueError(
            "magnus=3 is implemented for the resident member block only "
            "(n <= 64); use the XLA engine for larger dimensions."
        )
    if magnus == 3 and horner not in ("mxu", "vpu"):
        raise ValueError("magnus=3 supports horner 'mxu' or 'vpu' only.")
    # run the whole solve in transposed space: M^T blocks come out of
    # the same kernel math fed with transposed statics, EXCEPT the
    # commutator flips sign ([G2,G1]^T = -[G2^T, G1^T])
    static_op = jnp.swapaxes(jnp.asarray(static_op), -1, -2)
    operators = jnp.swapaxes(jnp.asarray(operators), -1, -2)
    if frame_omega_lo is not None:
        # pre-split (hi, lo) pair: may be traced (custom-vjp AD path), so
        # transpose with jnp (the split is elementwise — it commutes with
        # the transpose)
        frame_omega = jnp.swapaxes(jnp.asarray(frame_omega), -1, -2)
        frame_omega_lo = jnp.swapaxes(jnp.asarray(frame_omega_lo), -1, -2)
    else:
        # unsplit: must be concrete host values (the f64 split needs bits)
        frame_omega, frame_omega_lo = split_omega_host(
            np.swapaxes(np.asarray(frame_omega), -1, -2)
        )
    return _sweep_expm_magnus2_member_jit(
        static_op, operators, frame_omega, frame_omega_lo, coefficients, y0,
        dt=dt, t0=t0, order=order, block_m=block_m, interpret=interpret,
        hermitian=hermitian, horner=horner, resident=bool(resident),
        hoist_rotation=hoist_rotation, build=str(build), magnus=int(magnus),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "dt", "t0", "order", "block_m", "interpret", "hermitian", "horner",
        "resident", "hoist_rotation", "build", "magnus",
    ),
)
def _sweep_expm_magnus2_member_jit(
    static_op, operators, frame_omega, frame_omega_lo, coefficients, y0,
    dt: float, t0: float = 0.0, order: int = 8, block_m: int = 8,
    interpret: bool = False, hermitian: bool = False, horner: str = "mxu",
    resident: bool = True, hoist_rotation=None, build: str = "member",
    magnus: int = 2,
):
    T, n_gauss, k, B = coefficients.shape
    if n_gauss != magnus:
        raise ValueError(
            f"coefficients carry {n_gauss} Gauss-point samples per step but "
            f"magnus={magnus} needs exactly {magnus}."
        )
    n = y0.shape[0]
    f32 = jnp.float32 if not jax.config.jax_enable_x64 else jnp.float64
    statr = jnp.real(static_op).astype(f32)
    stati = jnp.imag(static_op).astype(f32)
    opsr = jnp.real(operators).astype(f32)
    opsi = jnp.imag(operators).astype(f32)
    omh = jnp.asarray(frame_omega).astype(f32)
    oml = jnp.asarray(frame_omega_lo).astype(f32)
    # coefficient layout (B, T, 2k): members on the BLOCKED leading dim
    # (Mosaic requires blocked minor dims to be 128-divisible, so the member
    # block cannot ride the lane dim), the dynamic step index on the sublane
    # dim, the static (gauss, op) pair on lanes. The 2k lanes tile-pad to
    # 128 (~4 MB/block at T=1000, bm=8) — a trailing (2, k) pair would pad
    # to (8, 128) EACH: measured 16 MB scoped-VMEM OOM at T=1000.
    coef = jnp.asarray(coefficients).astype(f32)
    coef = jnp.moveaxis(coef.reshape(T, n_gauss * k, B), -1, 0)  # (B, T, gk)
    # real row states (B, 2n): [yr | yi] — the member block rides the
    # leading dim (same Mosaic blocking rule as the coefficients)
    y0r = jnp.real(y0).astype(f32).T
    y0i = jnp.imag(y0).astype(f32).T
    y0t = jnp.concatenate([y0r, y0i], axis=1)  # (B, 2n)

    pad = (-B) % block_m
    if pad:
        coef = jnp.concatenate(
            [coef, jnp.broadcast_to(coef[:1], (pad,) + coef.shape[1:])],
            axis=0,
        )
        y0t = jnp.concatenate(
            [y0t, jnp.broadcast_to(y0t[:1], (pad, 2 * n))], axis=0
        )
    n_blocks = (B + pad) // block_m

    # hoisted shared-table rotation: a VMEM-budget call — the Gauss points'
    # rotated (k+1)-table sets cost magnus*(k+1) n^2 * 2 arrays; skip the
    # hoist when that exceeds ~4 MB f32 (very large n or many operators)
    hoist = (
        hoist_rotation
        if hoist_rotation is not None
        else magnus * (k + 1) * n * n * 2 * 4 <= 4 * 1024 * 1024
    )
    kernel = functools.partial(
        _kernel, n, k, T, float(dt), float(t0), int(order), int(block_m),
        bool(hermitian), str(horner), -1.0, bool(resident), bool(hoist),
        str(build), int(magnus),
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    coef_spec = pl.BlockSpec(
        (block_m, T, n_gauss * k), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec(
        (block_m, 2 * n), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    n_slots = block_m if resident else 1
    mat_block = pltpu.VMEM((n_slots, n, n), f32)
    mat = pltpu.VMEM((n, n), f32)
    state_block = pltpu.VMEM((block_m, 2 * n), f32)

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            full(statr), full(stati), full(opsr), full(opsi), full(omh),
            full(oml), coef_spec, state_spec,
        ],
        out_specs=state_spec,
        out_shape=jax.ShapeDtypeStruct((B + pad, 2 * n), f32),
        scratch_shapes=(
            [mat_block] * 4
            + [
                pltpu.VMEM((n_slots, 2 * n, 2 * n), f32),
                pltpu.VMEM((2 * n, n), f32),
                pltpu.VMEM((n, 2 * n), f32),
            ]
            + [mat] * 4
            + [
                pltpu.VMEM(
                    (magnus * (k + 1), n, n) if hoist else (1, 1, 1), f32
                )
            ]
            * 2
            + [state_block] * 2
            + [
                pltpu.VMEM(
                    (block_m, 1, n) if build == "batched" else (1, 1, 1), f32
                )
            ]
            + [
                pltpu.VMEM((n_slots, n, n) if magnus == 3 else (1, 1, 1), f32)
            ]
            * 8
        ),
        interpret=interpret,
    )(statr, stati, opsr, opsi, omh, oml, coef, y0t)
    return (out[:B, :n] + 1j * out[:B, n:]).T  # back to (n, B)
