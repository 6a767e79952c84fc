"""Headline benchmark: CR-gate amplitude-sweep throughput (BASELINE.md).

10k-point amplitude sweep of a two-transmon cross-resonance ``Solver``
(dim=16, rotating frame + RWA) on one chip, compared against single-core
NumPy/SciPy DOP853 (the reference's default solve path) at matched physics
accuracy. Uses the fused lockstep-adaptive dopri5 Pallas kernel
(``ops/adaptive_sweep.py``): the whole adaptive trajectory of each lane-tile
of sweep members executes inside one kernel (batch-on-lanes layout, all
intermediates in VMEM) — measured ~150x faster than the vmapped adaptive path
and ~2x faster than the fused fixed-step kernel, at better accuracy (6e-6).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sims/sec", "vs_baseline": N}``
"""
import json
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    from qiskit_dynamics_tpu.benchmarks import cr_solver
    from qiskit_dynamics_tpu.solvers import fused_adaptive_sweep_solve
    from qiskit_dynamics_tpu import Signal

    sweep_size = int(os.environ.get("BENCH_SWEEP_SIZE", "10000"))
    n_baseline = int(os.environ.get("BENCH_BASELINE_POINTS", "3"))
    log(f"backend={jax.default_backend()} sweep={sweep_size}")

    solver, w1 = cr_solver()
    dim = 16
    y0 = np.zeros(dim, dtype=complex)
    y0[0] = 1.0
    T = 100.0
    amp_scale = 0.02

    def signals_fn(amp):
        return [Signal(lambda t: amp * amp_scale, carrier_freq=w1)]

    sweep = jax.jit(
        lambda a: jnp.abs(
            fused_adaptive_sweep_solve(
                solver.model, signals_fn, a, t_span=(0.0, T), y0=y0,
                atol=1e-6, rtol=1e-6, h0=0.1,
                rwa_signal_map=solver._rwa_signal_map,
            )
        )
        ** 2
    )
    amps = jnp.linspace(0.25, 1.0, sweep_size)

    # NOTE: timing uses forced host transfers — on the axon TPU platform
    # block_until_ready is a no-op on the first dispatch of an executable.
    t0 = time.time()
    out = np.asarray(sweep(amps))
    log(f"compile+first run: {time.time() - t0:.1f}s")

    best = np.inf
    for _ in range(2):
        t0 = time.time()
        out = np.asarray(sweep(amps))
        best = min(best, time.time() - t0)
    device_throughput = sweep_size / best
    log(f"device: {best:.3f}s for {sweep_size} sims -> {device_throughput:.1f} sims/sec")

    # single-core NumPy/SciPy DOP853 baseline at matched accuracy, extrapolated
    check_idx = np.linspace(0, sweep_size - 1, n_baseline).astype(int)
    check_amps = np.asarray(amps)[check_idx]
    t0 = time.time()
    base_results = []
    for a in check_amps:
        r = solver.solve(
            t_span=[0.0, T],
            y0=y0,
            signals=[Signal(lambda t, a=a: a * amp_scale, carrier_freq=w1)],
            method="DOP853",
            atol=1e-8,
            rtol=1e-8,
        )
        base_results.append(np.abs(np.asarray(r.y[-1])) ** 2)
    numpy_time = (time.time() - t0) / n_baseline
    numpy_throughput = 1.0 / numpy_time
    log(f"numpy DOP853: {numpy_time:.3f}s/sim -> {numpy_throughput:.2f} sims/sec")

    # accuracy at the probe points (reuses the compiled 10k sweep's outputs)
    max_err = float(np.max(np.abs(out[check_idx] - np.asarray(base_results))))
    log(f"max |device - DOP853(1e-8)| over {n_baseline} probe points: {max_err:.2e}")

    # --- high-precision row: df32 sweep at the BASELINE 1e-8 agreement bar ---
    # (compensated double-float32, Magnus order-6; ops/df_sweep.py)
    df_metrics = {}
    if os.environ.get("BENCH_DF32", "1") == "1":
        from qiskit_dynamics_tpu.solvers import fused_sweep_solve

        df_sweep_size = int(os.environ.get("BENCH_DF32_SWEEP_SIZE", str(sweep_size)))
        df_amps = np.linspace(0.25, 1.0, df_sweep_size)
        df_kwargs = dict(
            t_span=(0.0, T), max_dt=0.2, y0=y0,
            rwa_signal_map=solver._rwa_signal_map, precision="df32",
        )
        t0 = time.time()
        df_out = fused_sweep_solve(solver.model, signals_fn, df_amps, **df_kwargs)
        log(f"df32 compile+first run: {time.time() - t0:.1f}s")
        t0 = time.time()
        df_out = fused_sweep_solve(solver.model, signals_fn, df_amps, **df_kwargs)
        df_time = time.time() - t0
        df_throughput = df_sweep_size / df_time
        log(f"df32 device: {df_time:.2f}s for {df_sweep_size} sims -> {df_throughput:.1f} sims/sec")

        df_idx = np.linspace(0, df_sweep_size - 1, n_baseline).astype(int)
        df_err = 0.0
        for i in df_idx:
            r = solver.solve(
                t_span=[0.0, T], y0=y0,
                signals=[Signal(lambda t, a=df_amps[i]: a * amp_scale, carrier_freq=w1)],
                method="DOP853", atol=1e-12, rtol=1e-12,
            )
            df_err = max(df_err, float(np.max(np.abs(df_out[i] - np.asarray(r.y[-1])))))
        log(f"df32 max |state - DOP853(1e-12)| over {n_baseline} probes: {df_err:.2e}")
        df_metrics = {
            "df32_throughput": round(df_throughput, 2),
            "df32_vs_baseline": round(df_throughput / numpy_throughput, 2),
            "df32_max_err": float(f"{df_err:.3g}"),
        }

    # --- gradient row: whole-sweep gradient through the fused fixed-step
    # kernel (custom vjp: Pallas primal, checkpointed XLA adjoint) ---
    grad_metrics = {}
    if os.environ.get("BENCH_GRAD", "1") == "1":
        try:
            from qiskit_dynamics_tpu.solvers import fused_sweep_solve

            def grad_loss(amps_in):
                yf = fused_sweep_solve(
                    solver.model, signals_fn, amps_in, t_span=(0.0, T),
                    max_dt=0.5, y0=y0, rwa_signal_map=solver._rwa_signal_map,
                )
                return jnp.mean(jnp.abs(yf[:, 1]) ** 2)

            gradfn = jax.jit(jax.grad(grad_loss))
            g_amps = jnp.linspace(0.25, 1.0, sweep_size)
            t0 = time.time()
            np.asarray(gradfn(g_amps))
            log(f"grad compile+first: {time.time() - t0:.1f}s")
            t0 = time.time()
            np.asarray(gradfn(g_amps))
            grad_time = time.time() - t0
            log(
                f"grad steady: {grad_time:.2f}s for {sweep_size}-point sweep "
                f"-> {sweep_size / grad_time:.0f} grad-sims/s"
            )
            grad_metrics = {"grad_sims_per_sec": round(sweep_size / grad_time, 1)}
        except Exception as exc:  # never let the grad row kill the bench JSON
            log(f"grad row failed: {exc!r}")

    # --- config-5 row: 3-transmon schedule batch through the fused kernel ---
    sched_metrics = {}
    if os.environ.get("BENCH_SCHEDULES", "1") == "1":
        from qiskit_dynamics_tpu.benchmarks import (
            gaussian_amp_schedules,
            three_transmon_backend,
        )

        n_sched = int(os.environ.get("BENCH_SCHEDULES_N", "256"))
        backend = three_transmon_backend()
        backend.set_options(solver_options={"method": "fused_dopri5"})
        scheds = gaussian_amp_schedules(np.linspace(0.05, 0.95, n_sched), duration=64)
        t0 = time.time()
        backend.solve(scheds)
        log(f"schedule batch compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        backend.solve(scheds)
        sched_time = time.time() - t0
        log(
            f"schedule batch steady: {sched_time:.3f}s for {n_sched} schedules "
            f"-> {n_sched / sched_time:.1f} schedules/s"
        )
        sched_metrics = {"schedules_per_sec_dim27": round(n_sched / sched_time, 1)}

    print(
        json.dumps(
            {
                "metric": "cr_sweep_throughput_dim16",
                "value": round(device_throughput, 2),
                "unit": "sims/sec",
                "vs_baseline": round(device_throughput / numpy_throughput, 2),
                **df_metrics,
                **grad_metrics,
                **sched_metrics,
            }
        )
    )


if __name__ == "__main__":
    main()
