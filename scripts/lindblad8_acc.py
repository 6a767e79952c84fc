"""Accuracy/throughput ladder for the lindblad8 bench row vs step size.

Measures, on the real chip, the member-engine throughput AND the max state
error vs host DOP853(1e-12) at a grid of step sizes — establishes whether
the bench config (dt=0.02) is truncation- or f32-roundoff-limited, i.e. how
much dt headroom a higher-order Magnus kernel can convert into throughput.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/lindblad8_acc.py
"""
import json
import os
import sys
import time

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    from qiskit_dynamics_tpu import Signal, Solver
    from qiskit_dynamics_tpu.models import LindbladModel
    from qiskit_dynamics_tpu.solvers import fused_sweep_solve

    dim8 = 8
    a_op = np.diag(np.sqrt(np.arange(1, dim8)), 1)
    N_op = np.diag(np.arange(dim8, dtype=float))
    H0 = 2 * np.pi * (5.0 * N_op - 0.33 / 2 * (N_op @ N_op - N_op))
    Hd = 2 * np.pi * 0.02 * (a_op + a_op.conj().T)
    lmodel = LindbladModel(
        static_hamiltonian=H0, hamiltonian_operators=[Hd],
        static_dissipators=[np.sqrt(0.01) * a_op],
        rotating_frame=np.diag(H0), vectorized=True,
    )
    rho0 = np.zeros((dim8, dim8), dtype=complex)
    rho0[1, 1] = 1.0
    B = 10240
    l_amps = np.linspace(0.2, 1.0, B)
    l_sig = lambda amp: ([Signal(lambda t: amp, carrier_freq=5.0)], None)

    # host f64 reference at 3 probe amps (scipy DOP853 on the vectorized ODE)
    probe_idx = [0, B // 2, B - 1]
    ham_solver = Solver(
        static_hamiltonian=H0, hamiltonian_operators=[Hd],
        static_dissipators=[np.sqrt(0.01) * a_op],
        rotating_frame=np.diag(H0),
    )
    refs = []
    t0 = time.time()
    for i in probe_idx:
        r = ham_solver.solve(
            t_span=[0.0, 20.0], y0=rho0,
            signals=[Signal(lambda t, a=l_amps[i]: a, carrier_freq=5.0)],
            method="DOP853", atol=1e-12, rtol=1e-12,
        )
        refs.append(np.asarray(r.y[-1]))
    log(f"host refs: {time.time() - t0:.1f}s")

    rows = []
    for dt in (0.02, 0.04, 0.1):
        run = jax.jit(
            lambda a, _dt=dt: fused_sweep_solve(
                lmodel, l_sig, a, t_span=(0.0, 20.0), max_dt=_dt, y0=rho0,
                sweep_engine="member",
            )
        )
        amps = jnp.asarray(l_amps)
        t0 = time.time()
        out = run(amps)
        outs = np.stack([
            np.asarray(jnp.real(out[i])) + 1j * np.asarray(jnp.imag(out[i]))
            for i in probe_idx
        ])
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(jnp.real(out := run(amps))[0])
            times.append(time.time() - t0)
        steady = float(np.median(times))
        err = float(
            max(np.max(np.abs(outs[j].reshape(8, 8) - refs[j])) for j in range(3))
        )
        tp = B / steady
        log(f"dt={dt}: compile {compile_s:.0f}s steady {steady:.2f}s -> {tp:.0f} sims/s, max err {err:.2e}")
        rows.append({"dt": dt, "sims_per_sec": round(tp, 1), "max_err": float(f"{err:.3g}")})
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
