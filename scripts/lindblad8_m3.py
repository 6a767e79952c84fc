"""On-chip throughput/accuracy of the Magnus order-3 member kernel on the
lindblad8 bench config (dim-8 vectorized Lindblad, solve_dim 64, 10,240
members, T=20). Compares magnus_order=3 at larger dt against the standing
magnus_order=2 @ dt=0.02 row and host DOP853(1e-12) references.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/lindblad8_m3.py
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

    probe_idx = [0, B // 2, B - 1]
    ham_solver = Solver(
        static_hamiltonian=H0, hamiltonian_operators=[Hd],
        static_dissipators=[np.sqrt(0.01) * a_op], rotating_frame=np.diag(H0),
    )
    refs = []
    for i in probe_idx:
        r = ham_solver.solve(
            t_span=[0.0, 20.0], y0=rho0,
            signals=[Signal(lambda t, a=l_amps[i]: a, carrier_freq=5.0)],
            method="DOP853", atol=1e-12, rtol=1e-12,
        )
        refs.append(np.asarray(r.y[-1]))

    rows = []
    for magnus, dt in ((2, 0.02), (3, 0.05), (3, 0.0625), (3, 0.08)):
        run = jax.jit(
            lambda a, _dt=dt, _m=magnus: fused_sweep_solve(
                lmodel, l_sig, a, t_span=(0.0, 20.0), max_dt=_dt, y0=rho0,
                sweep_engine="member", magnus_order=_m,
            )
        )
        amps = jnp.asarray(l_amps)
        try:
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
            err = float(max(np.max(np.abs(outs[j] - refs[j])) for j in range(3)))
            tp = B / steady
            log(f"magnus={magnus} dt={dt}: compile {compile_s:.0f}s steady "
                f"{steady:.2f}s -> {tp:.0f} sims/s, max err {err:.2e}")
            rows.append({"magnus": magnus, "dt": dt, "sims_per_sec": round(tp, 1),
                         "max_err": float(f"{err:.3g}"),
                         "compile_s": round(compile_s, 1)})
        except Exception as exc:
            log(f"magnus={magnus} dt={dt} FAILED: {exc!r}")
            rows.append({"magnus": magnus, "dt": dt, "error": repr(exc)[:300]})
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
