"""On-chip A/B of the poly engine's Horner modes at the dim-256 bench row.

Reproduces bench.py's lindblad256 row (solve_dim 256 vectorized two-transmon
Lindblad, B=2048, Magnus-3, dt=0.08 over [0, 10]) with
poly_horner="pallas" (VMEM-resident kernel) vs "einsum", plus a DOP853
accuracy probe on two members.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/lindblad256_horner_ab.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from qiskit_dynamics_tpu import Signal, Solver
from qiskit_dynamics_tpu.models import LindbladModel
from qiskit_dynamics_tpu.solvers import fused_sweep_solve

d4 = 4
a4 = np.diag(np.sqrt(np.arange(1, d4)), 1)
N4 = np.diag(np.arange(d4, dtype=float))
I4 = np.eye(d4)
H0b = (
    2 * np.pi * 5.0 * np.kron(N4, I4)
    + np.pi * (-0.33) * np.kron(N4 @ (N4 - I4), I4)
    + 2 * np.pi * 5.1 * np.kron(I4, N4)
    + np.pi * (-0.33) * np.kron(I4, N4 @ (N4 - I4))
    + 2 * np.pi * 0.002 * (np.kron(a4.conj().T, a4) + np.kron(a4, a4.conj().T))
)
Hdb = 2 * np.pi * 0.02 * np.kron(a4 + a4.conj().T, I4)
diss = [np.sqrt(0.005) * np.kron(a4, I4), np.sqrt(0.005) * np.kron(I4, a4)]
model = LindbladModel(
    static_hamiltonian=H0b, hamiltonian_operators=[Hdb],
    static_dissipators=diss, rotating_frame=np.diag(H0b), vectorized=True,
)
rho2 = np.zeros((16, 16), dtype=complex)
rho2[1, 1] = 1.0
B = 2048
amps = jnp.linspace(0.2, 1.0, B)
sig = lambda amp: ([Signal(lambda t: amp, carrier_freq=5.1)], None)


def steady(fn, min_s=1.0):
    fn()
    reps = 1
    while True:
        t0 = time.time()
        for _ in range(reps):
            fn()
        dt = time.time() - t0
        if dt >= min_s:
            return dt / reps, dt, reps
        reps = max(reps + 1, int(reps * 1.5 * min_s / max(dt, 1e-3)))


results = {}
for mode in ("pallas", "einsum"):
    run = jax.jit(
        lambda a, m=mode: fused_sweep_solve(
            model, sig, a, t_span=(0.0, 10.0), max_dt=0.08, y0=rho2,
            magnus_order=3, sweep_engine="poly", poly_horner=m,
        )
    )
    t0 = time.time()
    out = run(amps)
    probes = [0, B - 1]
    outs = [
        np.asarray(jnp.real(out[i])) + 1j * np.asarray(jnp.imag(out[i]))
        for i in probes
    ]
    print(f"{mode}: compile+first {time.time() - t0:.1f}s", flush=True)
    med, block, reps = steady(lambda r=run: np.asarray(jnp.real(r(amps))[0]))
    print(
        f"{mode}: steady {med:.3f}s/run (block {block:.2f}s x{reps}) -> "
        f"{B / med:.0f} sims/s", flush=True
    )
    results[mode] = (med, outs)

solver = Solver(
    static_hamiltonian=H0b, hamiltonian_operators=[Hdb],
    static_dissipators=diss, rotating_frame=np.diag(H0b),
)
for mode, (med, outs) in results.items():
    err = 0.0
    for j, i in enumerate([0, B - 1]):
        r = solver.solve(
            t_span=[0.0, 10.0], y0=rho2,
            signals=[Signal(lambda t, a=float(np.asarray(amps)[i]): a, carrier_freq=5.1)],
            method="DOP853", atol=1e-12, rtol=1e-12,
        )
        err = max(err, float(np.max(np.abs(outs[j] - np.asarray(r.y[-1])))))
    print(f"{mode}: max err vs DOP853(1e-12) = {err:.3e}", flush=True)
print(
    f"speedup pallas/einsum: {results['einsum'][0] / results['pallas'][0]:.2f}x",
    flush=True,
)
