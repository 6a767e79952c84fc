"""A/B the member-major engine's gen-2 batched build on the real chip.

Round-3 tuning campaign (BENCHMARKS.md "Large-dim" section) diagnosed the
per-member VPU build/assembly op stream as the ~1,300 sims/s plateau of the
gen-1 member kernel and produced the gen-2 whole-block layout
(``build="batched"``, ``ops/member_sweep.py:203-263``) — interpret-verified
to 1e-15 but never timed on real Mosaic. This script runs the exact
lindblad8 bench config (bench.py "large-dim row": dim-8 vectorized Lindblad,
solve_dim 64, 10,240-member amplitude sweep, 1,000 Magnus-2 steps) through
``fused_sweep_solve`` for a (build, horner) matrix and prints one JSON line
per variant, plus cross-variant agreement.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_member_build.py
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


def median_time(fn, repeats=3):
    times = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    from qiskit_dynamics_tpu import Signal
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
    l_amps = jnp.linspace(0.2, 1.0, 10240)
    l_sig = lambda amp: ([Signal(lambda t: amp, carrier_freq=5.0)], None)

    variants = [
        {"member_build": "member", "member_horner": "mxu"},   # gen-1 baseline
        {"member_build": "batched", "member_horner": "mxu"},  # gen-2
        {"member_build": "batched", "member_horner": "bvpu"}, # gen-2 + batched horner
    ]
    if os.environ.get("AB_EXTRA", "0") == "1":
        variants += [
            {"member_build": "batched", "member_horner": "hybrid"},
            {"member_build": "member", "member_horner": "bvpu"},
        ]

    outs = {}
    results = []
    for v in variants:
        tag = f"{v['member_build']}/{v['member_horner']}"
        run = jax.jit(
            lambda a, _v=tuple(sorted(v.items())): jnp.abs(
                fused_sweep_solve(
                    lmodel, l_sig, a, t_span=(0.0, 20.0), max_dt=0.02,
                    y0=rho0, sweep_engine="member", **dict(_v),
                )
            ) ** 2
        )
        try:
            t0 = time.time()
            out = np.asarray(run(l_amps))
            compile_s = time.time() - t0
            log(f"[{tag}] compile+first: {compile_s:.1f}s")
            steady = median_time(lambda: np.asarray(run(l_amps)))
            tp = 10240 / steady
            log(f"[{tag}] steady (median of 3): {steady:.2f}s -> {tp:.0f} sims/s")
            outs[tag] = out
            results.append(
                {"variant": tag, "sims_per_sec": round(tp, 1),
                 "steady_s": round(steady, 3), "compile_s": round(compile_s, 1)}
            )
        except Exception as exc:
            log(f"[{tag}] FAILED: {exc!r}")
            results.append({"variant": tag, "error": repr(exc)[:300]})

    tags = list(outs)
    agreement = {}
    for t in tags[1:]:
        agreement[f"{tags[0]} vs {t}"] = float(
            f"{np.max(np.abs(outs[tags[0]] - outs[t])):.3g}"
        )
    print(json.dumps({"rows": results, "agreement": agreement}))


if __name__ == "__main__":
    main()
