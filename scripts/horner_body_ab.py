"""On-chip A/B of the Horner kernel BODY forms at the dim-256 row shape.

The unrolled body costs Mosaic ~26.5 min to compile at dim 256 (the whole
poly-engine sweep; the kernel dominates). This measures the loop body's
standalone cold compile + steady runtime vs the unrolled body (warm from
the persistent cache), at the bench kernel shape (B=2048, n=256, order 8).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/horner_body_ab.py
(pass --no-cache to cold-compile both bodies).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--no-cache" not in sys.argv:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from qiskit_dynamics_tpu.ops.horner_pallas import horner_apply_bm, horner_twin_bm

B, n, order = 2048, 256, 8
rng = np.random.default_rng(0)
# small-norm matrices (the rotating-frame Magnus regime the kernel serves)
MTr = jax.device_put(jnp.asarray(
    (rng.normal(size=(B, n, n)) * (0.3 / np.sqrt(n))).astype(np.float32)))
MTi = jax.device_put(jnp.asarray(
    (rng.normal(size=(B, n, n)) * (0.3 / np.sqrt(n))).astype(np.float32)))
vr = jax.device_put(jnp.asarray(rng.normal(size=(B, n)).astype(np.float32)))
vi = jax.device_put(jnp.asarray(rng.normal(size=(B, n)).astype(np.float32)))

outs = {}
for body in ("loop", "unrolled"):
    t0 = time.time()
    u = horner_apply_bm(MTr, MTi, vr, vi, order=order, body=body)
    ur = np.asarray(u[0])
    print(f"{body}: compile+first {time.time() - t0:.1f}s", flush=True)
    outs[body] = (ur, np.asarray(u[1]))
    # steady: >=1 s block of back-to-back calls, host-transfer a scalar
    f = lambda b=body: np.asarray(
        horner_apply_bm(MTr, MTi, vr, vi, order=order, body=b)[0][0, 0]
    )
    f()
    t1 = time.time(); f(); t1 = time.time() - t1
    reps = max(3, int(np.ceil(1.0 / max(t1, 1e-3))))
    t0 = time.time()
    for _ in range(reps):
        f()
    per = (time.time() - t0) / reps
    print(f"{body}: steady {per * 1e3:.2f} ms/call ({reps} reps)", flush=True)

d = max(
    float(np.max(np.abs(outs["loop"][0] - outs["unrolled"][0]))),
    float(np.max(np.abs(outs["loop"][1] - outs["unrolled"][1]))),
)
print(f"loop-vs-unrolled max abs diff: {d:.3e} (expect 0)", flush=True)
# jit the twin: eager complex arithmetic is UNIMPLEMENTED on axon TPU
tw = jax.jit(lambda a, b, c, e: horner_twin_bm(a, b, c, e, order=order))(
    MTr, MTi, vr, vi
)
dt_ = float(np.max(np.abs(outs["loop"][0] - np.asarray(tw[0]))))
print(f"loop-vs-XLA-twin max abs diff: {dt_:.3e}", flush=True)
