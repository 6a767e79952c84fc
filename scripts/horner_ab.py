"""A/B the Horner expm-action mat-vec formulations at the dim-256 row shape.

The poly engine's step cost is the order-8 Horner apply on (B, n, n) c64
step matrices with a single-column state (BENCHMARKS.md dim-256 row).
Candidates:
  einsum : current — batched GEMV, unit minor axis lane-padded to 128
  bmr    : broadcast-multiply-reduce on the VPU
  rowform: w'^T = w^T M^T — (B, 1, n) @ (B, n, n), sublane pad 1->8 only
Run on chip: PYTHONPATH=/root/repo:/root/.axon_site python scripts/horner_ab.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, N, T, ORD = 2048, 256, 125, 8


def make_inputs():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    Mr = jax.random.normal(k1, (B, N, N), jnp.float32) * 0.003
    Mi = jax.random.normal(k2, (B, N, N), jnp.float32) * 0.003
    vr = jax.random.normal(k3, (B, N), jnp.float32)
    return Mr, Mi, vr


def horner(step_matvec):
    def run(Mr, Mi, vr):
        M = (Mr + 1j * Mi).astype(jnp.complex64)
        v0 = vr.astype(jnp.complex64)

        def step(w, _):
            u = w
            for k in range(ORD, 0, -1):
                u = w + step_matvec(M, u) / k
            return u, None

        w, _ = jax.lax.scan(step, v0, None, length=T)
        return jnp.sum(jnp.real(w) ** 2 + jnp.imag(w) ** 2)

    return jax.jit(run)


def mv_einsum(M, u):  # u (B, n)
    return jnp.einsum("bij,bjm->bim", M, u[..., None])[..., 0]


def mv_bmr(M, u):
    return jnp.sum(M * u[:, None, :], axis=-1)


def mv_rowform(M, u):
    # w'[b,i] = sum_j M[b,i,j] u[b,j] = (u^T @ M^T)[b,0,i]
    return jnp.matmul(u[:, None, :], jnp.swapaxes(M, 1, 2))[:, 0, :]


def time_run(name, fn, args):
    t0 = time.time()
    out = float(np.asarray(fn(*args)))
    print(f"{name}: compile+first {time.time() - t0:.1f}s (out {out:.6g})")
    times = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(fn(*args)))
        times.append(time.time() - t0)
    med = sorted(times)[1]
    per_iter_us = med / (T * ORD) * 1e6
    print(
        f"{name}: median {med:.3f}s  ({per_iter_us:.0f} us/matvec-iter, "
        f"{B / med * T / T:.0f} eff-members/s-scale)"
    )
    return med


if __name__ == "__main__" and len(__import__("sys").argv) == 1:
    args = make_inputs()
    args = jax.device_put(args)
    jax.block_until_ready(args)
    for name, mv in [
        ("einsum ", mv_einsum),
        ("bmr    ", mv_bmr),
        ("rowform", mv_rowform),
    ]:
        time_run(name, horner(mv), args)


def run_pallas():
    """Chip A/B of the VMEM-resident kernel at the same shape."""
    from qiskit_dynamics_tpu.ops.horner_pallas import horner_apply_bm

    Mr, Mi, vr = make_inputs()
    vi = jnp.zeros_like(vr)
    # kernel takes transposed planes; transpose once outside the timed loop
    MTr = jnp.swapaxes(Mr, 1, 2)
    MTi = jnp.swapaxes(Mi, 1, 2)

    @jax.jit
    def run(MTr, MTi, vr, vi):
        def step(w, _):
            ur, ui = horner_apply_bm(MTr, MTi, w[0], w[1], order=ORD)
            return (ur, ui), None

        (ur, ui), _ = jax.lax.scan(step, (vr, vi), None, length=T)
        return jnp.sum(ur**2 + ui**2)

    args = jax.device_put((MTr, MTi, vr, vi))
    jax.block_until_ready(args)
    time_run("pallas ", run, args)


if __name__ == "__main__" and len(__import__("sys").argv) > 1:
    pass

if __name__ == "__main__" and len(__import__("sys").argv) > 1:
    run_pallas()
