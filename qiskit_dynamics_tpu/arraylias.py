"""Array-dispatch compatibility layer.

The reference's L0 is a 4-way arraylias dispatch
(``/root/reference/qiskit_dynamics/arraylias/alias.py``: numpy / scipy_sparse /
jax / jax_sparse global aliases). This framework replaces it with ONE JAX core
plus the 2-way host/trace rule in :mod:`.unified` — this module exposes the
reference's public names so user code written against the reference's L0 API
keeps working:

- ``DYNAMICS_NUMPY`` (``unp``): unified numpy-compatible namespace.
- ``DYNAMICS_NUMPY_ALIAS``: callable ``(like=...)`` returning a namespace with
  ``asarray`` honoring the requested array library.
- ``DYNAMICS_SCIPY``: scipy dispatch (host scipy / jax.scipy under trace).
- ``ArrayLike``; ``requires_array_library`` decorator (a no-op here — every
  library the unified core supports is always available).
"""
from __future__ import annotations

import functools

import numpy as np
import scipy
import jax
import jax.numpy as jnp
import jax.scipy
from jax.experimental import sparse as jsparse
from scipy.sparse import csr_matrix

from .dtypes import ArrayLike
from .unified import unp, contains_tracer

__all__ = [
    "DYNAMICS_NUMPY",
    "DYNAMICS_NUMPY_ALIAS",
    "DYNAMICS_SCIPY",
    "DYNAMICS_SCIPY_ALIAS",
    "ArrayLike",
    "requires_array_library",
]

DYNAMICS_NUMPY = unp


class _ScipyDispatch:
    """scipy on host values, jax.scipy on traced values."""

    def __getattr__(self, name):
        host = getattr(scipy, name, None)
        traced = getattr(jax.scipy, name, None)

        class _Sub:
            def __getattr__(self, fn_name):
                def fn(*args, **kwargs):
                    mod = traced if contains_tracer(*args) and traced is not None else host
                    return getattr(mod, fn_name)(*args, **kwargs)

                return fn

        if callable(host):
            def fn(*args, **kwargs):
                mod = traced if contains_tracer(*args) and traced is not None else host
                return mod(*args, **kwargs)

            return fn
        return _Sub()


DYNAMICS_SCIPY = _ScipyDispatch()


class _NumpyAlias:
    """``DYNAMICS_NUMPY_ALIAS(like=...)`` -> namespace whose ``asarray``
    coerces to the requested array library (numpy / jax / jax_sparse /
    scipy_sparse)."""

    def __call__(self, like=None):
        lib = like if isinstance(like, (str, type(None))) else self.infer_libs(like)[0]

        class _Namespace:
            @staticmethod
            def asarray(x, dtype=None):
                if hasattr(x, "full") and callable(x.full):
                    x = x.full()  # qutip Qobj duck-typing (reference asarray.py:36-59)
                if lib in (None, "numpy"):
                    return np.asarray(x, dtype=dtype)
                if lib == "jax":
                    return jnp.asarray(x, dtype=dtype)
                if lib == "jax_sparse":
                    if isinstance(x, jsparse.BCOO):
                        return x
                    arr = jnp.asarray(x, dtype=dtype)
                    n_batch = 1 if arr.ndim == 3 else 0
                    return jsparse.BCOO.fromdense(arr, n_batch=n_batch)
                if lib == "scipy_sparse":
                    arr = np.asarray(x)
                    if arr.ndim == 3:
                        return [csr_matrix(m) for m in arr]
                    return csr_matrix(arr)
                raise ValueError(f"Unknown array library {lib}.")

            def __getattr__(self, name):
                return getattr(unp, name)

        return _Namespace()

    @staticmethod
    def infer_libs(x):
        """Infer the array library of a value (tuple, most specific first)."""
        if isinstance(x, jsparse.BCOO):
            return ("jax_sparse",)
        if isinstance(x, jax.Array) or contains_tracer(x):
            return ("jax",)
        if isinstance(x, csr_matrix) or (
            isinstance(x, (list, tuple)) and x and isinstance(x[0], csr_matrix)
        ):
            return ("scipy_sparse",)
        return ("numpy",)


DYNAMICS_NUMPY_ALIAS = _NumpyAlias()


class _ScipyAlias:
    """``DYNAMICS_SCIPY_ALIAS(like=...)`` -> scipy-flavored namespace for the
    requested array library (reference ``alias.py``: the scipy alias registers
    scipy for numpy arrays and ``jax.scipy`` for jax arrays). Since the shim's
    only real backends are numpy and jax, anything jax-flavored returns the
    trace-aware :data:`DYNAMICS_SCIPY` dispatcher bound to ``jax.scipy``."""

    def __call__(self, like=None):
        lib = (
            like
            if isinstance(like, (str, type(None)))
            else _NumpyAlias.infer_libs(like)[0]
        )
        if lib in ("jax", "jax_sparse"):
            return jax.scipy
        return DYNAMICS_SCIPY


DYNAMICS_SCIPY_ALIAS = _ScipyAlias()


def requires_array_library(lib: str):
    """Decorator marking a function as requiring an array library.

    In the reference this raises when the optional library is missing
    (``alias.py:151-203``); here every supported library ships with the core,
    so this is a transparent pass-through kept for API compatibility.
    """

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            return func(*args, **kwargs)

        return wrapper

    return decorator
