r"""Precomputed perturbative expansion model (the "Dysolve" compile step).

Reference behavior:
``/root/reference/qiskit_dynamics/solvers/perturbative_solvers/expansion_model.py``
(algorithm: Puzzuoli et al. arXiv:2210.11595; Shillito et al. "Dysolve").

At construction, for a generator :math:`G(t) = G_0 + \sum_j Re[f_j(t)
e^{i2\pi\nu_j t}] G_j`, the model computes a truncated Dyson/Magnus expansion
of the propagator over one step :math:`[0, \Delta t]` in the rotating frame of
:math:`G_0`, with perturbation variables being the Chebyshev coefficients of
the frequency-shifted envelopes. The result is packaged into an
:class:`ArrayPolynomial` — stepping then costs one monomial evaluation +
tensordot (+ ``expm`` for Magnus) per step.

TPU-first details: the Chebyshev basis is evaluated with an unrolled
three-term recurrence (trace-safe for both numpy and jax integration methods);
the multi-interval Discrete Chebyshev Transform of the signal envelopes is a
single vectorized evaluation ``M @ f(x_grid)`` that traces cleanly under jit
(so a ``DysonSolver.solve`` over traced signal parameters compiles into one
XLA program).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple, Union

import numpy as np
from numpy.polynomial.chebyshev import chebpts1, chebvander

import jax.numpy as jnp

from ...exceptions import DynamicsError
from ...unified import unp, contains_tracer
from ...models import RotatingFrame
from ...signals import Signal
from ...perturbation import solve_lmde_perturbation, ArrayPolynomial
from ..solver_functions import _is_jax_method

__all__ = ["ExpansionModel"]


def _cheb_basis(t, deg: int, dt: float):
    """T_deg on domain [0, dt], by the three-term recurrence (trace-safe)."""
    x = (2.0 * t - dt) / dt
    if deg == 0:
        return unp.ones_like(x) if hasattr(x, "shape") else 1.0
    t_prev, t_cur = 1.0, x
    for _ in range(deg - 1):
        t_prev, t_cur = t_cur, 2.0 * x * t_cur - t_prev
    return t_cur


def _construct_DCT(degree: int, domain: Optional[List] = None) -> Tuple[np.ndarray, np.ndarray]:
    """DCT matrix + sample points for interval ``domain``: coefficients of the
    Chebyshev interpolant of ``f`` are ``M @ f(x)``."""
    domain = domain or [-1, 1]
    order = degree + 1
    xcheb = chebpts1(order)
    xcheb_shifted = 0.5 * ((domain[1] - domain[0]) * xcheb + (domain[1] + domain[0]))
    dct_mat = chebvander(xcheb, degree).T.copy()
    dct_mat[0] /= order
    dct_mat[1:] /= 0.5 * order
    return dct_mat, xcheb_shifted


def _multi_interval_DCT(f: Callable, degree: int, t0: float, dt: float, n_intervals: int):
    """DCT of ``f`` over ``n_intervals`` contiguous intervals: one vectorized
    evaluation over the full (order, n_intervals) sample grid."""
    dct_mat, xcheb = _construct_DCT(degree, domain=[0, dt])
    interval_starts = t0 + np.arange(n_intervals) * dt
    x_vals = np.add.outer(xcheb, interval_starts)
    return unp.matmul(unp.asarray(dct_mat, dtype=complex), f(x_vals))


def _signal_envelope_DCT(
    signal: Signal, reference_freq: float, degree: int, t0: float, dt: float, n_intervals: int
):
    """Multi-interval DCT of a signal's envelope shifted to ``reference_freq``."""
    t_vals = t0 + np.arange(n_intervals) * dt
    phase_arg = -1j * 2 * np.pi * reference_freq
    final_phase_shift = np.exp(-phase_arg * t_vals)

    def shifted_env(t):
        return signal.complex_value(t) * unp.exp(phase_arg * unp.asarray(t))

    return _multi_interval_DCT(shifted_env, degree, t0, dt, n_intervals) * unp.expand_dims(
        unp.asarray(final_phase_shift), 0
    )


def _signal_list_envelope_DCT(
    signal_list,
    reference_freqs,
    degrees: List[int],
    t0: float,
    dt: float,
    n_intervals: int,
    include_imag: Optional[List[bool]] = None,
):
    """Stacked real/imag Chebyshev coefficients of every signal's shifted
    envelope, shape (n_vars, n_intervals)."""
    if include_imag is None:
        include_imag = [True] * len(signal_list)

    blocks = []
    for sig, freq, deg, inc_imag in zip(signal_list, reference_freqs, degrees, include_imag):
        coeffs = _signal_envelope_DCT(sig, freq, deg, t0, dt, n_intervals)
        blocks.append(unp.real(coeffs))
        if inc_imag:
            blocks.append(unp.imag(coeffs))
    return unp.concatenate(blocks, axis=0)


def _construct_cheb_perturbations(
    operators,
    chebyshev_orders: List[int],
    carrier_freqs,
    dt: float,
    rotating_frame: RotatingFrame,
    include_imag: Optional[List[bool]] = None,
) -> List[Callable]:
    r"""Perturbation callables ``cos(2πν t) T_m(t) G̃_j(t)`` and
    ``sin(-2πν t) T_m(t) G̃_j(t)`` with ``G̃_j(t)`` the operator in the
    rotating frame; ordered by (j, m), cosine block before sine block per j."""
    if include_imag is None:
        include_imag = [True] * len(operators)

    def make(deg, freq, op, trig):
        rad = 2 * np.pi * freq

        def func(t):
            op_in_frame = rotating_frame.operator_into_frame(t, op)
            carrier = unp.cos(rad * t) if trig == "cos" else unp.sin(-rad * t)
            return _cheb_basis(t, deg, dt) * carrier * op_in_frame

        return func

    perturbations = []
    for deg, op, freq, inc_imag in zip(chebyshev_orders, operators, carrier_freqs, include_imag):
        for k in range(deg + 1):
            perturbations.append(make(k, freq, op, "cos"))
        if inc_imag:
            for k in range(deg + 1):
                perturbations.append(make(k, freq, op, "sin"))
    return perturbations


class ExpansionModel:
    """Precomputed perturbative expansion of an LMDE over one fixed step."""

    def __init__(
        self,
        operators,
        rotating_frame,
        dt: float,
        carrier_freqs,
        chebyshev_orders: List[int],
        expansion_method: str = "dyson",
        expansion_order: Optional[int] = None,
        expansion_labels: Optional[List] = None,
        integration_method: Optional[str] = None,
        include_imag: Optional[List[bool]] = None,
        **kwargs,
    ):
        if expansion_method not in ["dyson", "magnus"]:
            raise DynamicsError(
                "ExpansionModel only accepts expansion_method 'dyson' or 'magnus'."
            )
        operators = np.asarray(operators)
        carrier_freqs = np.asarray(carrier_freqs)
        if len(operators) != len(carrier_freqs):
            raise DynamicsError("carrier_freqs must have the same length as operators.")
        if len(operators) != len(chebyshev_orders):
            raise DynamicsError("chebyshev_orders must have the same length as operators.")

        self._expansion_method = expansion_method
        self._dt = dt
        if include_imag is None:
            include_imag = [True] * len(carrier_freqs)
        self._include_imag = include_imag
        self._carrier_freqs = carrier_freqs
        self._chebyshev_orders = list(chebyshev_orders)
        self._operators = operators

        self._rotating_frame = (
            rotating_frame
            if isinstance(rotating_frame, RotatingFrame)
            else RotatingFrame(rotating_frame)
        )
        dim = operators[0].shape[0]
        self._Udt = np.asarray(
            self._rotating_frame.state_out_of_frame(dt, np.eye(dim, dtype=complex))
        )

        if integration_method is None:
            integration_method = "DOP853"

        perturbations = _construct_cheb_perturbations(
            operators, chebyshev_orders, carrier_freqs, dt, self._rotating_frame, include_imag
        )

        results = solve_lmde_perturbation(
            perturbations=perturbations,
            t_span=[0, dt],
            expansion_method=expansion_method,
            expansion_order=expansion_order,
            expansion_labels=expansion_labels,
            integration_method=integration_method,
            **kwargs,
        )

        data = np.asarray(results.perturbation_data.data)
        if expansion_method == "dyson":
            # premultiply by the single-step frame change: stepping then maps
            # frame-basis state directly
            data = self._Udt @ data
            self._expansion_polynomial = ArrayPolynomial(
                constant_term=self._Udt,
                array_coefficients=data[:, -1],
                monomial_labels=results.perturbation_data.labels,
            )
        else:
            self._expansion_polynomial = ArrayPolynomial(
                array_coefficients=data[:, -1],
                monomial_labels=results.perturbation_data.labels,
            )

    @property
    def expansion_method(self) -> str:
        """Perturbation method used in solver."""
        return self._expansion_method

    @property
    def dt(self) -> float:
        """Step size of solver."""
        return self._dt

    @property
    def Udt(self) -> np.ndarray:
        """Single-step frame transformation."""
        return self._Udt

    @property
    def operators(self) -> np.ndarray:
        """Original operators in the generator."""
        return self._operators

    @property
    def rotating_frame(self) -> RotatingFrame:
        """Rotating frame."""
        return self._rotating_frame

    @property
    def expansion_polynomial(self) -> ArrayPolynomial:
        """ArrayPolynomial evaluating the perturbation series."""
        return self._expansion_polynomial

    def approximate_signals(self, signals, t0: float, n_steps: int):
        """Chebyshev coefficients of the signals over ``n_steps`` intervals,
        shape (n_vars, n_steps). Trace-safe in the signal parameters."""
        return _signal_list_envelope_DCT(
            signals,
            reference_freqs=self._carrier_freqs,
            degrees=self._chebyshev_orders,
            t0=t0,
            dt=self._dt,
            n_intervals=n_steps,
            include_imag=self._include_imag,
        )

    def evaluate(self, coeffs):
        """Evaluate the expansion polynomial at Chebyshev coefficients."""
        return self._expansion_polynomial(coeffs)

    # ------------------------------------------------------------------ #
    # checkpointing — the precompute is expensive; the reference recomputes
    # it on every construction (SURVEY.md §5). Here it can be saved/loaded.
    # ------------------------------------------------------------------ #

    def save(self, path: str):
        """Serialize the precomputed expansion to an ``.npz`` checkpoint."""
        poly = self._expansion_polynomial
        np.savez(
            path,
            expansion_method=self._expansion_method,
            dt=self._dt,
            Udt=self._Udt,
            operators=self._operators,
            carrier_freqs=self._carrier_freqs,
            chebyshev_orders=np.asarray(self._chebyshev_orders),
            include_imag=np.asarray(self._include_imag),
            frame_operator=np.asarray(
                self._rotating_frame.frame_operator
                if self._rotating_frame.frame_operator is not None
                else np.zeros(self._Udt.shape, dtype=complex)
            ),
            poly_constant=np.asarray(
                poly.constant_term
                if poly.constant_term is not None
                else np.zeros(self._Udt.shape, dtype=complex)
            ),
            poly_has_constant=poly.constant_term is not None,
            poly_coefficients=np.asarray(poly.array_coefficients),
            poly_labels=np.asarray(
                [",".join(map(str, label)) for label in poly.monomial_labels]
            ),
        )

    @classmethod
    def load(cls, path: str) -> "ExpansionModel":
        """Reconstruct an ExpansionModel from a checkpoint without recompute."""
        data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        obj = object.__new__(cls)
        obj._expansion_method = str(data["expansion_method"])
        obj._dt = float(data["dt"])
        obj._Udt = data["Udt"]
        obj._operators = data["operators"]
        obj._carrier_freqs = data["carrier_freqs"]
        obj._chebyshev_orders = list(data["chebyshev_orders"])
        obj._include_imag = [bool(b) for b in data["include_imag"]]
        obj._rotating_frame = RotatingFrame(data["frame_operator"])
        labels = [
            tuple(int(i) for i in s.split(",")) if s else ()
            for s in data["poly_labels"]
        ]
        obj._expansion_polynomial = ArrayPolynomial(
            constant_term=data["poly_constant"] if bool(data["poly_has_constant"]) else None,
            array_coefficients=data["poly_coefficients"],
            monomial_labels=labels,
        )
        return obj
