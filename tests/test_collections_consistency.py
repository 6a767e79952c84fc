"""Lindblad-collection term-subset consistency battery (mirrors the
reference's test_operator_collections.py "consistency_*" family): every
combination of {static hamiltonian, hamiltonian operators, static
dissipators, dissipator operators} present/absent must agree across the
dense, scipy-sparse, jax-sparse, and vectorized implementations and match
the explicit Lindblad formula."""
import itertools

import numpy as np
import pytest

from qiskit_dynamics_tpu.models.operator_collections import (
    LindbladCollection,
    ScipySparseLindbladCollection,
    VectorizedLindbladCollection,
    ScipySparseVectorizedLindbladCollection,
)

RNG = np.random.default_rng(1234)
N = 3


def _rand(shape, scale=1.0):
    return scale * (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape))


H0 = (lambda a: (a + a.conj().T) / 2)(_rand((N, N)))
HK = np.stack([(lambda a: (a + a.conj().T) / 2)(_rand((N, N), 0.5)) for _ in range(2)])
L0 = np.stack([_rand((N, N), 0.3)])
LK = np.stack([_rand((N, N), 0.2), _rand((N, N), 0.25)])
HAM_C = np.array([0.7, -0.4])
DIS_C = np.array([0.5, 0.9])
RHO = (lambda a: a + a.conj().T)(_rand((N, N)))


def _explicit_rhs(static_h, ham_ops, static_d, dis_ops, ham_c, dis_c, rho):
    H = np.zeros((N, N), dtype=complex)
    if static_h is not None:
        H = H + static_h
    if ham_ops is not None:
        H = H + np.tensordot(ham_c, ham_ops, axes=1)
    out = -1j * (H @ rho - rho @ H)
    diss = []
    if static_d is not None:
        diss.extend(list(static_d))
    if dis_ops is not None:
        diss.extend([np.sqrt(complex(c)) * L for c, L in zip(dis_c, dis_ops)])
    for L in diss:
        out = out + L @ rho @ L.conj().T - 0.5 * (
            L.conj().T @ L @ rho + rho @ L.conj().T @ L
        )
    return out


SUBSETS = [
    combo
    for combo in itertools.product([False, True], repeat=4)
    if any(combo)  # all-empty raises by design
]


@pytest.mark.parametrize("has_h0,has_hk,has_l0,has_lk", SUBSETS)
def test_subset_consistency_across_implementations(has_h0, has_hk, has_l0, has_lk):
    kwargs = dict(
        static_hamiltonian=H0 if has_h0 else None,
        hamiltonian_operators=HK if has_hk else None,
        static_dissipators=L0 if has_l0 else None,
        dissipator_operators=LK if has_lk else None,
    )
    ham_c = HAM_C if has_hk else None
    dis_c = DIS_C if has_lk else None

    expect = _explicit_rhs(
        kwargs["static_hamiltonian"], kwargs["hamiltonian_operators"],
        kwargs["static_dissipators"], kwargs["dissipator_operators"],
        ham_c, dis_c, RHO,
    )

    dense = LindbladCollection(**kwargs)
    out_dense = np.asarray(dense.evaluate_rhs(ham_c, dis_c, RHO))
    np.testing.assert_allclose(out_dense, expect, atol=1e-10)

    sp = ScipySparseLindbladCollection(**kwargs)
    np.testing.assert_allclose(
        np.asarray(sp.evaluate_rhs(ham_c, dis_c, RHO)), expect, atol=1e-10
    )

    jx = LindbladCollection(**kwargs, array_library="jax_sparse")
    np.testing.assert_allclose(
        np.asarray(jx.evaluate_rhs(ham_c, dis_c, RHO)), expect, atol=1e-10
    )

    vec = VectorizedLindbladCollection(**kwargs)
    out_vec = np.asarray(vec.evaluate_rhs(ham_c, dis_c, RHO.flatten(order="F")))
    np.testing.assert_allclose(
        out_vec.reshape((N, N), order="F"), expect, atol=1e-10
    )

    spvec = ScipySparseVectorizedLindbladCollection(**kwargs)
    out_spv = np.asarray(spvec.evaluate_rhs(ham_c, dis_c, RHO.flatten(order="F")))
    np.testing.assert_allclose(
        out_spv.reshape((N, N), order="F"), expect, atol=1e-10
    )


@pytest.mark.parametrize("has_h0,has_hk", [(True, False), (False, True), (True, True)])
def test_evaluate_hamiltonian_subsets(has_h0, has_hk):
    kwargs = dict(
        static_hamiltonian=H0 if has_h0 else None,
        hamiltonian_operators=HK if has_hk else None,
        static_dissipators=L0,
    )
    ham_c = HAM_C if has_hk else None
    expect = np.zeros((N, N), dtype=complex)
    if has_h0:
        expect = expect + H0
    if has_hk:
        expect = expect + np.tensordot(HAM_C, HK, axes=1)
    dense = LindbladCollection(**kwargs)
    np.testing.assert_allclose(
        np.asarray(dense.evaluate_hamiltonian(ham_c)), expect, atol=1e-12
    )
    sp = ScipySparseLindbladCollection(**kwargs)
    out_sp = sp.evaluate_hamiltonian(ham_c)
    out_sp = out_sp.toarray() if hasattr(out_sp, "toarray") else np.asarray(out_sp)
    np.testing.assert_allclose(out_sp, expect, atol=1e-12)
