"""Model layer tests: collections, generator/Hamiltonian/Lindblad models, RWA."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.linalg import expm

from qiskit_dynamics_tpu.models import (
    OperatorCollection,
    ScipySparseOperatorCollection,
    LindbladCollection,
    ScipySparseLindbladCollection,
    VectorizedLindbladCollection,
    vec_commutator,
    vec_dissipator,
    GeneratorModel,
    HamiltonianModel,
    LindbladModel,
    RotatingFrame,
    rotating_wave_approximation,
)
from qiskit_dynamics_tpu.signals import Signal
from qiskit_dynamics_tpu.exceptions import DynamicsError

rng = np.random.default_rng(123)

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Y = np.array([[0.0, -1j], [1j, 0.0]])
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)


def rand_herm(d):
    m = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    return m + m.conj().T


def rand_mat(d):
    return rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))


# --------------- collections ------------------------------------------------


def test_operator_collection_dense():
    ops = np.array([X, Z])
    static = np.eye(2, dtype=complex)
    coll = OperatorCollection(static_operator=static, operators=ops)
    c = np.array([2.0, -1.0])
    expected = static + 2 * X - Z
    np.testing.assert_allclose(coll.evaluate(c), expected)
    y = rand_mat(2)
    np.testing.assert_allclose(coll.evaluate_rhs(c, y), expected @ y)


def test_operator_collection_jax_sparse():
    ops = np.array([X, Z])
    coll = OperatorCollection(operators=ops, array_library="jax_sparse")
    c = jnp.array([0.5, 1.5])
    expected = 0.5 * X + 1.5 * Z
    np.testing.assert_allclose(coll.evaluate(c).todense(), expected)
    y = jnp.asarray(rand_mat(2))
    np.testing.assert_allclose(coll.evaluate_rhs(c, y), expected @ y, atol=1e-12)


def test_scipy_sparse_operator_collection():
    ops = [X, Z]
    coll = ScipySparseOperatorCollection(static_operator=np.eye(2), operators=ops)
    c = np.array([1.0, 2.0])
    expected = np.eye(2) + X + 2 * Z
    np.testing.assert_allclose(coll.evaluate(c).toarray(), expected)
    y1 = rng.normal(size=2)
    np.testing.assert_allclose(coll.evaluate_rhs(c, y1), expected @ y1)
    y2 = rng.normal(size=(2, 2))
    np.testing.assert_allclose(coll.evaluate_rhs(c, y2), expected @ y2)


def lindblad_rhs_explicit(H, rho, Ls, gammas, static_Ls=()):
    out = -1j * (H @ rho - rho @ H)
    for L in static_Ls:
        out = out + L @ rho @ L.conj().T - 0.5 * (L.conj().T @ L @ rho + rho @ L.conj().T @ L)
    for g, L in zip(gammas, Ls):
        out = out + g * (L @ rho @ L.conj().T - 0.5 * (L.conj().T @ L @ rho + rho @ L.conj().T @ L))
    return out


def test_lindblad_collection_vs_explicit():
    d = 3
    H0 = rand_herm(d)
    H1 = rand_herm(d)
    Ls = np.array([rand_mat(d), rand_mat(d)])
    Ns = np.array([rand_mat(d)])
    rho = rand_mat(d)
    ham_c = np.array([0.7])
    gam = np.array([0.2, 0.5])

    coll = LindbladCollection(
        static_hamiltonian=H0,
        hamiltonian_operators=np.array([H1]),
        static_dissipators=Ns,
        dissipator_operators=Ls,
    )
    out = coll.evaluate_rhs(ham_c, gam, rho)
    expected = lindblad_rhs_explicit(H0 + 0.7 * H1, rho, Ls, gam, static_Ls=Ns)
    np.testing.assert_allclose(out, expected, atol=1e-10)

    # batched density matrices
    rhos = np.array([rand_mat(d), rand_mat(d)])
    out_b = coll.evaluate_rhs(ham_c, gam, rhos)
    for i in range(2):
        np.testing.assert_allclose(
            out_b[i], lindblad_rhs_explicit(H0 + 0.7 * H1, rhos[i], Ls, gam, static_Ls=Ns),
            atol=1e-10,
        )


def test_scipy_sparse_lindblad_collection_matches_dense():
    d = 2
    H0 = rand_herm(d)
    Ls = np.array([rand_mat(d)])
    rho = rand_mat(d)
    gam = np.array([0.4])
    dense = LindbladCollection(static_hamiltonian=H0, dissipator_operators=Ls)
    sparse = ScipySparseLindbladCollection(static_hamiltonian=H0, dissipator_operators=Ls)
    np.testing.assert_allclose(
        dense.evaluate_rhs(None, gam, rho), sparse.evaluate_rhs(None, gam, rho), atol=1e-8
    )


def test_vectorized_lindblad_collection_matches_unvectorized():
    d = 2
    H0 = rand_herm(d)
    H1 = rand_herm(d)
    Ls = np.array([rand_mat(d)])
    rho = rand_mat(d)
    ham_c, gam = np.array([0.3]), np.array([0.8])

    unvec = LindbladCollection(
        static_hamiltonian=H0, hamiltonian_operators=np.array([H1]), dissipator_operators=Ls
    )
    vec = VectorizedLindbladCollection(
        static_hamiltonian=H0, hamiltonian_operators=np.array([H1]), dissipator_operators=Ls
    )
    expected = unvec.evaluate_rhs(ham_c, gam, rho)
    out_vec = vec.evaluate_rhs(ham_c, gam, rho.flatten(order="F"))
    np.testing.assert_allclose(out_vec, expected.flatten(order="F"), atol=1e-10)


def test_vec_commutator_dissipator_identities():
    d = 3
    A = rand_mat(d)
    rho = rand_mat(d)
    vc = vec_commutator(jnp.asarray(A))
    expected = -1j * (A @ rho - rho @ A)
    np.testing.assert_allclose(
        (vc @ rho.flatten(order="F")).reshape((d, d), order="F"), expected, atol=1e-10
    )
    L = rand_mat(d)
    vd = vec_dissipator(jnp.asarray(L))
    expected = L @ rho @ L.conj().T - 0.5 * (
        L.conj().T @ L @ rho + rho @ L.conj().T @ L
    )
    np.testing.assert_allclose(
        (vd @ rho.flatten(order="F")).reshape((d, d), order="F"), expected, atol=1e-10
    )


# --------------- generator / Hamiltonian models ------------------------------


def test_generator_model_evaluate_no_frame():
    model = GeneratorModel(
        static_operator=-1j * Z, operators=-1j * np.array([X]), signals=[Signal(1.0, carrier_freq=1.0)]
    )
    t = 0.23
    sig_val = np.cos(2 * np.pi * t)
    expected = -1j * Z + sig_val * (-1j * X)
    np.testing.assert_allclose(model.evaluate(t), expected, atol=1e-10)
    y = rand_mat(2)
    np.testing.assert_allclose(model.evaluate_rhs(t, y), expected @ y, atol=1e-10)


def test_generator_model_frame_consistency():
    """evaluate in frame == e^{-tF}(G(t)-F)e^{tF}."""
    frame_op = rand_herm(4)
    F = -1j * frame_op
    G0 = rand_mat(4)
    G0 = G0 - G0.conj().T  # anti-Hermitian static
    G1 = rand_mat(4)
    model = GeneratorModel(
        static_operator=G0,
        operators=np.array([G1]),
        signals=[Signal(0.5, carrier_freq=1.3)],
        rotating_frame=frame_op,
    )
    t = 0.4
    sig_val = 0.5 * np.cos(2 * np.pi * 1.3 * t)
    G_t = G0 + sig_val * G1
    expected = expm(-t * F) @ (G_t - F) @ expm(t * F)
    np.testing.assert_allclose(model.evaluate(t), expected, atol=1e-8)

    y = rand_mat(4) @ np.ones(4)
    np.testing.assert_allclose(model.evaluate_rhs(t, y), expected @ y, atol=1e-8)


def test_hamiltonian_model_storage_and_validation():
    ham = HamiltonianModel(
        static_operator=Z, operators=np.array([X]), signals=[Signal(1.0)]
    )
    np.testing.assert_allclose(ham.static_operator, Z)
    np.testing.assert_allclose(ham.operators, [X])
    # evaluate returns -i H form
    np.testing.assert_allclose(ham.evaluate(0.1), -1j * (Z + X), atol=1e-10)

    with pytest.raises(DynamicsError):
        HamiltonianModel(static_operator=np.array([[0, 1], [0, 0]]))


def test_hamiltonian_model_frame_matches_schrodinger():
    """RHS in rotating frame solves the frame-transformed Schrodinger equation."""
    H0 = np.diag([0.0, 1.0])
    ham = HamiltonianModel(
        static_operator=H0,
        operators=np.array([X]),
        signals=[Signal(0.2, carrier_freq=1.0)],
        rotating_frame=H0,
    )
    t = 0.3
    st = 0.2 * np.cos(2 * np.pi * 1.0 * t)
    F = -1j * H0
    G_t = -1j * (H0 + st * X)
    expected = expm(-t * F) @ (G_t - F) @ expm(t * F)
    np.testing.assert_allclose(ham.evaluate(t), expected, atol=1e-10)


def test_signals_length_validation():
    with pytest.raises(DynamicsError):
        GeneratorModel(operators=np.array([X, Z]), signals=[Signal(1.0)])


# --------------- Lindblad model -----------------------------------------------


def test_lindblad_model_vs_explicit_no_frame():
    d = 2
    H0 = rand_herm(d)
    L0 = rand_mat(d)
    model = LindbladModel(
        static_hamiltonian=H0,
        dissipator_operators=np.array([L0]),
        dissipator_signals=[Signal(0.3)],
    )
    rho = rand_mat(d)
    out = model.evaluate_rhs(0.0, rho)
    expected = lindblad_rhs_explicit(H0, rho, [L0], [0.3])
    np.testing.assert_allclose(out, expected, atol=1e-10)


def test_lindblad_model_frame_consistency():
    d = 2
    H0 = rand_herm(d)
    L0 = rand_mat(d)
    frame_op = rand_herm(d)
    F = -1j * frame_op
    model = LindbladModel(
        static_hamiltonian=H0,
        dissipator_operators=np.array([L0]),
        dissipator_signals=[Signal(1.0)],
        rotating_frame=frame_op,
    )
    t = 0.15
    rho = rand_mat(d)
    # frame-transformed RHS: e^{-tF} L(e^{tF} rho e^{-tF}) e^{tF} - [F, rho]... using
    # the generator form: rhs = U^dag(t) L(U rho U^dag) U where U = e^{tF}, minus
    # commutator with F from the frame derivative.
    U = expm(t * F)
    Ud = expm(-t * F)
    rho_lab = U @ rho @ Ud
    lab_rhs = lindblad_rhs_explicit(H0, rho_lab, [L0], [1.0])
    expected = Ud @ lab_rhs @ U - (F @ rho - rho @ F)
    np.testing.assert_allclose(model.evaluate_rhs(t, rho), expected, atol=1e-9)


def test_lindblad_model_vectorized_matches():
    d = 2
    H0 = rand_herm(d)
    L0 = rand_mat(d)
    kwargs = dict(
        static_hamiltonian=H0,
        hamiltonian_operators=np.array([X]),
        hamiltonian_signals=[Signal(0.4, carrier_freq=0.7)],
        dissipator_operators=np.array([L0]),
        dissipator_signals=[Signal(0.2)],
    )
    unvec = LindbladModel(**kwargs)
    vec = LindbladModel(**kwargs, vectorized=True)
    rho = rand_mat(d)
    t = 0.11
    expected = unvec.evaluate_rhs(t, rho)
    out = vec.evaluate_rhs(t, rho.flatten(order="F"))
    np.testing.assert_allclose(out, expected.flatten(order="F"), atol=1e-9)
    # vectorized generator applied to vec(rho) should also match
    gen = vec.evaluate(t)
    np.testing.assert_allclose(gen @ rho.flatten(order="F"), out, atol=1e-9)


def test_from_hamiltonian():
    ham = HamiltonianModel(
        static_operator=Z, operators=np.array([X]), signals=[Signal(1.0)]
    )
    lind = LindbladModel.from_hamiltonian(ham, static_dissipators=np.array([0.1 * X]))
    rho = rand_mat(2)
    expected = lindblad_rhs_explicit(Z + X, rho, [], [], static_Ls=[0.1 * X])
    np.testing.assert_allclose(lind.evaluate_rhs(0.0, rho), expected, atol=1e-10)


# --------------- RWA ------------------------------------------------------------


def test_rwa_generator_model():
    """RWA on a driven qubit in its own frame: standard result."""
    nu = 5.0
    H0 = 2 * np.pi * nu * Z / 2
    drive = Signal(1.0, carrier_freq=nu)
    ham = HamiltonianModel(
        static_operator=H0,
        operators=np.array([2 * np.pi * X / 2]),
        signals=[drive],
        rotating_frame=H0,
    )
    rwa_ham = rotating_wave_approximation(ham, cutoff_freq=2 * nu)
    assert rwa_ham.operators.shape[0] == 2
    # time-averaged generator should be finite and jit-evaluable
    val = jax.jit(lambda t: rwa_ham.evaluate_rhs(t, jnp.array([1.0, 0.0], dtype=complex)))(0.1)
    assert np.all(np.isfinite(val))


def test_rwa_highcutoff_equals_original():
    """With a cutoff above every frequency, the RWA model equals the original."""
    H0 = np.diag([0.0, 1.0])
    ham = HamiltonianModel(
        static_operator=H0,
        operators=np.array([X]),
        signals=[Signal(0.1, carrier_freq=0.2)],
        rotating_frame=H0,
    )
    rwa_ham, signal_map = rotating_wave_approximation(
        ham, cutoff_freq=1e6, return_signal_map=True
    )
    t = 0.77
    y = np.array([0.3 + 0.1j, -0.2j])
    np.testing.assert_allclose(rwa_ham.evaluate_rhs(t, y), ham.evaluate_rhs(t, y), atol=1e-10)
    # signal map duplicates signals
    mapped = signal_map(ham.signals)
    assert len(mapped) == 2


def test_rwa_lindblad():
    H0 = np.diag([0.0, 5.0])
    lind = LindbladModel(
        static_hamiltonian=H0,
        hamiltonian_operators=np.array([X]),
        hamiltonian_signals=[Signal(0.1, carrier_freq=5.0)],
        dissipator_operators=np.array([0.1 * X]),
        dissipator_signals=[Signal(1.0)],
        rotating_frame=H0,
    )
    rwa = rotating_wave_approximation(lind, cutoff_freq=7.0)
    rho = np.array([[1.0, 0.0], [0.0, 0.0]], dtype=complex)
    out = rwa.evaluate_rhs(0.1, rho)
    assert np.all(np.isfinite(out))
    assert rwa.hamiltonian_operators.shape[0] == 2
    assert rwa.dissipator_operators.shape[0] == 2


# --------------- jit/grad through models ------------------------------------


def test_model_jit_grad():
    H0 = np.diag([0.0, 1.0])

    def prob(amp):
        sig = Signal(amp, carrier_freq=1.0)
        ham = HamiltonianModel(
            static_operator=H0,
            operators=np.array([X]),
            signals=[sig],
            rotating_frame=H0,
            validate=False,
        )
        y = jnp.array([1.0, 0.0], dtype=complex)
        return jnp.real(jnp.sum(jnp.abs(ham.evaluate_rhs(0.5, y)) ** 2))

    g = jax.grad(prob)(0.8)
    assert np.isfinite(g)

    jitted = jax.jit(prob)
    np.testing.assert_allclose(jitted(0.8), prob(0.8), rtol=1e-12)
