"""Hamiltonian string parser battery.

Reference analog: ``/root/reference/test/dynamics/backend/
test_backend_string_parser.py`` — error-path coverage plus hand-kron
correctness of every operator token, tensor embedding, channel collection,
``_SUM`` expansion, and subsystem filtering.
"""
import numpy as np
import pytest

from qiskit_dynamics_tpu.backend import parse_backend_hamiltonian_dict
from qiskit_dynamics_tpu.exceptions import DynamicsError

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Y = np.array([[0.0, -1j], [1j, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
SM = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)  # lowering = a for dim 2
N2 = np.diag([0.0, 1.0]).astype(complex)


def parse(h_str, qub=None, vars_=None, subsystem_list=None):
    return parse_backend_hamiltonian_dict(
        {"h_str": h_str, "qub": qub or {"0": 2}, "vars": vars_ or {}},
        subsystem_list=subsystem_list,
    )


class TestParserErrors:
    @pytest.mark.parametrize(
        "ham",
        [
            {"h_str": [], "qub": {"0": 2}},
            {"h_str": [""], "qub": {"0": 2}},
            {"h_str": ["X0"], "qub": {}},
            {"h_str": ["X0"], "qub": {"0": 2}, "osc": {"0": 5}},
        ],
    )
    def test_structure_errors(self, ham):
        with pytest.raises(DynamicsError):
            parse_backend_hamiltonian_dict(ham)

    @pytest.mark.parametrize(
        "term",
        [
            "r*X0||",          # empty channel
            "r*X0|D0",         # single pipe
            "r*X0||Q0",        # bad channel char
            "r*X0||Dx",        # non-digit channel index
            "r*X0||D0||D1",    # too many pipes
        ],
    )
    def test_malformed_channel(self, term):
        with pytest.raises(DynamicsError):
            parse([term], vars_={"r": 1.0})

    def test_unknown_operator(self):
        with pytest.raises(DynamicsError):
            parse(["W0"])

    def test_invalid_character(self):
        with pytest.raises(DynamicsError):
            parse(["X0 @ X0"])

    def test_mismatched_parens(self):
        with pytest.raises(DynamicsError):
            parse(["(X0"])
        with pytest.raises(DynamicsError):
            parse(["X0)"])

    def test_scalar_only_term(self):
        with pytest.raises(DynamicsError):
            parse(["2*v"], vars_={"v": 1.0})

    def test_malformed_sum(self):
        with pytest.raises(DynamicsError):
            parse(["_SUM[i,0,1]"], qub={"0": 2, "1": 2})

    def test_unknown_sum_index_var(self):
        with pytest.raises(DynamicsError):
            parse(["_SUM[i,0,1,X{j}]"], qub={"0": 2, "1": 2})


class TestOperatorTokens:
    """Every operator token vs its hand-built matrix (single dim-3 subsystem)."""

    A3 = np.diag(np.sqrt([1.0, 2.0]), 1).astype(complex)
    N3 = np.diag([0.0, 1.0, 2.0]).astype(complex)

    @pytest.mark.parametrize(
        "token,expected",
        [
            ("X", A3 + A3.conj().T),
            ("Y", -1j * (A3 - A3.conj().T)),
            ("Z", np.eye(3) - 2 * N3),
            ("a", A3),
            ("A", A3),
            ("Sm", A3),
            ("Sp", A3.conj().T),
            ("C", A3.conj().T),
            ("N", N3),
            ("O", N3),
            ("I", np.eye(3).astype(complex)),
        ],
    )
    def test_token(self, token, expected):
        static, _, _, _ = parse([f"{token}0"], qub={"0": 3})
        np.testing.assert_allclose(static, expected, atol=1e-12)


class TestParsingSemantics:
    def test_tensor_embedding_little_endian(self):
        """Subsystem 0 is the LAST kron factor (qiskit convention)."""
        static, _, _, _ = parse(["X0"], qub={"0": 2, "1": 2})
        np.testing.assert_allclose(static, np.kron(np.eye(2), X), atol=1e-12)
        static, _, _, _ = parse(["X1"], qub={"0": 2, "1": 2})
        np.testing.assert_allclose(static, np.kron(X, np.eye(2)), atol=1e-12)

    def test_product_and_vars(self):
        static, _, _, _ = parse(
            ["w*X0*Y1"], qub={"0": 2, "1": 2}, vars_={"w": 0.5}
        )
        np.testing.assert_allclose(static, 0.5 * np.kron(Y, X), atol=1e-12)

    def test_var_name_prefix_shadowing(self):
        """Longer variable names substitute before their prefixes."""
        static, _, _, _ = parse(
            ["om*X0+omega*Z0"], vars_={"om": 2.0, "omega": 3.0}
        )
        np.testing.assert_allclose(static, 2.0 * X + 3.0 * Z, atol=1e-12)

    def test_channels_collected_sorted(self):
        static, ops, channels, dims = parse(
            ["v*Z0", "r*X0||D0", "r*Y0||U1", "r*X0||D0"],
            vars_={"v": 1.0, "r": 0.5},
        )
        assert channels == ["d0", "u1"]
        np.testing.assert_allclose(static, Z, atol=1e-12)
        # same-channel terms accumulate
        np.testing.assert_allclose(ops[0], X, atol=1e-12)
        np.testing.assert_allclose(ops[1], 0.5 * Y, atol=1e-12)
        assert dims == {0: 2}

    def test_sum_expansion(self):
        explicit, _, _, _ = parse(
            ["v*N0", "v*N1", "v*N2"], qub={"0": 2, "1": 2, "2": 2}, vars_={"v": 2.0}
        )
        summed, _, _, _ = parse(
            ["_SUM[i,0,2,v*N{i}]"], qub={"0": 2, "1": 2, "2": 2}, vars_={"v": 2.0}
        )
        np.testing.assert_allclose(summed, explicit, atol=1e-12)

    def test_sum_index_arithmetic(self):
        """{i+1} style index expressions inside _SUM."""
        explicit, _, _, _ = parse(
            ["j*Sp0*Sm1", "j*Sp1*Sm2"],
            qub={"0": 2, "1": 2, "2": 2},
            vars_={"j": 0.1},
        )
        summed, _, _, _ = parse(
            ["_SUM[i,0,1,j*Sp{i}*Sm{i+1}]"],
            qub={"0": 2, "1": 2, "2": 2},
            vars_={"j": 0.1},
        )
        np.testing.assert_allclose(summed, explicit, atol=1e-12)

    def test_subsystem_list_filters_terms(self):
        """Terms touching excluded subsystems are dropped; dims restricted."""
        static, ops, channels, dims = parse(
            ["v*Z0", "v*Z1", "j*X0*X1", "r*X0||D0", "r*X1||D1"],
            qub={"0": 2, "1": 2},
            vars_={"v": 1.0, "j": 0.5, "r": 1.0},
            subsystem_list=[0],
        )
        assert dims == {0: 2}
        assert channels == ["d0"]
        np.testing.assert_allclose(static, Z, atol=1e-12)
        np.testing.assert_allclose(ops[0], X, atol=1e-12)

    def test_parenthesized_expression(self):
        static, _, _, _ = parse(
            ["v*(X0+Y0)*0.5"], vars_={"v": 2.0}
        )
        np.testing.assert_allclose(static, X + Y, atol=1e-12)

    def test_numeric_literals_and_pi(self):
        static, _, _, _ = parse(["2*np.pi*0.25*Z0"])
        np.testing.assert_allclose(static, 2 * np.pi * 0.25 * Z, atol=1e-12)


class TestParserSystemCases:
    """System-level parser cases (reference
    test_hamiltonian_string_parser.py: repeated entries, case variants,
    measurement channels, oscillators, dagger, reduced subsystems)."""

    def _parse(self, h_str, qub, subsystem_list=None):
        return parse_backend_hamiltonian_dict(
            {"h_str": h_str, "qub": qub, "vars": {"w": 5.0, "r": 0.02}},
            subsystem_list=subsystem_list,
        )

    def test_repeat_entries_accumulate(self):
        # the same static term listed twice doubles the operator
        s1, ops1, chans1, dims1 = self._parse(["w*Z0", "w*Z0"], {"0": 2})
        s2, _, _, _ = self._parse(["2*w*Z0"], {"0": 2})
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-12)

    def test_measurement_channel_term(self):
        # M channels are valid drive channels in the grammar
        _, ops, chans, _ = self._parse(["w*Z0", "r*X0||M0"], {"0": 2})
        assert chans == ["m0"]
        assert len(ops) == 1

    def test_oscillator_system_dims(self):
        static, _, _, dims = self._parse(["w*O0"], {"0": 4})
        assert dims == {0: 4}
        np.testing.assert_allclose(
            np.asarray(static), 5.0 * np.diag(np.arange(4.0)), atol=1e-12
        )

    def test_two_subsystem_tensor_order(self):
        # little-endian: qubit 0 varies fastest
        static, _, _, _ = self._parse(["w*Z0", "2*w*Z1"], {"0": 2, "1": 2})
        z = np.diag([1.0, -1.0])
        expect = 5.0 * np.kron(np.eye(2), z) + 10.0 * np.kron(z, np.eye(2))
        np.testing.assert_allclose(np.asarray(static), expect, atol=1e-12)

    def test_dagger_suffix(self):
        s1, _, _, _ = self._parse(["w*Sm0.dag"], {"0": 2})
        s2, _, _, _ = self._parse(["w*Sp0"], {"0": 2})
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-12)

    def test_dagger_function_form(self):
        """Reference-parity dag(...) function syntax (reference
        test_hamiltonian_string_parser.py:327 uses v*np.pi*dag(A0))."""
        s1, _, _, _ = self._parse(["w*dag(A0)"], {"0": 4})
        s2, _, _, _ = self._parse(["w*C0"], {"0": 4})  # C = a^dag
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-12)
        # dag of a compound expression, composed with another operator
        s3, _, _, _ = self._parse(["w*dag(A0+N0)*A0"], {"0": 4})
        a = np.diag(np.sqrt(np.arange(1, 4)), 1)
        N = np.diag(np.arange(4)).astype(complex)
        np.testing.assert_allclose(
            np.asarray(s3), 5.0 * (a + N).conj().T @ a, atol=1e-12
        )

    def test_dagger_function_unbalanced(self):
        with pytest.raises(DynamicsError, match="Unbalanced"):
            self._parse(["w*dag(A0"], {"0": 4})

    def test_subsystem_reduction_drops_terms(self):
        h = ["w*Z0", "2*w*Z1", "r*X0||D0", "r*X1||D1"]
        static, ops, chans, dims = self._parse(
            h, {"0": 2, "1": 2}, subsystem_list=[1]
        )
        assert dims == {1: 2}
        assert chans == ["d1"]
        # only the qubit-1 static term survives
        np.testing.assert_allclose(
            np.asarray(static), 10.0 * np.diag([1.0, -1.0]), atol=1e-12
        )

    def test_sum_expansion_with_channels(self):
        h = ["_SUM[i,0,1,w*Z{i}]", "_SUM[i,0,1,r*X{i}||D{i}]"]
        static, ops, chans, dims = self._parse(h, {"0": 2, "1": 2})
        assert chans == ["d0", "d1"]
        assert len(ops) == 2
        z = np.diag([1.0, -1.0])
        expect = 5.0 * (np.kron(np.eye(2), z) + np.kron(z, np.eye(2)))
        np.testing.assert_allclose(np.asarray(static), expect, atol=1e-12)

    def test_high_dim_qubit_truncation_operators(self):
        # X on a 3-level system uses the truncated ladder, not the Pauli
        static, _, _, _ = self._parse(["w*X0"], {"0": 3})
        a = np.diag(np.sqrt([1.0, 2.0]), 1)
        np.testing.assert_allclose(
            np.asarray(static), 5.0 * (a + a.conj().T), atol=1e-12
        )

    def test_case_insensitive_variable_collision(self):
        # variables are matched case-sensitively; W != w raises
        with pytest.raises(DynamicsError):
            parse_backend_hamiltonian_dict(
                {"h_str": ["W*Z0"], "qub": {"0": 2}, "vars": {"w": 5.0}}
            )
