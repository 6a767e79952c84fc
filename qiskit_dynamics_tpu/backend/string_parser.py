r"""Pulse-backend Hamiltonian string parser.

Reference behavior:
``/root/reference/qiskit_dynamics/backend/backend_string_parser/`` (grammar
documented at ``hamiltonian_string_parser.py:36-235``).

Parses the IBM pulse-backend Hamiltonian dictionary format::

    {
        "h_str": ["v*np.pi*O0", "alpha*np.pi*O0*O0", "r*np.pi*X0||D0",
                  "_SUM[i,0,1,wq{i}/2*(I{i}-Z{i})]"],
        "qub": {"0": 4},
        "vars": {"v": 2.1, "alpha": -0.33, "r": 0.02},
    }

into concrete arrays. Operator tokens: ``X Y Z a A Sm C Sp N O I`` followed by
a subsystem index; channel suffix ``||Dxx``/``||Uxx``/etc; ``_SUM[i,lb,ub,...]``
summation expansion with ``{i}`` / ``{i+1}``-style substitution.

Design difference from the reference: no ``exec`` — variables are resolved
against the ``vars`` dict during tokenization (matched greedily, longest name
first, so names like ``jq0q1`` tokenize correctly), and the whole expression
(scalars and matrices together) is evaluated in one shunting-yard/RPN pass.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..exceptions import DynamicsError

__all__ = ["parse_backend_hamiltonian_dict"]

CHANNEL_CHARS = ["U", "D", "M", "A", "u", "d", "m", "a"]


# ---------------------------------------------------------------------------
# single-subsystem operators
# ---------------------------------------------------------------------------


def _a(dim):
    return np.diag(np.sqrt(np.arange(1, dim, dtype=complex)), 1)


def _adag(dim):
    return _a(dim).conj().T


def _N(dim):
    return np.diag(np.arange(dim, dtype=complex))


_OPERATOR_FACTORIES = {
    "X": lambda d: _a(d) + _adag(d),
    "Y": lambda d: -1j * (_a(d) - _adag(d)),
    "Z": lambda d: np.eye(d, dtype=complex) - 2 * _N(d),
    "a": _a,
    "A": _a,
    "Sm": _a,
    "Sp": _adag,
    "C": _adag,
    "N": _N,
    "O": _N,
    "I": lambda d: np.eye(d, dtype=complex),
}


def _embedded_operator(op_label: str, subsystem: int, subsystem_dims: Dict[int, int]) -> np.ndarray:
    """Single-subsystem operator tensored with identities; subsystem 0 is the
    LAST tensor factor (little-endian, matching the qiskit convention used by
    the reference's ``operator_from_string.py:28-142``)."""
    factory = _OPERATOR_FACTORIES.get(op_label)
    if factory is None:
        raise DynamicsError(f"String {op_label} does not correspond to a known operator.")
    labels = sorted(subsystem_dims)
    out = np.eye(1, dtype=complex)
    for label in reversed(labels):
        factor = factory(subsystem_dims[label]) if label == subsystem else np.eye(
            subsystem_dims[label], dtype=complex
        )
        out = np.kron(out, factor)
    return out


# ---------------------------------------------------------------------------
# _SUM expansion
# ---------------------------------------------------------------------------

_SUM_RE = re.compile(r"_SUM\[([a-z]),(-?\d+),(-?\d+),(.*)\]$")
_SUBST_RE = re.compile(r"\{([a-z0-9+\-*/]+)\}")


def _eval_index_expr(expr: str, var: str, value: int) -> str:
    """Evaluate a simple arithmetic index expression like ``i+1``."""
    m = re.fullmatch(r"([a-z0-9]+)([+\-*/])([a-z0-9]+)|([a-z0-9]+)", expr)
    if m is None:
        raise DynamicsError(f"Invalid index expression {{{expr}}} in _SUM term.")

    def resolve(tok):
        if tok == var:
            return value
        if tok.isdigit():
            return int(tok)
        raise DynamicsError(f"Unknown index variable '{tok}' in _SUM term.")

    if m.group(4) is not None:
        return str(resolve(m.group(4)))
    v0, op, v1 = resolve(m.group(1)), m.group(2), resolve(m.group(3))
    return str({"+": v0 + v1, "-": v0 - v1, "*": v0 * v1, "/": v0 // v1}[op])


def _expand_sums(h_str: List[str]) -> List[str]:
    """Expand every ``_SUM[i,lb,ub,body]`` entry into explicit terms."""
    out = []
    for term in h_str:
        if not term.startswith("_SUM["):
            out.append(term)
            continue
        m = _SUM_RE.match(term)
        if m is None:
            raise DynamicsError(f"Malformed _SUM term: {term}")
        var, lb, ub, body = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
        for k in range(lb, ub + 1):
            expanded = _SUBST_RE.sub(lambda mm: _eval_index_expr(mm.group(1), var, k), body)
            out.append(expanded)
    return out


# ---------------------------------------------------------------------------
# tokenizer + shunting-yard + RPN evaluation
# ---------------------------------------------------------------------------

_OP_TOKEN_RE = re.compile(r"(Sp|Sm|O|N|X|Y|Z|I|A|C|a)(\d+)")
_NUM_RE = re.compile(r"\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?")
_NPCONST_RE = re.compile(r"np\.(pi|e)")
_DAG_RE = re.compile(r"\.dag")


def _tokenize(expr: str, variables: Dict[str, float], var_names: List[str]):
    """Tokenize into (kind, value) pairs.

    kinds: 'num' (scalar), 'op' ((label, idx)), 'dag', 'binop', 'unary',
    '(' , ')'. Variables are matched greedily against the actual vars dict
    (longest first) so multi-part names like ``jq0q1`` resolve directly.
    """
    tokens = []
    i = 0
    prev_is_value = False
    while i < len(expr):
        ch = expr[i]
        if ch == " ":
            i += 1
            continue
        m = _NPCONST_RE.match(expr, i)
        if m:
            tokens.append(("num", np.pi if m.group(1) == "pi" else np.e))
            i = m.end()
            prev_is_value = True
            continue
        m = _DAG_RE.match(expr, i)
        if m:
            tokens.append(("dag", None))
            i = m.end()
            prev_is_value = True
            continue
        if expr.startswith("dag(", i):
            # reference-parity function form dag(expr): tokenize the balanced
            # inner expression and append the postfix adjoint
            depth, j = 1, i + 4
            while j < len(expr) and depth:
                depth += {"(": 1, ")": -1}.get(expr[j], 0)
                j += 1
            if depth:
                raise DynamicsError(f"Unbalanced parentheses in 'dag(' of '{expr}'.")
            inner = _tokenize(expr[i + 4 : j - 1], variables, var_names)
            tokens += [("(", None)] + inner + [(")", None), ("dag", None)]
            i = j
            prev_is_value = True
            continue
        m = _OP_TOKEN_RE.match(expr, i)
        if m:
            tokens.append(("op", (m.group(1), int(m.group(2)))))
            i = m.end()
            prev_is_value = True
            continue
        matched_var = None
        for name in var_names:
            if expr.startswith(name, i):
                matched_var = name
                break
        if matched_var is not None:
            tokens.append(("num", variables[matched_var]))
            i += len(matched_var)
            prev_is_value = True
            continue
        if expr.startswith("pi", i):
            tokens.append(("num", np.pi))
            i += 2
            prev_is_value = True
            continue
        m = _NUM_RE.match(expr, i)
        if m:
            tokens.append(("num", float(m.group())))
            i = m.end()
            prev_is_value = True
            continue
        if ch in "+-":
            tokens.append(("binop" if prev_is_value else "unary", ch))
            i += 1
            prev_is_value = False
            continue
        if ch in "*/":
            tokens.append(("binop", ch))
            i += 1
            prev_is_value = False
            continue
        if ch == "(":
            tokens.append(("(", None))
            i += 1
            prev_is_value = False
            continue
        if ch == ")":
            tokens.append((")", None))
            i += 1
            prev_is_value = True
            continue
        raise DynamicsError(f"Invalid character '{ch}' in Hamiltonian term '{expr}'.")
    return tokens


_PRECEDENCE = {"u-": 3, "dag": 4, "*": 2, "/": 2, "+": 1, "-": 1}


def _to_rpn(tokens):
    """Shunting-yard: infix tokens -> postfix queue."""
    queue, stack = [], []
    for kind, val in tokens:
        if kind in ("num", "op"):
            queue.append((kind, val))
        elif kind == "dag":
            queue.append(("apply", "dag"))
        elif kind == "unary":
            stack.append(("apply", "u-")) if val == "-" else None
        elif kind == "binop":
            while stack and stack[-1][0] == "apply" and _PRECEDENCE[stack[-1][1]] >= _PRECEDENCE[val]:
                queue.append(stack.pop())
            stack.append(("apply", val))
        elif kind == "(":
            stack.append(("(", None))
        elif kind == ")":
            while stack and stack[-1][0] != "(":
                queue.append(stack.pop())
            if not stack:
                raise DynamicsError("Mismatched parentheses in Hamiltonian term.")
            stack.pop()
    while stack:
        top = stack.pop()
        if top[0] == "(":
            raise DynamicsError("Mismatched parentheses in Hamiltonian term.")
        queue.append(top)
    return queue


def _eval_rpn(queue, op_cache, subsystem_dims: Dict[int, int]):
    """Evaluate the postfix queue; stack holds scalars and matrices mixed.
    ``*`` is matmul for matrix-matrix, scalar multiply otherwise."""
    stack = []
    for kind, val in queue:
        if kind == "num":
            stack.append(val)
        elif kind == "op":
            key = val
            if key not in op_cache:
                op_cache[key] = _embedded_operator(val[0], val[1], subsystem_dims)
            stack.append(op_cache[key])
        elif kind == "apply":
            if val == "u-":
                stack.append(-stack.pop())
            elif val == "dag":
                stack.append(np.conjugate(np.transpose(stack.pop())))
            else:
                b = stack.pop()
                a = stack.pop()
                if val == "+":
                    stack.append(a + b)
                elif val == "-":
                    stack.append(a - b)
                elif val == "/":
                    stack.append(a / b)
                else:  # "*"
                    if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
                        stack.append(a @ b)
                    else:
                        stack.append(a * b)
    if len(stack) != 1:
        raise DynamicsError("Invalid mathematical operation in Hamiltonian term.")
    return stack[0]


def _term_subsystems(expr: str) -> List[int]:
    """Subsystem indices referenced by operator tokens in an expression."""
    return [int(m.group(2)) for m in _OP_TOKEN_RE.finditer(expr)]


# ---------------------------------------------------------------------------
# validation + main entry point
# ---------------------------------------------------------------------------


def _pre_parse_validation(hamiltonian_dict: dict):
    ham_str = hamiltonian_dict.get("h_str", [])
    if ham_str in ([], [""]):
        raise DynamicsError("Hamiltonian dict requires a non-empty 'h_str' entry.")
    if hamiltonian_dict.get("qub", {}) == {}:
        raise DynamicsError(
            "Hamiltonian dict requires non-empty 'qub' entry with subsystem dimensions."
        )
    if hamiltonian_dict.get("osc", {}) != {}:
        raise DynamicsError("Oscillator-type systems are not supported.")

    for term in ham_str:
        malformed = (
            f"Term '{term}' does not conform to required string format. Channels may only be "
            "specified as 'aa||Cxx' with C a channel character and xx digits."
        )
        if term.count("|") == 2 and term.count("||") == 1:
            channel_str = term[term.index("||") + 2:]
            if term.startswith("_SUM[") and term.endswith("]"):
                channel_str = channel_str[:-1]
            if len(channel_str) <= 1 or channel_str[0] not in CHANNEL_CHARS:
                raise DynamicsError(malformed)
            rest = channel_str[1:]
            if rest.startswith("{"):
                if not rest.endswith("}"):
                    raise DynamicsError(malformed)
            elif any(not c.isdigit() for c in rest):
                raise DynamicsError(malformed)
        elif term.count("|") != 0:
            raise DynamicsError(malformed)


def parse_backend_hamiltonian_dict(
    hamiltonian_dict: dict, subsystem_list: Optional[List[int]] = None
) -> Tuple[np.ndarray, List[np.ndarray], List[str], Dict[int, int]]:
    """Convert a pulse-backend Hamiltonian dictionary to concrete arrays.

    Args:
        hamiltonian_dict: dict with ``h_str`` (term strings), ``qub``
            (subsystem dims), and ``vars`` (variable values).
        subsystem_list: subsystems to keep; terms touching others are dropped.

    Returns:
        ``(static_hamiltonian, operators, channel_labels, subsystem_dims_dict)``
        with channel labels lowercase and sorted, operators aligned to them.
    """
    _pre_parse_validation(hamiltonian_dict)

    variables = dict(hamiltonian_dict.get("vars", {}))
    var_names = sorted(variables, key=len, reverse=True)

    qub_dict = {int(k): int(v) for k, v in hamiltonian_dict["qub"].items()}
    if subsystem_list is None:
        subsystem_list = sorted(qub_dict)
    else:
        subsystem_list = sorted(subsystem_list)
    subsystem_dims = {label: qub_dict[label] for label in subsystem_list}

    terms = _expand_sums(list(hamiltonian_dict["h_str"]))

    op_cache: dict = {}
    static_hamiltonian = None
    channel_ops: Dict[str, np.ndarray] = {}

    for term in terms:
        if "||" in term:
            expr, channel = term.split("||")
            channel = channel.lower()
        else:
            expr, channel = term, None

        # drop terms touching excluded subsystems
        if any(idx not in subsystem_dims for idx in _term_subsystems(expr)):
            continue

        value = _eval_rpn(
            _to_rpn(_tokenize(expr, variables, var_names)), op_cache, subsystem_dims
        )
        if not isinstance(value, np.ndarray):
            raise DynamicsError(f"Hamiltonian term '{term}' contains no operator.")

        if channel is None:
            static_hamiltonian = value if static_hamiltonian is None else static_hamiltonian + value
        elif channel in channel_ops:
            channel_ops[channel] = channel_ops[channel] + value
        else:
            channel_ops[channel] = value

    channels = sorted(channel_ops)
    operators = [channel_ops[c] for c in channels]
    return static_hamiltonian, operators, channels, subsystem_dims
