"""Parsers for external circuit formats: qsim and OpenQASM 2 / 3.

Re-design of reference ``quimb/tensor/circuit/qasm.py`` (qsim parser
:49, openqasm2 :644, openqasm3 :823). Feature-parity includes comment
stripping (line + block), custom ``gate`` definitions, whole-register
broadcasting, arithmetic parameter expressions, OpenQASM 3 ``input``
symbolic parameters / ``const`` / classical declarations / assignment,
and warn-or-error handling of unsupported instructions.

The implementation differs structurally from the reference: custom
gates are expanded by *recursively re-parsing their body statements
under a local scope* (parameter and qubit bindings held in
environment dicts), rather than by textual ``str.format``
substitution, and deferred symbolic parameters are first-class
:class:`QasmExpr` callables rather than re-combined source strings.

Returns ``{'n', 'sitemap', 'gates', 'n_gates', ...}``.
"""

import ast
import math
import numbers
import operator
import re
import warnings

from .gates import GATE_SIZE, Gate


def parse_qsim_str(contents):
    """Parse a qsim circuit description: first line number of qubits,
    then ``round gate qubits... [params...]`` lines (reference
    qasm.py:49)."""
    lines = [
        ln.strip() for ln in contents.strip().splitlines()
        if ln.strip() and not ln.strip().startswith("#")
    ]
    n = int(lines[0])
    gates = []
    for ln in lines[1:]:
        parts = ln.split()
        rnd = int(parts[0])
        label = parts[1].upper()
        rest = parts[2:]
        nq = GATE_SIZE.get(label)
        if nq is None:
            raise ValueError(f"unknown qsim gate {label}")
        qubits = tuple(int(x) for x in rest[:nq])
        params = tuple(float(x) for x in rest[nq:])
        gates.append(Gate(label, params, qubits, round=rnd))
    return {"n": n, "gates": gates}


def parse_qsim_file(fname, **kwargs):
    with open(fname) as f:
        return parse_qsim_str(f.read(), **kwargs)


def parse_qsim_url(url, **kwargs):
    from urllib.request import urlopen

    with urlopen(url) as f:
        return parse_qsim_str(f.read().decode(), **kwargs)


# ---------------------------------------------------------------------------
# source normalization
# ---------------------------------------------------------------------------

# one pass: quoted strings are matched first (and kept) so comment
# markers inside them are never treated as comments
_COMMENT_RE = re.compile(
    r'("(?:[^"\\]|\\.)*")'      # 1: string literal (preserved)
    r"|(/\*[\s\S]*?\*/)"        # 2: block comment
    r"|(//[^\n]*)"              # 3: line comment
)


def _strip_comments(src):
    """Remove ``//`` and ``/* */`` comments, ignoring markers inside
    double-quoted strings; newlines inside block comments are kept so
    statement structure survives."""

    def repl(m):
        if m.group(1) is not None:
            return m.group(1)
        if m.group(2) is not None:
            return "\n" * m.group(2).count("\n")
        return ""

    return _COMMENT_RE.sub(repl, src)


def _statements(src):
    """Split source into statements: ``;``-terminated at brace depth
    zero, with whole ``{ ... }`` blocks (gate bodies) kept as a single
    statement. Whitespace/newlines are collapsed."""
    out = []
    buf = []
    depth = 0

    def flush():
        stmt = " ".join("".join(buf).split())
        if stmt:
            out.append(stmt)
        buf.clear()

    for c in src:
        if c == "{":
            depth += 1
            buf.append(c)
        elif c == "}":
            depth -= 1
            buf.append(c)
            if depth == 0:
                flush()
        elif c == ";" and depth == 0:
            flush()
        else:
            buf.append(c)
    flush()
    return out


def _split_args(s, sep=","):
    """Split ``s`` on top-level ``sep`` (ignoring separators nested in
    any kind of bracket)."""
    if not s:
        return []
    parts = []
    buf = []
    depth = 0
    for c in s:
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


# ---------------------------------------------------------------------------
# expression evaluation (shared by qasm 2 and 3)
# ---------------------------------------------------------------------------

_CONSTS = {
    "pi": math.pi,
    "tau": 2.0 * math.pi,
    "euler": math.e,
}

_FNS = {
    "sin": math.sin, "cos": math.cos, "tan": math.tan,
    "asin": math.asin, "acos": math.acos, "atan": math.atan,
    "arcsin": math.asin, "arccos": math.acos, "arctan": math.atan,
    "exp": math.exp, "ln": math.log, "log": math.log,
    "sqrt": math.sqrt, "abs": abs, "pow": pow,
    "floor": math.floor, "ceiling": math.ceil, "mod": math.fmod,
}

_BINOPS = {
    ast.Add: operator.add, ast.Sub: operator.sub,
    ast.Mult: operator.mul, ast.Div: operator.truediv,
    ast.FloorDiv: operator.floordiv, ast.Mod: operator.mod,
    ast.Pow: operator.pow, ast.LShift: operator.lshift,
    ast.RShift: operator.rshift, ast.BitAnd: operator.and_,
    ast.BitXor: operator.xor, ast.BitOr: operator.or_,
}

_UNOPS = {
    ast.USub: operator.neg, ast.UAdd: operator.pos,
    ast.Invert: operator.invert, ast.Not: operator.not_,
}

_CMPOPS = {
    ast.Eq: operator.eq, ast.NotEq: operator.ne,
    ast.Lt: operator.lt, ast.LtE: operator.le,
    ast.Gt: operator.gt, ast.GtE: operator.ge,
}


class _SymbolicRef(Exception):
    """Raised when expression evaluation touches an unbound symbolic
    (``input``-declared) name."""


class QasmExpr:
    """A deferred OpenQASM parameter expression.

    Holds the parsed AST plus the concrete values captured at parse
    time; calling it with a mapping of named-parameter values produces
    the numeric parameter. Used for OpenQASM 3 ``input`` parameters.
    """

    __slots__ = ("src", "node", "consts")

    def __init__(self, src, node, consts):
        self.src = src
        self.node = node
        self.consts = consts

    def __call__(self, named):
        named = {
            k: v for k, v in named.items()
            if isinstance(v, numbers.Number) and not (
                isinstance(v, float) and math.isnan(v)
            )
        }
        try:
            return _eval_node(self.node, dict(self.consts), named)
        except _SymbolicRef:
            # some referenced input is still unbound
            return float("nan")

    def __repr__(self):
        return f"QasmExpr({self.src!r})"


def _eval_node(node, env, named=None):
    """Recursively evaluate a python-syntax arithmetic AST against
    ``env``. Symbolic input names (marked by being bound to their own
    name string) resolve through ``named`` when given, else raise
    :class:`_SymbolicRef`. Nested :class:`QasmExpr` values evaluate in
    their *own* captured environment (lexical scoping for custom-gate
    formals) with the same ``named`` bindings."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        if node.id in _CONSTS:
            return _CONSTS[node.id]
        if node.id in env:
            val = env[node.id]
            if isinstance(val, str):
                # an ``input`` symbol: bindable, else still symbolic
                if named and val in named:
                    return named[val]
                raise _SymbolicRef(node.id)
            if isinstance(val, QasmExpr):
                return _eval_node(val.node, dict(val.consts), named)
            return val
        raise NotImplementedError(
            f"Unknown OpenQASM identifier: {node.id}"
        )
    if isinstance(node, ast.BinOp):
        fn = _BINOPS.get(type(node.op))
        if fn is None:
            raise NotImplementedError(
                f"Unsupported operator: {type(node.op).__name__}"
            )
        return fn(
            _eval_node(node.left, env, named),
            _eval_node(node.right, env, named),
        )
    if isinstance(node, ast.UnaryOp):
        fn = _UNOPS.get(type(node.op))
        if fn is None:
            raise NotImplementedError(
                f"Unsupported unary op: {type(node.op).__name__}"
            )
        return fn(_eval_node(node.operand, env, named))
    if isinstance(node, ast.Compare):
        if len(node.ops) != 1:
            raise NotImplementedError("Chained comparisons unsupported.")
        fn = _CMPOPS.get(type(node.ops[0]))
        if fn is None:
            raise NotImplementedError(
                f"Unsupported compare op: {type(node.ops[0]).__name__}"
            )
        return fn(
            _eval_node(node.left, env, named),
            _eval_node(node.comparators[0], env, named),
        )
    if isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name) or node.func.id not in _FNS:
            raise NotImplementedError("Unsupported function call.")
        return _FNS[node.func.id](
            *(_eval_node(a, env, named) for a in node.args)
        )
    if isinstance(node, ast.List):
        return [_eval_node(x, env, named) for x in node.elts]
    if isinstance(node, ast.Subscript):
        seq = _eval_node(node.value, env, named)
        idx = _eval_node(node.slice, env, named)
        if not isinstance(idx, numbers.Number):
            raise NotImplementedError("Symbolic array indices unsupported.")
        if not isinstance(seq, (list, tuple)):
            raise NotImplementedError("Only array values can be indexed.")
        return seq[int(idx)]
    raise NotImplementedError(
        f"Unsupported expression node: {type(node).__name__}"
    )


def _eval_expr(src, env, defer=False):
    """Evaluate an arithmetic expression string. If ``defer`` and the
    expression references unbound symbolic names, return a
    :class:`QasmExpr` capturing the current concrete environment."""
    if isinstance(src, QasmExpr):
        return src
    if not isinstance(src, str):
        return src
    src = src.strip()
    if not src:
        return None
    node = ast.parse(src, mode="eval").body
    try:
        return _eval_node(node, env)
    except _SymbolicRef:
        if not defer:
            raise
        consts = {
            k: v for k, v in env.items()
            if isinstance(v, (numbers.Number, list, tuple, QasmExpr, str))
        }
        return QasmExpr(src, node, consts)


# ---------------------------------------------------------------------------
# the shared OpenQASM engine
# ---------------------------------------------------------------------------

# lower-case OpenQASM names -> canonical gate registry labels
QASM_GATE_ALIASES = {
    "u": "U3", "u1": "U1", "u2": "U2", "u3": "U3",
    "p": "PHASE", "phase": "PHASE",
    "id": "IDEN", "i": "IDEN",
    "cnot": "CNOT", "cx": "CX", "cy": "CY", "cz": "CZ",
    "h": "H", "x": "X", "y": "Y", "z": "Z",
    "s": "S", "sdg": "SDG", "t": "T", "tdg": "TDG",
    "sx": "SX", "sxdg": "SXDG",
    "swap": "SWAP", "iswap": "ISWAP",
    "rx": "RX", "ry": "RY", "rz": "RZ",
    "crx": "CRX", "cry": "CRY", "crz": "CRZ",
    "cu1": "CU1", "cu2": "CU2", "cu3": "CU3",
    "cphase": "CPHASE", "cp": "CPHASE",
    "ccx": "CCX", "ccnot": "CCX", "toffoli": "CCX",
    "cswap": "CSWAP", "fredkin": "CSWAP",
}

_GATE_CALL_RE = re.compile(r"(\w+)\s*(?:\((.*)\))?\s*(.*)$")
_GATE_SIG_RE = re.compile(r"gate\s+(\w+)\s*(?:\((.*?)\))?\s*([^{]*)\{(.*)\}$")


class _GateDef:
    """A custom gate definition: signature names plus raw body
    statements, re-parsed under a local scope at each call site."""

    __slots__ = ("name", "params", "qubits", "body")

    def __init__(self, name, params, qubits, body):
        self.name = name
        self.params = params
        self.qubits = qubits
        self.body = body


def _broadcast(resolved):
    """Expand resolved qubit args (ints and register tuples) into the
    list of concrete per-call qubit tuples."""
    sizes = {len(q) for q in resolved if isinstance(q, tuple)}
    if not sizes:
        return [tuple(resolved)]
    if len(sizes) != 1:
        raise NotImplementedError(
            "Broadcasted gate args must use registers of equal length."
        )
    (size,) = sizes
    return [
        tuple(q[i] if isinstance(q, tuple) else q for q in resolved)
        for i in range(size)
    ]


class _OpenQasmEngine:
    """Statement-dispatch OpenQASM parser core, shared by the 2.0 and
    3.x front ends (which differ only in their declaration handlers
    and ignore/error sets)."""

    version = 2
    # statements ignored with a one-time warning
    IGNORE = ("creg", "measure", "barrier", "reset")
    # statements that are hard errors
    ERROR = ("if", "for", "while", "opaque")

    def __init__(self):
        self.sitemap = {}
        self.registers = {}
        self.gates = []
        self.defs = {}
        self.env = {}
        self.inputs = []
        self.expressions = {}
        self._warned = set()

    # -- helpers ---------------------------------------------------------

    def warn_once(self, op):
        if op not in self._warned:
            warnings.warn(
                f"Unsupported operation ignored: {op}", SyntaxWarning
            )
            self._warned.add(op)

    def new_register(self, name, size):
        start = len(self.sitemap)
        qubits = tuple(range(start, start + size))
        self.registers[name] = qubits
        for i, q in enumerate(qubits):
            self.sitemap[f"{name}[{i}]"] = q

    def resolve_qubit(self, token, scope):
        """Resolve one qubit argument to an index (or register tuple,
        for broadcasting). ``scope`` maps custom-gate formal qubit
        names to concrete indices."""
        token = token.strip()
        if token in scope:
            return scope[token]
        if token in self.registers:
            reg = self.registers[token]
            return reg if len(reg) > 1 else reg[0]
        m = re.fullmatch(r"(\w+)\[(.+)\]", token)
        if m:
            base, idx_src = m.groups()
            idx = _eval_expr(idx_src, self.env)
            if not isinstance(idx, numbers.Number):
                raise NotImplementedError(
                    "Symbolic qubit indices are unsupported."
                )
            key = f"{base}[{int(idx)}]"
            if key in self.sitemap:
                return self.sitemap[key]
        raise NotImplementedError(f"Unknown qubit identifier: {token}")

    # -- statement handlers ---------------------------------------------

    def handle_gate_def(self, stmt):
        m = _GATE_SIG_RE.match(stmt)
        if m is None:
            raise SyntaxError(stmt)
        name, params, qubits, body = m.groups()
        self.defs[name] = _GateDef(
            name,
            _split_args(params or ""),
            _split_args(qubits),
            [s for s in (b.strip() for b in body.split(";")) if s],
        )

    def apply_gate_stmt(self, stmt, pscope=None, qscope=None):
        """Parse and apply one gate-application statement. ``pscope``
        / ``qscope`` carry parameter and qubit bindings when expanding
        inside a custom gate body."""
        m = _GATE_CALL_RE.match(stmt)
        if m is None:
            raise SyntaxError(stmt)
        name, params_src, qubits_src = m.groups()
        pscope = pscope or {}
        qscope = qscope or {}

        env = {**self.env, **pscope}
        param_srcs = _split_args(params_src or "")
        qubit_toks = _split_args(qubits_src)

        if name in self.defs:
            gd = self.defs[name]
            if len(gd.params) != len(param_srcs):
                raise NotImplementedError(
                    f"Custom gate {name} expected {len(gd.params)} "
                    f"parameters, got {len(param_srcs)}"
                )
            if len(gd.qubits) != len(qubit_toks):
                raise NotImplementedError(
                    f"Custom gate {name} expected {len(gd.qubits)} "
                    f"qubits, got {len(qubit_toks)}"
                )
            # bind actual parameter values (deferred allowed) to the
            # formal names...
            sub_pscope = {
                formal: _eval_expr(src, env, defer=self.version >= 3)
                for formal, src in zip(gd.params, param_srcs)
            }
            # ...resolve + broadcast actual qubits, then expand the
            # body once per broadcast element under a local scope
            resolved = [
                self.resolve_qubit(t, qscope) for t in qubit_toks
            ]
            for call_qubits in _broadcast(resolved):
                sub_qscope = dict(zip(gd.qubits, call_qubits))
                for body_stmt in gd.body:
                    self.apply_gate_stmt(
                        body_stmt, sub_pscope, sub_qscope
                    )
            return

        label = QASM_GATE_ALIASES.get(name.lower())
        if label is None:
            label = name.upper()
            if label not in GATE_SIZE:
                raise NotImplementedError(f"Unknown gate: {name}")

        raw_params = tuple(
            _eval_expr(p, env, defer=self.version >= 3)
            for p in param_srcs
        )
        symbolic = any(
            not isinstance(p, numbers.Number) for p in raw_params
        )
        params = tuple(
            float("nan") if not isinstance(p, numbers.Number) else p
            for p in raw_params
        )
        resolved = [self.resolve_qubit(t, qscope) for t in qubit_toks]
        for call_qubits in _broadcast(resolved):
            if symbolic:
                self.expressions[len(self.gates)] = raw_params
            self.gates.append(
                Gate(label, params, call_qubits, parametrize=symbolic)
            )

    def dispatch(self, stmt):
        """Handle one non-gate-application statement; return True if it
        was consumed."""
        raise NotImplementedError

    def parse(self, contents):
        src = _strip_comments(contents)
        for stmt in _statements(src):
            if self.dispatch(stmt):
                continue
            first = re.match(r"\w+", stmt)
            word = first.group(0) if first else ""
            if word in self.IGNORE:
                self.warn_once(word)
                continue
            if word in self.ERROR:
                raise NotImplementedError(
                    f"The following instruction is not supported: {stmt}"
                )
            if word == "gate":
                self.handle_gate_def(stmt)
                continue
            self.apply_gate_stmt(stmt)
        return self.result()

    def result(self):
        return {
            "n": len(self.sitemap),
            "sitemap": dict(self.sitemap),
            "gates": self.gates,
            "n_gates": len(self.gates),
        }


class _OpenQasm2(_OpenQasmEngine):
    version = 2
    IGNORE = ("creg", "measure", "barrier")
    ERROR = ("reset", "if", "for", "opaque")

    def dispatch(self, stmt):
        if re.match(r"OPENQASM\s+2", stmt) or re.match(
            r'include\s+"[^"]*"', stmt
        ):
            return True
        m = re.match(r"qreg\s+(\w+)\s*\[(\d+)\]$", stmt)
        if m:
            self.new_register(m.group(1), int(m.group(2)))
            return True
        return False


class _OpenQasm3(_OpenQasmEngine):
    version = 3
    IGNORE = ("measure", "barrier", "gphase")
    ERROR = (
        "reset", "if", "for", "while", "switch", "box", "delay",
        "defcal", "cal", "extern", "pragma", "alias", "return",
        "opaque", "def",
    )

    def __init__(self):
        super().__init__()
        self.symbols = {}

    def dispatch(self, stmt):
        if re.match(r"OPENQASM\s+3", stmt) or re.match(
            r'include\s+"[^"]*"', stmt
        ):
            return True

        m = re.match(r"qubit(?:\s*\[(.+)\])?\s+(\w+)$", stmt)
        if m:
            size_src, name = m.groups()
            size = (
                1 if size_src is None
                else int(_eval_expr(size_src, self.env))
            )
            self.new_register(name, size)
            return True

        m = re.match(r"input\s+\w+(?:\s*\[[^\]]+\])?\s+(\w+)$", stmt)
        if m:
            name = m.group(1)
            self.inputs.append(name)
            # bound to its own name: evaluation raises _SymbolicRef
            self.env[name] = name
            self.symbols[name] = name
            return True

        if re.match(r"output\b", stmt):
            raise NotImplementedError(
                "Output declarations are unsupported."
            )

        m = re.match(
            r"const\s+\w+(?:\s*\[[^\]]+\])?\s+(\w+)\s*=\s*(.+)$", stmt
        )
        if m:
            self.env[m.group(1)] = _eval_expr(
                m.group(2), self.env, defer=True
            )
            return True

        m = re.match(
            r"(bit|bool|int|uint|float|angle|complex|duration)"
            r"(?:\s*\[[^\]]+\])?\s+(\w+)(?:\s*=\s*(.+))?$",
            stmt,
        )
        if m:
            ctype, name, expr = m.groups()
            if expr is None:
                if ctype == "bit":
                    self.warn_once("bit")
                return True
            if expr.lstrip().startswith("measure "):
                self.warn_once("measure")
                return True
            self.env[name] = _eval_expr(expr, self.env, defer=True)
            return True

        m = re.match(r"array\s*\[.*?\]\s+(\w+)\s*=\s*(.+)$", stmt)
        if m:
            self.env[m.group(1)] = _eval_expr(
                m.group(2).replace("{", "[").replace("}", "]"),
                self.env,
                defer=True,
            )
            return True

        if "@" in stmt:
            raise NotImplementedError(
                f"The following instruction is not supported: {stmt}"
            )

        # assignment to a classical variable (declared or not),
        # including indexed targets like qiskit's per-qubit
        # `c[0] = measure q[0];` form
        m = re.match(r"(\w+)\s*(\[[^\]]+\])?\s*=(?!=)\s*(.+)$", stmt)
        if m:
            name, idx, rhs = m.groups()
            if rhs.lstrip().startswith("measure "):
                self.warn_once("measure")
                return True
            if idx is not None:
                raise NotImplementedError(
                    f"Indexed classical assignment is not supported: "
                    f"{stmt}"
                )
            self.env[name] = _eval_expr(rhs, self.env, defer=True)
            return True

        return False

    def result(self):
        out = super().result()
        out["inputs"] = tuple(self.inputs)
        out["symbols"] = dict(self.symbols)
        out["expressions"] = dict(self.expressions)
        return out


def parse_openqasm2_str(contents):
    """Parse an OpenQASM 2.0 program: registers, custom ``gate``
    definitions, arithmetic parameter expressions and whole-register
    broadcasting (reference qasm.py:644)."""
    return _OpenQasm2().parse(contents)


def parse_openqasm2_file(fname, **kwargs):
    with open(fname) as f:
        return parse_openqasm2_str(f.read(), **kwargs)


def parse_openqasm2_url(url, **kwargs):
    from urllib.request import urlopen

    with urlopen(url) as f:
        return parse_openqasm2_str(f.read().decode(), **kwargs)


def parse_openqasm3_str(contents):
    """Parse a practical subset of OpenQASM 3: qubit / input / const /
    classical declarations, assignment, custom gates, broadcasting,
    and symbolic ``input`` parameters returned as deferred
    ``expressions`` for later binding (reference qasm.py:823)."""
    return _OpenQasm3().parse(contents)


def parse_openqasm3_file(fname, **kwargs):
    with open(fname) as f:
        return parse_openqasm3_str(f.read(), **kwargs)


def parse_openqasm3_url(url, **kwargs):
    from urllib.request import urlopen

    with urlopen(url) as f:
        return parse_openqasm3_str(f.read().decode(), **kwargs)
