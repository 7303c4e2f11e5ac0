"""Parsers for external circuit formats: qsim and OpenQASM 2.0.

Re-design of reference ``quimb/tensor/circuit/qasm.py`` (qsim parser :49,
openqasm2 :644). Returns ``{'n': int, 'gates': [Gate, ...]}``.
"""

import math
import re

from .gates import GATE_SIZE, PARAM_GATES, Gate


def parse_qsim_str(contents):
    """Parse a qsim circuit description: first line number of qubits,
    then ``round gate qubits... [params...]`` lines."""
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


_QASM_EXPR_SAFE = {
    "pi": math.pi, "sin": math.sin, "cos": math.cos, "tan": math.tan,
    "exp": math.exp, "ln": math.log, "sqrt": math.sqrt,
}


def _eval_param(expr):
    expr = expr.strip()
    return float(eval(expr, {"__builtins__": {}}, _QASM_EXPR_SAFE))


_QASM_GATE_MAP = {
    "id": "I", "u": "U3", "u3": "U3", "u2": "U2", "u1": "U1",
    "p": "U1", "phase": "U1", "x": "X", "y": "Y", "z": "Z", "h": "H",
    "s": "S", "sdg": "SDG", "t": "T", "tdg": "TDG", "sx": "SX",
    "sxdg": "SXDG", "rx": "RX", "ry": "RY", "rz": "RZ", "cx": "CX",
    "cnot": "CX", "cy": "CY", "cz": "CZ", "ch": None, "swap": "SWAP",
    "iswap": "ISWAP", "ccx": "CCX", "ccz": "CCZ", "cswap": "CSWAP",
    "crx": "CRX", "cry": "CRY", "crz": "CRZ", "cu1": "CU1",
    "cp": "CP", "cu3": "CU3", "rxx": "RXX", "ryy": "RYY", "rzz": "RZZ",
}


def parse_openqasm2_str(contents):
    """Parse (a common subset of) OpenQASM 2.0."""
    # strip comments
    contents = re.sub(r"//.*", "", contents)
    statements = [
        s.strip() for s in contents.replace("\n", " ").split(";")
        if s.strip()
    ]
    regs = {}
    n = 0
    gates = []
    custom_gates = {}

    def qubit_index(tok):
        m = re.match(r"(\w+)\[(\d+)\]", tok.strip())
        if m:
            name, i = m.group(1), int(m.group(2))
            return regs[name] + i
        return regs[tok.strip()]

    for st in statements:
        if st.startswith(("OPENQASM", "include", "barrier", "creg")):
            continue
        if st.startswith("qreg"):
            m = re.match(r"qreg\s+(\w+)\[(\d+)\]", st)
            regs[m.group(1)] = n
            n += int(m.group(2))
            continue
        if st.startswith(("measure", "reset", "if", "gate")):
            # custom gate defs / measurement not supported in round 1
            continue
        m = re.match(r"([a-zA-Z_][\w]*)\s*(\(([^)]*)\))?\s*(.*)", st)
        if not m:
            continue
        gname = m.group(1).lower()
        params = tuple(
            _eval_param(p) for p in m.group(3).split(",")
        ) if m.group(3) else ()
        qubits = tuple(
            qubit_index(t) for t in m.group(4).split(",") if t.strip()
        )
        label = _QASM_GATE_MAP.get(gname, gname.upper())
        if label is None or label not in GATE_SIZE:
            raise ValueError(f"unsupported qasm gate {gname}")
        gates.append(Gate(label, params, qubits))
    return {"n": n, "gates": gates}


def parse_openqasm3_str(contents):
    """Parse (a common subset of) OpenQASM 3: ``qubit[n] q;``
    declarations plus the same gate applications as 2.0."""
    contents = re.sub(r"//.*", "", contents)
    statements = [
        s.strip() for s in contents.replace("\n", " ").split(";")
        if s.strip()
    ]
    regs = {}
    n = 0
    gates = []

    def qubit_index(tok):
        m = re.match(r"(\w+)\[(\d+)\]", tok.strip())
        if m:
            return regs[m.group(1)] + int(m.group(2))
        return regs[tok.strip()]

    for st in statements:
        if st.startswith(("OPENQASM", "include", "barrier")):
            continue
        m3 = re.match(r"qubit\[(\d+)\]\s+(\w+)", st)
        if m3:
            regs[m3.group(2)] = n
            n += int(m3.group(1))
            continue
        m1 = re.match(r"qubit\s+(\w+)", st)
        if m1:
            regs[m1.group(1)] = n
            n += 1
            continue
        if st.startswith(("bit", "measure", "reset", "if", "gate",
                          "def", "cal", "let")) or "=" in st.split(
                              "(")[0]:
            continue
        m = re.match(r"([a-zA-Z_][\w]*)\s*(\(([^)]*)\))?\s*(.*)", st)
        if not m:
            continue
        gname = m.group(1).lower()
        params = tuple(
            _eval_param(p) for p in m.group(3).split(",")
        ) if m.group(3) else ()
        qubits = tuple(
            qubit_index(t) for t in m.group(4).split(",") if t.strip()
        )
        label = _QASM_GATE_MAP.get(gname, gname.upper())
        if label is None or label not in GATE_SIZE:
            raise ValueError(f"unsupported qasm3 gate {gname}")
        gates.append(Gate(label, params, qubits))
    return {"n": n, "gates": gates}
