"""Behavior tests for the OpenQASM 2/3 front end (reference
tests/test_tensor/test_circuit/test_qasm.py)."""

import math
import warnings

import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.circuit.qasm import (
    parse_openqasm2_str,
    parse_openqasm3_str,
    parse_qsim_str,
)


def dense_match(circ_a, circ_b, atol=1e-10):
    """Statevector agreement up to global phase."""
    a = np.asarray(circ_a.to_dense()).ravel()
    b = np.asarray(circ_b.to_dense()).ravel()
    k = np.argmax(np.abs(b))
    return np.allclose(a * (b[k] / a[k]), b, atol=atol)


class TestQsim:
    def test_parse(self):
        info = parse_qsim_str(
            "2\n0 h 0\n0 h 1\n1 cz 0 1\n2 rz 0 0.5\n"
        )
        assert info["n"] == 2
        assert [g.label for g in info["gates"]] == ["H", "H", "CZ", "RZ"]
        assert info["gates"][3].params == (0.5,)


class TestOpenQASM2:
    def test_basic(self):
        circ = qtn.Circuit.from_openqasm2_str(
            """
            OPENQASM 2.0;
            include "qelib1.inc";
            qreg q[2];
            h q[0];
            cx q[0], q[1];
            """
        )
        psi = np.asarray(circ.to_dense()).ravel()
        assert psi[0] == pytest.approx(1 / math.sqrt(2))
        assert psi[3] == pytest.approx(1 / math.sqrt(2))

    def test_custom_gates_vs_dense(self):
        qasm = """
        OPENQASM 2.0;
        include "qelib1.inc";
        qreg q[3];
        gate bell a, b { h a; cx a, b; }
        gate wiggle(t) a { rx(t) a; rz(2*t) a; }
        bell q[0], q[1];
        wiggle(0.3) q[2];
        ccx q[0], q[1], q[2];
        """
        circ = qtn.Circuit.from_openqasm2_str(qasm)
        dense = qtn.CircuitDense.from_openqasm2_str(qasm)
        assert circ.num_gates == 5
        assert dense_match(circ, dense)

    def test_nested_custom_gates(self):
        qasm = """
        OPENQASM 2.0;
        include "qelib1.inc";
        qreg q[2];
        gate inner(t) a { ry(t) a; }
        gate outer(t) a, b { inner(t/2) a; cx a, b; inner(-t) b; }
        outer(0.8) q[0], q[1];
        """
        circ = qtn.Circuit.from_openqasm2_str(qasm)
        labels = [g.label for g in circ.gates]
        assert labels == ["RY", "CX", "RY"]
        assert circ.gates[0].params == (pytest.approx(0.4),)
        assert circ.gates[2].params == (pytest.approx(-0.8),)
        ref = qtn.Circuit(2)
        ref.apply_gate("RY", 0.4, 0)
        ref.apply_gate("CX", 0, 1)
        ref.apply_gate("RY", -0.8, 1)
        assert dense_match(circ, ref)

    def test_a_gate_called_gate_prefix(self):
        circ = qtn.Circuit.from_openqasm2_str(
            """
            OPENQASM 2.0;
            include "qelib1.inc";
            gate gate_Evo(p) a, b { rz(p) a; rz(-p) b; }
            qreg q[2];
            gate_Evo(0.1) q[0], q[1];
            """
        )
        assert [g.label for g in circ.gates] == ["RZ", "RZ"]
        assert circ.gates[0].params == (pytest.approx(0.1),)
        assert circ.gates[1].params == (pytest.approx(-0.1),)

    def test_identity_gate(self):
        circ = qtn.Circuit.from_openqasm2_str(
            """
            OPENQASM 2.0;
            include "qelib1.inc";
            qreg q[2];
            x q[0];
            id q[0];
            i q[1];
            """
        )
        assert [g.label for g in circ.gates] == ["X", "IDEN", "IDEN"]
        psi = np.asarray(circ.to_dense()).ravel()
        np.testing.assert_allclose(np.abs(psi) ** 2, [0, 0, 1, 0],
                                   atol=1e-12)

    def test_gate_aliases(self):
        circ = qtn.Circuit.from_openqasm2_str(
            """
            OPENQASM 2.0;
            qreg q[3];
            cnot q[0], q[1];
            toffoli q[0], q[1], q[2];
            fredkin q[0], q[1], q[2];
            p(0.1) q[0];
            u(0.1, 0.2, 0.3) q[1];
            """
        )
        assert [g.label for g in circ.gates] == [
            "CNOT", "CCX", "CSWAP", "PHASE", "U3",
        ]

    def test_whole_register_broadcast(self):
        circ = qtn.Circuit.from_openqasm2_str(
            """
            OPENQASM 2.0;
            qreg a[2];
            qreg b[2];
            h a;
            cx a, b;
            cx a[0], b;
            """
        )
        assert [(g.label, g.qubits) for g in circ.gates] == [
            ("H", (0,)), ("H", (1,)),
            ("CX", (0, 2)), ("CX", (1, 3)),
            ("CX", (0, 2)), ("CX", (0, 3)),
        ]

    def test_broadcast_length_mismatch(self):
        with pytest.raises(NotImplementedError):
            qtn.Circuit.from_openqasm2_str(
                """
                OPENQASM 2.0;
                qreg a[2];
                qreg b[3];
                cx a, b;
                """
            )

    def test_math_functions_in_params(self):
        circ = qtn.Circuit.from_openqasm2_str(
            """
            OPENQASM 2.0;
            qreg q[1];
            rx(sin(0.5) + cos(pi/3)) q[0];
            rz(sqrt(2) * ln(2)) q[0];
            """
        )
        assert circ.gates[0].params == (
            pytest.approx(math.sin(0.5) + math.cos(math.pi / 3)),
        )
        assert circ.gates[1].params == (
            pytest.approx(math.sqrt(2) * math.log(2)),
        )

    def test_measure_and_creg_warn(self):
        with pytest.warns(SyntaxWarning):
            circ = qtn.Circuit.from_openqasm2_str(
                """
                OPENQASM 2.0;
                qreg q[2];
                creg c[2];
                h q[0];
                measure q -> c;
                """
            )
        assert circ.num_gates == 1

    def test_reset_unsupported(self):
        with pytest.raises(NotImplementedError):
            parse_openqasm2_str(
                "OPENQASM 2.0;\nqreg q[1];\nreset q[0];\n"
            )

    def test_conditional_unsupported(self):
        with pytest.raises(NotImplementedError):
            parse_openqasm2_str(
                "OPENQASM 2.0;\nqreg q[1];\ncreg c[1];\n"
                "if (c==1) x q[0];\n"
            )

    def test_comments_and_statement_splitting(self):
        circ = qtn.Circuit.from_openqasm2_str(
            """
            OPENQASM 2.0; // trailing comment
            qreg q[2]; h q[0]; /* inline
            block */ cx q[0], q[1]; // done
            """
        )
        assert [g.label for g in circ.gates] == ["H", "CX"]

    def test_unknown_gate_raises(self):
        with pytest.raises(NotImplementedError):
            parse_openqasm2_str(
                "OPENQASM 2.0;\nqreg q[1];\nfrobnicate q[0];\n"
            )


class TestOpenQASM3:
    def test_basic_and_q2_subset_match(self):
        body = """
        {header}
        {reg}
        h q[0];
        cx q[0], q[1];
        rz(pi/4) q[1];
        """
        c2 = qtn.Circuit.from_openqasm2_str(body.format(
            header="OPENQASM 2.0;", reg="qreg q[2];"
        ))
        c3 = qtn.Circuit.from_openqasm3_str(body.format(
            header="OPENQASM 3.0;", reg="qubit[2] q;"
        ))
        assert [
            (g.label, g.params, g.qubits) for g in c2.gates
        ] == [
            (g.label, g.params, g.qubits) for g in c3.gates
        ]

    def test_single_qubit_decl(self):
        info = parse_openqasm3_str(
            "OPENQASM 3.0;\nqubit a;\nqubit b;\nh a;\ncx a, b;\n"
        )
        assert info["n"] == 2
        assert info["gates"][1].qubits == (0, 1)

    def test_broadcast_registers(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            qubit[3] q;
            qubit[3] r;
            h q;
            cx q, r;
            """
        )
        assert [(g.label, g.qubits) for g in circ.gates] == [
            ("H", (0,)), ("H", (1,)), ("H", (2,)),
            ("CX", (0, 3)), ("CX", (1, 4)), ("CX", (2, 5)),
        ]

    def test_const_and_classical_decls(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            qubit[1] q;
            const float w = pi / 2;
            float t = w * 2;
            int k = 3;
            rx(t / k) q[0];
            """
        )
        assert circ.gates[0].params == (pytest.approx(math.pi / 3),)

    def test_assignment(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            qubit[1] q;
            float t = 1.0;
            t = t + 0.5;
            rx(t) q[0];
            """
        )
        assert circ.gates[0].params == (pytest.approx(1.5),)

    def test_symbolic_inputs(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            input float theta;
            qubit[2] q;
            ry(theta) q[0];
            cx q[0], q[1];
            rz(theta * 2) q[1];
            """
        )
        assert circ.gates[0].parametrize
        assert not circ.gates[1].parametrize
        assert circ.gates[2].parametrize
        assert math.isnan(circ.gates[0].params[0])
        circ.set_params({"theta": 0.3})
        assert circ.gates[0].params == (pytest.approx(0.3),)
        assert circ.gates[2].params == (pytest.approx(0.6),)
        ref = qtn.Circuit(2)
        ref.apply_gate("RY", 0.3, 0)
        ref.apply_gate("CX", 0, 1)
        ref.apply_gate("RZ", 0.6, 1)
        assert dense_match(circ, ref)

    def test_custom_gate_with_symbolic_params(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            input float a;
            qubit[2] q;
            gate foo(x) s, t { rx(x) s; cz s, t; ry(x / 2) t; }
            foo(a) q[0], q[1];
            foo(0.5) q[1], q[0];
            """
        )
        # first call symbolic, second concrete
        assert circ.gates[0].parametrize
        assert circ.gates[2].parametrize
        assert not circ.gates[3].parametrize
        assert circ.gates[3].params == (pytest.approx(0.5),)
        circ.set_params({"a": 0.4})
        assert circ.gates[0].params == (pytest.approx(0.4),)
        assert circ.gates[2].params == (pytest.approx(0.2),)

    def test_custom_gate_param_shadows_input(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            input float a;
            qubit[1] q;
            gate foo(a, aa) s { u3(aa, a, aa) s; }
            foo(0.1, a) q[0];
            """
        )
        circ.set_params({"a": 0.2})
        assert tuple(circ.gates[0].params) == pytest.approx(
            (0.2, 0.1, 0.2)
        )

    def test_array_index_symbolic_binding(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            input float theta;
            array[float, 2] angles = {theta, theta / 2};
            qubit[2] q;
            rx(angles[0]) q[0];
            ry(angles[1]) q[1];
            """
        )
        circ.set_params({"theta": 0.6})
        assert tuple(circ.gates[0].params) == pytest.approx((0.6,))
        assert tuple(circ.gates[1].params) == pytest.approx((0.3,))

    def test_partial_updates_preserve_other_params(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            input float a;
            input float b;
            qubit[1] q;
            rx(a) q[0];
            rz(b) q[0];
            """
        )
        circ.set_params({"a": 0.1, "b": 0.2})
        circ.set_params({"b": 0.9})
        assert circ.gates[0].params == (pytest.approx(0.1),)
        assert circ.gates[1].params == (pytest.approx(0.9),)

    def test_empty_update_preserves_state(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            input float a;
            qubit[1] q;
            rx(a) q[0];
            """
        )
        circ.set_params({"a": 0.7})
        circ.set_params({})
        assert circ.gates[0].params == (pytest.approx(0.7),)

    def test_unknown_named_param_rejected(self):
        circ = qtn.Circuit.from_openqasm3_str(
            "OPENQASM 3.0;\ninput float a;\nqubit[1] q;\nrx(a) q[0];\n"
        )
        with pytest.raises(ValueError):
            circ.set_params({"nope": 1.0})

    def test_managed_gate_direct_override_rejected(self):
        circ = qtn.Circuit.from_openqasm3_str(
            "OPENQASM 3.0;\ninput float a;\nqubit[1] q;\nrx(a) q[0];\n"
        )
        with pytest.raises(ValueError):
            circ.set_params({0: (0.5,)})

    def test_get_set_params_roundtrip(self):
        circ = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            input float a;
            qubit[1] q;
            rx(a) q[0];
            ry(0.3) q[0];
            """
        )
        circ.set_params({"a": 0.25})
        params = circ.get_params()
        assert params["a"] == pytest.approx(0.25)
        circ2 = qtn.Circuit.from_openqasm3_str(
            """
            OPENQASM 3.0;
            input float a;
            qubit[1] q;
            rx(a) q[0];
            ry(0.3) q[0];
            """
        )
        circ2.set_params(params)
        assert dense_match(circ, circ2)

    def test_output_decl_unsupported(self):
        with pytest.raises(NotImplementedError):
            parse_openqasm3_str(
                "OPENQASM 3.0;\noutput bit r;\nqubit[1] q;\n"
            )

    def test_control_flow_unsupported(self):
        for bad in (
            "for int i in [0:4] { x q[0]; }",
            "while (true) { x q[0]; }",
            "reset q[0];",
        ):
            with pytest.raises(NotImplementedError):
                parse_openqasm3_str(
                    f"OPENQASM 3.0;\nqubit[1] q;\n{bad}\n"
                )

    def test_modifier_unsupported(self):
        with pytest.raises(NotImplementedError):
            parse_openqasm3_str(
                "OPENQASM 3.0;\nqubit[2] q;\nctrl @ x q[0], q[1];\n"
            )

    def test_measure_warns(self):
        with pytest.warns(SyntaxWarning):
            info = parse_openqasm3_str(
                """
                OPENQASM 3.0;
                qubit[1] q;
                bit c;
                h q[0];
                c = measure q[0];
                """
            )
        assert info["n_gates"] == 1

    def test_measure_decl_initializer_warns(self):
        with pytest.warns(SyntaxWarning):
            info = parse_openqasm3_str(
                """
                OPENQASM 3.0;
                qubit[1] q;
                h q[0];
                bit c = measure q[0];
                """
            )
        assert info["n_gates"] == 1

    def test_indexed_measure_assignment_warns(self):
        # qiskit emits per-qubit measurement as `c[i] = measure q[i];`
        with pytest.warns(SyntaxWarning) as record:
            info = parse_openqasm3_str(
                """
                OPENQASM 3.0;
                bit[2] c;
                qubit[2] q;
                h q[0];
                cx q[0], q[1];
                c[0] = measure q[0];
                c[1] = measure q[1];
                """
            )
        assert info["n_gates"] == 2
        # the measure warning fires once, not per statement
        msgs = [str(w.message) for w in record]
        assert sum("measure" in m for m in msgs) == 1

    def test_gphase_ignored(self):
        with pytest.warns(SyntaxWarning):
            info = parse_openqasm3_str(
                "OPENQASM 3.0;\nqubit[1] q;\ngphase(pi/2);\nx q[0];\n"
            )
        assert info["n_gates"] == 1

    def test_multiple_statements_per_line(self):
        info = parse_openqasm3_str(
            "OPENQASM 3.0; qubit[2] q; h q[0]; cx q[0], q[1];"
        )
        assert info["n_gates"] == 2

    def test_inline_block_comment(self):
        info = parse_openqasm3_str(
            "OPENQASM 3.0;\nqubit[1] q;\nx /* mid */ q[0];\n"
        )
        assert info["n_gates"] == 1

    def test_nested_custom_gates_match_q2(self):
        body = """
        gate ent a, b {{ h a; cx a, b; }}
        gate twice(t) a, b {{ ent a, b; rz(t) b; ent a, b; }}
        {reg}
        twice(0.4) q[0], q[1];
        """
        c2 = qtn.Circuit.from_openqasm2_str(
            "OPENQASM 2.0;\n" + body.format(reg="qreg q[2];")
        )
        c3 = qtn.Circuit.from_openqasm3_str(
            "OPENQASM 3.0;\n" + body.format(reg="qubit[2] q;")
        )
        assert [
            (g.label, g.params, g.qubits) for g in c2.gates
        ] == [
            (g.label, g.params, g.qubits) for g in c3.gates
        ]
        assert dense_match(c2, c3)

    def test_parse_file_and_url(self, tmp_path):
        src = (
            "OPENQASM 3.0;\ninput float theta;\nqubit[2] q;\n"
            "rx(theta) q[0];\ncx q[0], q[1];\n"
        )
        from quimb_tpu.tensor.circuit.qasm import (
            parse_openqasm3_file,
            parse_openqasm3_url,
        )

        f = tmp_path / "c.qasm"
        f.write_text(src)
        a = parse_openqasm3_str(src)
        b = parse_openqasm3_file(str(f))
        c = parse_openqasm3_url(f.as_uri())
        for other in (b, c):
            assert other["n"] == a["n"]
            assert other["n_gates"] == a["n_gates"]
            assert other["inputs"] == a["inputs"]


class TestQASMSimulatorEquivalence:
    """Custom-gate QASM round trip agrees across simulators (VERDICT
    item 5 done-criterion)."""

    QASM = """
    OPENQASM 2.0;
    include "qelib1.inc";
    qreg q[4];
    gate su4ish(t, u) a, b { rx(t) a; ry(u) b; cx a, b; rz(t+u) b; }
    h q;
    su4ish(0.3, 0.7) q[0], q[1];
    su4ish(0.2, -0.4) q[2], q[3];
    su4ish(1.1, 0.05) q[1], q[2];
    cp(pi/5) q[0], q[3];
    """

    def test_dense_vs_tn_vs_mps(self):
        c_tn = qtn.Circuit.from_openqasm2_str(self.QASM)
        c_dense = qtn.CircuitDense.from_openqasm2_str(self.QASM)
        c_mps = qtn.CircuitMPS.from_openqasm2_str(self.QASM)
        assert dense_match(c_tn, c_dense)
        assert dense_match(c_mps, c_dense)
