"""Isolate _eval_pos_kinds vs native eval_gate on random ext wires."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.field import host as hf
from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.circuit.builder import POS_A, POS_B, POS_C, GateInstance
from vfhe_tpu.prover.constraints import eval_gate
from vfhe_tpu.ivc.verifier_circuit import _eval_pos_kinds
from vfhe_tpu.gadgets import extension as ge

rng = np.random.default_rng(0)
wire_vals = rng.integers(0, gl.P, size=(132, 2), dtype=np.uint64)

b = CircuitBuilder(TEST_CONFIG)
wires = b.add_virtual_targets(132 * 2).reshape(132, 2)
terms = _eval_pos_kinds(b, wires)
data = b.build()
pw = PartialWitness()
pw.set_target_arr(wires, wire_vals)
w = np.asarray(data.eval_witness(pw))

wires_h = [hf.from_array(wire_vals[i]) for i in range(132)]
for kind, name in ((POS_A, "A"), (POS_B, "B"), (POS_C, "C")):
    cs = eval_gate(GateInstance(kind=kind), hf.HostExtOps, wires_h,
                   [hf.ext(0)] * 4, [hf.ext(0)] * 4)
    ct = w[np.asarray(terms[kind], dtype=np.int64)]
    nbad = 0
    for i, c in enumerate(cs):
        cv = tuple(int(x) for x in ct[i])
        if cv != tuple(c):
            if nbad < 5:
                print(f"POS_{name} term {i} (step {i//12} lane {i%12}): "
                      f"circuit {cv} native {tuple(c)}")
            nbad += 1
    print(f"POS_{name}: {nbad} mismatches / {len(cs)}")
