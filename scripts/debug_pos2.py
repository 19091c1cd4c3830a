"""Stage-by-stage comparison of one Poseidon constraint round."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from vfhe_tpu.field import goldilocks as gl
from vfhe_tpu.field import host as hf
from vfhe_tpu.hashing import constants as HC
from vfhe_tpu.circuit import CircuitBuilder, PartialWitness, TEST_CONFIG
from vfhe_tpu.gadgets import extension as ge
from vfhe_tpu.ivc.verifier_circuit import ext_tree_sum

rng = np.random.default_rng(0)
wire_vals = rng.integers(0, gl.P, size=(132, 2), dtype=np.uint64)

b = CircuitBuilder(TEST_CONFIG)
wires = b.add_virtual_targets(132 * 2).reshape(132, 2)

rc = HC.all_round_constants()
mds = HC.mds_matrix()

# replicate _eval_pos_kinds round 0 for the 3 kinds
kinds = ["A", "B", "C"]
offsets = [0, 10, 20]
state = np.stack([wires[0:12]] * 3)          # (3, 12, 2)
step = 0
rcs = np.array([[int(rc[off + step][i]) for i in range(12)]
                for off in offsets])
rc_t = b.constants(rcs).reshape(3, 12)
s0 = b.add_vec(state[..., 0], rc_t).reshape(3, 12)
s = np.stack([s0, state[..., 1]], axis=-1)
x2 = ge.ext_mul(b, s, s)
x4 = ge.ext_mul(b, x2, x2)
x6 = ge.ext_mul(b, x4, x2)
x7 = ge.ext_mul(b, x6, s)
full_mask = np.array([(off + step < HC.HALF_FULL_ROUNDS or
                       off + step >= HC.HALF_FULL_ROUNDS + HC.N_PARTIAL_ROUNDS)
                      for off in offsets])
sb = s.copy()
for ki in range(3):
    if full_mask[ki]:
        sb[ki] = x7[ki]
    else:
        sb[ki, 0] = x7[ki, 0]
prod = ge.ext_mul_base(
    b, np.broadcast_to(sb[:, None, :, :], (3, 12, 12, 2)),
    b.constants(np.tile(mds[None], (3, 1, 1))).reshape(3, 12, 12))
out = ext_tree_sum(b, np.moveaxis(prod, 2, 0))   # (3, 12, 2)

data = b.build()
pw = PartialWitness()
pw.set_target_arr(wires, wire_vals)
w = np.asarray(data.eval_witness(pw))

def wv(t):
    return w[np.asarray(t, dtype=np.int64)]

# native (host field) for POS_A round 0 (full round)
wires_h = [hf.from_array(wire_vals[i]) for i in range(12)]
F = hf.HostExtOps
s_h = [F.add_int(wires_h[i], int(rc[0][i])) for i in range(12)]
def sbox(x):
    x2 = F.mul(x, x); x4 = F.mul(x2, x2)
    return F.mul(F.mul(x4, x2), x)
x7_h = [sbox(x) for x in s_h]
out_h = []
for i in range(12):
    acc = F.mul_int(x7_h[0], int(mds[i, 0]))
    for j in range(1, 12):
        acc = F.add(acc, F.mul_int(x7_h[j], int(mds[i, j])))
    out_h.append(acc)

print("full_mask:", full_mask)
print("s circuit[A,0]:", wv(s[0, 0]), " native:", s_h[0])
print("x7 circuit[A,0]:", wv(x7[0, 0]), " native:", x7_h[0])
print("sb circuit[A,0]:", wv(sb[0, 0]))
print("mds prod circuit[A,0,0]:", wv(prod[0, 0, 0]),
      " native:", F.mul_int(x7_h[0], int(mds[0, 0])))
print("out circuit[A,0]:", wv(out[0, 0]), " native:", out_h[0])
print("out circuit[A,1]:", wv(out[0, 1]), " native:", out_h[1])

print("rc_t[0,0] target value:", w[rc_t[0, 0]], " want:", int(rc[0][0]) % gl.P)
print("rc[0][:3] raw:", [int(rc[0][i]) for i in range(3)])
print("rcs[0,:3]:", rcs[0, :3], "dtype:", rcs.dtype)
print("wire[0,0]:", wire_vals[0, 0], "sum check:",
      (int(wire_vals[0, 0]) + int(rc[0][0])) % gl.P)
print("s target ids:", s[0, 0], "w at those:", wv(s[0, 0]))
