"""Committed golden vectors for THIS package's Poseidon instance.

The reference stack hashes with plonky2's ``PoseidonHash``
(ivc_based_vpbs.rs:64-78, 127-146). This package has the same instance
SHAPE (Goldilocks, width 12, x^7, 4+22+4 rounds, plonky2's MDS) but the
round constants are Grain-LFSR generated (hashing/constants.py) because
no copy of plonky2's committed ALL_ROUND_CONSTANTS table is available in
this environment — so transcript-level bit-parity with plonky2 cannot be
checked. These vectors pin OUR instance instead: any accidental drift of
the constant table, MDS, round structure, or sponge semantics is a test
failure. See README "Poseidon instance" and
tests/test_poseidon.py::test_plonky2_parity_when_table_installed for the
drop-in parity path.

Generated once from hashing.poseidon.{permute_host, hash_no_pad_host,
two_to_one_host} (which are themselves cross-checked against the
vectorized jnp path and the C++ runtime) and committed as literals.
"""

# (input_state, permuted_state) pairs, each 12 Goldilocks elements.
PERMUTE = [
    ([0x0000000000000000] * 12,
     [0x6a9608482b4758b2, 0x4e74e737b943df6e, 0x2186d87f48a02b9c,
      0x5277dd070be17dbf, 0x199d275f73f2d684, 0x2b4799edc464a6a8,
      0xff89d4905b9f5b38, 0x76e8f2bf2440b0f6, 0xc3ad9d600a48d392,
      0x95bc2747d1a4a187, 0x0282bca244b32066, 0xc9bad28211c43d70]),
    (list(range(12)),
     [0xd600caa7c93782ff, 0x51b0a688a645e257, 0xab66e96f38777ae2,
      0xfb22a8eb3ca92c76, 0x1bde4b7dad3f8bc3, 0x92d0c78786bbef96,
      0xb465de689662edac, 0x34f50cd553694c77, 0x109a3e326f0f3d91,
      0x9b44c53d1671f368, 0xe0489aa59f1a31a8, 0x9da467de168a9119]),
    ([0xffffffff00000000] * 12,                    # p - 1 lanes
     [0xc1976bcbe2e9afd2, 0x7af6220ff3e52d32, 0x5351166fcb81ad88,
      0x7a30eed422f11b38, 0x511620a0fe45e3ad, 0x91f34cbc738dc51d,
      0x7f4633f1f10789aa, 0x3874f2f7e74fd733, 0x7e531dbe17e9bd73,
      0x670f568cd42069b8, 0xa5f9aae7403b4868, 0x779ebc74245acb75]),
    ([0x123456789abcdef0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
     [0xc505889524efd3fe, 0xd8c2e2b9b700b6b7, 0x84405af52f15f871,
      0xb8b8d553bf570f59, 0x8153b80ff94bd622, 0xeedc2eddd10d8910,
      0x2c0aec2b23fa4a1b, 0xbf28fdf56e4e1281, 0x6995c9dd607f4474,
      0xb5cac7fa19338c74, 0xc0c64441eb54ca88, 0x553cc899570017d7]),
]

# (n, hash_no_pad([1..n])) — overwrite-mode rate-8 sponge, incl. exactly
# one chunk (8), chunk+partial (9), two chunks (16), two chunks+partial.
HASH_NO_PAD = [
    (1, [0x8416e24b59f69411, 0xb1a43fc987aed435,
         0x9c694d6f33012fe4, 0x9d3141b3c5a0b72e]),
    (4, [0xdc69e6c8efb95308, 0xee02b91d77509bc9,
         0xfcf5ebd5762bc1bd, 0x6b954d393ea9445a]),
    (8, [0x9e5e971750780b34, 0xfb79f3916270a2d2,
         0xb5f156575479d11b, 0xd4ef5a4965ad5d1c]),
    (9, [0x795c22676cbe2ca3, 0xcc75d35a3ae9457e,
         0xebfc8de97124f18a, 0xf273cffaeff212f9]),
    (16, [0xbdec67f8af62c648, 0xec2909632ce5dfe0,
          0x276a7961a71778b6, 0x3c176dab62658cf3]),
    (20, [0x5f116cc2ea9d7ef8, 0x2317902708f44aed,
          0xa8c83a0272877d91, 0x7790c76c9468ff89]),
]

# two_to_one(hash([1,2,3,4]), hash([5,6,7,8]))
TWO_TO_ONE = [0x6403498863c190d5, 0x97f9c6f404f26c5f,
              0x87707c05668d7d6d, 0xde011d1d7b567922]

# 3-round chain h_{i+1} = H(h_i || [10i .. 10i+4]) from h_0 = 0
# (the bsk/LWE hash-chain shape, ivc_based_vpbs.rs:64-78)
HASH_CHAIN3 = [0xd8d315da6dd8d939, 0x205fa8e84d22f6c1,
               0x56b4baf5dc0fe618, 0xb9934e79384c35a9]
