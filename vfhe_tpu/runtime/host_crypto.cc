// Native host runtime: Goldilocks + Poseidon scalar kernels.
//
// The verifier's hash-chain recomputation (ref: verify_hash_output,
// ivc_based_vpbs.rs:64-78) is a strictly sequential sponge over the whole
// bootstrapping key — ~1.5M permutations at paper parameters. That path
// (plus Merkle path checks and the Fiat-Shamir transcript) is scalar host
// work the reference gets from native Rust/plonky2; this is its C++
// equivalent, bound via ctypes with a pure-python fallback.
//
// Round constants / MDS are injected from Python (set_poseidon_constants)
// so the tables cannot drift from the device kernels.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

static const u64 P = 0xFFFFFFFF00000001ULL;
static const u64 EPS = 0xFFFFFFFFULL;

// Branchless throughout: the reduction carries are data-dependent
// ~50/50 branches, and the mispredictions dominated the mul itself.
static inline u64 reduce128(u128 x) {
  u64 lo = (u64)x;
  u64 hi = (u64)(x >> 64);
  u64 hi_hi = hi >> 32;
  u64 hi_lo = hi & EPS;
  u64 t0 = lo - hi_hi - (EPS & (-(u64)(lo < hi_hi)));
  u64 t1 = hi_lo * EPS;
  u64 t2 = t0 + t1;
  t2 += EPS & (-(u64)(t2 < t1));
  t2 -= P & (-(u64)(t2 >= P));
  return t2;
}

static inline u64 gl_add(u64 a, u64 b) {
  u64 s = a + b;
  s += EPS & (-(u64)((s < a) | (s >= P)));
  return s;
}

static inline u64 gl_sub(u64 a, u64 b) {
  u64 d = a - b;
  d -= EPS & (-(u64)(a < b));
  return d;
}

static inline u64 gl_mul(u64 a, u64 b) { return reduce128((u128)a * b); }

// Full-width dot product: accumulate 128-bit products with an overflow
// counter (2^128 = -2^32 mod p), ONE reduction at the end.
static inline u64 dot_full(const u64* w, const u64* v, int n) {
  u128 acc = (u128)w[0] * v[0];
  u64 of = 0;
  for (int j = 1; j < n; j++) {
    u128 pr = (u128)w[j] * v[j];
    acc += pr;
    of += (u64)(acc < pr);
  }
  u64 r = reduce128(acc);
  return gl_sub(r, of << 32);
}

// Poseidon instance (width 12, x^7, 4+22+4 rounds); tables set from python.
static const int WIDTH = 12;
static const int N_ROUNDS = 30;
static const int HALF_FULL = 4;
static const int N_PARTIAL = 22;
static u64 RC[N_ROUNDS][WIDTH];
static u64 MDS[WIDTH][WIDTH];

// Optimized partial-round tables (Poseidon paper App. B — derived from
// this instance's constants by hashing/constants.fast_partial_data and
// injected below; bit-identical to the standard rounds, ~2.5x fewer
// scalar muls per partial round: one sparse 23-mul layer vs a 144-mul
// dense MDS).
static u64 FP_DENSE[WIDTH][WIDTH];
static u64 FP_ROW0[N_PARTIAL][WIDTH];
static u64 FP_COL[N_PARTIAL][WIDTH - 1];
static u64 FP_CONST[N_PARTIAL][WIDTH];
static bool FP_SET = false;

extern "C" void set_poseidon_constants(const u64* rc, const u64* mds) {
  std::memcpy(RC, rc, sizeof(RC));
  std::memcpy(MDS, mds, sizeof(MDS));
  FP_SET = false;  // fast tables must be re-derived for a new instance
}

extern "C" void set_poseidon_fast_partial(const u64* dense, const u64* row0,
                                          const u64* col, const u64* consts) {
  std::memcpy(FP_DENSE, dense, sizeof(FP_DENSE));
  std::memcpy(FP_ROW0, row0, sizeof(FP_ROW0));
  std::memcpy(FP_COL, col, sizeof(FP_COL));
  std::memcpy(FP_CONST, consts, sizeof(FP_CONST));
  FP_SET = true;
}

static inline u64 sbox(u64 x) {
  u64 x2 = gl_mul(x, x);
  u64 x4 = gl_mul(x2, x2);
  return gl_mul(gl_mul(x4, x2), x);
}

static void mds_layer(u64* s) {
  u64 out[WIDTH];
  for (int i = 0; i < WIDTH; i++) {
    u128 acc = 0;
    // MDS entries are < 2^7, so the 12-term accumulation fits u128 easily;
    // one reduction per output element.
    for (int j = 0; j < WIDTH; j++) acc += (u128)MDS[i][j] * s[j];
    out[i] = reduce128(acc);
  }
  std::memcpy(s, out, sizeof(out));
}

static void dense_layer(u64* s) {
  u64 out[WIDTH];
  for (int i = 0; i < WIDTH; i++) out[i] = dot_full(FP_DENSE[i], s, WIDTH);
  std::memcpy(s, out, sizeof(out));
}

extern "C" void poseidon_permute(u64* state) {
  int r = 0;
  for (int k = 0; k < HALF_FULL; k++, r++) {
    for (int i = 0; i < WIDTH; i++) state[i] = sbox(gl_add(state[i], RC[r][i]));
    mds_layer(state);
  }
  if (FP_SET) {
    dense_layer(state);
    for (int k = 0; k < N_PARTIAL; k++) {
      for (int i = 0; i < WIDTH; i++)
        state[i] = gl_add(state[i], FP_CONST[k][i]);
      state[0] = sbox(state[0]);
      u64 new0 = dot_full(FP_ROW0[k], state, WIDTH);
      for (int j = 1; j < WIDTH; j++)
        state[j] = gl_add(state[j], gl_mul(FP_COL[k][j - 1], state[0]));
      state[0] = new0;
    }
    r += N_PARTIAL;
  } else {
    for (int k = 0; k < N_PARTIAL; k++, r++) {
      for (int i = 0; i < WIDTH; i++) state[i] = gl_add(state[i], RC[r][i]);
      state[0] = sbox(state[0]);
      mds_layer(state);
    }
  }
  for (int k = 0; k < HALF_FULL; k++, r++) {
    for (int i = 0; i < WIDTH; i++) state[i] = sbox(gl_add(state[i], RC[r][i]));
    mds_layer(state);
  }
}

// Overwrite-mode rate-8 sponge, 4-element digest (plonky2 hash_no_pad).
extern "C" void hash_no_pad(const u64* in, u64 n, u64* out4) {
  u64 state[WIDTH] = {0};
  for (u64 start = 0; start < n; start += 8) {
    u64 w = n - start < 8 ? n - start : 8;
    for (u64 i = 0; i < w; i++) state[i] = in[start + i];
    poseidon_permute(state);
  }
  std::memcpy(out4, state, 4 * sizeof(u64));
}

// h_{i+1} = H(h_i || block_i) over n_blocks equal-size blocks
// (ref: verify_hash_output iteration).
extern "C" void hash_chain(const u64* blocks, u64 n_blocks, u64 block_len,
                           u64* inout4) {
  u64 buf_static[512];
  u64* buf = buf_static;  // enough for 4 + block_len <= 512 fast path
  u64 total = 4 + block_len;
  u64* heap = nullptr;
  if (total > 512) {
    heap = new u64[total];
    buf = heap;
  }
  for (u64 b = 0; b < n_blocks; b++) {
    std::memcpy(buf, inout4, 4 * sizeof(u64));
    std::memcpy(buf + 4, blocks + b * block_len, block_len * sizeof(u64));
    hash_no_pad(buf, total, inout4);
  }
  delete[] heap;
}

// Sponge absorption of n_chunks FULL rate-8 chunks from an arbitrary
// 12-wide state, recording the 4 capacity lanes (state[8..12]) after each
// permutation. Used by the prover to PRECOMPUTE the sequential sponge
// dependency chain once on the host, so the in-jit witness generation can
// evaluate all permutations of a long absorb (bsk hash / PI hash,
// ivc_based_vpbs.rs:64-78, 127-146) in one batched call instead of a
// sequential scan.
extern "C" void sponge_carries(const u64* chunks, u64 n_chunks,
                               u64* state12, u64* carries) {
  for (u64 c = 0; c < n_chunks; c++) {
    std::memcpy(state12, chunks + 8 * c, 8 * sizeof(u64));
    poseidon_permute(state12);
    std::memcpy(carries + 4 * c, state12 + 8, 4 * sizeof(u64));
  }
}

// two-to-one compression for Merkle paths.
extern "C" void two_to_one(const u64* l, const u64* r, u64* out4) {
  u64 state[WIDTH] = {0};
  std::memcpy(state, l, 4 * sizeof(u64));
  std::memcpy(state + 4, r, 4 * sizeof(u64));
  poseidon_permute(state);
  std::memcpy(out4, state, 4 * sizeof(u64));
}

// --- batch variants (thread-parallel; the batched proof verifier's
// host-side hashing: one ctypes call for B proofs x Q queries of paths
// instead of per-path python dispatch) ---------------------------------

template <typename F>
static void parallel_for(u64 n, F f) {
  unsigned nt = std::thread::hardware_concurrency();
  if (nt > 16) nt = 16;
  if (nt < 2 || n < 64) {
    for (u64 i = 0; i < n; i++) f(i);
    return;
  }
  std::vector<std::thread> ts;
  u64 chunk = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; t++) {
    u64 lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back([=] { for (u64 i = lo; i < hi; i++) f(i); });
  }
  for (auto& th : ts) th.join();
}

extern "C" void poseidon_permute_batch(u64* states, u64 n) {
  parallel_for(n, [=](u64 i) { poseidon_permute(states + 12 * i); });
}

extern "C" void hash_no_pad_batch(const u64* in, u64 len, u64 n,
                                  u64* out) {
  parallel_for(n, [=](u64 i) { hash_no_pad(in + len * i, len, out + 4 * i); });
}

// Merkle path verify: hash leaf_row (len w), fold siblings upward.
// Returns the final digest in out4 (caller compares against the cap).
extern "C" void merkle_path_digest(const u64* leaf, u64 leaf_len,
                                   const u64* siblings, u64 n_sib,
                                   u64 index, u64* out4) {
  u64 digest[4];
  hash_no_pad(leaf, leaf_len, digest);
  u64 tmp[4];
  for (u64 s = 0; s < n_sib; s++) {
    const u64* sib = siblings + 4 * s;
    if (index & 1) two_to_one(sib, digest, tmp);
    else two_to_one(digest, sib, tmp);
    std::memcpy(digest, tmp, sizeof(tmp));
    index >>= 1;
  }
  std::memcpy(out4, digest, sizeof(digest));
}

// Batch of Merkle path verifications, all with the same leaf width and
// depth (one FRI/PLONK oracle across B proofs x Q queries).
extern "C" void merkle_paths_batch(const u64* leaves, u64 leaf_len,
                                   const u64* siblings, u64 n_sib,
                                   const u64* indices, u64 n_paths,
                                   u64* out) {
  parallel_for(n_paths, [=](u64 i) {
    merkle_path_digest(leaves + leaf_len * i, leaf_len,
                       siblings + 4 * n_sib * i, n_sib, indices[i],
                       out + 4 * i);
  });
}

// Batch of independent hash chains (one per proof): chain c walks
// n_blocks blocks of block_len, updating inout4 + 4*c in place.
extern "C" void hash_chain_batch(const u64* blocks, u64 n_chains,
                                 u64 n_blocks, u64 block_len,
                                 u64* inout4) {
  parallel_for(n_chains, [=](u64 c) {
    hash_chain(blocks + c * n_blocks * block_len, n_blocks, block_len,
               inout4 + 4 * c);
  });
}
