"""MXU pointwise multiplication mod p = 2^(16M)+1: dense negacyclic NTT over
small primes with CRT recombination.

This is the TPU-native answer to the role MPIR's assembly mpn_mulmod_2expp1
plays below the reference's recursion crossover (mul_fft.c:3119-3123,
3135-3139): the FFT's pointwise stage is a huge batch B of independent
products mod 2^(16M)+1.  Each product is the NEGACYCLIC convolution of the
two length-M base-2^16 digit vectors (x = 2^16, x^M == -1).  The schoolbook
chunk kernel (ops/pointwise_fused.py) computes that convolution on the VPU at
O(M^2) multiply-adds per row; here the same convolution runs on the MXU:

    per prime p:  c mod p = INTT_p( NTT_p(a) * NTT_p(b) )
    c (signed integer coefficients, |c| < P/2) via Garner CRT over 3 primes

with each NTT a DENSE matrix multiply [B, M] @ [M, M] mod p -- the transform
matrix is shared by the whole batch, which is exactly the shape the MXU's
systolic array wants (the "small-prime CRT on MXU" plan of SURVEY.md section
2's parallelism checklist).  A dense transform costs O(M^2) MACs like the
schoolbook, but MXU int8 matmul throughput is ~20x the VPU's int32
multiply-add rate, and three primes' matmuls still win by ~an order of
magnitude (measured: 472ms -> ~50ms for the 10^8-bit pointwise stage).

Exact-arithmetic scheme (everything int32/int8, no floats):

* Two prime tiers (see _tier): (12289, 40961, 61441) == 1 mod 4096 covers
  M <= 2048 with P ~ 2^44.8 (P/2 ~ 2^43.8); (65537, 114689, 163841) == 1
  mod 16384 covers M <= 8192 with P ~ 2^50.1 (P/2 ~ 2^49.1) (below 2^16
  only 40961 has 8192 | p-1, so wider rings need the ~17-bit primes; above
  NTT_MAX_M the recursive Fermat path takes over).
* Inputs get one BALANCED carry pass (digits recentered to [-2^15, 2^15]
  with the carry injected negacyclically), bounding digits below
  2^15 + 2^9 + 2 for any redundant input bounded by 2^25; negacyclic
  coefficients then satisfy |c| <= M * (2^15 + 2^9 + 2)^2: < 2^41.1 at
  M = 2048 (tier-1 P/2 ~ 2^43.8) and < 2^42.1 at M = 4096 (tier-2
  P/2 ~ 2^49.1).
* A value v mod p enters a matmul as k signed-int8 planes
  v = v0 + 256*v1 (+ 65536*v2), k = 2 for tier-1 (p < 2^16), k = 3 for
  tier-2, after balanced centering.  The 256^j factors of the high planes
  are absorbed into the MATRIX: row-plane j of the [kM, kM] block holds the
  planes of 256^j * V mod p, so the whole transform is ONE
  [B, kM] @ [kM, kM] int8 matmul with int32 accumulation (partial sums
  < kM * 128^2 < 2^29, exact), then a cheap high-to-low mod-fold.
* Garner mixed-radix digits recombine the three residues; the up-to-43-bit
  signed coefficients are never materialized -- each Garner term spreads
  into base-2^8 chunk planes (every partial product < 2^16) which pair back
  into redundant int32 digits, negacyclic-rolled into place.

Reference parity: replaces mpn_mulmod_2expp1 as the pointwise leaf; the
naive mod-2^64 CRT leg (fft_naive_convolution_1, mul_fft.c:2981-2996) has no
analogue because signs come out of the CRT range directly.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from .limb import DIGIT_BITS, _wrap_inject, carry_pass, normmod

# Two prime tiers.  Tier 1: sub-2^16 primes == 1 mod 4096 (2M-th roots for
# M <= 2048), values fit TWO signed-int8 planes -- the cheapest matmuls.
# Tier 2: sub-2^17.4 primes == 1 mod 16384 (M <= 8192; only 40961 reaches
# M=4096 below 2^16, so wider rings need wider primes), values take THREE
# planes -- 2.25x the matmul work, still far cheaper than a recursion level.
PRIMES = (12289, 40961, 61441)       # P ~ 2^44.8; |c| < P/2 up to M = 2048
PRIMES_T2 = (65537, 114689, 163841)  # P ~ 2^50.1; |c| < P/2 up to M = 8192
# pair tier (opt-in A/B, MPIR_FFT_NTT_PAIR=1): adjacent base-2^16 digits
# fuse into base-2^32 values, HALVING the transform length -- per-prime
# matmul work drops 4x while the wider coefficient bound
# (|c| <= Mp * (2^31.03)^2, log2(2|c|) = 73.04 at Mp = 1024) needs 5
# sub-2^16 primes == 1 mod 2048 (product ~2^74.8) instead of 3: total
# plane-MACs 5*(2*Mp)^2 vs 3*(2*2Mp)^2 = 2.4x fewer on the
# pointwise-dominating matmuls.  Measured on v5e the MAC savings do NOT
# materialize (B=16384, M=2048: 35.6 ms vs 34.2 ms dense 16-bit): int8
# GEMMs at K=N=2048 run at ~109 Tops vs ~186 at K=N=4096, and the 5-prime
# mixed-radix Garner costs ~2 ms more than the 3-prime one -- so the tier
# stays OFF by default, kept bit-exact under test for future retuning
# (e.g. hardware where small-K GEMMs reach peak).
PRIMES_PAIR = (12289, 18433, 40961, 59393, 61441)
PAIR_MAX_M = 1024                    # pairs; digit vectors up to L = 2048
TIER1_MAX_M = 2048
# tier-2 ceiling: the 4-step path's matrices are [3*m1, 3*m1] kilobyte-scale
# blocks, so M = 8192 costs no dense-matrix HBM (the round-1 cap of 4096 was
# sized for dense [kM, kM] blocks).  Bounds at M = 8192: negacyclic
# |c| <= M*(2^15+2^9+2)^2 ~ 2^43.1 < P/2 ~ 2^49.1; matmul partial sums
# |S_j| <= 3M*127^2 ~ 2^28.6 < 2^31 (int32-exact).
NTT_MAX_M = 8192


def _tier(M: int) -> tuple[tuple[int, int, int], int]:
    """(primes, planes) serving transform length M."""
    if M <= TIER1_MAX_M:
        return PRIMES, 2
    return PRIMES_T2, 3


def ntt_supported(M: int) -> bool:
    return 4 <= M <= NTT_MAX_M and (M & (M - 1)) == 0


# ---------------------------------------------------------------------------
# Host: roots and plane-block transform matrices
# ---------------------------------------------------------------------------

def _factorize(n: int) -> list[int]:
    fs, d = [], 2
    while d * d <= n:
        if n % d == 0:
            fs.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        fs.append(n)
    return fs


def _generator(p: int) -> int:
    fs = _factorize(p - 1)
    for g in range(2, p):
        if all(pow(g, (p - 1) // q, p) != 1 for q in fs):
            return g
    raise AssertionError(f"no generator mod {p}")


@functools.lru_cache(maxsize=None)
def _psi(p: int, M: int) -> int:
    """Primitive 2M-th root mod p with psi^M == -1."""
    assert (p - 1) % (2 * M) == 0, (p, M)
    psi = pow(_generator(p), (p - 1) // (2 * M), p)
    assert pow(psi, M, p) == p - 1
    return psi


def _center(v: np.ndarray, p: int) -> np.ndarray:
    return np.where(v > p // 2, v - p, v).astype(np.int64)


def _split_planes(v: np.ndarray, k: int) -> list[np.ndarray]:
    """Signed value -> k planes with v = sum_j planes[j] * 256^j, the low
    k-1 balanced into [-128, 128)."""
    planes = []
    for _ in range(k - 1):
        lo = ((v + 128) % 256) - 128
        planes.append(lo)
        v = (v - lo) >> 8
    planes.append(v)
    return planes


def _plane_block(V: np.ndarray, p: int, k: int) -> np.ndarray:
    """[M, M] value matrix mod p -> [kM, kM] signed-int8 plane block so that
    for X = [x0 | .. | x_{k-1}] (input planes), X @ block = [S0 | .. | S_{k-1}]
    with  x @ V mod p == sum_j 256^j * S_j  (mod p): row-plane j of the block
    holds the planes of 256^j * V mod p, absorbing the input planes' scale
    into the matrix."""
    rows = []
    for j in range(k):
        Uj = (V * (256**j)) % p
        rows.append(np.concatenate(_split_planes(_center(Uj, p), k), axis=1))
    blk = np.concatenate(rows, axis=0)
    assert blk.min() >= -128 and blk.max() <= 127
    return blk.astype(np.int8)


def _matrices(M: int) -> list[dict]:
    primes, planes = _tier(M)
    return _matrices_p(M, primes, planes)


@functools.lru_cache(maxsize=None)
def _matrices_p(M: int, primes: tuple, planes: int) -> list[dict]:
    """Per prime: plane-block forward/inverse negacyclic NTT matrices.
    F[i, k] = psi^(i(2k+1)); G[k, j] = M^-1 psi^(-j(2k+1))  (mod p)."""
    out = []
    for p in primes:
        psi = _psi(p, M)
        pows = np.empty(2 * M, np.int64)
        acc = 1
        for e in range(2 * M):
            pows[e] = acc
            acc = acc * psi % p
        i = np.arange(M, dtype=np.int64)[:, None]
        k = np.arange(M, dtype=np.int64)[None, :]
        F = pows[(i * (2 * k + 1)) % (2 * M)]
        Minv = pow(M, -1, p)
        G = (Minv * pows[(-(k * (2 * i + 1))) % (2 * M)]) % p
        out.append({"p": p, "k": planes,
                    "F": _plane_block(F, p, planes),
                    "G": _plane_block(G, p, planes)})
    return out


@functools.lru_cache(maxsize=None)
def _ntt4_mats(M: int) -> list[dict]:
    """Per prime: 4-step (Bailey) factorization of the length-M cyclic DFT
    into two length-m DFT matmul passes with an elementwise twiddle between
    them.  The negacyclic psi^i weights are FOLDED INTO THE MATRICES
    (round 5; VERDICT r4 next #2): psi^(i1*m2+i2) factors as
    psi^(i1*m2)*psi^(i2) -- the i1 part scales F1's rows, the i2 part rides
    the cross-twiddle table T (and on the inverse side psi^(-i2) rides Ti,
    M^-1*psi^(-i1*m2) scales G1's columns).  The explicit k_in/k_out weight
    passes of rounds 2-4 vanish: input planes are planes of the RAW
    balanced digits, and the inverse's last GEMM emits the fully unweighted
    coefficients.

    The dense [kM, kM] plane blocks at M=4096 weigh 151 MB each and get
    inlined into the lowered program (the remote compiler rejects the
    payload); the 4-step's [k*m, k*m] blocks are ~37 KB and the matmul work
    drops from O(M^2) to O(M^1.5) MACs per row.  Layout contract: the
    forward transform emits the spectrum in (k1, k2)-blocked PERMUTED order
    -- fine for the pointwise product, and the inverse consumes the same
    layout, mirroring the reference's no-reorder MFA convention
    (README:87-91)."""
    primes, k = _tier(M)
    lg = M.bit_length() - 1
    m1 = 1 << (lg // 2)
    m2 = M // m1
    out = []
    for p in primes:
        psi = _psi(p, M)
        om = psi * psi % p                      # primitive M-th root
        pw = np.empty(M, np.int64)
        acc = 1
        for e in range(M):
            pw[e] = acc
            acc = acc * om % p
        ppw = np.empty(2 * M, np.int64)
        acc = 1
        for e in range(2 * M):
            ppw[e] = acc
            acc = acc * psi % p
        i1 = np.arange(m1, dtype=np.int64)
        i2 = np.arange(m2, dtype=np.int64)
        Minv = pow(M, -1, p)
        # F1 rows carry psi^(i1*m2); T carries psi^(i2)
        F1 = (ppw[(i1 * m2) % (2 * M)][:, None]
              * pw[(m2 * np.outer(i1, i1)) % M]) % p     # [i1, k1]
        F2 = pw[(m1 * np.outer(i2, i2)) % M]             # [i2, k2]
        T = (ppw[i2 % (2 * M)][:, None]
             * pw[np.outer(i2, i1) % M]) % p             # [i2, k1]
        # inverse: Ti carries psi^(-i2); G1 columns carry M^-1 psi^(-i1*m2)
        G2 = pw[(-m1 * np.outer(i2, i2)) % M]            # [k2 dot]
        Ti = (ppw[(-i2) % (2 * M)][None, :]
              * pw[(-np.outer(i1, i2)) % M]) % p         # [k1, i2]
        G1 = (Minv * ppw[(-i1 * m2) % (2 * M)][None, :]
              * pw[(-m2 * np.outer(i1, i1)) % M]) % p    # [k1, i1]
        out.append({
            "p": p, "k": k, "m1": m1, "m2": m2,
            "F1": _plane_block(F1, p, k), "F2": _plane_block(F2, p, k),
            "G1": _plane_block(G1, p, k), "G2": _plane_block(G2, p, k),
            "T": T.astype(np.int32), "Ti": Ti.astype(np.int32),
        })
    return out


@functools.lru_cache(maxsize=None)
def _garner_consts(primes: tuple[int, int, int]) -> dict:
    p1, p2, p3 = primes
    return {
        "inv12": pow(p1, -1, p2),
        "inv13": pow(p1, -1, p3),
        "inv23": pow(p2, -1, p3),
        "q": p1 * p2,
    }


# ---------------------------------------------------------------------------
# Device: exact int32 modular helpers
#
# Reduction discipline (round-3 rewrite): TPU integer division (what
# jnp.mod lowers to) is the single most expensive VPU op in this file --
# measured 0.94 ms per whole-chunk pass at [16384, 2048], and the dense
# pipeline used ~11 of them per prime while its 9 GEMMs cost only 11 ms
# total.  All reductions now go through one f32-Barrett quotient
# (q = round-or-floor(v * 1/p); r = v - q*p) with exact conditional
# fixups, and intermediates stay LOOSE (|r| < 2p) wherever the next
# consumer tolerates it -- exact representatives are materialized only at
# plane conversion (centered) and before Garner (nonneg).  Exactness: for
# |v| <= 2^29 the f32 quotient errs by at most 1 (relative error ~2^-23
# against v/p >= 2^11 quotient magnitudes), so r lands within +-2p (loose),
# +-1.5p before the centering fixups, and q*p stays int32.
# ---------------------------------------------------------------------------

def _red_loose(v: jax.Array, p: int) -> jax.Array:
    """Same residue class, |result| < 2p.  Valid for |v| <= 2^29 - 2p."""
    q = jnp.floor(v.astype(jnp.float32) * np.float32(1.0 / p)).astype(jnp.int32)
    return v - q * p


def _red_center(v: jax.Array, p: int) -> jax.Array:
    """Exact centered representative in [-p//2, p//2].  |v| <= 2^29."""
    q = jnp.round(v.astype(jnp.float32) * np.float32(1.0 / p)).astype(jnp.int32)
    r = v - q * p                                  # within +-1.5p
    r = r - jnp.where(r > p // 2, p, 0)
    return r + jnp.where(r < -(p // 2), p, 0)


def _red_nonneg(v: jax.Array, p: int) -> jax.Array:
    """Exact representative in [0, p).  |v| <= 2^29."""
    r = _red_center(v, p)
    return r + jnp.where(r < 0, p, 0)


_RED = {"loose": _red_loose, "center": _red_center, "nonneg": _red_nonneg}


def _modmul_const(a: jax.Array, c: int, p: int) -> jax.Array:
    """a * c mod p -> [0, p), for |a| < 2p, p < 2^17.5, constant c in [0, p).
    Partial products stay int32-exact: |a*ch| < 2p * (p>>8) < 2^28.6."""
    cl, ch = c & 0xFF, c >> 8
    t = _red_loose(a * ch, p)
    return _red_nonneg(a * cl + (t << 8), p)


def _modmul(a: jax.Array, b: jax.Array, p: int, out: str = "nonneg") -> jax.Array:
    """a * b mod p for |a|, |b| < 2p (signed ok), p < 2^17.5.  out: 'loose'
    (|r| < 2p, cheapest), 'center', or 'nonneg'.  The byte decomposition
    b = (b >> 8)*256 + (b & 255) holds for negative b (arithmetic shift);
    |a * bh| <= 2p * 2p/256 < 2^28.6 int32-exact."""
    bl = b & 0xFF
    bh = b >> 8
    t = _red_loose(a * bh, p)
    return _RED[out](a * bl + (t << 8), p)


def _to_planes(x: jax.Array, p: int, k: int) -> jax.Array:
    """Digits (any int32 magnitude <= 2^29) -> [..., kM] signed-int8 planes."""
    rc = _red_center(x, p)
    planes = []
    for _ in range(k - 1):
        lo = ((rc + 128) & 255) - 128
        planes.append(lo)
        rc = (rc - lo) >> 8
    planes.append(rc)
    return jnp.concatenate(planes, axis=-1).astype(jnp.int8)


def _dot_raw(planes: jax.Array, blk) -> jax.Array:
    """[..., kM] int8 planes @ [kM, kM] int8 block -> raw int32 plane sums
    [..., kM] (exact: |S_j| <= kM*127^2 < 2^28.6)."""
    return jax.lax.dot_general(
        planes,
        jnp.asarray(blk),
        (((planes.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _fold_S(S: jax.Array, p: int, k: int, out: str = "center") -> jax.Array:
    """Fold raw plane sums S = [S0|..|S_{k-1}] high-to-low into values mod p
    [..., M]: v = S0 + 256(S1 + 256(S2 ...)); every intermediate stays
    int32-exact (each loose fold term adds (2p << 8) < 2^26.4)."""
    M = S.shape[-1] // k
    acc = _red_loose(S[..., (k - 1) * M :], p)
    for j in range(k - 2, -1, -1):
        v = S[..., j * M : (j + 1) * M] + (acc << 8)
        acc = _red_loose(v, p) if j else _RED[out](v, p)
    return acc


def _apply_block(planes: jax.Array, blk: np.ndarray, p: int, k: int,
                 out: str = "center") -> jax.Array:
    """[..., kM] int8 planes @ [kM, kM] int8 block -> values mod p [..., M],
    exact 'center' (default) or 'nonneg' (the pre-Garner application)."""
    return _fold_S(_dot_raw(planes, blk), p, k, out)


def _nega_roll_digits(v: jax.Array, k: int) -> jax.Array:
    """Shift digit positions up by k, wrapping negated (2^(16M) == -1)."""
    if k == 0:
        return v
    return jnp.concatenate([-v[..., -k:], v[..., :-k]], axis=-1)


def _garner_to_digits(rs, primes) -> jax.Array:
    """Three residue planes [..., M] -> redundant int32 digits of the signed
    negacyclic coefficients (|c| < P/2), via mixed-radix Garner digits
    c = v1 + p1*v2 + (p1*p2)*v3 spread into base-2^8 chunk planes: every
    chunk product stays below ~2^17 and the paired digits below ~2^21, so
    nothing wide is ever materialized."""
    r1, r2, r3 = rs
    p1, p2, p3 = primes
    g = _garner_consts(primes)
    v1 = r1
    v2 = _modmul_const(_red_nonneg(r2 - v1, p2), g["inv12"], p2)
    t = _modmul_const(_red_nonneg(r3 - v1, p3), g["inv13"], p3)
    v3 = _modmul_const(_red_nonneg(t - v2, p3), g["inv23"], p3)
    v3 = jnp.where(v3 > p3 // 2, v3 - p3, v3)          # centered: |v3| < p3/2

    nA = (g["q"].bit_length() + p3.bit_length()) // 8 + 2
    A = [0] * nA

    def var_chunks(v, signed):
        """Base-2^8 chunks of v (< 2^18 magnitude), top chunk signed."""
        out = []
        for _ in range(2):
            lo = v & 0xFF
            out.append(lo)
            v = (v - lo) >> 8
        out.append(v)                                   # |top| <= ~2^2..2^9
        return out

    def spread(const: int, vcs):
        m = 0
        c = const
        while c:
            ck = c & 0xFF
            if ck:
                for j, vc in enumerate(vcs):
                    A[m + j] = A[m + j] + ck * vc
            c >>= 8
            m += 1

    spread(1, var_chunks(v1, False))
    spread(p1, var_chunks(v2, False))
    spread(g["q"], var_chunks(v3, True))

    even = 0
    odd = 0
    for m in range(0, nA, 2):
        if not isinstance(A[m], int):
            even = even + _nega_roll_digits(A[m], m // 2)
    for m in range(1, nA, 2):
        if not isinstance(A[m], int):
            odd = odd + _nega_roll_digits(A[m], m // 2)
    return even + (odd << 8)


import contextlib
import contextvars

# trace-time hook: (expected_M, row_multiple, body, consumed_cell).  The
# staged flagship sets it around the pointwise call so the chunk's first
# inverse leg (transforms.ifft_innermost_body) runs INSIDE the Garner
# kernel -- zero extra HBM round trips (ref combined variant,
# mul_fft.c:2745-2923).  consumed_cell lets the caller detect when the
# pointwise routed away from the NTT (recursive/schoolbook) and apply the
# leg separately.
_GARNER_POST = contextvars.ContextVar("mpir_fft_garner_post", default=None)

# diagnostic: Garner kernels that consumed a garner_post body since import
# (tests pin that a pipeline's pointwise actually fused its inverse leg)
_GARNER_FUSED_CALLS = 0


@contextlib.contextmanager
def garner_post(M: int, K: int, body):
    """Install `body` (pure ops on [rb, M] row blocks, rb a multiple of K)
    as the Garner kernel's epilogue for rings of exactly M digits.  Yields a
    dict whose 'consumed' becomes True if a matching Garner kernel traced."""
    cell = {"consumed": False}
    tok = _GARNER_POST.set((M, K, body, cell))
    try:
        yield cell
    finally:
        _GARNER_POST.reset(tok)


def _garner_carry(parts, primes, raw_k: int | None = None) -> jax.Array:
    """carry_pass(_garner_to_digits(parts, primes)), fused into ONE Pallas
    row-block kernel when enabled: the ~30 elementwise links of the Garner
    spread otherwise cost several whole-batch HBM passes (measured 11 ms ->
    5.4 ms per 16384x2048 pointwise chunk; ~45 ms of the 10^9-bit multiply).
    A matching garner_post body is applied in the same kernel.

    raw_k: parts are RAW [..., kM] inverse-GEMM plane sums; the nonneg fold
    happens in-kernel too, saving the per-prime fold's whole-batch HBM
    round trip (dense-tier link fusion)."""
    x = parts[0]
    kk = raw_k or 1
    M = x.shape[-1] // kk
    if x.ndim >= 2 and M >= 128:
        from .fused import VMEM_SCOPED_LIMIT, _interpret, _pick_row_block, use_pallas
        from .transforms import _NO_FUSE

        if use_pallas() and not _NO_FUSE.get():
            import math

            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            from .transforms import no_auto_fuse

            lead = x.shape[:-1]
            B = math.prod(lead)
            flats = [p.reshape(B, kk * M) for p in parts]
            hook = _GARNER_POST.get()
            post = None
            fudge = 16 + 12 * (kk - 1)
            if hook is not None and hook[0] == M and B % hook[1] == 0:
                _, rowq, body, cell = hook
                # row blocks must hold whole K-groups of the inverse leg
                fudge = 24 + 12 * (kk - 1)
                r = _pick_row_block(B, VMEM_SCOPED_LIMIT // (fudge * M * x.dtype.itemsize))
                r -= r % rowq
                while r >= rowq and B % r:
                    r -= rowq
                if r >= rowq:
                    post, cell["consumed"], rbq = body, True, r
                    global _GARNER_FUSED_CALLS
                    _GARNER_FUSED_CALLS += 1
            rb = rbq if post is not None else _pick_row_block(
                B, VMEM_SCOPED_LIMIT // (fudge * M * x.dtype.itemsize))

            def kernel(*refs):
                if raw_k is None:
                    rs = tuple(r[...] for r in refs[:-1])
                else:
                    rs = tuple(_fold_S(r[...], p, raw_k, out="nonneg")
                               for r, p in zip(refs[:-1], primes))
                d = carry_pass(_garner_to_digits(rs, primes))
                if post is not None:
                    with no_auto_fuse():
                        d = post(d)
                refs[-1][...] = d

            spec_in = pl.BlockSpec((rb, kk * M), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
            spec = pl.BlockSpec((rb, M), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                kernel,
                grid=(B // rb,),
                out_shape=jax.ShapeDtypeStruct((B, M), x.dtype),
                in_specs=[spec_in] * len(parts),
                out_specs=spec,
                interpret=_interpret(),
            )(*flats)
            return out.reshape(x.shape[:-1] + (M,))
    if raw_k is not None:
        parts = [_fold_S(r, p, raw_k, out="nonneg")
                 for r, p in zip(parts, primes)]
    return carry_pass(_garner_to_digits(parts, primes))


def _mixed_radix(rs, primes):
    """Mixed-radix Garner digits of the signed CRT value over n primes:
    c = v[0] + q1*v[1] + q1q2*v[2] + ... with the LAST digit centered signed
    (so c covers (-P/2, P/2)).  O(n^2) _modmul_const passes."""
    n = len(primes)
    vs = []
    for j in range(n):
        t = rs[j]
        pj = primes[j]
        for i in range(len(vs)):
            t = _modmul_const(_red_nonneg(t - vs[i], pj), pow(primes[i], -1, pj), pj)
        vs.append(t)
    vs[-1] = jnp.where(vs[-1] > primes[-1] // 2, vs[-1] - primes[-1], vs[-1])
    return vs


def _garner_pair_to_digits(rs, primes) -> jax.Array:
    """n residue planes [..., Mp] of PAIR coefficients (32-bit positions) ->
    redundant int32 base-2^16 digits [..., 2*Mp] of the signed negacyclic
    coefficients.  Chunk plane m (base-2^8) of coefficient j lands at byte
    4j + m = digit 2j + m//2, bit 8*(m & 1); rolls are negacyclic at PAIR
    granularity (2^(32*Mp) == -1), and the final digit vector interleaves
    the even/odd digit planes of each pair."""
    vs = _mixed_radix(rs, primes)
    consts = [1]
    for p in primes[:-1]:
        consts.append(consts[-1] * p)
    clog = sum(p.bit_length() for p in primes)
    nA = clog // 8 + 4
    A = [0] * nA

    def var_chunks(v):
        out = []
        for _ in range(2):
            lo = v & 0xFF
            out.append(lo)
            v = (v - lo) >> 8
        out.append(v)
        return out

    for const, v in zip(consts, vs):
        vcs = var_chunks(v)
        m = 0
        c = const
        while c:
            ck = c & 0xFF
            if ck:
                for j, vc in enumerate(vcs):
                    A[m + j] = A[m + j] + ck * vc
            c >>= 8
            m += 1

    evens = 0
    odds = 0
    for m in range(0, nA, 2):
        if not isinstance(A[m], int):
            q = m // 2
            part = _nega_roll_digits(A[m], q // 2)
            if q % 2 == 0:
                evens = evens + part
            else:
                odds = odds + part
    for m in range(1, nA, 2):
        if not isinstance(A[m], int):
            q = m // 2
            part = _nega_roll_digits(A[m], q // 2) << 8
            if q % 2 == 0:
                evens = evens + part
            else:
                odds = odds + part
    out = jnp.stack([evens, odds], axis=-1)
    return out.reshape(out.shape[:-2] + (2 * out.shape[-2],))


def _pair_mod(d0: jax.Array, d1: jax.Array, p: int) -> jax.Array:
    """(d0 + 2^16 * d1) mod p for balanced digit planes (|d| <= ~2^15.1):
    split the 2^16 mod p constant into bytes so every partial product stays
    int32-exact."""
    c16 = (1 << 16) % p
    cl, ch = c16 & 0xFF, c16 >> 8
    t = _red_loose(d1 * ch, p)
    return _red_loose(d0 + d1 * cl + (t << 8), p)


def pair_supported(M: int) -> bool:
    """M = 16-bit digit count; the pair tier serves even M with a
    power-of-two pair count Mp = M/2 in [4, PAIR_MAX_M]."""
    Mp = M // 2
    return M % 2 == 0 and 4 <= Mp <= PAIR_MAX_M and (Mp & (Mp - 1)) == 0


def _mulmod_ntt_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a * b) mod 2^(16M)+1 via the base-2^32 pair tier (see PRIMES_PAIR):
    digits pair into Mp = M/2 values, 5 sub-2^16 primes, dense [2Mp, 2Mp]
    int8 plane matmuls -- 2.4x fewer MXU MACs than the 3-prime 16-bit tier
    at the same ring width."""
    M = a.shape[-1]
    Mp = M // 2
    a = _balanced_pass(a)
    b = _balanced_pass(b)
    a0, a1 = a[..., 0::2], a[..., 1::2]
    b0, b1 = b[..., 0::2], b[..., 1::2]
    mats = _matrices_p(Mp, PRIMES_PAIR, 2)
    parts = []
    for mat in mats:
        p, k = mat["p"], mat["k"]
        fa = _apply_block(_to_planes(_pair_mod(a0, a1, p), p, k), mat["F"], p, k)
        fb = _apply_block(_to_planes(_pair_mod(b0, b1, p), p, k), mat["F"], p, k)
        parts.append(
            _apply_block(_to_planes(_modmul(fa, fb, p, out="loose"), p, k),
                         mat["G"], p, k, out="nonneg")
        )
    return carry_pass(_garner_pair_to_digits(parts, PRIMES_PAIR))


def _balanced_pass(x: jax.Array) -> jax.Array:
    """One carry sweep recentering digits to ~[-2^15, 2^15]: the negacyclic
    coefficient bound scales with the SQUARE of the digit bound, so balancing
    doubles the M each prime tier's CRT range covers.  From |digit| <= B the
    output bound is 2^15 + B/2^16 + 1 (exact in the ring)."""
    m = (x + (1 << (DIGIT_BITS - 1))) >> DIGIT_BITS
    r = x - (m << DIGIT_BITS)
    return r + _wrap_inject(m)


# ---------------------------------------------------------------------------
# Dense-tier link kernels: the elementwise chains BETWEEN the plane-block
# GEMMs (balanced pass + plane conversion; fold/pointwise/replane) each cost
# whole-batch HBM round trips when left to XLA -- measured ~18 ms of the
# 28.9 ms per [16384, 2048] pointwise chunk at 10^9 bits while the 9 GEMMs
# cost ~11 ms.  Each link here runs as ONE Pallas row-block pass: inputs make
# one HBM read, outputs (int8 planes -- a quarter the bytes) one write.
# ---------------------------------------------------------------------------

def _links_on(B: int, M: int) -> bool:
    from .fused import use_pallas
    from .transforms import _NO_FUSE

    return (use_pallas() and not _NO_FUSE.get()
            and B % 32 == 0 and M % 128 == 0)


def _link_rb(B: int, M: int, fudge: int) -> int:
    """Row block for link kernels: like _pick_row_block but a multiple of 32
    (the int8 output tile's sublane count)."""
    from .fused import VMEM_SCOPED_LIMIT

    rb = min(B, max(32, (VMEM_SCOPED_LIMIT // (fudge * 4 * M) // 32) * 32))
    rb -= rb % 32
    while rb >= 32:
        if B % rb == 0:
            return rb
        rb -= 32
    return B


def _input_planes(x: jax.Array, mats) -> list[jax.Array]:
    """Balanced carry pass + per-prime centered plane conversion in one HBM
    round trip: [B, M] int32 digits -> one [B, kM] int8 plane tensor per
    prime (the forward GEMMs' inputs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused import _interpret

    B, M = x.shape
    k = mats[0]["k"]

    def kernel(x_ref, *o_refs):
        xb = _balanced_pass(x_ref[...])
        for mat, o in zip(mats, o_refs):
            o[...] = _to_planes(xb, mat["p"], k)

    rb = _link_rb(B, M, 8 + 3 * k)
    spec_in = pl.BlockSpec((rb, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((rb, k * M), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return list(pl.pallas_call(
        kernel,
        grid=(B // rb,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, k * M), jnp.int8) for _ in mats),
        in_specs=[spec_in],
        out_specs=(spec_out,) * len(mats),
        interpret=_interpret(),
    )(x))


def _mid_planes(Sa: jax.Array, Sb: jax.Array, p: int, k: int) -> jax.Array:
    """Fold both forward GEMM outputs, pointwise-multiply mod p, and replane
    for the inverse GEMM, in one HBM round trip: 2x [B, kM] raw int32 plane
    sums -> [B, kM] int8 planes of (fa * fb) mod p."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused import _interpret

    B, kM = Sa.shape
    M = kM // k

    def kernel(a_ref, b_ref, o_ref):
        fa = _fold_S(a_ref[...], p, k)
        fb = _fold_S(b_ref[...], p, k)
        o_ref[...] = _to_planes(_modmul(fa, fb, p, out="loose"), p, k)

    rb = _link_rb(B, kM, 14)
    spec = pl.BlockSpec((rb, kM), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // rb,),
        out_shape=jax.ShapeDtypeStruct((B, kM), jnp.int8),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(Sa, Sb)


# ---------------------------------------------------------------------------
# 4-step (tier-2) link kernels: same idea at M > TIER1_MAX_M.  The XLA
# 4-step path pays an HBM round trip for every fold / twiddle / replane /
# TRANSPOSE between its four dots; here each inter-dot chain is one Pallas
# pass over [rb, m, km] 3-D row blocks, and the transposes vanish entirely:
# every dot contracts the axis the planes were laid along (dot_general's
# free-dim ordering lands the contracted axis last, exactly where the next
# stage wants it -- the same trick as _fused_mulmod_fn, but with the dots
# left to XLA's whole-batch GEMMs, which beat in-kernel row-block GEMMs).
# ---------------------------------------------------------------------------

def _to_planes_ax(x: jax.Array, p: int, k: int, axis: int) -> jax.Array:
    """_to_planes with the k planes concatenated along `axis` (f32-Barrett
    centered; any |x| <= 2^29)."""
    rc = _red_center(x, p)
    planes = []
    for _ in range(k - 1):
        lo = ((rc + 128) & 255) - 128
        planes.append(lo)
        rc = (rc - lo) >> 8
    planes.append(rc)
    return jnp.concatenate(planes, axis=axis).astype(jnp.int8)


def _link3(fn, ins, tables, out_shape, out_dtype, fudge: int):
    """One Pallas pass of a row-elementwise fn over 3-D [B, d1, d2] blocks
    (trailing dims whole in VMEM; rows stream).  `tables` are small constant
    arrays given to the kernel whole (constant index map)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused import _interpret

    B = ins[0].shape[0]
    rb = _link_rb(B, ins[0].shape[-2] * ins[0].shape[-1], fudge)

    def kernel(*refs):
        n = len(ins)
        vals = [r[...] for r in refs[: n + len(tables)]]
        refs[-1][...] = fn(*vals)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((rb,) + tuple(shape[1:]),
                            lambda i, nd=nd: (i,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B // rb,),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        in_specs=[spec(x.shape) for x in ins] + [tspec(t) for t in tables],
        out_specs=spec(out_shape),
        interpret=_interpret(),
    )(*ins, *tables)


def _link3_multi(fn, ins, tables, out_shapes, out_dtype, fudge: int):
    """_link3 with MULTIPLE outputs: fn returns a tuple matching
    out_shapes.  One read of the inputs feeds every output (the
    all-primes/all-operands input-planes pass)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused import _interpret

    B = ins[0].shape[0]
    rb = _link_rb(B, ins[0].shape[-2] * ins[0].shape[-1], fudge)

    def kernel(*refs):
        n = len(ins) + len(tables)
        vals = [r[...] for r in refs[:n]]
        outs = fn(*vals)
        for o_ref, o in zip(refs[n:], outs):
            o_ref[...] = o

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((rb,) + tuple(shape[1:]),
                            lambda i, nd=nd: (i,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    def tspec(t):
        nd = t.ndim
        return pl.BlockSpec(t.shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B // rb,),
        out_shape=tuple(jax.ShapeDtypeStruct(s, out_dtype)
                        for s in out_shapes),
        in_specs=[spec(x.shape) for x in ins] + [tspec(t) for t in tables],
        out_specs=tuple(spec(s) for s in out_shapes),
        interpret=_interpret(),
    )(*ins, *tables)


def _ntt4_input_planes(a3: jax.Array, b3: jax.Array, mats) -> list:
    """ONE kernel pass: balanced carry pass on both operands + per-prime
    plane conversion -- 6 int8 plane tensors from 2 HBM reads (round 5;
    both operands' former per-prime k_in passes collapse here)."""
    B, m1, m2 = a3.shape
    k = mats[0]["k"]

    def body(xa, xb):
        xa = _balanced_pass3(xa)
        xb = _balanced_pass3(xb)
        outs = []
        for mat in mats:
            outs.append(_to_planes_ax(xa, mat["p"], k, -2))
            outs.append(_to_planes_ax(xb, mat["p"], k, -2))
        return tuple(outs)

    shapes = ((B, k * m1, m2),) * (2 * len(mats))
    outs = _link3_multi(body, (a3, b3), (), shapes, jnp.int8,
                        10 + 3 * len(mats))
    return [(outs[2 * i], outs[2 * i + 1]) for i in range(len(mats))]


def _dot_ax(planes: jax.Array, blk, axis: int) -> jax.Array:
    """Contract `axis` of the int8 plane tensor against plane block axis 0;
    the contracted axis lands LAST in the output (int32, raw plane sums)."""
    ax = axis % planes.ndim
    return jax.lax.dot_general(
        planes, jnp.asarray(blk), (((ax,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _ntt4_linked_parts(pl_a: jax.Array, pl_b: jax.Array, B: int,
                       mat: dict) -> jax.Array:
    """One prime's full 4-step negacyclic product through link kernels:
    per-prime input planes [B, k*m1, m2] (from _ntt4_input_planes) ->
    [B, m2, m1] residue values in [0, p) (i2, i1 PERMUTED layout; caller
    transposes).  Four XLA whole-batch plane GEMMs; every inter-dot chain
    is one Pallas pass and no explicit transpose exists anywhere
    (contraction-order layouts).

    Round 5: the psi weights live inside F1/T and Ti/G1 (_ntt4_mats), so
    the former per-operand k_in weight passes and the k_out weight pass
    are gone (input planes come shared from _ntt4_input_planes; the last
    link is a plain fold)."""
    p, k = mat["p"], mat["k"]
    m1, m2 = mat["m1"], mat["m2"]
    T = jnp.asarray(mat["T"])                    # [m2(i2), m1(k1)], psi-folded
    Ti = jnp.asarray(mat["Ti"])                  # [m1(k1), m2(i2)], psi-folded

    def k_mid1(S, t):
        v = _fold_S(S, p, k, out="loose")        # [rb, m2, m1]
        return _to_planes_ax(_modmul(v, t, p, out="loose"), p, k, -2)

    def k_pw(Sa, Sb):
        fa = _fold_S(Sa, p, k, out="loose")      # [rb, k1, k2]
        fb = _fold_S(Sb, p, k, out="loose")
        return _to_planes_ax(_modmul(fa, fb, p, out="loose"), p, k, -1)

    def k_mid3(S, t):
        v = _fold_S(S, p, k, out="loose")        # [rb, k1, i2]
        return _to_planes_ax(_modmul(v, t, p, out="loose"), p, k, -2)

    def k_out(S):
        return _fold_S(S, p, k, out="nonneg")    # [rb, i2, i1]

    def fwd(pl1):
        S1 = _dot_ax(pl1, mat["F1"], -2)         # [B, m2, km1]
        pl2 = _link3(k_mid1, (S1,), (T,), (B, k * m2, m1), jnp.int8, 10)
        return _dot_ax(pl2, mat["F2"], -2)       # [B, m1, km2]

    Sa, Sb = fwd(pl_a), fwd(pl_b)
    pp = _link3(k_pw, (Sa, Sb), (), (B, m1, k * m2), jnp.int8, 12)
    S3 = _dot_ax(pp, mat["G2"], -1)              # [B, m1, km2] (k1, i2)
    pl4 = _link3(k_mid3, (S3,), (Ti,), (B, k * m1, m2), jnp.int8, 10)
    S4 = _dot_ax(pl4, mat["G1"], -2)             # [B, m2, km1] (i2, i1)
    return _link3(k_out, (S4,), (), (B, m2, m1), jnp.int32, 10)


def _ntt4_fwd(x: jax.Array, mat: dict) -> jax.Array:
    """Digits [..., M] (any int32 magnitude) -> permuted spectrum
    [..., m1, m2] of the psi-weighted (negacyclic) sequence, values in
    [0, p).  The psi weights ride F1/T (see _ntt4_mats)."""
    p, k, m1, m2 = mat["p"], mat["k"], mat["m1"], mat["m2"]
    a = x.reshape(x.shape[:-1] + (m1, m2))
    a = jnp.swapaxes(a, -1, -2)                              # [.., i2, i1]
    a = _apply_block(_to_planes(a, p, k), mat["F1"], p, k)   # [.., i2, k1]
    a = _modmul(a, jnp.asarray(mat["T"]), p, out="loose")
    a = jnp.swapaxes(a, -1, -2)                              # [.., k1, i2]
    return _apply_block(_to_planes(a, p, k), mat["F2"], p, k)  # [.., k1, k2]


def _ntt4_inv(y: jax.Array, mat: dict) -> jax.Array:
    """Permuted spectrum [..., m1, m2] -> negacyclic coefficient residues
    [..., M] in [0, p); the M^-1 psi^-j unweighting rides Ti/G1 (see
    _ntt4_mats)."""
    p, k, m1, m2 = mat["p"], mat["k"], mat["m1"], mat["m2"]
    a = _apply_block(_to_planes(y, p, k), mat["G2"], p, k)   # [.., k1, i2]
    a = _modmul(a, jnp.asarray(mat["Ti"]), p, out="loose")
    a = jnp.swapaxes(a, -1, -2)                              # [.., i2, k1]
    a = _apply_block(_to_planes(a, p, k), mat["G1"], p, k,
                     out="nonneg")                           # [.., i2, i1]
    a = jnp.swapaxes(a, -1, -2)                              # [.., i1, i2]
    return a.reshape(a.shape[:-2] + (m1 * m2,))


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def mulmod_ntt(a: jax.Array, b: jax.Array, canonical: bool = False) -> jax.Array:
    """(a * b) mod 2^(16M)+1 on digit vectors [..., M] via the MXU NTT-CRT
    path.  Inputs may be redundant (|digit| <= 2^25); output is bounded
    redundant digits (< 2^16 + 2^12) unless canonical=True."""
    M = a.shape[-1]
    assert ntt_supported(M), M
    if M > TIER1_MAX_M and os.environ.get("MPIR_FFT_NTT_FUSED", "0") == "1":
        # Opt-in A/B path: the fully-fused Pallas pipeline below.  Measured
        # on v5e it LOSES to the plain XLA 4-step at the production shapes
        # (M=2048 B=8192: 42.6 ms vs 19.5 ms; M=4096 B=4096: 35.6 vs 37.0)
        # -- XLA's whole-batch int8 GEMMs beat per-row-block kernel GEMMs,
        # so it stays off by default.  Kept for A/B and future retuning.
        from .fused import use_pallas
        from .transforms import _NO_FUSE

        if use_pallas() and not _NO_FUSE.get():
            d = _mulmod_ntt_fused(a, b)
            return normmod(d) if canonical else d
    if pair_supported(M) and os.environ.get("MPIR_FFT_NTT_PAIR", "0") == "1":
        d = _mulmod_ntt_pair(a, b)
        return normmod(d) if canonical else d
    if M <= TIER1_MAX_M:
        # dense single-matmul transforms: best MXU shape at moderate M
        mats = _matrices(M)
        lead = a.shape[:-1]
        import math

        B = math.prod(lead) if lead else 1
        if _links_on(B, M):
            # link-fused flow: every elementwise chain between the GEMMs is
            # one Pallas row-block pass, and the inverse folds run inside
            # the Garner kernel (raw_k)
            k = mats[0]["k"]
            pa = _input_planes(a.reshape(B, M), mats)
            pb = _input_planes(b.reshape(B, M), mats)
            parts = []
            for i, mat in enumerate(mats):
                Sa = _dot_raw(pa[i], mat["F"])
                Sb = _dot_raw(pb[i], mat["F"])
                pp = _mid_planes(Sa, Sb, mat["p"], k)
                parts.append(_dot_raw(pp, mat["G"]).reshape(lead + (k * M,)))
            primes = tuple(mat["p"] for mat in mats)
            d = _garner_carry(parts, primes, raw_k=k)
            return normmod(d) if canonical else d
        a = _balanced_pass(a)
        b = _balanced_pass(b)
        parts = []
        for mat in mats:
            p, k = mat["p"], mat["k"]
            fa = _apply_block(_to_planes(a, p, k), mat["F"], p, k)
            fb = _apply_block(_to_planes(b, p, k), mat["F"], p, k)
            parts.append(
                _apply_block(_to_planes(_modmul(fa, fb, p, out="loose"), p, k),
                         mat["G"], p, k, out="nonneg")
            )
    else:
        # 4-step transforms: O(M^1.5) matmul work, kilobyte-scale matrices
        mats = _ntt4_mats(M)
        lead = a.shape[:-1]
        import math

        B = math.prod(lead) if lead else 1
        if _links_on(B, M):
            m1, m2 = mats[0]["m1"], mats[0]["m2"]
            a3 = a.reshape(B, m1, m2)
            b3 = b.reshape(B, m1, m2)
            planes = _ntt4_input_planes(a3, b3, mats)
            parts = []
            for mat, (pl_a, pl_b) in zip(mats, planes):
                V = _ntt4_linked_parts(pl_a, pl_b, B, mat)   # [B, m2, m1]
                parts.append(
                    jnp.swapaxes(V, -1, -2).reshape(lead + (M,)))
            primes = tuple(mat["p"] for mat in mats)
            d = _garner_carry(parts, primes)
            return normmod(d) if canonical else d
        a = _balanced_pass(a)
        b = _balanced_pass(b)
        parts = []
        for mat in mats:
            p = mat["p"]
            fa = _ntt4_fwd(a, mat)
            fb = _ntt4_fwd(b, mat)
            parts.append(_ntt4_inv(_modmul(fa, fb, p, out="loose"), mat))
    primes = tuple(mat["p"] for mat in mats)
    d = _garner_carry(parts, primes)
    return normmod(d) if canonical else d


# ---------------------------------------------------------------------------
# Fully-fused Pallas mulmod: the whole 3-prime 4-step NTT-CRT pipeline
# (balanced pass, psi weighting, both matmul passes per transform, pointwise,
# inverse, Garner, carry) in ONE kernel pass over VMEM row blocks.
# ---------------------------------------------------------------------------

def _ntt4_tables(M: int):
    """Kernel-input table list (6 arrays per prime, fixed order) + static
    metas.  Tables are KB-scale ([k*m, k*m] int8 blocks, 2-D int32 twiddle
    grids) -- they ride VMEM whole.  The psi weights live inside F1/T and
    Ti/G1 (_ntt4_mats), so no separate weight grids exist."""
    mats = _ntt4_mats(M)
    arrs, metas = [], []
    for mat in mats:
        arrs += [
            mat["F1"], mat["F2"], mat["G1"], mat["G2"],
            mat["T"], mat["Ti"],
        ]
        metas.append({k: mat[k] for k in ("p", "k", "m1", "m2")})
    return arrs, metas


def _planes_ax(x: jax.Array, p: int, k: int, axis: int) -> jax.Array:
    """_to_planes along an arbitrary axis (planes concatenated there)."""
    r = jnp.mod(x, p)
    rc = jnp.where(r > p // 2, r - p, r)
    planes = []
    for _ in range(k - 1):
        lo = ((rc + 128) & 255) - 128
        planes.append(lo)
        rc = (rc - lo) >> 8
    planes.append(rc)
    return jnp.concatenate(planes, axis=axis).astype(jnp.int8)


def _dot_fold(x: jax.Array, blk: jax.Array, p: int, k: int, axis: int) -> jax.Array:
    """Plane-split x along `axis`, contract that axis against the [km, km]
    plane block, fold the k output plane groups high-to-low mod p.  The
    contracted axis lands LAST in the dot output (dot_general free-dim
    ordering does the 4-step's transposes for free -- no in-kernel
    lane-splitting reshapes, which Mosaic cannot lower)."""
    pl8 = _planes_ax(x, p, k, axis)
    ax = axis % pl8.ndim
    S = jax.lax.dot_general(
        pl8, blk, (((ax,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    m = S.shape[-1] // k
    acc = jnp.mod(S[..., (k - 1) * m :], p)
    for j in range(k - 2, -1, -1):
        acc = jnp.mod(S[..., j * m : (j + 1) * m] + (acc << 8), p)
    return acc


@functools.lru_cache(maxsize=8)
def _fused_mulmod_fn(M: int, B: int):
    """Two pallas_calls computing (a*b) mod 2^(16M)+1 for [B, M] digit
    batches: kernel 1 runs the whole 3-prime 4-step NTT pipeline (balanced
    pass, psi weighting, both MXU dot passes per transform, pointwise,
    inverse) on [rb, m1, m2] VMEM blocks; kernel 2 recombines the three
    residue planes (Garner CRT + carry pass).  The XLA 4-step path makes
    every elementwise link between the matmuls an HBM round trip (measured
    ~0.4 s of the 10^9-bit multiply's pointwise stage); here a and b make
    one HBM read and each intermediate exactly one write.
    (Ref role: mpn_mulmod_2expp1 below the crossover, mul_fft.c:3119-3139.)"""
    import jax.numpy as _jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused import VMEM_SCOPED_LIMIT, _interpret, _pick_row_block

    arrs, metas = _ntt4_tables(M)
    m1, m2 = metas[0]["m1"], metas[0]["m2"]
    # ~40 M-wide int32 temps live through the unrolled 3-prime pipeline
    # (measured: rb=64 at M=2048 overflowed the 16M scoped-vmem stack by 36K)
    rb = _pick_row_block(B, VMEM_SCOPED_LIMIT // (40 * 4 * M))

    def kernel_ntt(*refs):
        a_ref, b_ref = refs[0], refs[1]
        tab = refs[2:-3]
        outs = refs[-3:]
        a = _balanced_pass3(a_ref[...])
        b = _balanced_pass3(b_ref[...])
        for i, meta in enumerate(metas):
            t6 = tab[6 * i : 6 * i + 6]
            p, k = meta["p"], meta["k"]
            F1, F2, G1, G2 = (t6[j][...] for j in range(4))
            T, Ti = (t6[j][...] for j in range(4, 6))

            def fwd(x):
                # [rb, i1, i2] -> [rb, i2, k1] -> [rb, k1, k2]
                # (psi weights ride F1/T: no input weight pass)
                r = _dot_fold(x, F1, p, k, -2)
                r = _modmul(r, T, p)
                return _dot_fold(r, F2, p, k, -2)

            prod = _modmul(fwd(a), fwd(b), p)
            # [rb, k1, k2] -> [rb, k1, i2] -> [rb, i2, i1]
            r = _dot_fold(prod, G2, p, k, -1)
            r = _modmul(r, Ti, p)
            outs[i][...] = _dot_fold(r, G1, p, k, -2)

    def kernel_crt(r1_ref, r2_ref, r3_ref, o_ref):
        rs = (r1_ref[...], r2_ref[...], r3_ref[...])
        o_ref[...] = carry_pass(
            _garner_to_digits(rs, tuple(m["p"] for m in metas))
        )

    spec_in = pl.BlockSpec((rb, m1, m2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_ot = pl.BlockSpec((rb, m2, m1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(t.shape, (lambda i: (0, 0)), memory_space=pltpu.VMEM)
        for t in arrs
    ]
    res_aval = jax.ShapeDtypeStruct((B, m2, m1), jnp.int32)
    call_ntt = pl.pallas_call(
        kernel_ntt,
        grid=(B // rb,),
        out_shape=(res_aval,) * 3,
        in_specs=[spec_in, spec_in] + tab_specs,
        out_specs=(spec_ot,) * 3,
        interpret=_interpret(),
    )
    spec_m = pl.BlockSpec((rb, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    call_crt = pl.pallas_call(
        kernel_crt,
        grid=(B // rb,),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.int32),
        in_specs=[spec_m] * 3,
        out_specs=spec_m,
        interpret=_interpret(),
    )
    tables = [_jnp.asarray(t) for t in arrs]

    def run(a, b):
        a3 = a.reshape(B, m1, m2)
        b3 = b.reshape(B, m1, m2)
        rs = call_ntt(a3, b3, *tables)
        rs = [jnp.swapaxes(r, -1, -2).reshape(B, M) for r in rs]
        return call_crt(*rs)

    return run


def _balanced_pass3(x: jax.Array) -> jax.Array:
    """_balanced_pass on the [rb, m1, m2] kernel layout: digit i = i1*m2+i2,
    so the carry moves to the next i2 (wrapping into the next i1 row, the
    top carry negacyclically to digit 0) -- a pure roll in the flattened
    order, expressed without lane-merging reshapes."""
    m = (x + (1 << (DIGIT_BITS - 1))) >> DIGIT_BITS
    r = x - (m << DIGIT_BITS)
    # roll m one digit up in flattened order: shift along i2; the column
    # that falls off (last i2) moves to i2=0 of the NEXT i1 row; the very
    # top digit's carry wraps negated to digit 0
    last = m[..., :, -1:]                       # [rb, m1, 1] carries out of rows
    top = -last[..., -1:, :]                    # negacyclic wrap of the top digit
    carry_col = jnp.concatenate([top, last[..., :-1, :]], axis=-2)
    shifted = jnp.concatenate([carry_col, m[..., :, :-1]], axis=-1)
    return r + shifted


def _mulmod_ntt_fused(a: jax.Array, b: jax.Array) -> jax.Array:
    """Fused-kernel entry: flattens leading dims, pads the batch to a row
    multiple, dispatches _fused_mulmod_fn."""
    M = a.shape[-1]
    lead = a.shape[:-1]
    B = 1
    for s in lead:
        B *= s
    af = a.reshape(B, M)
    bf = b.reshape(B, M)
    pad = (-B) % 64
    if pad:
        z = jnp.zeros((pad, M), af.dtype)
        af = jnp.concatenate([af, z])
        bf = jnp.concatenate([bf, z])
    out = _fused_mulmod_fn(M, B + pad)(af, bf)
    if pad:
        out = out[:B]
    return out.reshape(lead + (M,))
