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

* Primes (12289, 40961, 61441), all == 1 mod 4096, so primitive 2M-th roots
  exist for every power-of-two M <= 2048.  Product P ~ 2^43.8.
* Inputs get one BALANCED carry pass (digits recentered to [-2^15, 2^15]
  with the carry injected negacyclically), bounding digits below
  2^15 + 2^9 + 2 for any redundant input bounded by 2^25; negacyclic
  coefficients then satisfy |c| <= M * (2^15 + 2^9 + 2)^2 < 2^41.1 < P/2
  up to M = 2048.  (M = 4096 would need 8192 | p-1, which none of the
  sub-2^16 primes provide; above 2048 the recursive Fermat path takes
  over.)
* A value v mod p (< 2^16) enters a matmul as two signed-int8 planes
  v = v0 + 256*v1 after balanced centering (|v0| <= 128, |v1| <= 121).  The
  256 factor of the hi plane is absorbed into the MATRIX: with U = V mod p
  and U' = 256 V mod p, each split into planes (U0, U1), (U'0, U'1),

      x @ V mod p == (x0 @ U0 + x1 @ U'0) + 256 * (x0 @ U1 + x1 @ U'1)

  which is ONE [B, 2M] @ [2M, 2M] int8 matmul with int32 accumulation
  (partial sums < 2M * 128^2 < 2^25, exact), then a cheap mod-fold.
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

import numpy as np

import jax
import jax.numpy as jnp

from .limb import DIGIT_BITS, _wrap_inject, carry_pass, normmod

PRIMES = (12289, 40961, 61441)   # == 1 mod 4096; P ~ 2^43.8
NTT_MAX_M = 2048                 # |c| < P/2 guaranteed up to here


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


def _split8(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Signed value -> (lo, hi) with v = lo + 256*hi, lo in [-128, 128)."""
    lo = ((v + 128) % 256) - 128
    hi = (v - lo) >> 8
    return lo, hi


def _plane_block(V: np.ndarray, p: int) -> np.ndarray:
    """[M, M] value matrix mod p -> [2M, 2M] signed-int8 plane block so that
    for X = [x0 | x1] (input planes), X @ block = [S0 | S1] with
    x @ V mod p == (S0 + 256 * (S1 mod p)) mod p."""
    U = V % p
    Up = (V * 256) % p
    U0, U1 = _split8(_center(U, p))
    Q0, Q1 = _split8(_center(Up, p))
    top = np.concatenate([U0, U1], axis=1)
    bot = np.concatenate([Q0, Q1], axis=1)
    blk = np.concatenate([top, bot], axis=0)
    assert blk.min() >= -128 and blk.max() <= 127
    return blk.astype(np.int8)


@functools.lru_cache(maxsize=None)
def _matrices(M: int) -> list[dict]:
    """Per prime: plane-block forward/inverse negacyclic NTT matrices.
    F[i, k] = psi^(i(2k+1)); G[k, j] = M^-1 psi^(-j(2k+1))  (mod p)."""
    out = []
    for p in PRIMES:
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
        out.append({"p": p, "F": _plane_block(F, p), "G": _plane_block(G, p)})
    return out


@functools.lru_cache(maxsize=None)
def _garner_consts() -> dict:
    p1, p2, p3 = PRIMES
    return {
        "inv12": pow(p1, -1, p2),
        "inv13": pow(p1, -1, p3),
        "inv23": pow(p2, -1, p3),
        "q": p1 * p2,
    }


# ---------------------------------------------------------------------------
# Device: exact int32 modular helpers
# ---------------------------------------------------------------------------

def _modmul_const(a: jax.Array, c: int, p: int) -> jax.Array:
    """a * c mod p for a in [0, p), p < 2^16, constant c in [0, p).
    Both partial products stay below 2^24 (int32-exact)."""
    cl, ch = c & 0xFF, c >> 8
    t = jnp.mod(a * ch, p)
    return jnp.mod(a * cl + (t << 8), p)


def _modmul(a: jax.Array, b: jax.Array, p: int) -> jax.Array:
    """a * b mod p, both in [0, p), p < 2^16."""
    bl = b & 0xFF
    bh = b >> 8
    t = jnp.mod(a * bh, p)
    return jnp.mod(a * bl + (t << 8), p)


def _to_planes(x: jax.Array, p: int) -> jax.Array:
    """Digits (any int32 magnitude) -> [..., 2M] signed-int8 matmul planes."""
    r = jnp.mod(x, p)
    rc = jnp.where(r > p // 2, r - p, r)
    lo = ((rc + 128) & 255) - 128
    hi = (rc - lo) >> 8
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


def _apply_block(planes: jax.Array, blk: np.ndarray, p: int) -> jax.Array:
    """[..., 2M] int8 planes @ [2M, 2M] int8 block -> values mod p [..., M]."""
    S = jax.lax.dot_general(
        planes,
        jnp.asarray(blk),
        (((planes.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    M = S.shape[-1] // 2
    s0, s1 = S[..., :M], S[..., M:]
    return jnp.mod(s0 + (jnp.mod(s1, p) << 8), p)


def _nega_roll_digits(v: jax.Array, k: int) -> jax.Array:
    """Shift digit positions up by k, wrapping negated (2^(16M) == -1)."""
    if k == 0:
        return v
    return jnp.concatenate([-v[..., -k:], v[..., :-k]], axis=-1)


def _garner_to_digits(r1, r2, r3) -> jax.Array:
    """Three residue planes [..., M] -> redundant int32 digits of the signed
    negacyclic coefficients (|c| < P/2), spread via base-2^8 chunk planes so
    every intermediate product stays below 2^16."""
    p1, p2, p3 = PRIMES
    g = _garner_consts()
    v1 = r1
    v2 = _modmul_const(jnp.mod(r2 - v1, p2), g["inv12"], p2)
    t = _modmul_const(jnp.mod(r3 - v1, p3), g["inv13"], p3)
    v3 = _modmul_const(jnp.mod(t - v2, p3), g["inv23"], p3)
    v3 = jnp.where(v3 > p3 // 2, v3 - p3, v3)          # centered: |v3| < p3/2

    # c = v1 + p1*v2 + (p1*p2)*v3 ; spread into chunk planes A[m], m = 0..4
    A = [0, 0, 0, 0, 0]

    def spread(const: int, var_lo, var_hi):
        m = 0
        c = const
        while c:
            ck = c & 0xFF
            if ck:
                A[m] = A[m] + ck * var_lo
                A[m + 1] = A[m + 1] + ck * var_hi
            c >>= 8
            m += 1

    A[0] = v1 & 0xFF
    A[1] = v1 >> 8
    v2l, v2h = v2 & 0xFF, v2 >> 8
    spread(p1, v2l, v2h)
    v3l = v3 & 0xFF
    v3h = (v3 - v3l) >> 8                               # signed, |v3h| <= 121
    spread(g["q"], v3l, v3h)

    even = A[0] + _nega_roll_digits(A[2], 1) + _nega_roll_digits(A[4], 2)
    odd = A[1] + _nega_roll_digits(A[3], 1)
    return even + (odd << 8)


def _balanced_pass(x: jax.Array) -> jax.Array:
    """One carry sweep recentering digits to ~[-2^15, 2^15]: the negacyclic
    coefficient bound scales with the SQUARE of the digit bound, so balancing
    buys M = 2048 from the same 3-prime CRT range.  From |digit| <= B the
    output bound is 2^15 + B/2^16 + 1 (exact in the ring)."""
    m = (x + (1 << (DIGIT_BITS - 1))) >> DIGIT_BITS
    r = x - (m << DIGIT_BITS)
    return r + _wrap_inject(m)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def mulmod_ntt(a: jax.Array, b: jax.Array, canonical: bool = False) -> jax.Array:
    """(a * b) mod 2^(16M)+1 on digit vectors [..., M] via the MXU NTT-CRT
    path.  Inputs may be redundant (|digit| <= 2^25); output is bounded
    redundant digits (< 2^16 + 2^12) unless canonical=True."""
    M = a.shape[-1]
    assert ntt_supported(M), M
    a = _balanced_pass(a)
    b = _balanced_pass(b)
    mats = _matrices(M)
    parts = []
    for mat in mats:
        p = mat["p"]
        fa = _apply_block(_to_planes(a, p), mat["F"], p)
        fb = _apply_block(_to_planes(b, p), mat["F"], p)
        parts.append(_apply_block(_to_planes(_modmul(fa, fb, p), p), mat["G"], p))
    d = carry_pass(_garner_to_digits(*parts))
    return normmod(d) if canonical else d
