"""Fermat-ring product tests (ref test_mulmod mul_fft.c:4224-4274 vs the
MPIR oracle; here the oracle is Python int arithmetic mod 2^N+1), plus
negacyclic transform round trips (ref test_fft_ifft_negacyclic
mul_fft.c:4341-4404)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpir_fft_tpu.ops.limb import (
    DIGIT_BITS,
    Ring,
    digits_from_int,
    int_from_digits,
    normmod,
)
from mpir_fft_tpu.ops.mulmod import MULMOD_BASE_MAX_BITS, mulmod, mulmod_fft, mulmod_plan
from mpir_fft_tpu.ops.negacyclic import fft_negacyclic, ifft_negacyclic
from mpir_fft_tpu.utils import oracle


def vals_of(arr, W):
    arr = np.asarray(normmod(arr))
    flat = arr.reshape(-1, arr.shape[-1])
    return [oracle.canon(int_from_digits(r), W) for r in flat]


@pytest.mark.parametrize("ring", [Ring(16, 1), Ring(16, 3), Ring(8, 2), Ring(32, 2)], ids=repr)
def test_negacyclic_roundtrip(ring, rng):
    """IFFT_nega(FFT_nega(x)) == 2n * x (ref mul_fft.c:4341-4404)."""
    m, W = 2 * ring.n, ring.bits
    D = m.bit_length() - 1
    x = oracle.rand_digits(rng, (m, ring.L))
    xin = vals_of(jnp.asarray(x), W)
    y = ifft_negacyclic(fft_negacyclic(jnp.asarray(x), ring.w, W), ring.w, W)
    got = vals_of(y, W)
    for j in range(m):
        assert got[j] == oracle.canon(xin[j] * (1 << D), W), (ring, j)


@pytest.mark.parametrize("ring", [Ring(16, 1), Ring(16, 3)], ids=repr)
def test_negacyclic_convolution_property(ring, rng):
    """pointwise-in-frequency == negacyclic convolution in coefficients."""
    m, W = 2 * ring.n, ring.bits
    p = (1 << W) + 1
    D = m.bit_length() - 1
    a = oracle.rand_digits(rng, (m, ring.L), lo=0, hi=1 << 10)
    b = oracle.rand_digits(rng, (m, ring.L), lo=0, hi=1 << 10)
    fa = fft_negacyclic(jnp.asarray(a), ring.w, W)
    fb = fft_negacyclic(jnp.asarray(b), ring.w, W)
    from mpir_fft_tpu.ops.pointwise import mulmod_base

    pw = mulmod_base(normmod(fa), normmod(fb))
    c = ifft_negacyclic(pw, ring.w, W)
    got = vals_of(c, W)
    av = vals_of(jnp.asarray(a), W)
    bv = vals_of(jnp.asarray(b), W)
    for j in range(m):
        want = sum(av[i] * bv[j - i] for i in range(j + 1))
        want -= sum(av[i] * bv[j + m - i] for i in range(j + 1, m))
        assert got[j] == oracle.canon(want * (1 << D), W), (ring, j)


def _rand_residue(rng, N):
    """Random canonical residue mod 2^N+1, biased to hit edge forms."""
    r = rng.integers(0, 8)
    if r == 0:
        return (1 << N)            # the -1 form
    if r == 1:
        return (1 << N) - 1
    if r == 2:
        return 0
    return int.from_bytes(rng.bytes(N // 8), "little") % ((1 << N) + 1)


@pytest.mark.parametrize("N", [256, 1024])
def test_mulmod_base_path_oracle(N, rng):
    p = (1 << N) + 1
    L = N // DIGIT_BITS
    for _ in range(6):
        a, b = _rand_residue(rng, N), _rand_residue(rng, N)
        da = jnp.asarray(digits_from_int(oracle.canon(a, N), L))
        db = jnp.asarray(digits_from_int(oracle.canon(b, N), L))
        got = vals_of(mulmod(da, db, N), N)[0]
        assert got == oracle.canon(a * b, N), (N, a % 97, b % 97)


@pytest.mark.parametrize("N,depth", [(8192, 3), (8192, 4), (16384, None), (65536, None)])
def test_mulmod_fft_path_oracle(N, depth, rng):
    """The recursive negacyclic path, forced above the crossover, against the
    Python-int oracle -- incl. -1 / p-1 / 0 edge residues."""
    L = N // DIGIT_BITS
    plan = mulmod_plan(N, depth)
    assert plan is not None and plan.N == N
    for _ in range(4):
        a, b = _rand_residue(rng, N), _rand_residue(rng, N)
        da = jnp.asarray(digits_from_int(oracle.canon(a, N), L))
        db = jnp.asarray(digits_from_int(oracle.canon(b, N), L))
        got = vals_of(mulmod_fft(da, db, plan), N)[0]
        assert got == oracle.canon(a * b, N), (N, depth)


def test_mulmod_nonpow2_routes_to_fft():
    """Rings whose L the base path cannot serve (non-pow2 L in (2048, 4096])
    must trace through the recursive FFT path instead of asserting
    (round-1 coverage hole: W=49152 -> L=3072 crashed; ADVICE r1)."""
    import jax

    for N in (49152, 39168):   # L = 3072, 2448
        L = N // DIGIT_BITS
        spec = jax.ShapeDtypeStruct((1, L), jnp.int32)
        out = jax.eval_shape(lambda a, b, N=N: mulmod(a, b, N), spec, spec)
        assert out.shape == (1, L)


@pytest.mark.slow
def test_mulmod_nonpow2_inner_ring_exec(rng):
    """Executed bit-exactness at a non-pow2-L ring below the crossover."""
    N = 39168   # L = 2448: no NTT (non-pow2), no schoolbook (2L > 4096)
    L = N // DIGIT_BITS
    a, b = _rand_residue(rng, N), _rand_residue(rng, N)
    da = jnp.asarray(digits_from_int(oracle.canon(a, N), L))
    db = jnp.asarray(digits_from_int(oracle.canon(b, N), L))
    got = vals_of(mulmod(da[None], db[None], N), N)[0]
    assert got == oracle.canon(a * b, N)


@pytest.mark.slow
def test_mulmod_ntt_off_wide_ring(rng, monkeypatch):
    """MPIR_FFT_NTT=0 must not crash at W=65536 (L=4096 > schoolbook limit):
    the ring recurses instead (round-1: pointwise.py assert fired)."""
    monkeypatch.setenv("MPIR_FFT_NTT", "0")
    N = 65536
    L = N // DIGIT_BITS
    a, b = _rand_residue(rng, N), _rand_residue(rng, N)
    da = jnp.asarray(digits_from_int(oracle.canon(a, N), L))
    db = jnp.asarray(digits_from_int(oracle.canon(b, N), L))
    got = vals_of(mulmod(da[None], db[None], N), N)[0]
    assert got == oracle.canon(a * b, N)


def test_mulmod_int_entry(rng):
    """The integer-level package-boundary entry (ref fft_mulmod_2expp1 as a
    first-class API, mul_fft.c:3125-3167): ints in, canonical residue out,
    automatic plan, host fallback below the crossover / at unaligned N."""
    from mpir_fft_tpu import mulmod_int

    # device path (N > _MULMOD_INT_SMALL_BITS, digit-aligned)
    for N in (32768, 65536):
        p = (1 << N) + 1
        for _ in range(3):
            a, b = _rand_residue(rng, N), _rand_residue(rng, N)
            assert mulmod_int(a, b, N) == (a * b) % p, N
        # edge residues: 2^N == -1, p-1 interplay, negatives reduce first
        assert mulmod_int(1 << N, 1 << N, N) == 1
        assert mulmod_int(-1, 1 << N, N) == 1
        assert mulmod_int(p + 2, 3, N) == 6
        assert mulmod_int(0, 5, N) == 0
    # host fallbacks: small N, unaligned N
    for N in (100, 16384, 12345):
        p = (1 << N) + 1
        a, b = _rand_residue(rng, max(N, 64) // 64 * 64), 12345678901234567
        assert mulmod_int(a, b, N) == (a % p) * (b % p) % p, N


def test_mulmod_batched(rng):
    """One mulmod call over a batch == per-element products."""
    N = 4096
    L = N // DIGIT_BITS
    plan = mulmod_plan(N, depth=3)
    vals = [( _rand_residue(rng, N), _rand_residue(rng, N)) for _ in range(3)]
    da = jnp.stack([jnp.asarray(digits_from_int(oracle.canon(a, N), L)) for a, _ in vals])
    db = jnp.stack([jnp.asarray(digits_from_int(oracle.canon(b, N), L)) for _, b in vals])
    got = vals_of(mulmod_fft(da, db, plan), N)
    for i, (a, b) in enumerate(vals):
        assert got[i] == oracle.canon(a * b, N), i
