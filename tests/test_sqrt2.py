"""sqrt2-transform tests (ref test_fft_ifft_sqrt2 mul_fft.c:4406-4470,
test_fft_ifft_truncate_sqrt2 mul_fft.c:4570-4666): sqrt2 root identity,
DFT oracle at length 4n, round trips, and truncation."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpir_fft_tpu.ops.limb import Ring, int_from_digits, normmod
from mpir_fft_tpu.ops.sqrt2 import (
    fft_sqrt2,
    fft_trunc_sqrt2,
    ifft_sqrt2,
    ifft_trunc_sqrt2,
    twiddle_half,
)
from mpir_fft_tpu.utils import oracle

# rings with odd w (the interesting case; even w collapses to plain radix-2);
# odd w requires 16 | n so that W = n*w is a digit multiple
RINGS = [Ring(16, 1), Ring(16, 3), Ring(16, 5), Ring(32, 1), Ring(32, 3)]


def vals_of(arr, W):
    arr = np.asarray(normmod(arr))
    flat = arr.reshape(-1, arr.shape[-1])
    return [oracle.canon(int_from_digits(r), W) for r in flat]


def sqrt2_int(W):
    """sqrt2 = 2^(3W/4) - 2^(W/4) mod p (module docstring identity)."""
    p = (1 << W) + 1
    return (pow(2, 3 * W // 4, p) - pow(2, W // 4, p)) % p


def q_pow(e2, W):
    """2^(e2/2) mod p for a half-bit exponent e2."""
    p = (1 << W) + 1
    r = pow(2, (e2 >> 1) % (2 * W), p)
    if e2 & 1:
        r = r * sqrt2_int(W) % p
    return r


def test_sqrt2_squares_to_two():
    for W in [32, 64, 128, 208]:
        p = (1 << W) + 1
        assert sqrt2_int(W) ** 2 % p == 2


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_twiddle_half_oracle(ring, rng):
    W = ring.bits
    C = 2 * ring.n
    x = oracle.rand_digits(rng, (C, ring.L))
    xin = vals_of(jnp.asarray(x), W)
    for e2s in [
        np.arange(C, dtype=np.int64) * ring.w,            # alternating parity
        -np.arange(C, dtype=np.int64) * ring.w,           # negative
        np.full(C, 2 * ring.w + 1, dtype=np.int64),       # all odd
        np.full(C, 4 * ring.w, dtype=np.int64),           # all even
        rng.integers(0, 8 * W, size=C),                   # arbitrary pattern
    ]:
        got = vals_of(twiddle_half(jnp.asarray(x), e2s, W), W)
        for j in range(C):
            want = oracle.canon(xin[j] * q_pow(int(e2s[j]) % (4 * W), W), W)
            assert got[j] == want, (ring, e2s[j], j)


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_fft_sqrt2_matches_dft_oracle(ring, rng):
    """Length-4n forward transform against an O(n^2) DFT with root q=sqrt2^w.
    Output order: positions [0, 2n) = plain FFT of even-frequency seq, etc.;
    checked via frequency map k = revbin within halves."""
    from mpir_fft_tpu.ops.transforms import revbin_vec

    C, W = 4 * ring.n, ring.bits
    p = (1 << W) + 1
    x = oracle.rand_digits(rng, (C, ring.L))
    xin = vals_of(jnp.asarray(x), W)
    got = vals_of(fft_sqrt2(jnp.asarray(x), ring.w, W), W)
    # DIF layout at length C: out[j] corresponds to frequency
    # 2*revbin(j, log2(C)-1) for j < C/2 (even freqs), 2*revbin(j-C/2)+1 (odd)
    rb = revbin_vec(C // 2)
    for j in range(C):
        freq = 2 * int(rb[j % (C // 2)]) + (1 if j >= C // 2 else 0)
        want = oracle.canon(
            sum(v * q_pow((ring.w * i * freq) % (4 * W), W) for i, v in enumerate(xin)) % p, W
        )
        assert got[j] == want, (ring, j, freq)


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_fft_ifft_sqrt2_roundtrip(ring, rng):
    C, W = 4 * ring.n, ring.bits
    D = C.bit_length() - 1
    x = oracle.rand_digits(rng, (C, ring.L))
    xin = vals_of(jnp.asarray(x), W)
    y = ifft_sqrt2(fft_sqrt2(jnp.asarray(x), ring.w, W), ring.w, W)
    got = vals_of(y, W)
    for j in range(C):
        assert got[j] == oracle.canon(xin[j] * (1 << D), W), (ring, j)


@pytest.mark.parametrize("ring", RINGS[:4], ids=repr)
def test_trunc_sqrt2_roundtrip(ring, rng):
    """IFFT_trunc_sqrt2(FFT_trunc_sqrt2(x)) == C*x on j < trunc for zero-tail
    x at random truncs (ref test_fft_ifft_truncate_sqrt2)."""
    C, W = 4 * ring.n, ring.bits
    D = C.bit_length() - 1
    truncs = sorted({2, C // 2, C // 2 + 1, C - 1, C} | {int(t) for t in rng.integers(1, C + 1, 4)})
    for trunc in truncs:
        x = oracle.rand_digits(rng, (C, ring.L))
        x[trunc:] = 0
        xin = vals_of(jnp.asarray(x), W)
        y = fft_trunc_sqrt2(jnp.asarray(x), ring.w, W, trunc)
        o = ifft_trunc_sqrt2(y, ring.w, W, trunc)
        got = vals_of(o, W)
        for j in range(trunc):
            assert got[j] == oracle.canon(xin[j] * (1 << D), W), (ring, trunc, j)


def test_even_w_collapses_to_plain(rng):
    """Even w: length-4n sqrt2 transform == plain radix-2 with w/2
    (ref mul_fft.c:850-855)."""
    from mpir_fft_tpu.ops.transforms import fft_radix2

    ring = Ring(8, 6)
    C, W = 4 * ring.n, ring.bits
    x = oracle.rand_digits(rng, (C, ring.L))
    a = fft_sqrt2(jnp.asarray(x), ring.w, W)
    b = fft_radix2(jnp.asarray(x), ring.w // 2, W)
    assert vals_of(a, W) == vals_of(b, W)
