"""Tier-2 transform tests: round-trip identities and small-size DFT oracles.

Mirrors the reference's test_fft_ifft (mul_fft.c:4276) pattern:
IFFT(FFT(x)) == 2^(depth+1) * x with the scaling checked on the oracle side,
plus an exact O(n^2) DFT oracle in Python ints (the reference has no DFT
oracle; we add one since Python ints make it cheap)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpir_fft_tpu.ops.limb import Ring, int_from_digits, normmod
from mpir_fft_tpu.ops.transforms import (
    fft_radix2,
    fft_radix2_twiddle,
    ifft_radix2,
    ifft_radix2_twiddle,
    revbin_vec,
)
from mpir_fft_tpu.utils import oracle

RINGS = [Ring(2, 8), Ring(4, 4), Ring(8, 2), Ring(8, 16), Ring(16, 4), Ring(32, 2), Ring(16, 13)]


def vals_of(arr, W):
    arr = np.asarray(normmod(arr))
    flat = arr.reshape(-1, arr.shape[-1])
    return [oracle.canon(int_from_digits(r), W) for r in flat]


def dft_oracle(vals, w, W):
    p = (1 << W) + 1
    C = len(vals)
    return [
        oracle.canon(sum(v * pow(2, (w * j * k) % (2 * W), p) for j, v in enumerate(vals)), W)
        for k in range(C)
    ]


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_fft_matches_dft_oracle(ring, rng):
    C, W = 2 * ring.n, ring.bits
    x = oracle.rand_digits(rng, (C, ring.L))
    xin = [oracle.canon(int_from_digits(r), W) for r in x]
    out = jax.jit(lambda x: fft_radix2(x, ring.w, W))(jnp.asarray(x))
    got = vals_of(out, W)
    want = dft_oracle(xin, ring.w, W)
    rb = revbin_vec(C)
    for j in range(C):
        assert got[j] == want[rb[j]], (j, ring)


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_fft_ifft_roundtrip(ring, rng):
    C, W = 2 * ring.n, ring.bits
    D = C.bit_length() - 1
    x = oracle.rand_digits(rng, (3, C, ring.L))  # batched leading dim
    xin = vals_of(jnp.asarray(x), W)
    y = jax.jit(
        lambda x: ifft_radix2(fft_radix2(x, ring.w, W), ring.w, W)
    )(jnp.asarray(x))
    got = vals_of(y, W)
    for i in range(len(xin)):
        assert got[i] == oracle.canon(xin[i] * (1 << D), W)


@pytest.mark.parametrize("ring", RINGS[:5], ids=repr)
def test_twiddle_variant(ring, rng):
    """fft_radix2_twiddle == fft then explicit per-position twiddle, and its
    inverse round-trips."""
    C, W = 2 * ring.n, ring.bits
    D = C.bit_length() - 1
    ws, c = ring.w, 3
    x = oracle.rand_digits(rng, (C, ring.L))
    y = fft_radix2_twiddle(jnp.asarray(x), ring.w, W, ws, c)
    base = fft_radix2(jnp.asarray(x), ring.w, W)
    rb = revbin_vec(C)
    got = vals_of(y, W)
    bvals = vals_of(base, W)
    p = (1 << W) + 1
    for j in range(C):
        want = oracle.canon(bvals[j] * pow(2, (ws * int(rb[j]) * c) % (2 * W), p), W)
        assert got[j] == want, j
    # inverse round-trip
    z = ifft_radix2_twiddle(y, ring.w, W, ws, c)
    got = vals_of(z, W)
    xin = vals_of(jnp.asarray(x), W)
    for i in range(C):
        assert got[i] == oracle.canon(xin[i] * (1 << D), W)
