"""Truncated-transform tests (ref test_fft_truncate mul_fft.c:5031-5103,
test_fft_ifft_truncate mul_fft.c:4472-4568): cross-implementation equivalence
with the full FFT on the first trunc entries, and round-trip identities
IFFT_trunc(FFT_trunc(x)) == 2^depth * x at random truncation lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpir_fft_tpu.ops.limb import Ring, int_from_digits, normmod, shift_mod
from mpir_fft_tpu.ops.transforms import fft_radix2, revbin_vec
from mpir_fft_tpu.ops.truncate import fft_trunc, fft_trunc1, ifft_trunc, ifft_trunc1
from mpir_fft_tpu.utils import oracle

RINGS = [Ring(4, 4), Ring(8, 2), Ring(8, 16), Ring(16, 4), Ring(16, 13)]


def vals_of(arr, W):
    arr = np.asarray(normmod(arr))
    flat = arr.reshape(-1, arr.shape[-1])
    return [oracle.canon(int_from_digits(r), W) for r in flat]


def truncs_for(C, rng, k=6):
    cand = sorted({1, 2, C // 2 - 1, C // 2, C // 2 + 1, C - 1, C} | set(
        int(t) for t in rng.integers(1, C + 1, size=k)
    ))
    return [t for t in cand if 1 <= t <= C]


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_fft_trunc_matches_full(ring, rng):
    """Truncated == full on the first trunc entries, zero-tail inputs
    (ref test_fft_truncate's equivalence check, mul_fft.c:5084-5096)."""
    C, W = 2 * ring.n, ring.bits
    for trunc in truncs_for(C, rng):
        x = oracle.rand_digits(rng, (C, ring.L))
        x[trunc:] = 0
        xj = jnp.asarray(x)
        got = vals_of(fft_trunc(xj, ring.w, W, trunc), W)[:trunc]
        want = vals_of(fft_radix2(xj, ring.w, W), W)[:trunc]
        assert got == want, (ring, trunc)


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_fft_trunc1_matches_full(ring, rng):
    """truncate1 == full on the first trunc entries, arbitrary tails."""
    C, W = 2 * ring.n, ring.bits
    for trunc in truncs_for(C, rng):
        x = oracle.rand_digits(rng, (C, ring.L))
        xj = jnp.asarray(x)
        got = vals_of(fft_trunc1(xj, ring.w, W, trunc), W)[:trunc]
        want = vals_of(fft_radix2(xj, ring.w, W), W)[:trunc]
        assert got == want, (ring, trunc)


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_ifft_trunc_roundtrip(ring, rng):
    """IFFT_trunc(FFT_trunc(x)) == C * x on j < trunc for zero-tail x
    (ref test_fft_ifft_truncate, mul_fft.c:4472-4568)."""
    C, W = 2 * ring.n, ring.bits
    D = C.bit_length() - 1
    for trunc in truncs_for(C, rng):
        x = oracle.rand_digits(rng, (C, ring.L))
        x[trunc:] = 0
        xin = vals_of(jnp.asarray(x), W)
        y = fft_trunc(jnp.asarray(x), ring.w, W, trunc)
        o = ifft_trunc(y, ring.w, W, trunc)
        got = vals_of(o, W)
        for j in range(trunc):
            assert got[j] == oracle.canon(xin[j] * (1 << D), W), (ring, trunc, j)


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_ifft_trunc1_roundtrip(ring, rng):
    """ifft_trunc1 on (transform values | unscaled tail) recovers C * x on
    j < trunc and leaves the tail bit-identical."""
    C, W = 2 * ring.n, ring.bits
    D = C.bit_length() - 1
    for trunc in truncs_for(C, rng):
        x = oracle.rand_digits(rng, (C, ring.L))
        xj = jnp.asarray(x)
        full = fft_radix2(xj, ring.w, W)
        vin = jnp.concatenate([full[:trunc], xj[trunc:]], axis=-2)
        o = ifft_trunc1(vin, ring.w, W, trunc)
        got = vals_of(o, W)
        xin = vals_of(xj, W)
        for j in range(trunc):
            assert got[j] == oracle.canon(xin[j] * (1 << D), W), (ring, trunc, j)
        assert np.array_equal(np.asarray(o[trunc:]), x[trunc:])


@pytest.mark.parametrize("ring", RINGS[:3], ids=repr)
def test_trunc_twiddle_fusion(ring, rng):
    """post_exps / pre_exps fused into truncated transforms == explicit
    per-position shifts (the *_truncate_twiddle variants)."""
    C, W = 2 * ring.n, ring.bits
    D = C.bit_length() - 1
    pe = (revbin_vec(C) * 3 * ring.w) % (2 * W)
    for trunc in truncs_for(C, rng, k=3):
        x = oracle.rand_digits(rng, (C, ring.L))
        x[trunc:] = 0
        xj = jnp.asarray(x)
        fused = fft_trunc(xj, ring.w, W, trunc, post_exps=pe)
        manual = shift_mod(fft_trunc(xj, ring.w, W, trunc), jnp.asarray(pe)[:, None], W)
        assert vals_of(fused, W)[:trunc] == vals_of(manual, W)[:trunc], (ring, trunc)
        # inverse: fused pre-division round-trips
        o = ifft_trunc(fused, ring.w, W, trunc, pre_exps=pe)
        xin = vals_of(xj, W)
        got = vals_of(o, W)
        for j in range(trunc):
            assert got[j] == oracle.canon(xin[j] * (1 << D), W), (ring, trunc, j)


@pytest.mark.parametrize("ring", RINGS[:2], ids=repr)
def test_trunc_batched(ring, rng):
    """Leading batch dims flow through the truncated transforms."""
    C, W = 2 * ring.n, ring.bits
    trunc = C // 2 + 1
    x = oracle.rand_digits(rng, (3, C, ring.L))
    x[:, trunc:] = 0
    xj = jnp.asarray(x)
    batched = fft_trunc(xj, ring.w, W, trunc)
    for i in range(3):
        single = fft_trunc(xj[i], ring.w, W, trunc)
        assert vals_of(batched[i], W)[:trunc] == vals_of(single, W)[:trunc]
