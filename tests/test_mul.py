"""Tier-3 end-to-end product tests vs the Python-int oracle multiplier
(ref test_mul / test_mul5 / test_mul4, mul_fft.c:5459-5608: new_mpn_mul* vs
MPIR's mpn_mul at even and uneven operand sizes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpir_fft_tpu.models.mul import mpn_mul_radix2, mul, out_len_digits
from mpir_fft_tpu.ops.limb import DIGIT_BITS, digits_from_int, int_from_digits
from mpir_fft_tpu.ops.split import fft_combine_bits, fft_split_bits
from mpir_fft_tpu.utils.params import cdiv, choose_params, plan_for_depth


def rand_bits(rng, bits):
    words = rng.integers(0, 1 << 32, size=cdiv(bits, 32), dtype=np.uint64)
    v = 0
    for i, wd in enumerate(words.tolist()):
        v |= int(wd) << (32 * i)
    v |= 1 << (bits - 1)
    return v & ((1 << bits) - 1)


def test_split_combine_roundtrip(rng):
    bits = 40
    L = 8  # ring digits per coefficient
    x = rand_bits(rng, 1000)
    Lx = cdiv(1000, DIGIT_BITS)
    C = cdiv(1000, bits) + 1
    d = jnp.asarray(digits_from_int(x, Lx))
    coeffs = fft_split_bits(d, bits, C, L)
    # check each coefficient value
    cn = np.asarray(coeffs)
    for j in range(C):
        want = (x >> (j * bits)) & ((1 << bits) - 1)
        assert int_from_digits(cn[j]) == want, j
    back = fft_combine_bits(coeffs, bits, Lx + 4)
    assert int_from_digits(np.asarray(back)) == x


def test_combine_overlapping(rng):
    # coefficients wider than the stride: exercises the carrying sum
    bits, L, C = 24, 4, 30   # 64-bit coefficients at 24-bit strides
    vals = [int(v) for v in rng.integers(0, 1 << 62, C, dtype=np.uint64)]
    coeffs = np.stack([digits_from_int(v, L) for v in vals])
    want = sum(v << (j * bits) for j, v in enumerate(vals))
    out = fft_combine_bits(jnp.asarray(coeffs), bits, cdiv(want.bit_length(), 16) + 2)
    assert int_from_digits(np.asarray(out)) == want


@pytest.mark.parametrize(
    "bits", [33, 40, 48, 41, 61, 62, 2041, 8185, 16376]
)
def test_split_combine_offset_classes(bits, rng):
    """Sweep every residue-class period P = 16/gcd(bits,16) of the unaligned
    split/combine (P in {16, 2, 1, 16, 16, 8, 16, 16, 2}) against the int
    oracle, including the production plans' bits1 values (16376 = 10^9 plan,
    8185 = 10^8 plan, 2041 = 10^7 plan)."""
    total = max(6 * bits + 13, 2000)     # non-multiple of P coefficients
    x = rand_bits(rng, total)
    Lx = cdiv(total, DIGIT_BITS)
    C = cdiv(total, bits) + 2
    L = max(2 * cdiv(bits, DIGIT_BITS) + 1, 4)
    d = jnp.asarray(digits_from_int(x, Lx))
    coeffs = np.asarray(fft_split_bits(d, bits, C, L))
    for j in range(C):
        want = (x >> (j * bits)) & ((1 << bits) - 1)
        assert int_from_digits(coeffs[j]) == want, (bits, j)
    # combine with coefficients wider than the stride (random, overlapping)
    vals = [
        int_from_digits(row)
        for row in rng.integers(0, 1 << 16, (17, L), dtype=np.int64)
    ]
    want = sum(v << (j * bits) for j, v in enumerate(vals))
    cs = jnp.asarray(
        np.stack([digits_from_int(v, L) for v in vals]).astype(np.int32)
    )
    out = fft_combine_bits(cs, bits, cdiv(want.bit_length(), 16) + 2)
    assert int_from_digits(np.asarray(out)) == want


def test_split_combine_batched(rng):
    """Leading batch dims flow through both unaligned paths."""
    bits, L = 40, 8
    xs = [rand_bits(rng, 999) for _ in range(3)]
    Lx = cdiv(999, DIGIT_BITS)
    C = cdiv(999, bits) + 1
    d = jnp.asarray(np.stack([digits_from_int(x, Lx) for x in xs]))
    coeffs = fft_split_bits(d, bits, C, L)
    back = np.asarray(fft_combine_bits(coeffs, bits, Lx + 4))
    for i, x in enumerate(xs):
        assert int_from_digits(back[i]) == x


@pytest.mark.parametrize("ba,bb", [(20000, 20000), (50000, 37000), (100001, 99999)])
def test_mul_exact(ba, bb, rng):
    a, b = rand_bits(rng, ba), rand_bits(rng, bb)
    assert mul(a, b) == a * b


def _run_depths(rng, depths):
    ba = bb = 30000
    a, b = rand_bits(rng, ba), rand_bits(rng, bb)
    for depth in depths:
        plan = plan_for_depth(ba, bb, depth)
        da = jnp.asarray(digits_from_int(a, cdiv(ba, DIGIT_BITS)))
        db = jnp.asarray(digits_from_int(b, cdiv(bb, DIGIT_BITS)))
        out = mpn_mul_radix2(da, db, plan)
        assert int_from_digits(np.asarray(out)) == a * b, depth


def test_mul_driver_various_depths(rng):
    _run_depths(rng, (3, 4))


@pytest.mark.slow
def test_mul_driver_various_depths_deep(rng):
    _run_depths(rng, (5, 6))


def test_mul_small_fallback(rng):
    a, b = rand_bits(rng, 100), rand_bits(rng, 50)
    assert mul(a, b) == a * b
    assert mul(a, 0) == 0
