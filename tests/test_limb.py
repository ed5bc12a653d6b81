"""Tier-1 tests of the limb/digit substrate against Python-int oracles.

Mirrors the reference's unit tests test_norm / test_mul_2expmod /
test_div_2expmod (mul_fft.c:3777-3878, 3973-4028): sweep (n, w) ring-size
grids and shift amounts, always with *denormalized* (redundant signed) digit
inputs to exercise lazy-carry paths, like rand_n's random carry limb."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpir_fft_tpu.ops import limb
from mpir_fft_tpu.ops.limb import (
    DIGIT_BITS,
    Ring,
    carry_pass,
    digits_from_int,
    div_2expmod,
    int_from_digits,
    mul_2expmod,
    normmod,
    shift_mod,
)
from mpir_fft_tpu.utils import oracle

RINGS = [Ring(n, w) for (n, w) in [(1, 16), (2, 8), (2, 16), (4, 8), (4, 12), (8, 16), (16, 2), (32, 4), (64, 2)]]


def check_canonical(d: np.ndarray):
    d = np.asarray(d)
    special = d[0] == -1 and np.all(d[1:] == 0)
    ok = np.all((d >= 0) & (d < (1 << DIGIT_BITS)))
    assert special or ok, f"not canonical: {d}"


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_roundtrip_digits(ring, rng):
    for _ in range(20):
        v = int(rng.integers(0, 2**63)) % ((1 << ring.bits))
        d = digits_from_int(v, ring.L)
        assert int_from_digits(d) == v
    assert int_from_digits(digits_from_int(-1, ring.L)) == -1


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_carry_pass_preserves_value(ring, rng):
    x = oracle.rand_digits(rng, (16, ring.L), -(1 << 29), 1 << 29)
    y = np.asarray(carry_pass(jnp.asarray(x)))
    for i in range(16):
        assert oracle.canon(int_from_digits(y[i]), ring.bits) == oracle.canon(
            int_from_digits(x[i]), ring.bits
        )
    # bound contract: |out| <= 2^16 + M/2^16 + 1
    assert np.abs(y).max() <= (1 << 16) + (1 << 13) + 1


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_normmod(ring, rng):
    # wide redundant digits
    x = oracle.rand_digits(rng, (32, ring.L), -(1 << 29), 1 << 29)
    y = np.asarray(jax.jit(normmod)(jnp.asarray(x)))
    for i in range(32):
        check_canonical(y[i])
        assert int_from_digits(y[i]) == oracle.ref_norm(x[i], ring.bits)
    # adversarial patterns: all zeros, all MASK, -1 special, p-1, near-wrap
    specials = np.zeros((6, ring.L), np.int32)
    specials[1, :] = (1 << 16) - 1
    specials[2, 0] = -1
    specials[3, :] = -(1 << 16)
    specials[4, 0] = 1 << 16
    specials[5, :] = 1 << 16
    y = np.asarray(normmod(jnp.asarray(specials)))
    for i in range(6):
        check_canonical(y[i])
        assert int_from_digits(y[i]) == oracle.ref_norm(specials[i], ring.bits)


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_mul_div_2expmod_static(ring, rng):
    W = ring.bits
    shifts = sorted({0, 1, 15, 16, 17, W - 1, W, W + 5, 2 * W - 1} | set(
        int(s) for s in rng.integers(0, 2 * W, 6)
    ))
    x = oracle.rand_digits(rng, (8, ring.L))
    vals = [int_from_digits(x[i]) for i in range(8)]
    for s in shifts:
        y = np.asarray(normmod(mul_2expmod(jnp.asarray(x), s, W)))
        z = np.asarray(normmod(div_2expmod(jnp.asarray(x), s, W)))
        for i in range(8):
            assert int_from_digits(y[i]) == oracle.ref_mul_2expmod(vals[i], s, W), (s, i)
            assert int_from_digits(z[i]) == oracle.ref_div_2expmod(vals[i], s, W), (s, i)


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_shift_mod_variable(ring, rng):
    W = ring.bits
    B = 16
    x = oracle.rand_digits(rng, (B, ring.L))
    s = rng.integers(0, 2 * W, B).astype(np.int32)
    y = np.asarray(normmod(jax.jit(
        lambda x, s: shift_mod(x, s[:, None], W)
    )(jnp.asarray(x), jnp.asarray(s))))
    for i in range(B):
        want = oracle.ref_mul_2expmod(int_from_digits(x[i]), int(s[i]), W)
        assert int_from_digits(y[i]) == want, (i, s[i])


@pytest.mark.parametrize("ring", RINGS, ids=repr)
def test_shift_mod_bound_invariant(ring, rng):
    """Digit bound stays ~2^17 under repeated variable shifts (rep invariant)."""
    W = ring.bits
    x = jnp.asarray(oracle.rand_digits(rng, (8, ring.L), -(1 << 17), 1 << 17))
    s = jnp.asarray(np.random.default_rng(0).integers(0, 2 * W, 8).astype(np.int32))
    for _ in range(30):
        x = shift_mod(x, s[:, None], W)
    assert int(jnp.abs(x).max()) < (1 << 18)
