"""Pallas fusion paths, exercised on CPU in interpret mode via force_pallas.

The production TPU path fuses transforms into VMEM kernels (whole-transform
kernels for L <= MAX_FUSED_L, per-stage butterfly kernels for wider rings);
on CPU those paths are normally off, so these tests force them and check
bit-identity against the plain XLA path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mpir_fft_tpu.ops import fused
from mpir_fft_tpu.ops.fused import force_pallas
from mpir_fft_tpu.ops.limb import Ring, normmod
from mpir_fft_tpu.ops.transforms import (
    fft_radix2,
    fft_radix2_twiddle,
    ifft_radix2,
    ifft_radix2_twiddle,
)


def _rand(rng, shape):
    # denormalized signed digits, the transform-internal invariant
    return rng.integers(-(1 << 17), 1 << 17, shape).astype(np.int32)


def _eq_mod(x, y, W):
    xv = np.asarray(normmod(jnp.asarray(x)))
    yv = np.asarray(normmod(jnp.asarray(y)))
    assert np.array_equal(xv, yv)


@pytest.mark.parametrize("C,batch", [(8, 4), (16, 2)])
def test_stage_fused_fft_matches_plain(rng, C, batch):
    ring = Ring(C, 256 // C * 16)   # W = 4096 bits... keep L over MAX_FUSED_L
    # force a wide ring: L must exceed MAX_FUSED_L for the stage path;
    # shrink the cap for the test instead of building a monster array
    old = fused.MAX_FUSED_L
    fused.MAX_FUSED_L = 16
    try:
        W = 16 * 32           # L = 32 > 16
        x = _rand(rng, (batch, C, 32))
        w = 2 * W // (2 * C)  # any exponent with w*C = W works for roundtrip
        plain = fft_radix2(jnp.asarray(x), w, W)
        with force_pallas(True):
            fast = fft_radix2(jnp.asarray(x), w, W)
        _eq_mod(plain, fast, W)
        plain_i = ifft_radix2(plain, w, W)
        with force_pallas(True):
            fast_i = ifft_radix2(plain, w, W)
        _eq_mod(plain_i, fast_i, W)
    finally:
        fused.MAX_FUSED_L = old


def test_stage_fused_twiddle_matches_plain(rng):
    old = fused.MAX_FUSED_L
    fused.MAX_FUSED_L = 16
    try:
        C, W = 8, 16 * 32
        w = 2 * W // (2 * C)
        x = _rand(rng, (4, C, 32))
        plain = fft_radix2_twiddle(jnp.asarray(x), w, W, 3, 5)
        with force_pallas(True):
            fast = fft_radix2_twiddle(jnp.asarray(x), w, W, 3, 5)
        _eq_mod(plain, fast, W)
        plain_i = ifft_radix2_twiddle(plain, w, W, 3, 5)
        with force_pallas(True):
            fast_i = ifft_radix2_twiddle(plain, w, W, 3, 5)
        _eq_mod(plain_i, fast_i, W)
    finally:
        fused.MAX_FUSED_L = old


def test_ladder_factorized_group_twiddle_matches_plain(rng):
    """The ladder kernels' Cooley-Tukey twiddle factorization (hpos-free
    stage exponents + ONE composed z^(hpos*step0*revbin(p)) group pass,
    fused.fused_butterfly_ladder `factorize`) is bit-identical to the plain
    XLA path.  The production 10^8/10^9-bit flat plans run this branch in
    their outer ladder groups (h > hb, so hpos is grid-dependent and the
    composed group pass beats per-stage barrels), so it needs its own pin:
    C = 1024 with L = 64 puts h = 32 > hb = 8 in the first group and the
    cost heuristic chooses factorization there."""
    old = fused.MAX_FUSED_L
    fused.MAX_FUSED_L = 16
    try:
        # C/L sized so the small-step ladder group of BOTH directions has
        # h > hb (hb caps at the VMEM row budget): grid-dependent hpos, so
        # the static-unroll path cannot serve it and factorization wins
        C, L = 4096, 256
        W = 16 * L            # 4096 bits
        w = 2 * W // (2 * C)  # = 1: small-step groups all sub-digit
        x = _rand(rng, (1, C, L))
        plain = fft_radix2(jnp.asarray(x), w, W)
        before = fused._FACTORIZED_CALLS
        with force_pallas(True):
            fast = fft_radix2(jnp.asarray(x), w, W)
        # the pin is only real if the heuristic actually chose the
        # factorize branch for this shape (ADVICE r3)
        assert fused._FACTORIZED_CALLS > before
        _eq_mod(plain, fast, W)
        plain_i = ifft_radix2(plain, w, W)
        before = fused._FACTORIZED_CALLS
        with force_pallas(True):
            fast_i = ifft_radix2(plain, w, W)
        assert fused._FACTORIZED_CALLS > before
        _eq_mod(plain_i, fast_i, W)
    finally:
        fused.MAX_FUSED_L = old


def test_ladder_static_unroll_matches_plain(rng):
    """The ladder kernels' static-unrolled stage twiddles (grid-1 groups:
    h == hb makes every exponent static, so the stage applies python-
    unrolled static shifts instead of a per-row barrel) are bit-identical
    to the plain XLA path.  C = 256 with L = 64 puts h = hb = 8 in the
    first group, which therefore does NOT factorize and unrolls instead."""
    old = fused.MAX_FUSED_L
    fused.MAX_FUSED_L = 16
    try:
        C, L = 256, 64
        W = 16 * L            # 1024 bits
        w = 2 * W // (2 * C)  # = 4: first-group steps 4..64, all sub-digit
        x = _rand(rng, (2, C, L))
        plain = fft_radix2(jnp.asarray(x), w, W)
        before = fused._UNROLLED_STAGES
        with force_pallas(True):
            fast = fft_radix2(jnp.asarray(x), w, W)
        assert fused._UNROLLED_STAGES > before
        _eq_mod(plain, fast, W)
        plain_i = ifft_radix2(plain, w, W)
        before = fused._UNROLLED_STAGES
        with force_pallas(True):
            fast_i = ifft_radix2(plain, w, W)
        assert fused._UNROLLED_STAGES > before
        _eq_mod(plain_i, fast_i, W)
    finally:
        fused.MAX_FUSED_L = old


def test_whole_fused_transform_matches_plain(rng):
    # L <= MAX_FUSED_L: the whole-transform kernel path
    C, W = 8, 16 * 8
    w = 2 * W // (2 * C)
    x = _rand(rng, (4, C, 8))
    plain = fft_radix2(jnp.asarray(x), w, W)
    with force_pallas(True):
        fast = fft_radix2(jnp.asarray(x), w, W)
    _eq_mod(plain, fast, W)


def test_fused_normmod_matches_plain(rng):
    """normmod's Pallas row kernel (one HBM round trip for the whole
    canonicalization) is bit-identical to the plain XLA path, including the
    ripple edge rows (all-0xffff, all-zero, the -1 residue)."""
    from mpir_fft_tpu.ops.limb import _normmod_core, normmod as nm

    for L in (128, 256):
        x = rng.integers(-(1 << 29), 1 << 29, (6, L)).astype(np.int32)
        e = np.zeros((3, L), np.int32)
        e[0, :] = 0xFFFF
        e[2, 0] = -1
        for arr in (x, e):
            want = np.asarray(_normmod_core(jnp.asarray(arr)))
            with force_pallas(True):
                got = np.asarray(nm(jnp.asarray(arr)))
            assert np.array_equal(want, got)


def test_fused_canonicalize_plain(rng):
    """Two-level Pallas carry scan == flat canonicalization, including a
    carry ripple crossing row boundaries."""
    from mpir_fft_tpu.ops.fused import fused_canonicalize_plain

    N = 1 << 16
    x = rng.integers(0, 1 << 20, N).astype(np.int32)
    x[-4:] = 0
    y = np.full(N, 0xFFFF, np.int32)
    y[0] = 0x1FFFF
    y[-4:] = 0
    for arr in (x, y):
        want = sum(int(v) << (16 * i) for i, v in enumerate(arr.tolist()))
        with force_pallas(True):
            got = np.asarray(fused_canonicalize_plain(jnp.asarray(arr)))
        assert ((got >= 0) & (got < 1 << 16)).all()
        assert int.from_bytes(got.astype("<u2").tobytes(), "little") == want


def test_fused_canonicalize_plain_batched(rng):
    """Batched (2-D) two-level carry scan: rows canonicalize INDEPENDENTLY
    (no carry crosses a batch boundary) -- the mul_many combine path
    (round 5: the batched combine previously fell to the unfused scan)."""
    from mpir_fft_tpu.ops.fused import fused_canonicalize_plain

    B, N = 3, 1 << 16
    x = rng.integers(0, 1 << 20, (B, N)).astype(np.int32)
    x[:, -4:] = 0
    # row 1: all-propagate ripple from digit 0; would corrupt row 2's low
    # digits if the scan crossed the boundary
    x[1] = 0xFFFF
    x[1, 0] = 0x1FFFF
    x[1, -4:] = 0
    want = [
        sum(int(v) << (16 * i) for i, v in enumerate(x[b].tolist()))
        for b in range(B)
    ]
    with force_pallas(True):
        got = np.asarray(fused_canonicalize_plain(jnp.asarray(x)))
    assert got.shape == (B, N)
    assert ((got >= 0) & (got < 1 << 16)).all()
    for b in range(B):
        assert int.from_bytes(got[b].astype("<u2").tobytes(), "little") == want[b]


def test_fused_twiddle_half_matches_plain(rng):
    """Affine half-bit twiddle kernel == the plain select path, across
    parities (all-even, alternating, negative step, offset slice, single)."""
    from mpir_fft_tpu.ops.limb import normmod
    from mpir_fft_tpu.ops.sqrt2 import twiddle_half

    W = 16 * 128
    cases = [
        (8, np.arange(8) * 3),
        (8, -np.arange(8) * 5),
        (6, 7 + np.arange(6) * 2),
        (1, np.array([9])),
        (8, np.arange(8) * 4),
    ]
    for h, e2 in cases:
        x = rng.integers(-(1 << 17), 1 << 17, (2, h, 128)).astype(np.int32)
        want = np.asarray(normmod(twiddle_half(jnp.asarray(x), e2, W)))
        with force_pallas(True):
            got = np.asarray(normmod(twiddle_half(jnp.asarray(x), e2, W)))
        assert np.array_equal(want, got), (h, e2[:2])


def test_ladder_pre_half_matches_separate_twiddle(rng):
    """fft_radix2(pre_half=(e0, step)) == fft_radix2(twiddle_half(x)) in ring
    values, on the ladder path (forced) and the fallback path -- the fused
    sqrt2 top-layer t-leg of the zero-top staged forward."""
    from mpir_fft_tpu.ops.sqrt2 import twiddle_half
    from mpir_fft_tpu.ops.transforms import fft_radix2

    W = 16 * 32                    # L = 32
    C, w = 64, 2 * W // (2 * 64)
    x = _rand(rng, (2, C, 32))
    e2 = np.arange(C, dtype=np.int64) * w
    want = fft_radix2(twiddle_half(jnp.asarray(x), e2, W), w, W)
    old = fused.MAX_FUSED_L
    fused.MAX_FUSED_L = 16         # force the ladder path
    try:
        with force_pallas(True):
            got = fft_radix2(jnp.asarray(x), w, W, pre_half=(0, w))
    finally:
        fused.MAX_FUSED_L = old
    _eq_mod(want, got, W)
    # fallback (non-ladder) path takes the separate twiddle_half route
    got2 = fft_radix2(jnp.asarray(x), w, W, pre_half=(0, w))
    _eq_mod(want, got2, W)
