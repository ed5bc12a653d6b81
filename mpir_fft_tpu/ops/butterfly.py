"""Radix-2 butterflies over Z/(2^W+1)Z (ref layer L2: mul_fft.c:517-752).

All butterflies are thin fusions of the limb substrate: one sumdiff plus
shift-based twiddles.  A twiddle by z^i (z = 2^w) is *never* a multiplication
-- it is the exponent decomposition  i*w = (negate? W:0) + 16*digits + bits
realized as a negacyclic digit rotation plus a sub-digit shift
(ref mul_fft.c:525-541, TODO:109-122), provided by limb.shift_mod.

Digit-bound invariant: inputs bounded by M -> outputs bounded by
max(2^16 + M/2^15, 2^16 + M + 1)-ish; with the carry_pass on the sum leg both
outputs stay below 2^16 + M/2 + 2, so repeated stages converge to ~2^17."""

from __future__ import annotations

import jax.numpy as jnp

from .limb import carry_pass, div_2expmod, shift_mod


def butterfly_fwd(a, b, e_t, W: int, e_s=None, gcd_t: int = 1, gcd_s: int = 1,
                  carry: bool = True):
    """DIF butterfly (ref FFT_radix2_butterfly, mul_fft.c:553-576):
        s = a + b            (optionally * 2^e_s: the fused-twiddle form,
                              ref FFT_radix2_twiddle_butterfly mul_fft.c:517-548)
        t = (a - b) * 2^e_t  (mod p)
    e_t / e_s are bit-shift exponents: python ints or int32 arrays
    broadcastable to [..., 1] over the digit axis.  gcd_t / gcd_s: static
    power-of-two divisors of every e_t / e_s value (see limb.shift_mod).

    carry=False skips the s-leg carry sweep: digit magnitude then roughly
    doubles per stage, so callers running a BOUNDED number of consecutive
    stages (the ladder kernels) may defer carrying to the last stage of the
    group -- from the ~2^17 inter-kernel invariant, k uncarried stages stay
    below ~2^(17+k), safe in int32 for k <= 8 and inside shift_bits_var's
    2^25 domain."""
    s = a + b
    t = shift_mod(a - b, e_t, W, gcd=gcd_t)
    if e_s is not None:
        s = shift_mod(s, e_s, W, gcd=gcd_s)
    elif carry:
        s = carry_pass(s)
    return s, t


def butterfly_inv(s, t, e, W: int, e_s=None, e_t=None, gcd_t: int = 1,
                  gcd_s: int = 1, carry: bool = True):
    """Inverse DIF butterfly (ref FFT_radix2_inverse_butterfly,
    mul_fft.c:639-652):
        a = s + t / 2^e
        b = s - t / 2^e      (mod p)
    With e_s/e_t set, both inputs are pre-divided by their extra twiddles
    first (ref FFT_radix2_twiddle_inverse_butterfly, mul_fft.c:721-752).
    carry=False defers the output carry sweeps (see butterfly_fwd)."""
    if e_s is not None:
        s = div_2expmod(s, e_s, W, gcd=gcd_s)
    if e_t is not None:
        e = e + e_t
    h = div_2expmod(t, e, W, gcd=gcd_t)
    if not carry:
        return s + h, s - h
    return carry_pass(s + h), carry_pass(s - h)
