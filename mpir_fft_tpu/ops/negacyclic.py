"""Negacyclic weighted transforms (ref FFT_radix2_negacyclic
mul_fft.c:1290-1390, IFFT_radix2_negacyclic mul_fft.c:1861-1962,
FFT_negacyclic_twiddle mul_fft.c:887-921).

A negacyclic convolution of length m = 2n (product mod x^m + 1, i.e. mod
2^(m b) + 1 after evaluation) is a cyclic convolution of the sequences
weighted by q^i, where q is a PRIMITIVE 2m-th root: q = 2^(w/2) in half-bit
terms (q^2 = z = 2^w, q^m = 2^(w n) = 2^W = -1).  The reference weaves the
weighting through FFT_twiddle/FFT_twiddle_sqrt2 pairs (odd w,
mul_fft.c:1301-1340) or plain twiddles (even w, mul_fft.c:1342-1373); here
both collapse into one twiddle_half call with the static half-bit table
e2[i] = i*w, and the transform itself is the standard iterative radix-2."""

from __future__ import annotations

import numpy as np

from .limb import div_2expmod
from .sqrt2 import twiddle_half
from .transforms import fft_radix2, ifft_radix2


def _weight_exps(m: int, w: int) -> np.ndarray:
    return np.arange(m, dtype=np.int64) * w


def fft_negacyclic(x, w: int, W: int):
    """Weight by q^i then forward-transform; length m = x.shape[-2] = 2n
    (ref FFT_radix2_negacyclic, mul_fft.c:1290-1390)."""
    m = x.shape[-2]
    x = twiddle_half(x, _weight_exps(m, w), W)
    return fft_radix2(x, w, W)


def ifft_negacyclic(v, w: int, W: int):
    """Inverse-transform then unweight by q^-i; returns m * x for the
    weighted sequence x (ref IFFT_radix2_negacyclic, mul_fft.c:1861-1962).
    No scaling division -- callers divide by 2^depth+1 exactly as with the
    plain transforms."""
    m = v.shape[-2]
    v = ifft_radix2(v, w, W)
    return twiddle_half(v, -_weight_exps(m, w), W)


def negacyclic_scale(c, depth_plus1: int, W: int):
    """Divide by the transform scaling 2^(depth+1) (deferred as in
    mul_fft.c:3256-3260)."""
    return div_2expmod(c, depth_plus1, W)
