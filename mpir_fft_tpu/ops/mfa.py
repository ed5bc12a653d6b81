"""2-D Matrix Fourier Algorithm transforms (ref FFT_radix2_mfa
mul_fft.c:2021-2068, IFFT_radix2_mfa mul_fft.c:2411-2459).

A length C = n1*n2 transform becomes n1 column FFTs of length n2 (root
z^n1) with the cross twiddles z^(k2*j1) fused into the column transforms'
final stage, followed by n2 row FFTs of length n1 (root z^n2).  The
reference blocks this way for cache locality (README:74-91); on TPU the same
factorization is (a) the unit of VMEM-residency for Pallas column kernels
and (b) the sharding axis over the device mesh: column FFTs are batched over
j1 -- shard j1 and the column pass is device-local; one logical transpose
(XLA all-to-all under a sharding constraint) moves to the row pass
(SURVEY.md section 2 checklist).

Layout convention: coefficient j of the 1-D transform lives at matrix cell
(j2, j1), j = j2*n1 + j1 (the reference's stride-n1 columns).  The forward
output at cell (j2p, j1p) is frequency k = revbin(j2p, log n2) +
n2 * revbin(j1p, log n1).  The reference's explicit revbin row/column swaps
(mul_fft.c:2041-2050) are unnecessary: the inverse consumes the forward's
layout directly and the permutations cancel, as README:87-91 exploits."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .transforms import fft_radix2, ifft_radix2, revbin_vec


def _cross_exps(n1: int, n2: int, w: int, W: int) -> np.ndarray:
    """exps[j1, j2p] = w * revbin(j2p, log n2) * j1: the z^(k2*j1) cross
    twiddle, indexed by column j1 and column-output position j2p."""
    rb = revbin_vec(n2)                       # k2 at output position j2p
    j1 = np.arange(n1, dtype=np.int64)[:, None]
    return (w * rb[None, :] * j1) % (2 * W)


def fft_radix2_mfa(x, w: int, W: int, n1: int, n2: int):
    """Forward 2-D MFA: x [..., n2, n1, L] -> same shape, transformed."""
    pe = _cross_exps(n1, n2, w, W)
    xc = jnp.swapaxes(x, -3, -2)              # [..., n1, n2, L]: batch columns
    xc = fft_radix2(xc, w * n1, W, post_exps=pe)
    xr = jnp.swapaxes(xc, -3, -2)             # [..., n2, n1, L]: batch rows
    return fft_radix2(xr, w * n2, W)


def ifft_radix2_mfa(x, w: int, W: int, n1: int, n2: int):
    """Inverse 2-D MFA (times 2^(log2(n1*n2))): row IFFTs, then column IFFTs
    with the cross twiddles divided out in their first stage."""
    pe = _cross_exps(n1, n2, w, W)
    xr = ifft_radix2(x, w * n2, W)            # [..., n2, n1, L]
    xc = jnp.swapaxes(xr, -3, -2)             # [..., n1, n2, L]
    xc = ifft_radix2(xc, w * n1, W, pre_exps=pe)
    return jnp.swapaxes(xc, -3, -2)
