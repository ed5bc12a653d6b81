"""2-D Matrix Fourier Algorithm transforms, plain / truncated / sqrt2
(ref FFT_radix2_mfa mul_fft.c:2021-2068, IFFT_radix2_mfa mul_fft.c:2411-2459,
FFT_radix2_mfa_truncate mul_fft.c:2357-2409, IFFT_radix2_mfa_truncate
mul_fft.c:2925-2979, FFT_radix2_mfa_sqrt2 mul_fft.c:2078-2207,
FFT_radix2_mfa_truncate_sqrt2 mul_fft.c:2212-2355 -- the production forward
transform -- and IFFT_radix2_mfa_truncate_sqrt2 mul_fft.c:2593-2743).

A length C = n1*n2 transform becomes n1 column FFTs of length n2 (root
z^n1) with the cross twiddles z^(k2*j1) fused into the column transforms'
final stage, followed by n2 row FFTs of length n1 (root z^n2).  The
reference blocks this way for cache locality (README:74-91); on TPU the same
factorization is (a) the unit of VMEM-residency for column kernels and
(b) the sharding axis over the device mesh: column FFTs batch over j1 --
shard j1 and the column pass is device-local; one logical transpose (XLA
all-to-all under a sharding constraint) moves to the row pass.

Layout convention: coefficient j of the 1-D transform lives at matrix cell
(j2, j1), j = j2*n1 + j1 (the reference's stride-n1 columns).  The
reference's explicit revbin row/column swaps (mul_fft.c:2041-2050) and the
revbin-ordered pointwise walk they force (mul_fft.c:3244-3253, README:193)
are unnecessary here: the inverse consumes the forward's layout directly and
the permutations cancel, as README:87-91 exploits.

Truncation semantics: trunc2 counts KEPT ROWS (trunc = trunc2 * n1
coefficients, the reference's "trunc a multiple of n1", mul_fft.c:2361);
column transforms are row-truncated, and only the first trunc2 rows get row
transforms -- cost scales with trunc, not with C."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .limb import carry_pass, div_2expmod, mul_2expmod
from .sqrt2 import twiddle_half
from .transforms import fft_radix2, ifft_radix2, revbin_vec
from .truncate import fft_trunc, fft_trunc1, ifft_trunc, ifft_trunc1


def _cross_exps(n1: int, n2: int, w: int, W: int) -> np.ndarray:
    """exps[j1, j2p] = w * revbin(j2p, log n2) * j1: the z^(k2*j1) cross
    twiddle, indexed by column j1 and column-output position j2p."""
    rb = revbin_vec(n2)                       # k2 at output position j2p
    j1 = np.arange(n1, dtype=np.int64)[:, None]
    return (w * rb[None, :] * j1) % (2 * W)


def fft_radix2_mfa(x, w: int, W: int, n1: int, n2: int, con=None):
    """Forward 2-D MFA: x [..., n2, n1, L] -> same shape, transformed.
    `con(x, stage)` optionally applies sharding constraints at the
    column/row boundaries (stage in {"cols", "rows"})."""
    con = con or (lambda x, s: x)
    pe = _cross_exps(n1, n2, w, W)
    xc = jnp.swapaxes(con(x, "cols"), -3, -2) # [..., n1, n2, L]: batch columns
    xc = fft_radix2(xc, w * n1, W, post_exps=pe)
    xr = con(jnp.swapaxes(xc, -3, -2), "rows")  # [..., n2, n1, L]: batch rows
    return fft_radix2(xr, w * n2, W)


def ifft_radix2_mfa(x, w: int, W: int, n1: int, n2: int, con=None):
    """Inverse 2-D MFA (times n1*n2): row IFFTs, then column IFFTs with the
    cross twiddles divided out in their first stage."""
    con = con or (lambda x, s: x)
    pe = _cross_exps(n1, n2, w, W)
    xr = ifft_radix2(con(x, "rows"), w * n2, W)   # [..., n2, n1, L]
    xc = jnp.swapaxes(con(xr, "cols"), -3, -2)    # [..., n1, n2, L]
    xc = ifft_radix2(xc, w * n1, W, pre_exps=pe)
    return jnp.swapaxes(xc, -3, -2)


# ---------------------------------------------------------------------------
# Truncated MFA (ref FFT/IFFT_radix2_mfa_truncate, mul_fft.c:2357-2409,
# 2925-2979; the trunc1 flavor is what the sqrt2 composite's right half needs)
# ---------------------------------------------------------------------------

def mfa_fft_trunc(x, w: int, W: int, n1: int, n2: int, trunc2: int,
                  no_zero_tail: bool = False, con=None):
    """Truncated forward MFA: only the first trunc2 output rows are valid.
    With no_zero_tail, input rows >= trunc2 are arbitrary (truncate1
    semantics); otherwise they must be zero."""
    assert 1 <= trunc2 <= n2
    con = con or (lambda x, s: x)
    pe = _cross_exps(n1, n2, w, W)
    f = fft_trunc1 if no_zero_tail else fft_trunc
    xc = jnp.swapaxes(con(x, "cols"), -3, -2)
    xc = f(xc, w * n1, W, trunc2, pe)
    xr = con(jnp.swapaxes(xc, -3, -2), "rows")
    head = fft_radix2(xr[..., :trunc2, :, :], w * n2, W)
    return jnp.concatenate([head, xr[..., trunc2:, :, :]], axis=-3)


def mfa_ifft_trunc(v, w: int, W: int, n1: int, n2: int, trunc2: int,
                   no_zero_tail: bool = False, con=None):
    """Truncated inverse MFA (times n1*n2 on the first trunc2 rows).
    Plain flavor: underlying coefficient rows >= trunc2 are zero.
    no_zero_tail flavor: input rows >= trunc2 hold UNSCALED coefficients
    (cell (j2, j1) = x_{j2 n1 + j1}), mirroring truncate.ifft_trunc1."""
    assert 1 <= trunc2 <= n2
    con = con or (lambda x, s: x)
    pe = _cross_exps(n1, n2, w, W)
    v = con(v, "rows")
    head = ifft_radix2(v[..., :trunc2, :, :], w * n2, W)
    tail = v[..., trunc2:, :, :]
    if no_zero_tail:
        # row IFFT scaled the head by n1; scale the known coefficients to
        # match so the column ifft_trunc1 contract sees one uniform factor
        tail = mul_2expmod(tail, n1.bit_length() - 1, W)
    xr = jnp.concatenate([head, tail], axis=-3)
    f = ifft_trunc1 if no_zero_tail else ifft_trunc
    xc = jnp.swapaxes(con(xr, "cols"), -3, -2)
    xc = f(xc, w * n1, W, trunc2, pe)
    return jnp.swapaxes(xc, -3, -2)


# ---------------------------------------------------------------------------
# sqrt2 composites at length 4n = 2 * (n1 * n2)  (the production pair:
# ref FFT_radix2_mfa_truncate_sqrt2 mul_fft.c:2212-2355 and its inverse
# mul_fft.c:2593-2743).  Operates on FLAT [..., 4n, L] arrays; each half is
# internally in MFA (n2, n1) cell layout -- forward and inverse agree, and
# the pointwise stage is position-wise, so no reordering is ever needed.
# ---------------------------------------------------------------------------

def _as2d(x, n2, n1):
    return x.reshape(x.shape[:-2] + (n2, n1, x.shape[-1]))


def _flat(x):
    return x.reshape(x.shape[:-3] + (x.shape[-3] * x.shape[-2], x.shape[-1]))


def mfa_fft_trunc_sqrt2(x, w: int, W: int, n1: int, trunc: int, con=None):
    """Truncated length-4n forward transform over root sqrt2^w with MFA
    halves.  x flat [..., 4n, L], zero past trunc; trunc a multiple of n1.
    Valid outputs: positions < trunc (halves in MFA layout)."""
    C4 = x.shape[-2]
    h = C4 // 2
    n2 = h // n1
    assert trunc % n1 == 0 and 1 <= trunc <= C4
    if w % 2 == 0:
        # even w: plain length-4n MFA with root 2^(w/2) (ref mul_fft.c:850-855)
        out = mfa_fft_trunc(_as2d(x, 2 * n2, n1), w // 2, W, n1, 2 * n2,
                            trunc // n1, con=con)
        return _flat(out)
    if trunc <= h:
        left = mfa_fft_trunc(_as2d(x[..., :h, :], n2, n1), w, W, n1, n2,
                             trunc // n1, con=con)
        return jnp.concatenate([_flat(left), x[..., h:, :]], axis=-2)
    k = trunc - h
    a, b = x[..., :h, :], x[..., h:, :]
    s = jnp.concatenate([carry_pass(a[..., :k, :] + b[..., :k, :]), a[..., k:, :]], axis=-2)
    d = jnp.concatenate([a[..., :k, :] - b[..., :k, :], a[..., k:, :]], axis=-2)
    t = twiddle_half(d, np.arange(h, dtype=np.int64) * w, W)
    left = fft_radix2_mfa(_as2d(s, n2, n1), w, W, n1, n2, con=con)
    right = mfa_fft_trunc(_as2d(t, n2, n1), w, W, n1, n2, k // n1,
                          no_zero_tail=True, con=con)
    return jnp.concatenate([_flat(left), _flat(right)], axis=-2)


def mfa_ifft_trunc_sqrt2(v, w: int, W: int, n1: int, trunc: int, con=None):
    """Inverse of mfa_fft_trunc_sqrt2 (times 4n = C on positions < trunc)."""
    C4 = v.shape[-2]
    h = C4 // 2
    n2 = h // n1
    assert trunc % n1 == 0 and 1 <= trunc <= C4
    if w % 2 == 0:
        out = mfa_ifft_trunc(_as2d(v, 2 * n2, n1), w // 2, W, n1, 2 * n2,
                             trunc // n1, con=con)
        return _flat(out)
    if trunc <= h:
        left = mfa_ifft_trunc(_as2d(v[..., :h, :], n2, n1), w, W, n1, n2,
                              trunc // n1, con=con)
        left = _flat(left)
        return jnp.concatenate([carry_pass(left + left), v[..., h:, :]], axis=-2)
    k = trunc - h
    e2 = np.arange(h, dtype=np.int64) * w
    sL = _flat(ifft_radix2_mfa(_as2d(v[..., :h, :], n2, n1), w, W, n1, n2, con=con))
    # reconstruct missing right-half inputs t_j = s_j q^j, j >= k, unscaled
    # (ref FFT_twiddle reconstruction of second-half rows, mul_fft.c:2680-2691)
    tail = div_2expmod(sL[..., k:, :], h.bit_length() - 1, W)
    tail = twiddle_half(tail, e2[k:], W)
    vr = jnp.concatenate([v[..., h:trunc, :], tail], axis=-2)
    oR = _flat(mfa_ifft_trunc(_as2d(vr, n2, n1), w, W, n1, n2, k // n1,
                              no_zero_tail=True, con=con))
    u = twiddle_half(oR[..., :k, :], -e2[:k], W)
    xa = carry_pass(sL[..., :k, :] + u)
    xb = carry_pass(sL[..., :k, :] - u)
    mid = carry_pass(sL[..., k:, :] + sL[..., k:, :])
    return jnp.concatenate([xa, mid, xb, v[..., trunc:, :]], axis=-2)
