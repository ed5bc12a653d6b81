"""Iterative radix-2 DIF transforms over Z/(2^W+1)Z (ref layer L3).

The reference expresses transforms as pointer-swapping recursions
(FFT_radix2 mul_fft.c:786-827, IFFT_radix2 mul_fft.c:1444-1486,
FFT/IFFT_radix2_twiddle mul_fft.c:1397-1442, 1964-2010).  Here each transform
is an *iterative stage loop over a coefficient matrix* [..., C, L]: every
stage reshapes to (blocks, 2, half, L), applies one vectorized butterfly with
a static per-position exponent table, and reassembles.  Recursion depth
becomes a python loop of log2(C) stages traced once under jit; the pointer
swaps become functional array updates XLA can alias.

Conventions (identical to the reference):
  * z = 2^w is a 2n-th root of unity; the forward transform is
    decimation-in-frequency with output in revbin order (README:91).
  * No scaling inside transforms: ifft(fft(x)) == 2^(depth+1) * x; callers
    divide by 2^(depth+1) (ref: deferred scaling, mul_fft.c:3256-3260).
  * `post_exps` / `pre_exps` fuse extra per-position twiddles into the
    last forward / first inverse stage -- the mechanism behind the MFA's
    "column twiddles cost nothing" (ref FFT_radix2_twiddle leaf fusion,
    mul_fft.c:1406-1419; README:89).
"""

from __future__ import annotations

import contextlib
import contextvars

import numpy as np

import jax
import jax.numpy as jnp

from .butterfly import butterfly_fwd, butterfly_inv
from .limb import shift_mod

# trace-time guard: set while tracing inside a Pallas kernel body so the
# auto-fusing transforms below don't nest pallas_call inside pallas_call
_NO_FUSE = contextvars.ContextVar("mpir_fft_no_fuse", default=False)


@contextlib.contextmanager
def no_auto_fuse():
    tok = _NO_FUSE.set(True)
    try:
        yield
    finally:
        _NO_FUSE.reset(tok)


def _auto_fusable(x) -> bool:
    """Fuse a whole plain transform into one VMEM kernel when: enabled, not
    already inside a kernel, batched (>= 3-D), and the digit width is under
    the Mosaic compile-memory cap.  This catches the recursive mulmod's
    inner negacyclic transforms, which otherwise run as XLA pass-storms
    (the 10^9-bit pointwise stage was 80% of total time)."""
    if _NO_FUSE.get() or x.ndim < 3:
        return False
    from .fused import MAX_FUSED_L, use_pallas, whole_row_ok

    return (x.shape[-1] <= MAX_FUSED_L
            and whole_row_ok(x.shape[-2], x.shape[-1], x.dtype.itemsize)
            and use_pallas())


def _stage_fusable(x) -> bool:
    """Per-stage kernel fusion for (C, L) rows too big for whole-transform
    kernels (one ladder group's temps fit the Mosaic stack where log2(C)
    stages' don't).  The unfused fallback pays ~a dozen HBM passes per stage
    for the barrel-shifted twiddles."""
    if _NO_FUSE.get():
        return False
    from .fused import MAX_FUSED_L, MAX_STAGE_L, use_pallas, whole_row_ok

    if x.shape[-1] > MAX_STAGE_L or not use_pallas():
        return False
    return x.shape[-1] > MAX_FUSED_L or not whole_row_ok(
        x.shape[-2], x.shape[-1], x.dtype.itemsize
    )


def _as_col(e):
    """Shape an exponent vector for broadcast over the digit axis."""
    if isinstance(e, np.ndarray):
        return e.astype(np.int64)[..., None]
    return e[..., None]


def _iota_exps(h: int, step: int) -> jax.Array:
    """Traced stage-exponent column (i * step for i < h) built from iota so
    Pallas kernels see an op, not a captured constant (int32 is ample:
    values < W < 2^31)."""
    return jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) * jnp.int32(step)


def revbin_iota(C: int) -> jax.Array:
    """Traced revbin(j, log2 C) for all j (ref mpir_revbin, mul_fft.c:52-79),
    as bit ops on iota -- Pallas-compatible."""
    D = C.bit_length() - 1
    j = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[..., 0]
    r = jnp.zeros_like(j)
    for b in range(D):
        r = r | (((j >> b) & 1) << (D - 1 - b))
    return r


def fft_radix2(x, w: int, W: int, post_exps: np.ndarray | None = None,
               pre_half: tuple[int, int] | None = None):
    """Forward DIF FFT of length C = x.shape[-2] over root z = 2^w.

    Output in revbin order: out[j] = X(z^revbin(j)).  With `post_exps` (static
    int vector of length C), output position j is additionally multiplied by
    2^post_exps[j] -- fused into the final stage (ref FFT_radix2_twiddle).

    pre_half = (e0, step2): input position j is first multiplied by
    2^((e0 + j*step2)/2) (half-bit exponents) -- on the ladder-kernel path
    this rides the first group's HBM round trip (the sqrt2 top-layer t-leg,
    ref mul_fft.c:591-634); elsewhere it falls back to a separate
    twiddle_half pass, same values."""
    C = x.shape[-2]
    D = C.bit_length() - 1
    assert C == 1 << D
    if pre_half is not None and (D == 0 or not _stage_fusable(x)):
        from .sqrt2 import twiddle_half

        e0, st2 = pre_half
        x = twiddle_half(x, e0 + np.arange(C, dtype=np.int64) * st2, W)
        pre_half = None
    if post_exps is None and pre_half is None and D > 0 and _auto_fusable(x):
        from .fused import fused_batched

        flat = x.reshape((-1,) + x.shape[-2:])
        def body(blk):
            with no_auto_fuse():
                return fft_radix2(blk, w, W)
        return fused_batched(body, flat).reshape(x.shape)
    if post_exps is not None:
        if isinstance(post_exps, np.ndarray):
            post_exps = jnp.asarray(post_exps % (2 * W), jnp.int32)
        pe_lead = post_exps.shape[:-1]
    if D == 0:
        if post_exps is not None:
            x = shift_mod(x, post_exps[..., None] % (2 * W), W)
        return x
    lead = x.shape[:-2]
    L = x.shape[-1]
    if _stage_fusable(x):
        # multi-stage ladder kernels: LADDER stages share one HBM round trip
        # (width-capped: wide digit rows shrink the ladder so the h-block
        # floor keeps the Mosaic stack inside scoped vmem)
        from .fused import fused_butterfly_ladder, ladder_stages

        l = 0
        while l < D:
            kg = min(ladder_stages(L), D - l)
            K = 1 << kg
            hk = C >> (l + kg)
            steps = tuple(w << (l + j) for j in range(kg))
            pe = None
            if l + kg == D and post_exps is not None:
                pe = post_exps.reshape(pe_lead + (1 << l, K // 2, 2)) % (2 * W)
                pe = jnp.broadcast_to(
                    pe, lead + (1 << l, K // 2, 2)).reshape(-1, K // 2, 2)
            x = fused_butterfly_ladder(
                "fwd", x.reshape((-1, K, hk, L)), steps, W, pe,
                pre_half=pre_half if l == 0 else None,
            ).reshape(lead + (C, L))
            l += kg
        return x
    for l in range(D):
        h = C >> (l + 1)
        blocks = 1 << l
        xr = x.reshape(lead + (blocks, 2, h, L))
        pe = None
        if l == D - 1 and post_exps is not None:
            pe = post_exps.reshape(pe_lead + (blocks, 2, h)) % (2 * W)
        a = xr[..., 0, :, :]
        b = xr[..., 1, :, :]
        e_t = _iota_exps(h, w << l)                      # i * w * 2^l bits
        e_s = None
        g = (w << l) & -(w << l)          # static barrel hint (limb.shift_mod)
        if pe is not None:
            e_s = _as_col(pe[..., 0, :])                 # s lands at even pos
            e_t = _as_col(pe[..., 1, :]) + e_t           # t at odd pos
            g = 1
        s, t = butterfly_fwd(a, b, e_t, W, e_s=e_s, gcd_t=g)
        x = jnp.stack([s, t], axis=-3).reshape(lead + (C, L))
    return x


def inner_group(C: int) -> int:
    """Stage count of ifft_radix2's first-executed (innermost) ladder group
    on a length-C transform: the stages whose butterfly pairs live within
    contiguous 2^kg position blocks."""
    from .fused import LADDER

    return min(LADDER, C.bit_length() - 1)


def ifft_innermost(v, w: int, W: int, C: int):
    """Apply ONLY the innermost inner_group(C) inverse stages of the
    length-C ifft_radix2 to flat row chunks v [..., R, L], R a multiple of
    K = 2^inner_group(C).  Those stages pair positions within contiguous
    K-blocks, so they are chunk-local: the staged flagship's pointwise
    program runs them on each spectrum chunk while it is HBM-hot, and the
    whole-slab inverse skips them via skip_inner (the flat-transform
    analogue of the reference's pointwise-into-inverse fusion,
    IFFT_radix2_mfa_truncate_sqrt2_combined, mul_fft.c:2745-2923)."""
    D = C.bit_length() - 1
    kg = inner_group(C)
    K = 1 << kg
    L = v.shape[-1]
    assert v.shape[-2] % K == 0, (v.shape, K)
    steps = [w << (D - kg + j) for j in range(kg)]
    from .fused import MAX_STAGE_L, use_pallas

    if use_pallas() and not _NO_FUSE.get() and L <= MAX_STAGE_L:
        from .fused import fused_butterfly_ladder

        return fused_butterfly_ladder(
            "inv", v.reshape((-1, K, 1, L)), tuple(steps), W
        ).reshape(v.shape)
    return ifft_innermost_body(v, steps, W, K)


def ifft_innermost_body(v, steps, W: int, K: int):
    """Pure-ops core of ifft_innermost on [..., R, L] (R a multiple of K):
    also usable INSIDE a Pallas kernel (ntt._garner_carry fuses it as a
    post-body so the pointwise chunk's first inverse leg costs no extra HBM
    round trip).

    Stage exponents i*steps[l2] are static per position i, so the twiddle
    divides are applied as a python-unrolled loop of h2 <= K/2 STATIC
    shift_mod slices (static roll + bit shift, zero selects) instead of a
    per-row barrel of ~log2(L) roll+select levels (the static-roll motif of
    fused.fused_butterfly_ladder, ref mul_fft.c:525-541)."""
    from .limb import carry_pass

    lead, R, L = v.shape[:-2], v.shape[-2], v.shape[-1]
    kg = len(steps)
    x = v.reshape(lead + (R // K, K, L))
    for l2 in range(kg - 1, -1, -1):
        h2 = K >> (l2 + 1)
        xr = x.reshape(lead + (R // K, 1 << l2, 2, h2, L))
        s = xr[..., 0, :, :]
        t = xr[..., 1, :, :]
        if h2 <= 64:
            cols = [
                shift_mod(t[..., i : i + 1, :],
                          (-(i * steps[l2])) % (2 * W), W)
                for i in range(h2)
            ]
            hh = cols[0] if h2 == 1 else jnp.concatenate(cols, axis=-2)
            a, b = carry_pass(s + hh), carry_pass(s - hh)
        else:
            e = _iota_exps(h2, steps[l2])
            g = steps[l2] & -steps[l2]
            a, b = butterfly_inv(s, t, e, W, gcd_t=g)
        x = jnp.stack([a, b], axis=-3).reshape(lead + (R // K, K, L))
    return x.reshape(v.shape)


def ifft_radix2(x, w: int, W: int, pre_exps: np.ndarray | None = None,
                skip_inner: int = 0):
    """Inverse of fft_radix2 (times 2^D): revbin-ordered input, natural-order
    output, ifft(fft(x)) == 2^D * x.  With `pre_exps`, input position j is
    first *divided* by 2^pre_exps[j] -- fused into the first inverse stage
    (ref IFFT_radix2_twiddle, mul_fft.c:1964-2010).

    skip_inner: the caller already applied the innermost `skip_inner` stages
    chunk-locally via ifft_innermost (possibly computed on a different
    nominal length -- the even-w sqrt2 dispatch skips inner_group(C/2)
    stages of the length-C transform, which is fine: the stages are
    identical, see ops/sqrt2.ifft_sqrt2)."""
    C = x.shape[-2]
    D = C.bit_length() - 1
    assert C == 1 << D
    assert 0 <= skip_inner <= D
    assert skip_inner == 0 or pre_exps is None
    if pre_exps is None and D > 0 and skip_inner == 0 and _auto_fusable(x):
        from .fused import fused_batched

        flat = x.reshape((-1,) + x.shape[-2:])
        def body(blk):
            with no_auto_fuse():
                return ifft_radix2(blk, w, W)
        return fused_batched(body, flat).reshape(x.shape)
    if pre_exps is not None:
        if isinstance(pre_exps, np.ndarray):
            pre_exps = jnp.asarray(pre_exps % (2 * W), jnp.int32)
        pe_lead = pre_exps.shape[:-1]
    if D == 0:
        if pre_exps is not None:
            x = shift_mod(x, (-pre_exps[..., None]) % (2 * W), W)
        return x
    lead = x.shape[:-2]
    L = x.shape[-1]
    if _stage_fusable(x):
        # multi-stage ladder kernels, innermost group first (mirror of the
        # forward grouping; pre_exps rides the first-executed group)
        from .fused import fused_butterfly_ladder, ladder_stages

        l_hi = D - skip_inner
        while l_hi > 0:
            kg = min(ladder_stages(L), l_hi)
            l = l_hi - kg
            K = 1 << kg
            hk = C >> l_hi
            steps = tuple(w << (l + j) for j in range(kg))
            pe = None
            if l_hi == D and pre_exps is not None:
                pe = pre_exps.reshape(pe_lead + (1 << l, K // 2, 2)) % (2 * W)
                pe = jnp.broadcast_to(
                    pe, lead + (1 << l, K // 2, 2)).reshape(-1, K // 2, 2)
            x = fused_butterfly_ladder(
                "inv", x.reshape((-1, K, hk, L)), steps, W, pe
            ).reshape(lead + (C, L))
            l_hi = l
        return x
    for l in range(D - 1 - skip_inner, -1, -1):
        h = C >> (l + 1)
        blocks = 1 << l
        xr = x.reshape(lead + (blocks, 2, h, L))
        pe = None
        if l == D - 1 and pre_exps is not None:
            pe = pre_exps.reshape(pe_lead + (blocks, 2, h)) % (2 * W)
        s = xr[..., 0, :, :]
        t = xr[..., 1, :, :]
        e = _iota_exps(h, w << l)
        e_s = e_t = None
        g = (w << l) & -(w << l)          # static barrel hint (limb.shift_mod)
        if pe is not None:
            e_s = _as_col(pe[..., 0, :])
            e_t = _as_col(pe[..., 1, :])
            g = 1
        a, b = butterfly_inv(s, t, e, W, e_s=e_s, e_t=e_t, gcd_t=g)
        x = jnp.stack([a, b], axis=-3).reshape(lead + (C, L))
    return x


def fft_radix2_twiddle(x, w: int, W: int, ws: int, c: int):
    """fft_radix2 followed by out[j] *= 2^(ws * revbin(j) * c): the MFA column
    transform (ref FFT_radix2_twiddle, mul_fft.c:1397-1442, with r=0, rs=1;
    leaf index r accumulates to revbin(j))."""
    C = x.shape[-2]
    pe = (revbin_iota(C) * jnp.int32(ws * c)) % (2 * W)
    return fft_radix2(x, w, W, post_exps=pe)


def ifft_radix2_twiddle(x, w: int, W: int, ws: int, c: int):
    """Inverse of fft_radix2_twiddle (times 2^D): divides position j by
    2^(ws * revbin(j) * c) then inverse-transforms (ref IFFT_radix2_twiddle)."""
    C = x.shape[-2]
    pe = (revbin_iota(C) * jnp.int32(ws * c)) % (2 * W)
    return ifft_radix2(x, w, W, pre_exps=pe)


def revbin_vec(C: int) -> np.ndarray:
    """revbin(j, log2 C) for all j (ref mpir_revbin, mul_fft.c:52-79)."""
    D = C.bit_length() - 1
    assert C == 1 << D
    j = np.arange(C, dtype=np.int64)
    r = np.zeros_like(j)
    for b in range(D):
        r |= ((j >> b) & 1) << (D - 1 - b)
    return r
