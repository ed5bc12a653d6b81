"""L5 integer multiplication drivers (ref new_mpn_mul* mul_fft.c:3190-3668).

All drivers share the reference skeleton (mul_fft.c:3190-3265): derive sizes,
split both operands into ring coefficients, forward-transform, normalize +
pointwise-multiply, inverse-transform, scale by 2^-(depth+1), normalize,
combine with carries.  They differ in the transform family used.

Device data model: integers are canonical base-2^16 digit vectors (int32).
Drivers are pure jittable functions of digit arrays; shapes/plans are static.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from mpir_fft_tpu.ops.limb import (
    DIGIT_BITS,
    Ring,
    digits_from_int,
    div_2expmod,
    int_from_digits,
    normmod,
)
from mpir_fft_tpu.ops.mfa import fft_radix2_mfa, ifft_radix2_mfa
from mpir_fft_tpu.ops.pointwise import mulmod_base
from mpir_fft_tpu.ops.split import fft_combine_bits, fft_split_bits
from mpir_fft_tpu.ops.transforms import fft_radix2, ifft_radix2
from mpir_fft_tpu.utils.params import MulPlan, choose_params, cdiv


def out_len_digits(plan: MulPlan) -> int:
    return cdiv(plan.bits_a + plan.bits_b, DIGIT_BITS) + 2


def mpn_mul_radix2(a, b, plan: MulPlan):
    """Plain full-length cyclic FFT multiply (the new_mpn_mul skeleton with
    FFT/IFFT_radix2; ref mul_fft.c:3190-3265 without truncation/MFA).

    a, b: canonical digit vectors of the operands.  Returns the product as a
    canonical digit vector of length out_len_digits(plan)."""
    ring = Ring(plan.n, plan.w)
    C, W, D = 2 * plan.n, ring.bits, plan.depth + 1

    ia = fft_split_bits(a, plan.bits1, C, ring.L)
    ib = fft_split_bits(b, plan.bits1, C, ring.L)
    fa = fft_radix2(ia, plan.w, W)
    fb = fft_radix2(ib, plan.w, W)
    prod = mulmod_base(normmod(fa), normmod(fb))
    c = ifft_radix2(prod, plan.w, W)
    c = normmod(div_2expmod(c, D, W))
    return fft_combine_bits(c, plan.bits1, out_len_digits(plan))


def mfa_shape(plan: MulPlan) -> tuple[int, int]:
    """Square-ish (n1 cols, n2 rows) split of the length-2n transform
    (ref: sqrt blocking, mul_fft.c:3200; README:87)."""
    D = plan.depth + 1
    n1 = 1 << (D // 2)
    return n1, (2 * plan.n) // n1


def mpn_mul_mfa(a, b, plan: MulPlan, constrain=None):
    """Cyclic multiply via the 2-D Matrix Fourier transform (the new_mpn_mul3
    skeleton without sqrt2/truncation; ref mul_fft.c:3339-3413).

    `constrain(x, stage)` optionally applies sharding constraints at the
    column/row boundaries (see parallel/mfa_sharded.py)."""
    ring = Ring(plan.n, plan.w)
    C, W, D = 2 * plan.n, ring.bits, plan.depth + 1
    n1, n2 = mfa_shape(plan)
    con = constrain or (lambda x, stage: x)

    def fwd(digits):
        c = fft_split_bits(digits, plan.bits1, C, ring.L)
        m = c.reshape(c.shape[:-2] + (n2, n1, ring.L))
        m = con(m, "cols")
        return fft_radix2_mfa(m, plan.w, W, n1, n2)

    fa = con(fwd(a), "rows")
    fb = con(fwd(b), "rows")
    prod = mulmod_base(normmod(fa), normmod(fb))
    c = ifft_radix2_mfa(prod, plan.w, W, n1, n2)
    c = con(c, "cols")
    c = c.reshape(c.shape[:-3] + (C, ring.L))
    c = normmod(div_2expmod(c, D, W))
    return fft_combine_bits(c, plan.bits1, out_len_digits(plan))


# ---------------------------------------------------------------------------
# Host convenience API
# ---------------------------------------------------------------------------

_SMALL_THRESHOLD_BITS = 1 << 14


@functools.lru_cache(maxsize=64)
def _jitted_driver(kind: str, plan: MulPlan):
    if kind == "radix2":
        fn = functools.partial(mpn_mul_radix2, plan=plan)
    elif kind == "mfa":
        fn = functools.partial(mpn_mul_mfa, plan=plan)
    else:
        raise ValueError(kind)
    return jax.jit(fn)


def mul(a: int, b: int, driver: str = "radix2") -> int:
    """Multiply two nonnegative Python ints via the TPU FFT pipeline.

    Small products fall back to the host (the reference likewise delegates
    below-crossover sizes to MPIR's mpn_mul, mul_fft.c:3135-3139)."""
    if a < 0 or b < 0:
        raise ValueError("nonnegative operands only (mpn semantics)")
    if a == 0 or b == 0:
        return 0
    ba, bb = a.bit_length(), b.bit_length()
    if ba + bb <= _SMALL_THRESHOLD_BITS:
        return a * b
    plan = choose_params(ba, bb)
    La, Lb = cdiv(ba, DIGIT_BITS), cdiv(bb, DIGIT_BITS)
    da = jnp.asarray(digits_from_int(a, La))
    db = jnp.asarray(digits_from_int(b, Lb))
    out = _jitted_driver(driver, plan)(da, db)
    return int_from_digits(np.asarray(out))
