"""Pallas VMEM kernel for the pointwise base multiplication.

The jnp scan in pointwise.negacyclic_conv_chunks round-trips the full
accumulator through HBM every one of its M steps (measured 16 GB of traffic
for an 8 MB batch at 10^6-bit operands).  Here the whole convolution runs
inside one Pallas kernel per batch block: everything VMEM-resident, a real
on-device loop, one HBM read per operand and one write -- the same
cache-residency idea the reference gets from MPIR's register-blocked
assembly mulmod (the role of mpn_mulmod_2expp1 at mul_fft.c:3119-3123).

Formulation note: Mosaic supports neither gathers, minor-dim interleave
reshapes, nor dynamic_slice, so instead of one interleaved base-2^8 chunk
vector of length 2L the kernel keeps SEPARATED lo/hi chunk planes and forms
the product as four plane convolutions fused into one L-step loop:

    a = alo + 2^8 ahi,  b = blo + 2^8 bhi   (per base-2^16 digit position)
    c = conv(alo,blo) + 2^8 (conv(alo,bhi)+conv(ahi,blo)) + 2^16 conv(ahi,bhi)

(negacyclic over digit positions; 2^16L == -1).  With redundant inputs
|digit| <= ~2^17 every accumulator stays below 2^26 -- exact in int32 -- and
the recombination is a shift/mask/one-digit-negacyclic-roll, all
Mosaic-friendly.  The current operand chunk is kept at STATIC position 0 by
rotating the a-planes (no dynamic indexing)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limb import carry_pass

# scoped-VMEM budget: ~8 live (block, L) planes + temporaries
_VMEM_BUDGET = 12 * 2**20
_TEMP_FUDGE = 20


def _nega_roll(v):
    """One digit position up, wrapping negated (2^(16L) == -1)."""
    return jnp.concatenate([-v[..., -1:], v[..., :-1]], axis=-1)


def _cyc_left(v):
    return jnp.concatenate([v[..., 1:], v[..., :1]], axis=-1)


def _conv_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]
    L = a.shape[-1]
    alo = a & 0xFF
    ahi = (a - alo) >> 8
    blo = b & 0xFF
    bhi = (b - blo) >> 8

    def step(i, carry):
        acc_ll, acc_m, acc_hh, blo, bhi, alo, ahi = carry
        al, ah = alo[..., 0:1], ahi[..., 0:1]
        acc_ll = acc_ll + al * blo
        acc_m = acc_m + al * bhi + ah * blo
        acc_hh = acc_hh + ah * bhi
        return (acc_ll, acc_m, acc_hh, _nega_roll(blo), _nega_roll(bhi),
                _cyc_left(alo), _cyc_left(ahi))

    z = jnp.zeros_like(a)
    acc_ll, acc_m, acc_hh, _, _, _, _ = jax.lax.fori_loop(
        0, L, step, (z, z, z, blo, bhi, alo, ahi))

    # c = acc_ll + 2^8 acc_m + 2^16 acc_hh  (per digit position, carried)
    m_lo = acc_m & 0xFF
    m_hi = (acc_m - m_lo) >> 8
    d = acc_ll + (m_lo << 8) + _nega_roll(m_hi + acc_hh)
    o_ref[:] = carry_pass(d)


def mulmod_base_fused(a, b):
    """(a * b) mod 2^(16L)+1 over a 2-D batch (B, L) of redundant digit
    vectors -> bounded redundant digits.  Pallas path of
    pointwise.mulmod_base(canonical=False)."""
    assert a.ndim == 2 and a.shape == b.shape
    B, L = a.shape
    Lpad = -(-L // 128) * 128
    per_row = _TEMP_FUDGE * Lpad * 4
    block = max(1, min(B, _VMEM_BUDGET // per_row))
    while B % block:
        block -= 1

    interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        _conv_kernel,
        grid=(B // block,),
        out_shape=jax.ShapeDtypeStruct((B, L), a.dtype),
        in_specs=[
            pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)
