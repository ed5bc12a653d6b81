"""Pallas VMEM fusion of whole transform passes.

XLA compiles each FFT stage into many small HBM-to-HBM kernels (measured:
~240 bytes touched per byte of coefficient data per transform on v5e); the
reference instead leans on cache residency via the MFA (README:74-91).  The
TPU-native equivalent of "fits in cache" is "fits in VMEM": this module runs
an ENTIRE traced transform (all log2(C) stages, twiddles, carries) inside
one Pallas kernel, so the coefficient block makes exactly one HBM round
trip per pass.

Requirements on the traced function: all exponent tables must be built from
iota (see transforms._iota_exps / revbin_iota) -- Pallas rejects captured
constant arrays.  All transform-family functions in this package satisfy
that; the sqrt2 top layer (host-static half-bit parity logic) stays outside
the kernels by design (it is a single O(C) layer).

Control: config.use_pallas() -- env MPIR_FFT_PALLAS=1/0/auto.  In auto mode
fusion activates on TPU backends only.  `interpret=True` is used on CPU for
tests."""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scoped-VMEM budget per kernel instance.  Mosaic stack-allocates the
# kernel's live temporaries: an unrolled log2(C)-stage FFT keeps ~20-30
# block-sized intermediates alive, and the lane dim pads to 128 -- both are
# modeled below (measured: a (32, 64, 64->128) block wanted 24.5M scoped).
VMEM_SCOPED_LIMIT = 12 * 2**20
TEMP_FUDGE = 28
# Mosaic compile memory/time explodes on unrolled multi-stage kernels with
# wide digit vectors: L=1024 is measured good (10^8-bit end-to-end 4.3x GMP),
# L=4096 compiles for >20 min (the 10^9-bit stall).  Cap the fused transform
# path by digit width; wider rings use per-STAGE kernels instead (below).
MAX_FUSED_L = 1024
# per-stage butterfly kernels keep only one stage's temps on the Mosaic
# stack, so they scale to much wider digit vectors
MAX_STAGE_L = 8192
STAGE_FUDGE = int(os.environ.get("MPIR_FFT_STAGE_FUDGE", "14"))
# how many consecutive butterfly stages one ladder kernel fuses (the classic
# multi-stage FFT ladder): 2^LADDER positions stay VMEM-resident through
# LADDER stages, cutting the transform's HBM round trips by that factor at
# rings wider than MAX_FUSED_L.  Re-measured round 4 with static-unrolled
# twiddles at the 10^9-bit flat shape (C=65536, L=2048, fft+ifft pair):
# 3 -> 20.7 ms, 4 -> 14.7 ms, 5 -> 18.0 ms, 6 -> Mosaic scoped-vmem OOM --
# with barrels gone, smaller groups win (bigger hb/nb blocks beat deeper
# HBM-trip savings).  Round-3 (barrel twiddles) measured 5 best.
LADDER = int(os.environ.get("MPIR_FFT_LADDER", "4"))


def ladder_stages(L: int) -> int:
    """Ladder depth (stages per kernel) serving digit width L without
    blowing Mosaic's 16M scoped-vmem stack: the sublane constraint floors
    the h-block at 8 rows, so the resident block is >= 8 * 2^k * Lpad * 4
    bytes, and the measured Mosaic stack runs ~6x the block (the 2.5e9-bit
    w=3 plans, L = 6144, overflowed at K = 16: 17.83M > 16M).  Returns
    min(LADDER, largest k whose K = 2^k fits)."""
    Lpad = -(-L // 128) * 128
    max_k = max(1, ((16 << 20) // (6 * 8 * Lpad * 4)).bit_length() - 1)
    return max(1, min(LADDER, max_k))

# diagnostics: ladder calls that took the twiddle-factorize branch, and
# ladder stages that applied their twiddles as static-unrolled shifts,
# since import.  Tests pin that their shapes actually exercise each branch
# (the cost heuristics could silently stop choosing one if LADDER or the
# level model changes, degrading a test to re-covering another path;
# ADVICE r3).
_FACTORIZED_CALLS = 0
_UNROLLED_STAGES = 0


def _padded_row_bytes(C: int, L: int, itemsize: int) -> int:
    Lpad = -(-L // 128) * 128
    Cpad = -(-C // 8) * 8
    return Cpad * Lpad * itemsize


# largest (C, L) batch row a WHOLE-transform kernel may hold: Mosaic stack-
# allocates ~19x the block for an unrolled full transform, and the hardware
# scoped-vmem ceiling is 16M -- a (256, 1024) int32 row (1 MB) measured
# 19.15M and got rejected, a (128, 1024) row (512 KB) fits.  Wider rows
# fall to the multi-stage ladder kernels, which grid the transform axis.
MAX_FUSED_ROW_BYTES = 512 * 1024


def whole_row_ok(C: int, L: int, itemsize: int = 4) -> bool:
    return _padded_row_bytes(C, L, itemsize) <= MAX_FUSED_ROW_BYTES


@functools.lru_cache(maxsize=1)
def _mode() -> str:
    return os.environ.get("MPIR_FFT_PALLAS", "auto").lower()


_FORCE = None  # test hook: True/False overrides _mode (see force_pallas)


@contextlib.contextmanager
def force_pallas(on: bool = True):
    """Force the fusion decision for a scope (tests exercise the Pallas
    kernels on CPU in interpret mode through this)."""
    global _FORCE
    prev, _FORCE = _FORCE, on
    try:
        yield
    finally:
        _FORCE = prev


def use_pallas() -> bool:
    if _FORCE is not None:
        return _FORCE
    m = _mode()
    if m in ("1", "on", "true"):
        return True
    if m in ("0", "off", "false"):
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat not in ("cpu", "gpu")


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:
        return True


def fits_vmem(*arrays) -> bool:
    total = sum(a.size * a.dtype.itemsize for a in arrays)
    return TEMP_FUDGE * total <= VMEM_SCOPED_LIMIT


def _guarded(fn):
    """Trace fn with transform auto-fusion disabled (no nested pallas)."""
    def g(*args):
        from .transforms import no_auto_fuse

        with no_auto_fuse():
            return fn(*args)
    return g


def fused(fn, x):
    """Run fn(x) -> y entirely inside one Pallas VMEM kernel."""
    fn = _guarded(fn)
    out_aval = jax.eval_shape(fn, x)

    def kernel(x_ref, o_ref):
        o_ref[:] = fn(x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_aval.shape, out_aval.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x)


def fused_batched(fn, x, out_shape=None):
    """Run fn over a 3-D array (B, C, L), gridding the batch axis into the
    largest VMEM-fitting blocks.  fn must be batch-elementwise (independent
    transforms per batch row) and shape-preserving unless out_shape given."""
    B, C, L = x.shape
    per_row = TEMP_FUDGE * _padded_row_bytes(C, L, x.dtype.itemsize)
    block = max(1, min(B, VMEM_SCOPED_LIMIT // per_row))
    while B % block:
        block -= 1
    if out_shape is None:
        out_shape = x.shape
    fn = _guarded(fn)

    def kernel(x_ref, o_ref):
        o_ref[:] = fn(x_ref[:])

    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        in_specs=[pl.BlockSpec((block, C, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block,) + tuple(out_shape[1:]),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x)


def fused_batched_idx(fn, x, scalar=None):
    """Like fused_batched, but fn(block, start) also receives the absolute
    start index of its batch block (traced scalar) -- for per-batch-row
    twiddle tables (MFA cross exponents).

    `scalar`: optional traced int32 (e.g. a shard_map device offset); it is
    fed to the kernel through SMEM (Pallas kernels cannot close over traced
    values) and fn is called as fn(block, start, scalar)."""
    B, C, L = x.shape
    per_row = TEMP_FUDGE * _padded_row_bytes(C, L, x.dtype.itemsize)
    block = max(1, min(B, VMEM_SCOPED_LIMIT // per_row))
    while B % block:
        block -= 1
    fn = _guarded(fn)
    has_sc = scalar is not None

    def kernel(*refs):
        start = pl.program_id(0) * block
        if has_sc:
            sc_ref, x_ref, o_ref = refs
            o_ref[:] = fn(x_ref[:], start, sc_ref[0])
        else:
            x_ref, o_ref = refs
            o_ref[:] = fn(x_ref[:], start)

    blk_spec = pl.BlockSpec((block, C, L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [blk_spec]
    ins = [x]
    if has_sc:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        ins.insert(0, jnp.asarray(scalar, jnp.int32).reshape(1))
    return pl.pallas_call(
        kernel,
        grid=(B // block,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, C, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*ins)


def maybe_fused(fn, x):
    """fused(fn, x) when enabled and the whole array fits VMEM, else fn(x)."""
    if use_pallas() and fits_vmem(x, x):
        return fused(fn, x)
    return fn(x)


def fused_butterfly_ladder(kind: str, xp, steps: tuple, W: int, pe=None,
                           pre_half=None):
    """k = len(steps) consecutive FFT stages' butterflies in ONE kernel pass
    (the classic multi-stage ladder): a VMEM block spanning K = 2^k tree
    positions stays resident through all k stages, so the coefficient matrix
    makes one HBM round trip per GROUP instead of one per stage.  This is
    what makes rings wider than MAX_FUSED_L (whose whole-transform kernels
    blow the Mosaic compile budget) fast.

    xp: (N, K, h, L) int32 -- each batch row holds one length-(K*h) DIF
    block group; position p of the block sits at K-index p // h, h-index
    p % h.  Stage j (forward execution order) pairs K-indices (q, q+m),
    m = K >> (j+1), with twiddle exponent i * steps[j] for
    i = (q % m) * h + hpos (hpos = absolute h-index), built from iota inside
    the kernel.  kind 'fwd' runs j = 0..k-1 (ref FFT_radix2 recursion
    levels, mul_fft.c:786-827); 'inv' runs j = k-1..0 with inverse
    butterflies (ref IFFT_radix2, mul_fft.c:1444-1486).

    pe: optional (N, K//2, 2) exponent table for the INNERMOST stage
    (j = k-1, where m == 1) -- the fused last/first-stage twiddles of
    FFT/IFFT_radix2_twiddle (ref mul_fft.c:1406-1419, 1964-2010); callers
    pass it only when the group ends at the transform's last stage (h == 1).
    fwd: s = (a+b) * 2^pe[:,:,0], t = (a-b) * 2^(i*step + pe[:,:,1]).
    inv: s' = s / 2^pe[:,:,0], t' = t / 2^(i*step + pe[:,:,1]).

    pre_half: optional (e0, step2) half-bit twiddle x[j] *= 2^((e0 +
    j*step2)/2) applied to the block BEFORE the first stage (fwd only,
    j = absolute transform position q*h + hpos) -- the sqrt2 top layer's
    t-leg twiddle (ref mul_fft.c:591-634) rides the first ladder group's
    HBM round trip instead of costing its own pass + temp materialization
    (the zero-top staged forward's twiddle_half).

    Twiddle factorization (Cooley-Tukey): stage j's exponent
    (qm*h + hpos)*steps[j] splits into a qm-part and an hpos-part, and the
    hpos-parts of ALL k stages compose to ONE per-output factor
    z^(hpos * steps[0] * revbin_k(p)) (the same accumulation that makes the
    reference's FFT_radix2_twiddle leaf twiddles equal a revbin-indexed
    output twiddle, mul_fft.c:1397-1442).  When that is cheaper -- statically
    decidable from the barrel-shift level counts -- the kernel runs the k
    stages with qm-only exponents (gcd h*steps[j], huge: the barrel skips
    almost all levels) plus one combined full-barrel twiddle pass, instead
    of k full-barrel passes.  Measured at the 10^9-bit flat shape this
    halves the transform kernels' twiddle compute (the round-2 residual
    the static-gcd hint left, TODO:109-122's motif done TPU-style)."""
    from .butterfly import butterfly_fwd, butterfly_inv
    from .limb import carry_pass, div_2expmod, shift_mod
    from .transforms import no_auto_fuse

    N, K, h, L = xp.shape
    k = K.bit_length() - 1
    assert K == 1 << k and len(steps) == k
    has_pe = pe is not None
    assert not has_pe or h == 1, "pe is a last-stage (h == 1) table"

    def _lvls(step_gcd: int) -> int:
        # active barrel levels + bit-shift cost of one shift_mod pass whose
        # exponents are multiples of step_gcd (mirrors limb.shift_mod's
        # clamp/start_bit logic)
        g = 1
        while step_gcd % (2 * g) == 0 and W % (2 * g) == 0:
            g *= 2
        nbits = max(1, (L - 1).bit_length())
        if g >= 16:
            return max(0, nbits - (g.bit_length() - 5))
        return nbits + 1

    Lpad = -(-L // 128) * 128
    R = max(K, VMEM_SCOPED_LIMIT // (STAGE_FUDGE * Lpad * xp.dtype.itemsize))
    hb = min(h, 1 << max(0, (R // K).bit_length() - 1))
    while h % hb:
        hb //= 2
    if hb < 8 and hb != h:
        # Mosaic sublane constraint: block dims divisible by 8 or whole-dim
        # (h is a power of two, so min(h, 8) divides h); may exceed the soft
        # VMEM budget slightly -- the scoped limit is conservative
        hb = min(h, 8)
    nb = max(1, min(N, R // (K * hb)))
    while N % nb:
        nb -= 1
    grid = (N // nb, h // hb)

    # Static-unroll twiddles: a stage whose exponents are STATIC per block
    # position (factorize mode: e = qm * h*steps[j]; or h == hb so hpos is
    # the block-local index: e = (qm*h + r)*steps[j]) applies them as a
    # python-unrolled loop of static shift_mod slices along the (qm[, r])
    # axes -- ONE data pass (static negacyclic roll + static bit shift per
    # slice), instead of a per-row barrel of up to log2(L)+1 roll+select
    # levels.  This is the shift-decomposition motif (ref mul_fft.c:525-541,
    # TODO:109-122) taken to its TPU endpoint: when the exponent is known at
    # trace time, NO selects at all.  VERDICT r3's top item.
    _UNROLL_MAX = 64
    static_hpos = h == hb   # grid dim 1: absolute hpos == local index
    # per-stage twiddle cost (data passes) under each mode; m_j = K >> (j+1)
    def _cost_nofact(j):
        if static_hpos and (K >> (j + 1)) <= _UNROLL_MAX:
            return 2 if hb > 1 else 1   # qm pass + r pass
        return _lvls(steps[j])

    def _cost_fact(j):
        if (K >> (j + 1)) <= _UNROLL_MAX:
            return 1
        return _lvls(h * steps[j])

    factorize = (
        h > 1 and not has_pe
        and sum(_cost_fact(j) for j in range(k)) + _lvls(steps[0])
        < sum(_cost_nofact(j) for j in range(k))
    )
    if factorize:
        global _FACTORIZED_CALLS
        _FACTORIZED_CALLS += 1
    spec = pl.BlockSpec((nb, K, hb, L), lambda i, j: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)
    spec_pe = pl.BlockSpec((nb, K // 2, 2), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    order = range(k) if kind == "fwd" else range(k - 1, -1, -1)

    def _group_twiddle(x, inverse: bool):
        # the composed hpos-part of the group's twiddles:
        # z^(hpos * steps[0] * revbin_k(p)) on every (p, hpos) element of
        # the (nb, K, hb, L) block, ONE full-barrel pass (divides if inverse)
        p = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1, 1), 1)
        r = jnp.zeros_like(p)
        for b in range(k):
            r = r | (((p >> b) & 1) << (k - 1 - b))
        hpos = pl.program_id(1) * hb + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, hb, 1), 2)
        e = ((hpos * jnp.int32(steps[0])) % jnp.int32(2 * W)) * r
        g = steps[0] & -steps[0]
        if inverse:
            return div_2expmod(x, e % jnp.int32(2 * W), W, gcd=g)
        return shift_mod(x, e, W, gcd=g)

    assert pre_half is None or kind == "fwd"

    def _static_shift(v, j, inverse: bool):
        # v: (nb, nblk, m, hb, L) -- apply the stage twiddle as python-
        # unrolled STATIC shift_mod slices (static roll + static bit shift,
        # zero selects).  factorize: e = qm * h*steps[j] (qm axis only);
        # else (static_hpos) e = (qm*h + r)*steps[j], decomposed into TWO
        # sequential single-axis passes (m + hb slices, not m*hb).
        m = v.shape[2]
        sgn = -1 if inverse else 1

        def pass_axis(x, axis, count, mult):
            if count == 1 or mult % (2 * W) == 0:
                return x
            sls = []
            for i in range(count):
                idx = [slice(None)] * 5
                idx[axis] = slice(i, i + 1)
                e = (sgn * i * mult) % (2 * W)
                sls.append(shift_mod(x[tuple(idx)], e, W))
            return jnp.concatenate(sls, axis=axis)

        x = pass_axis(v, 2, m, h * steps[j])
        if not factorize:
            x = pass_axis(x, 3, hb, steps[j])
        return x

    def kernel(*refs):
        x = refs[0][...]
        pe_blk = refs[1][...] if has_pe else None
        o_ref = refs[-1]
        with no_auto_fuse():
            if pre_half is not None:
                e0, st2 = pre_half
                jq = jax.lax.broadcasted_iota(
                    jnp.int32, (1, K, hb, 1), 1) * jnp.int32(h)
                hp = pl.program_id(1) * hb + jax.lax.broadcasted_iota(
                    jnp.int32, (1, K, hb, 1), 2)
                x = _twiddle_half_rows(x, jq + hp, st2, W, extra2=e0)
            if factorize and kind == "inv":
                x = _group_twiddle(x, inverse=True)
            for j in order:
                m = K >> (j + 1)
                xr = x.reshape(nb, K // (2 * m), 2, m, hb, L)
                a, b = xr[:, :, 0], xr[:, :, 1]
                pes = pet = None
                if has_pe and j == k - 1:   # m == 1, hb == 1
                    pes = pe_blk[:, :, 0].reshape(nb, K // 2, 1, 1, 1)
                    pet = pe_blk[:, :, 1].reshape(nb, K // 2, 1, 1, 1)
                unroll = (pes is None and pet is None and m <= _UNROLL_MAX
                          and (factorize or static_hpos))
                if unroll:
                    # static exponents: unrolled static shifts, no barrel
                    global _UNROLLED_STAGES
                    _UNROLLED_STAGES += 1
                    if kind == "fwd":
                        s, t = a + b, _static_shift(a - b, j, inverse=False)
                    else:
                        hh = _static_shift(b, j, inverse=True)
                        s, t = a + hh, a - hh
                    x = jnp.stack([s, t], axis=2).reshape(nb, K, hb, L)
                    continue
                qm = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, m, hb, 1), 2)
                if factorize:
                    # hpos-free stage exponents: gcd h*steps[j], so the
                    # barrel runs ~log2(m) levels instead of ~log2(L)
                    e = qm * jnp.int32((h * steps[j]) % (2 * W))
                    g = (h * steps[j]) & -(h * steps[j])
                else:
                    hpos = pl.program_id(1) * hb + jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, m, hb, 1), 3)
                    e = (qm * jnp.int32(h) + hpos) * jnp.int32(steps[j])
                    # every e is a multiple of steps[j]: static hint for the
                    # twiddle's barrel shifter (limb.shift_mod gcd)
                    g = steps[j] & -steps[j]
                if kind == "fwd":
                    e_t = e if pet is None else e + pet
                    s, t = butterfly_fwd(a, b, e_t, W, e_s=pes,
                                         gcd_t=1 if pet is not None else g,
                                         carry=False)
                else:
                    s, t = butterfly_inv(a, b, e, W, e_s=pes, e_t=pet,
                                         gcd_t=1 if pet is not None else g,
                                         carry=False)
                x = jnp.stack([s, t], axis=2).reshape(nb, K, hb, L)
            if factorize and kind == "fwd":
                x = _group_twiddle(x, inverse=False)
        # deferred carry: stages above run carry-free (digit magnitude
        # roughly doubles per stage, ~2^(18+k) after k <= LADDER stages,
        # far inside int32); ONE whole-block sweep here restores the
        # ~2^17 inter-kernel invariant at a third of the per-stage cost
        o_ref[...] = carry_pass(x)

    in_specs = [spec] + ([spec_pe] if has_pe else [])
    ins = [xp] + ([pe] if has_pe else [])
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((N, K, h, L), xp.dtype),
        in_specs=in_specs,
        out_specs=spec,
        interpret=_interpret(),
    )(*ins)

def _pick_row_block(B: int, R: int) -> int:
    """Largest row-block size rb <= R with B % rb == 0 and rb % 8 == 0 (the
    Mosaic sublane constraint: block dims must be divisible by 8 or equal
    the full array dim).  Falls back to the whole array when B has no
    suitable divisor."""
    rb = min(B, max(8, (R // 8) * 8))
    rb -= rb % 8
    while rb >= 8:
        if B % rb == 0:
            return rb
        rb -= 8
    return B


def fused_rows(fn, x, fudge: int = 16):
    """Run a row-elementwise fn over [..., L] digit vectors in one Pallas
    pass: rows stream through VMEM in blocks, so multi-pass row-local scans
    (normmod's exact carry scan, ripple masks) cost one HBM round trip
    instead of dozens.  fn must treat every leading axis elementwise."""
    import math

    lead = x.shape[:-1]
    L = x.shape[-1]
    B = math.prod(lead) if lead else 1
    flat = x.reshape(B, L)
    Lpad = -(-L // 128) * 128
    rb = _pick_row_block(B, VMEM_SCOPED_LIMIT // (fudge * Lpad * x.dtype.itemsize))
    fn = _guarded(fn)

    def kernel(x_ref, o_ref):
        o_ref[...] = fn(x_ref[...])

    out = pl.pallas_call(
        kernel,
        grid=(B // rb,),
        out_shape=jax.ShapeDtypeStruct((B, L), x.dtype),
        in_specs=[pl.BlockSpec((rb, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(flat)
    return out.reshape(x.shape)

def fused_twiddle_half(x, e0: int, step: int, W: int, h: int):
    """Half-bit twiddle x[..., j, :] * 2^((e0 + j*step)/2) mod p in ONE
    Pallas pass (ref sqrt2 butterfly two-phase shift, mul_fft.c:591-634).

    The unfused path costs ~28 HBM passes (two/three barrel-shift shift_mods
    plus selects); here the whole computation -- exponent from iota, plain
    shift for even half-exponents, hi-lo sqrt2 combination for odd -- runs on
    VMEM row blocks.  j is the index along axis -2 (length h, any value);
    leading axes replicate."""
    from .limb import carry_pass, shift_mod
    from .transforms import no_auto_fuse

    L = x.shape[-1]
    assert x.shape[-2] == h
    lead = x.shape[:-1]
    import math

    B = math.prod(lead)
    flat = x.reshape(B, L)
    Lpad = -(-L // 128) * 128
    rb = _pick_row_block(B, VMEM_SCOPED_LIMIT // (14 * Lpad * x.dtype.itemsize))

    def kernel(x_ref, o_ref):
        xb = x_ref[...]
        start = pl.program_id(0) * rb
        j = (start + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)) % h
        with no_auto_fuse():
            o_ref[...] = _twiddle_half_rows(xb, j, step, W, extra2=e0)

    out = pl.pallas_call(
        kernel,
        grid=(B // rb,),
        out_shape=jax.ShapeDtypeStruct((B, L), x.dtype),
        in_specs=[pl.BlockSpec((rb, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(flat)
    return out.reshape(x.shape)

def fused_canonicalize_plain(x):
    """Exact non-modular carry canonicalization of a huge nonnegative digit
    vector (the final combine's carrying add, ref FFT_combine_bits
    mul_fft.c:207-267) in ~2.5 HBM round trips instead of the ~30 whole-
    array passes of the flat doubling scan.  1-D, or 2-D with INDEPENDENT
    rows (the batched mul_many combine -- round 5: the batch path fell to
    the unfused scan, half the batch8@10^7 regression).

    Classic two-level carry scan: each vector is viewed as (R, C2) rows;
    kernel A bounds digits row-locally (two carry passes, boundary carries
    out as per-row scalars) and emits per-row generate/propagate summaries;
    a tiny host-level (g, p) scan over the R row summaries (per batch row,
    never crossing batch boundaries) produces each row's incoming carry;
    kernel B applies the exact row-local carry scan seeded with that carry.
    Digit contract matches split.canonicalize_plain: input digits
    nonnegative < ~2^20, true value fits each vector."""
    if x.ndim == 2:
        Bt, N = x.shape
    else:
        (N,) = x.shape
        Bt = 1
    C2 = 4096
    R = -(-N // C2)
    R8 = -(-R // 8) * 8
    pad = R8 * C2 - N
    # pad on the original shape: a pre-reshape would dispatch an extra
    # whole-array copy (2 GB at the 4e9-bit combine)
    xp = (jnp.concatenate([x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)],
                          axis=-1) if pad else x)
    rows = xp.reshape(Bt * R8, C2)
    rb = _pick_row_block(Bt * R8,
                         VMEM_SCOPED_LIMIT // (16 * C2 * x.dtype.itemsize))
    spec = pl.BlockSpec((rb, C2), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    M16 = (1 << 16) - 1   # python literal: kernels cannot capture jnp scalars

    def kernel_a(x_ref, y_ref, t_ref, g_ref, p_ref):
        d = x_ref[...]
        t = jnp.zeros_like(d[:, :1])
        for _ in range(2):
            c = d >> 16
            r = d - (c << 16)
            t = t + c[:, -1:]
            d = r + jnp.concatenate(
                [jnp.zeros_like(c[:, :1]), c[:, :-1]], axis=-1
            )
        y_ref[...] = d
        t_ref[...] = t
        # row (generate, propagate) over digits 1..C2-1; digit 0 is updated
        # later (it receives the previous row's boundary carry), so it
        # enters as the identity transition here
        idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        g = jnp.where(idx == 0, 0, d >> 16)
        p = jnp.where(idx == 0, 1, jnp.where((d & M16) == M16, 1, 0))
        # suffix-AND of p (propagate of everything above digit i)
        sp = p
        k = 1
        while k < C2:
            nxt = jnp.concatenate(
                [sp[:, k:], jnp.ones_like(sp[:, :k])], axis=-1
            )
            sp = sp & nxt
            k *= 2
        sp_excl = jnp.concatenate([sp[:, 1:], jnp.ones_like(sp[:, :1])], axis=-1)
        g_ref[...] = jnp.max(g & sp_excl, axis=-1, keepdims=True)
        p_ref[...] = jnp.min(p, axis=-1, keepdims=True)

    y, t, g_rest, p_rest = pl.pallas_call(
        kernel_a,
        grid=(Bt * R8 // rb,),
        out_shape=(
            jax.ShapeDtypeStruct((Bt * R8, C2), x.dtype),
            jax.ShapeDtypeStruct((Bt * R8, 1), x.dtype),
            jax.ShapeDtypeStruct((Bt * R8, 1), x.dtype),
            jax.ShapeDtypeStruct((Bt * R8, 1), x.dtype),
        ),
        in_specs=[spec],
        out_specs=(spec, spec1, spec1, spec1),
        interpret=_interpret(),
    )(rows)

    # host-level (R8-element, per batch row) scan: fold the boundary carry
    # into digit 0's transition, compose with the rest of the row,
    # exclusive (g, p) scan.  Shifts run along the R8 axis of a (Bt, R8, 1)
    # view so carries never cross batch boundaries.
    def shift_seg(v, fill):
        v3 = v.reshape(Bt, R8, 1)
        pad3 = jnp.full_like(v3[:, :1], fill)
        return jnp.concatenate([pad3, v3[:, :-1]], axis=1).reshape(v.shape)

    t_shift = shift_seg(t, 0)
    y0 = y[:, :1] + t_shift
    g0 = y0 >> 16
    p0 = jnp.where((y0 & M16) == M16, 1, 0)
    G = g_rest | (p_rest & g0)
    P = p_rest & p0
    G3 = G.reshape(Bt, R8, 1)
    P3 = P.reshape(Bt, R8, 1)
    k = 1
    while k < R8:
        gs = jnp.concatenate(
            [jnp.zeros_like(G3[:, :k]), G3[:, :-k]], axis=1)
        ps = jnp.concatenate(
            [jnp.ones_like(P3[:, :k]), P3[:, :-k]], axis=1)
        G3 = G3 | (P3 & gs)
        P3 = P3 & ps
        k *= 2
    row_cin = shift_seg(G3.reshape(Bt * R8, 1), 0)

    def kernel_b(y_ref, ts_ref, rc_ref, o_ref):
        yv = y_ref[...]
        idx = jax.lax.broadcasted_iota(jnp.int32, yv.shape, 1)
        yv = yv + jnp.where(idx == 0, ts_ref[...], 0)
        rc = rc_ref[...]
        g = yv >> 16
        p = jnp.where((yv & M16) == M16, 1, 0)
        k = 1
        while k < C2:
            gs = jnp.concatenate([jnp.zeros_like(g[:, :k]), g[:, :-k]], axis=-1)
            ps = jnp.concatenate([jnp.ones_like(p[:, :k]), p[:, :-k]], axis=-1)
            g = g | (p & gs)
            p = p & ps
            k *= 2
        gx = jnp.concatenate([jnp.zeros_like(g[:, :1]), g[:, :-1]], axis=-1)
        px = jnp.concatenate([jnp.ones_like(p[:, :1]), p[:, :-1]], axis=-1)
        cin = gx | (px & rc)
        o_ref[...] = (yv + cin) & M16

    out = pl.pallas_call(
        kernel_b,
        grid=(Bt * R8 // rb,),
        out_shape=jax.ShapeDtypeStruct((Bt * R8, C2), x.dtype),
        in_specs=[spec, spec1, spec1],
        out_specs=spec,
        interpret=_interpret(),
    )(y, t_shift, row_cin)
    flat = out.reshape(Bt, R8 * C2)[:, :N]
    return flat.reshape(x.shape)


def _twiddle_half_rows(x, j, w: int, W: int, extra2: int = 0):
    """Kernel-body helper: x[r] * 2^((j[r] * w + extra2) / 2) mod p for a
    per-row index column j (broadcastable to x[..., :1]; half-bit exponents,
    the sqrt2 machinery of ops/sqrt2.twiddle_half on VMEM row blocks).

    One barrel shift, not three: 2^(k + 3W/4) = 2^k * 2^(3W/4) and the
    3W/4 / W/4 offsets are STATIC digit rotations of the shared 2^k value
    (3x less twiddle compute, and few enough live temps that the pre_half
    fusion fits Mosaic's 16M scoped-vmem stack at L = 2048)."""
    from .limb import carry_pass, shift_digits_static, shift_mod

    L = x.shape[-1]
    e2 = (j * jnp.int32(w) + jnp.int32(extra2)) % jnp.int32(4 * W)
    k = e2 >> 1
    odd = e2 & 1
    base = shift_mod(x, k % (2 * W), W)
    if L % 4 == 0:
        hi = shift_digits_static(base, (3 * L) // 4)
        lo = shift_digits_static(base, L // 4)
    else:   # sub-digit W/4 offset: tiny rings only
        hi = shift_mod(x, (k + 3 * W // 4) % (2 * W), W)
        lo = shift_mod(x, (k + W // 4) % (2 * W), W)
    return jnp.where(odd == 1, carry_pass(hi - lo), base)


def fused_sqrt2_top_fwd(a, b, w: int, W: int):
    """Forward sqrt2 top layer in ONE kernel pass (ref top-stage butterfly
    loop of FFT_radix2_(mfa_)truncate_sqrt2, mul_fft.c:1230-1288, 2232-2265):

        s_j = carry(a_j + b_j),   t_j = (a_j - b_j) * 2^(j w / 2)

    a, b: [..., h, L] (b rows past the truncation point must be zero -- the
    truncated-input contract -- which makes the layer branchless: s then
    VALUE-equals a and t equals a * q^j there).  Returns (s, t).  The
    unfused path costs ~4 separate programs over the halves (measured 30 ms
    at the 10^9-bit shape); here both outputs stream from one read."""
    from .limb import carry_pass
    from .transforms import no_auto_fuse

    h, L = a.shape[-2], a.shape[-1]
    lead = a.shape[:-2]
    import math

    B = math.prod(lead) * h if lead else h
    af = a.reshape(B, L)
    bf = b.reshape(B, L)
    Lpad = -(-L // 128) * 128
    rb = _pick_row_block(B, VMEM_SCOPED_LIMIT // (16 * Lpad * a.dtype.itemsize))

    def kernel(a_ref, b_ref, s_ref, t_ref):
        av, bv = a_ref[...], b_ref[...]
        start = pl.program_id(0) * rb
        j = (start + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)) % h
        with no_auto_fuse():
            s_ref[...] = carry_pass(av + bv)
            t_ref[...] = _twiddle_half_rows(av - bv, j, w, W)

    spec = pl.BlockSpec((rb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    s, t = pl.pallas_call(
        kernel,
        grid=(B // rb,),
        out_shape=(jax.ShapeDtypeStruct((B, L), a.dtype),) * 2,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=_interpret(),
    )(af, bf)
    return s.reshape(a.shape), t.reshape(a.shape)


def fused_sqrt2_top_inv(sl, orr, kpos: int, w: int, W: int,
                        norm_div: int = 0):
    """Inverse sqrt2 top-layer merge in ONE kernel pass (ref cross
    butterflies of IFFT_radix2_(mfa_)truncate_sqrt2, mul_fft.c:1832-1846,
    2700-2730): u_j = oR_j * 2^(-j w / 2),  xa_j = carry(sL_j + u_j),
    xb_j = carry(sL_j - u_j) for j < kpos.  sl, orr: [..., kpos, L].
    Returns (xa, xb).

    norm_div > 0: additionally divide both outputs by 2^norm_div and
    canonicalize (limb.normmod) while they are VMEM-resident -- the
    drivers' scale+normalize tail (mul_fft.c:3658-3662) costs no extra HBM
    pass this way."""
    from .limb import _normmod_core, carry_pass, shift_mod
    from .transforms import no_auto_fuse

    L = sl.shape[-1]
    lead = sl.shape[:-2]
    import math

    B = math.prod(lead) * kpos if lead else kpos
    sf = sl.reshape(B, L)
    of = orr.reshape(B, L)
    Lpad = -(-L // 128) * 128
    fudge = 24 if norm_div else 16
    rb = _pick_row_block(B, VMEM_SCOPED_LIMIT // (fudge * Lpad * sl.dtype.itemsize))
    sdiv = (2 * W - norm_div) % (2 * W)

    def post(x):
        # normmod's own bounding passes subsume the usual carry_pass
        if not norm_div:
            return carry_pass(x)
        return _normmod_core(shift_mod(x, sdiv, W))

    def kernel(s_ref, o_ref, xa_ref, xb_ref):
        sv, ov = s_ref[...], o_ref[...]
        start = pl.program_id(0) * rb
        j = (start + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)) % kpos
        with no_auto_fuse():
            u = _twiddle_half_rows(ov, -j, w, W)
            xa_ref[...] = post(sv + u)
            xb_ref[...] = post(sv - u)

    spec = pl.BlockSpec((rb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    xa, xb = pl.pallas_call(
        kernel,
        grid=(B // rb,),
        out_shape=(jax.ShapeDtypeStruct((B, L), sl.dtype),) * 2,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=_interpret(),
    )(sf, of)
    return xa.reshape(sl.shape), xb.reshape(sl.shape)
