"""Out-of-core flagship pipeline (models/huge.py) vs the big-int oracle,
at tiny shapes: the chunked pass engine is shape-agnostic, so every layout
case (even w; odd w with trunc <= and > the half length) runs here on CPU
with multiple chunks per pass (CHUNK knobs shrunk via monkeypatch)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpir_fft_tpu.models import huge
from mpir_fft_tpu.ops.limb import DIGIT_BITS, digits_from_int, int_from_digits
from mpir_fft_tpu.utils.params import MulPlan, cdiv, plan_for_depth, validate


def _run(plan, ba, bb, rng, square=False):
    a = int.from_bytes(rng.bytes(ba // 8), "little") | (1 << (ba - 8))
    b = a if square else (int.from_bytes(rng.bytes(bb // 8), "little") | 1)
    da = jnp.asarray(digits_from_int(a, cdiv(ba, DIGIT_BITS)))
    if square:
        out = huge.sqr_huge(da, plan)
    else:
        db = jnp.asarray(digits_from_int(b, cdiv(bb, DIGIT_BITS)))
        out = huge.mul_huge(da, db, plan)
    got = int_from_digits(np.asarray(out))
    assert got == a * b, (plan, ba, bb)


CASES = [
    # (bits_a, bits_b, depth) -> layout case asserted below
    pytest.param(100_000, 100_000, 7, "odd_t_gt_h", id="odd-t>h"),
    pytest.param(50_000, 50_000, 5, "even", id="even-w"),
    pytest.param(150_000, 150_000, 7, "even", id="even-w-deep"),
]


@pytest.fixture(autouse=True)
def _small_chunks(monkeypatch):
    # force multiple chunks/blocks per pass at test sizes
    monkeypatch.setattr(huge, "CHUNK_BYTES", 64 << 10)
    monkeypatch.setattr(huge, "PW_CHUNK_BYTES", 64 << 10)


@pytest.mark.parametrize("ba,bb,depth,case", CASES)
def test_mul_huge_exact(ba, bb, depth, case, rng):
    plan = plan_for_depth(ba, bb, depth, sqrt2=True)
    h = plan.conv_len // 2
    got_case = (
        "even" if plan.w % 2 == 0
        else ("odd_t_le_h" if plan.trunc_mfa <= h else "odd_t_gt_h")
    )
    assert got_case == case, "plan drifted; update CASES"
    assert huge.huge_serves(plan)
    _run(plan, ba, bb, rng)


def test_mul_huge_odd_t_le_h(rng):
    # planners never waste half the convolution, so hand-build the
    # odd-w trunc <= h layout with a wider-than-minimal ring
    plan = validate(MulPlan(6, 7, 160, 63, 63, 10_000, 10_000, True))
    assert plan.w % 2 == 1 and plan.trunc_mfa <= plan.conv_len // 2
    assert huge.huge_serves(plan)
    _run(plan, 10_000, 10_000, rng)


def test_sqr_huge_exact(rng):
    plan = plan_for_depth(100_000, 100_000, 7, sqrt2=True)
    assert plan.w % 2 == 1 and plan.trunc_mfa > plan.conv_len // 2
    _run(plan, 100_000, 100_000, rng, square=True)


def test_mul_huge_sharded(rng):
    """The sharded out-of-core flavor: every transform pass distributes its
    column blocks / row groups over an 8-device mesh (models.huge ctx
    plumbing; ref anchor: the stride-n1 column walk, mul_fft.c:2035-2051),
    bit-exact with multiple chunks per pass.  Covers the odd-w t > h
    composite (all three col-pass call sites) and squaring."""
    import jax
    from jax.sharding import Mesh

    from mpir_fft_tpu.parallel.mfa_sharded import ShardCtx

    mesh = Mesh(np.array(jax.devices()[:8]), ("cols",))
    ctx = ShardCtx(mesh)
    ba = bb = 100_000
    plan = plan_for_depth(ba, bb, 7, sqrt2=True)
    assert plan.w % 2 == 1 and plan.trunc_mfa > plan.conv_len // 2
    assert plan.n1 % ctx.ndev == 0
    a = int.from_bytes(rng.bytes(ba // 8), "little") | 1
    b = int.from_bytes(rng.bytes(bb // 8), "little") | 1
    da = jnp.asarray(digits_from_int(a, cdiv(ba, DIGIT_BITS)))
    db = jnp.asarray(digits_from_int(b, cdiv(bb, DIGIT_BITS)))
    got = int_from_digits(np.asarray(huge.mul_huge(da, db, plan, ctx=ctx)))
    assert got == a * b, "sharded out-of-core multiply mismatch"
    got_sq = int_from_digits(np.asarray(huge.sqr_huge(da, plan, ctx=ctx)))
    assert got_sq == a * a, "sharded out-of-core squaring mismatch"


def test_huge_matches_flagship(rng):
    """Same product through the monolithic flagship and the out-of-core
    pipeline (pins inter-path equivalence, not just oracle correctness)."""
    from mpir_fft_tpu.models.mul import mpn_mul_flagship

    ba = bb = 100_000
    plan = plan_for_depth(ba, bb, 7, sqrt2=True)
    a = int.from_bytes(rng.bytes(ba // 8), "little") | 1
    b = int.from_bytes(rng.bytes(bb // 8), "little") | 1
    da = jnp.asarray(digits_from_int(a, cdiv(ba, DIGIT_BITS)))
    db = jnp.asarray(digits_from_int(b, cdiv(bb, DIGIT_BITS)))
    ref = int_from_digits(np.asarray(mpn_mul_flagship(da, db, plan)))
    got = int_from_digits(np.asarray(huge.mul_huge(da, db, plan)))
    assert got == ref == a * b
