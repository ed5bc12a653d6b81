"""Per-stage profiling of the multiply pipeline.

The reference has no profiling at all -- its time_* harnesses loop whole
multiplies and wall-clock comes from an external timer (mul_fft.c:5105-5457,
SURVEY.md section 5).  Here each pipeline stage (split+forward transform,
pointwise product, inverse transform, normalize, combine) is compiled and
timed separately on the attached device, using the chained-execution recipe
from bench.py: the attached TPU can report readiness before cost is visible,
so every measured repetition feeds the previous output back in and the loop
closes with a scalar fetch.

Entry: profile_stages(bits, reps) -> dict of stage -> seconds; also exposed
as `python -m mpir_fft_tpu.cli profile --bits N`.
"""

from __future__ import annotations

import time

import numpy as np


def _timed(fn, *args, reps: int = 8) -> tuple[float, object]:
    """Chained timing with ONE closing fetch: a per-rep fetch would add the
    tunnel's full round trip (~30 ms measured) to every stage.  Each rep's
    first input gains a data dependency on the previous output (a scalar
    that is always zero, which the runtime cannot know without executing),
    so reps serialize without host round trips and cannot be deduplicated.

    reps must be large enough to reach PIPELINED steady state: the tunnel's
    ~26 ms dispatch latency overlaps device execution only once several
    dispatches are queued (measured: a 512 MB copy reads 91 ms/rep at 6 reps
    but 6 ms/rep at 12).  Never .delete() inside the timed region (each
    delete is a ~50 ms tunnel round trip).

    Warmup is a short UNTIMED chain, not one execution: the first chained
    executions of a program in a process run ~7-10x slow (tunnel buffer-pool
    / allocator ramp; measured 0.43 s/rep -> 0.042 s/rep for the identical
    10^9-bit combine program immediately after), and a single fetched call
    does not get past it."""
    import jax.numpy as jnp

    out = fn(*args)
    _ = int(jnp.sum(out))          # compile + one real fetched execution
    out.delete()
    dep = jnp.zeros((), args[0].dtype)
    warm = []
    for _ in range(3):             # untimed chain reaching steady state
        out = fn(args[0] + dep, *args[1:])
        dep = out[(0,) * out.ndim] * 0
        warm.append(out)
    _ = int(dep)
    for o in warm:
        o.delete()
    dep = jnp.zeros((), args[0].dtype)
    outs = []
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(args[0] + dep, *args[1:])
        dep = out[(0,) * out.ndim] * 0
        outs.append(out)
    _ = int(dep)                   # single fetch closes the chain
    dt = (time.perf_counter() - t0) / reps
    for o in outs[:-1]:
        o.delete()
    return dt, out


def profile_stages(bits: int, reps: int = 8, driver: str = "flagship") -> dict:
    """Stage wall-times of the (flagship) multiply at `bits`-bit operands."""
    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu.models.mul import DRIVERS, _pointwise, out_len_digits
    from mpir_fft_tpu.ops.limb import DIGIT_BITS, Ring, normmod_div
    from mpir_fft_tpu.ops.mfa import mfa_fft_trunc_sqrt2, mfa_ifft_trunc_sqrt2
    from mpir_fft_tpu.ops.split import fft_combine_bits, fft_split_bits
    from mpir_fft_tpu.utils.params import cdiv, choose_params

    assert driver == "flagship", "stage profile covers the flagship pipeline"
    from mpir_fft_tpu.models.mul import _inner_leg, flagship_is_staged

    plan = choose_params(bits, bits, sqrt2=DRIVERS[driver][1])
    ring = Ring(plan.n, plan.w)
    W, n1, t = plan.W, plan.n1, plan.trunc_mfa
    staged = flagship_is_staged(plan)
    inner = _inner_leg(plan)

    rng = np.random.default_rng(0)
    L = cdiv(bits, DIGIT_BITS)
    da = jnp.asarray(rng.integers(0, 1 << 16, L, dtype=np.int64).astype(np.int32))
    db = jnp.asarray(rng.integers(0, 1 << 16, L, dtype=np.int64).astype(np.int32))

    @jax.jit
    def fwd(d):
        ia = fft_split_bits(d, plan.bits1, plan.conv_len, ring.L)
        return mfa_fft_trunc_sqrt2(ia, plan.w, W, n1, t)[..., :t, :]

    @jax.jit
    def pw(fa, fb):
        # staged production path fuses the row-IFFT leg into the pointwise
        # program (models.mul._staged_flagship pw_rows_chunk; ref combined
        # variant mul_fft.c:2745-2923) -- profile what actually runs
        prod = _pointwise(fa, fb, W, True)
        return inner(prod) if staged else prod

    flat = t == plan.conv_len

    @jax.jit
    def norm(c):
        return normmod_div(c, plan.lg_conv, W)

    @jax.jit
    def inv(prod):
        # flat plans fold scale+normalize into the inverse (production
        # behavior); the separate normalize stage then reports ~0
        pad = jnp.zeros((plan.conv_len - t, prod.shape[-1]), prod.dtype)
        c = mfa_ifft_trunc_sqrt2(
            jnp.concatenate([prod, pad], axis=-2) if pad.shape[0] else prod,
            plan.w, W, n1, t, rows_done=staged,
            norm_div=plan.lg_conv if flat else 0)
        return c[..., :t, :]

    @jax.jit
    def combine(c):
        return fft_combine_bits(c, plan.bits1, out_len_digits(plan))

    out = {"bits": bits, "plan": {"depth": plan.depth, "w": plan.w, "W": W,
                                  "L": ring.L, "trunc": t},
           "staged": staged, "device": str(jax.devices()[0])}
    # free each stage's inputs before timing the next (at 10^9 bits the
    # full set of live intermediates exceeds one chip's HBM; the production
    # staged pipeline frees progressively via donation)
    s, fa = _timed(fwd, da, reps=reps)
    out["fwd_a_s"] = round(s, 6)
    da.delete()
    s, fb = _timed(fwd, db, reps=reps)
    out["fwd_b_s"] = round(s, 6)
    db.delete()
    s, prod = _timed(pw, fa, fb, reps=reps)
    out["pointwise_rows_s" if staged else "pointwise_s"] = round(s, 6)
    fa.delete(), fb.delete()
    s, c = _timed(inv, prod, reps=reps)
    out["inverse_s"] = round(s, 6)
    prod.delete()
    if flat:
        c2 = c   # normalize is folded into the inverse
    else:
        s, c2 = _timed(norm, c, reps=reps)
        out["normalize_s"] = round(s, 6)
        c.delete()
    s, _ = _timed(combine, c2, reps=reps)
    out["combine_s"] = round(s, 6)
    out["total_s"] = round(sum(v for k, v in out.items() if k.endswith("_s")), 6)
    return out
