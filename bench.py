"""Benchmark CLI: times the flagship multiply on the attached TPU chip and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

With no arguments it runs the FULL size sweep 10^6/10^7/10^8/10^9 (the
BASELINE.md table) and prints one JSON object whose headline metric is the
largest size, with the whole sweep under "sweep".  With an explicit size it
benchmarks that one configuration (the A/B mode).

vs_baseline is the measured speedup over GMP's assembly mpn_mul on this
machine's CPU (the reference's implied comparison target, mul_fft.c:5359,
5406, 5452; measured via mpir_fft_tpu/native/gmp_baseline.c since the
reference publishes no numbers -- see BASELINE.md).  Falls back to CPython's
big-int multiply if the GMP harness can't build.

Timing methodology: the attached TPU can be a remote (tunneled) device where
block_until_ready returns before the computation's cost is visible, so each
measured repetition CHAINS the previous output into the next input and the
loop is closed with a scalar reduction fetch -- the chain forces every
multiply to really execute before the clock stops.

Usage: bench.py [bits] [reps] [driver] [depth]
       bench.py batch <bits> <k> [reps] [driver]     (throughput mode)
       bench.py sqr <bits> [reps]                    (squaring mode)
       bench.py floor <bits> [reps]                  (dispatch-floor probe)
       bench.py mulmod <N> [reps]                    (Fermat-ring product)
(depth forces plan_for_depth at that depth for A/B plan comparisons;
env BENCH_SIZES="1e6,1e7" overrides the no-arg sweep)

Plan selection matches production: models.mul._select_plan (a measured
.tune_cache.json entry wins over the analytic model when present); each
result records plan_source so artifacts say whether the number is tuned
or analytic.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def rand_bits(rng, bits):
    v = int.from_bytes(rng.bytes((bits + 7) // 8), "little")
    v |= 1 << (bits - 1)
    return v & ((1 << bits) - 1)


# Authoritative quiet-host GMP mpn_mul baselines (BASELINE.md, 2026-08-17,
# single core, best of 5 on an idle machine).  The in-run measurement below
# absorbs whatever load the driver adds and reads 1.3-3x HIGH, which would
# inflate vs_baseline; the honest denominator is the BEST (fastest) GMP time
# ever observed for the size, so report against min(in-run, quiet-host).
QUIET_HOST_GMP_S = {
    1_000_000: 0.00362,
    10_000_000: 0.0541,
    100_000_000: 0.782,
    1_000_000_000: 8.82,
}


def honest_baseline(bits: int, measured_s: float | None) -> tuple[float, dict]:
    quiet = QUIET_HOST_GMP_S.get(bits)
    cands = [s for s in (measured_s, quiet) if s is not None]
    base_s = min(cands)
    info = {"kind": "gmp_mpn_mul", "seconds": round(base_s, 6)}
    if measured_s is not None:
        info["in_run_seconds"] = round(measured_s, 6)
    if quiet is not None:
        info["quiet_host_seconds"] = quiet
    return base_s, info


# exactness check: full a*b in CPython is O(n^1.58) and takes tens of minutes
# at 10^9 bits; checking got == a*b mod a few 62-bit primes is O(n) per prime
# (seconds) and catches any error except with probability ~2^-186

def _is_prime(n: int) -> bool:
    if n % 2 == 0:
        return n == 2
    d, s = n - 1, 0
    while d % 2 == 0:
        d, s = d // 2, s + 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):  # exact below 3.3e24
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _check_primes(k=3):
    out, c = [], (1 << 61) - 1
    while len(out) < k:
        if _is_prime(c):
            out.append(c)
        c -= 2
    return out


def product_matches(got: int, a: int, b: int, bits: int) -> bool:
    if bits <= 20_000_000:
        return got == a * b
    return all(got % p == (a % p) * (b % p) % p for p in _check_primes())


def residues_streamed(out, primes, max_bytes=32 << 20) -> dict:
    """Mod-p residues of the digit-vector product WITHOUT materializing it:
    fetch bounded slices (the remote backend exhausts on multi-GB fetch
    volume -- the 4x10^9-bit certification OOMed pulling 2 GB in 128 MB
    slices), fold each into the running residues host-side, and delete the
    device slice immediately.  O(n) host work total."""
    import functools

    import jax
    import jax.numpy as jnp

    n = out.shape[-1]
    step = max(1, max_bytes // max(1, out.nbytes // n))
    step = min(step, n)

    @functools.partial(jax.jit, static_argnums=())
    def slice_at(x, start):
        return jax.lax.dynamic_slice_in_dim(x, start, step, axis=x.ndim - 1)

    def fetch(start):
        # buffer frees on the remote backend land asynchronously: right
        # after the out-of-core pipeline the arena can be transiently full,
        # so RESOURCE_EXHAUSTED here is retryable (frees drain within
        # seconds)
        for attempt in range(9):
            try:
                dev = slice_at(out, jnp.int32(start))
                part = np.asarray(dev)
                dev.delete()
                return part
            except Exception as e:
                if "RESOURCE_EXHAUSTED" not in str(e) or attempt == 8:
                    raise
                log(f"bench: fetch at {start} resource-exhausted; "
                    f"retrying in {15 * (attempt + 1)}s")
                time.sleep(15 * (attempt + 1))

    res = {p: 0 for p in primes}
    done = 0
    starts = list(range(0, n - step + 1, step))
    for s in starts:
        part = fetch(s)
        v = int.from_bytes(part.astype("<u2").tobytes(), "little")
        for p in primes:
            res[p] = (res[p] + v * pow(2, 16 * s, p)) % p
        done = s + step
    if done < n:
        part = fetch(n - step)[..., done - (n - step):]
        v = int.from_bytes(part.astype("<u2").tobytes(), "little")
        for p in primes:
            res[p] = (res[p] + v * pow(2, 16 * done, p)) % p
    return res


def limb_ops(bits_a: int, bits_b: int, wall_s: float, plan=None) -> dict:
    """The BASELINE.json secondary metric, limb-ops/sec/chip (VERDICT r4
    missing #2), in two conventions:

    * schoolbook-equivalent: 64-bit-limb MACs the O(n^2) baseline would
      need for this product, / wall -- the classic 'equivalent throughput'
      a bignum library quotes (comparable across algorithms).
    * fft-work: limb-ops the FFT algorithm itself performs with the plan
      actually run (~3 transforms of conv_len coefficients x (W/64) limbs x
      lg(conv_len) butterfly levels, plus the pointwise), / wall -- the
      machine-utilization view.
    """
    la, lb = -(-bits_a // 64), -(-bits_b // 64)
    out = {"schoolbook_limb_ops_per_s": round(la * lb / wall_s, 1)}
    if plan is not None:
        limbs = plan.W // 64
        fft = 3 * plan.conv_len * limbs * plan.lg_conv + \
            plan.conv_len * limbs * max(1, plan.W.bit_length())
        out["fft_limb_ops_per_s"] = round(fft / wall_s, 1)
    return out


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def patient(thunk, what="fetch", attempts=9):
    """Run a device-fetch thunk, retrying RESOURCE_EXHAUSTED with growing
    backoff: the tunneled backend acks block_until_ready while a deep
    chunk-program queue is still executing server-side, and transfers into
    the saturated queue fail transiently (the 4x10^9-bit out-of-core
    runs)."""
    import time as _t

    for attempt in range(attempts):
        try:
            return thunk()
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or attempt == attempts - 1:
                raise
            log(f"bench: {what} resource-exhausted; "
                f"retrying in {15 * (attempt + 1)}s")
            _t.sleep(15 * (attempt + 1))


def _log_hbm(tag):
    try:
        import jax

        ms = jax.devices()[0].memory_stats() or {}
        log(f"bench: hbm {tag}: {ms.get('bytes_in_use', 0) / 2**30:.2f} GiB in use"
            f" / {ms.get('bytes_limit', 0) / 2**30:.2f} GiB")
    except Exception:
        pass


def _fetch_host(out, max_bytes=1 << 27):
    """Device array -> numpy, transferring at most max_bytes per fetch (one
    whole-array fetch of a multi-GB product exhausts the remote backend).
    Slicing uses ONE jitted dynamic-slice program (static per-slice indices
    would recompile per slice -- ~1 min each over the tunnel)."""
    if out.nbytes <= max_bytes:
        return np.asarray(out)
    import functools

    import jax
    import jax.numpy as jnp

    n = out.shape[-1]
    step = max(1, max_bytes // max(1, out.nbytes // n))
    step = min(step, n)

    @functools.partial(jax.jit, static_argnums=())
    def slice_at(x, start):
        return jax.lax.dynamic_slice_in_dim(x, start, step, axis=x.ndim - 1)

    parts = []
    for s in range(0, n - step + 1, step):
        parts.append(np.asarray(slice_at(out, jnp.int32(s))))
    done = len(parts) * step
    if done < n:  # ragged tail: one extra fixed-size slice, overlap-trimmed
        tail = np.asarray(slice_at(out, jnp.int32(n - step)))
        parts.append(tail[..., done - (n - step):])
    return np.concatenate(parts, axis=-1)


def _production_plan(bits_a, bits_b, driver, depth=None, batch=1):
    """The plan production mul()/mul_many() would pick for this size (tuning
    cache first, analytic fallback -- models.mul._select_plan), plus where it
    came from.  depth forces plan_for_depth (the A/B mode); batch > 1
    consults only batch-class tuning entries, matching mul_many."""
    from mpir_fft_tpu.models.mul import DRIVERS, _select_plan, _tune_enabled
    from mpir_fft_tpu.utils.params import plan_for_depth

    sqrt2 = DRIVERS[driver][1]
    if depth is not None:
        return plan_for_depth(bits_a, bits_b, depth, sqrt2=sqrt2), "forced_depth"
    plan = _select_plan(bits_a, bits_b, driver, batch=batch)
    source = "analytic"
    if _tune_enabled():
        from mpir_fft_tpu.utils.tune import cached_plan

        if cached_plan(bits_a, bits_b, driver, batch=batch) == plan:
            source = "tuned"
    return plan, source


def bench_one(bits, reps=None, driver="flagship", depth=None):
    # default reps amortize the tunnel's ~1-5 ms/dispatch overhead (measured:
    # a trivial chained program costs 4.6 ms/rep at 8 reps, 1.1 ms at 32).
    # Floor of 4 up to the in-HBM headline size: a 2-rep headline carries no
    # variance information (VERDICT r3); only the multi-minute out-of-core
    # sizes may drop to 2
    if reps is None:
        reps = max(4 if bits <= 1_000_000_000 else 2, min(64, (3 << 28) // bits))

    from mpir_fft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu import native
    from mpir_fft_tpu.models import mul as mulmod
    from mpir_fft_tpu.ops.limb import DIGIT_BITS, digits_from_int
    from mpir_fft_tpu.utils.params import cdiv

    rng = np.random.default_rng(0)
    a = rand_bits(rng, bits)
    b = rand_bits(rng, bits)

    plan, plan_source = _production_plan(bits, bits, driver, depth)
    L = cdiv(bits, DIGIT_BITS)
    da = jnp.asarray(digits_from_int(a, L))
    db = jnp.asarray(digits_from_int(b, L))
    fn = mulmod._jitted_driver(driver, plan)

    # chained step: reuse the low digits of the product as the next operand
    # (canonical digits in, canonical digits out -> same shapes, no recompile).
    # staged drivers must not be re-wrapped in one jit (it would rebuild the
    # monolithic program the staging exists to avoid)
    from mpir_fft_tpu.models.mul import flagship_is_staged

    if driver == "flagship" and flagship_is_staged(plan):
        def step(prev, db):
            return fn(prev, db)[..., :L]
    else:
        @jax.jit
        def step(prev, db):
            out = fn(prev, db)
            return out[..., :L]

    log(f"bench: plan depth={plan.depth} w={plan.w} sqrt2={plan.sqrt2}; compiling")
    out = fn(da, db)
    out.block_until_ready()              # compile + warm
    _log_hbm("after first run")
    # resolve the exactness check NOW and free the product's device copy:
    # at >10^9 bits it is a multi-GB buffer that would otherwise sit in HBM
    # through every timed pipeline run.  Above the out-of-core threshold the
    # product never materializes on host at all -- the check folds bounded
    # fetched slices into mod-prime residues (the 2 GB whole-product fetch
    # exhausted the remote backend even in 128 MB slices)
    if bits > 2_000_000_000:
        # drain the device queue first: the tunneled backend can ack
        # block_until_ready while the chunked pipeline is still executing
        # server-side, and transfers into the saturated queue come back
        # RESOURCE_EXHAUSTED.  A scalar fetch with a data dependency on the
        # product forces real completion before the streaming starts.
        log("bench: draining device queue (scalar dependency fetch)")
        patient(lambda: int(jnp.sum(out[..., :128])), "drain fetch")
        del da, db
        res = residues_streamed(out, _check_primes())
        del out
        da = jnp.asarray(digits_from_int(a, L))
        db = jnp.asarray(digits_from_int(b, L))

        def check_exact():
            return all(res[p] == (a % p) * (b % p) % p for p in res)
    else:
        out_host = _fetch_host(out)
        del out

        def check_exact():
            return product_matches(
                mulmod.int_from_digits(out_host), a, b, bits)
    _log_hbm("after fetch")
    log("bench: compiled; warming")
    # the attached device may load/compile the program server-side on first
    # execution with block_until_ready returning early; force full
    # executions with real result fetches before timing (one is enough at
    # huge sizes where a single run is seconds of real device work)
    for _ in range(1 if bits > 1_000_000_000 else 2):
        _ = patient(lambda: int(jnp.sum(step(da, db))), "warm fetch")

    import contextlib
    import os

    prof_dir = os.environ.get("BENCH_PROFILE")
    ctx = jax.profiler.trace(prof_dir) if prof_dir else contextlib.nullcontext()
    log("bench: timing")
    with ctx:
        t0 = time.perf_counter()
        prev = da
        for _ in range(reps):
            prev = step(prev, db)
        # scalar fetch closes the dependency chain (patient: at out-of-core
        # sizes the queued chunk programs saturate the tunnel; retried
        # fetch waits without perturbing the enqueued work being timed)
        sink = patient(lambda: int(jnp.sum(prev)), "timing fetch")
        wall = (time.perf_counter() - t0) / reps

    # correctness spot-check on the plain (unchained) device result
    log("bench: checking exactness")
    ok = check_exact()
    log("bench: measuring CPU baseline")

    base = native.gmp_baseline(bits, 2)
    if base is not None or bits in QUIET_HOST_GMP_S:
        base_s, base_info = honest_baseline(
            bits, base["value"] if base is not None else None)
    else:
        t0 = time.perf_counter()
        _ = a * b
        base_s = time.perf_counter() - t0
        base_info = {"kind": "cpython_int", "seconds": round(base_s, 6)}

    return {
        "metric": f"mul_{bits}bit_walltime",
        "value": round(wall, 6),
        "unit": "s",
        "vs_baseline": round(base_s / wall, 3),
        "exact": bool(ok),
        "baseline": base_info,
        "driver": driver,
        "plan": {"depth": plan.depth, "w": plan.w, "sqrt2": plan.sqrt2},
        "plan_source": plan_source,
        **limb_ops(bits, bits, wall, plan),
        "device": str(jax.devices()[0]),
        "reps": reps,
        "sink": sink % 1000,
    }


def bench_sqr(bits, reps=None):
    """Squaring mode: times models.mul's one-transform sqr pipeline and
    reports its speedup over the same-size mul (the ~1/3 transform saving
    the build adds beyond the reference, which always transforms both
    operands, mul_fft.c:3615-3624) and over GMP mpn_mul."""
    if reps is None:
        reps = max(4 if bits <= 1_000_000_000 else 2, min(64, (3 << 28) // bits))

    from mpir_fft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu import native
    from mpir_fft_tpu.models import mul as mulmod
    from mpir_fft_tpu.ops.limb import DIGIT_BITS, digits_from_int
    from mpir_fft_tpu.utils.params import cdiv

    rng = np.random.default_rng(0)
    a = rand_bits(rng, bits)
    plan, plan_source = _production_plan(bits, bits, "flagship")
    L = cdiv(bits, DIGIT_BITS)
    da = jnp.asarray(digits_from_int(a, L))
    sq = mulmod._jitted_sqr(plan)
    mul_fn = mulmod._jitted_driver("flagship", plan)

    from mpir_fft_tpu.models.mul import flagship_is_staged

    if flagship_is_staged(plan):
        def step(prev):
            return sq(prev)[..., :L]

        def mstep(prev, db):
            return mul_fn(prev, db)[..., :L]
    else:
        @jax.jit
        def step(prev):
            return sq(prev)[..., :L]

        @jax.jit
        def mstep(prev, db):
            return mul_fn(prev, db)[..., :L]

    log(f"bench-sqr: plan depth={plan.depth} w={plan.w}; compiling")
    out_host = np.asarray(sq(da))
    for _ in range(1 if bits > 1_000_000_000 else 2):
        _ = int(jnp.sum(step(da)))

    log("bench-sqr: timing sqr")
    t0 = time.perf_counter()
    prev = da
    for _ in range(reps):
        prev = step(prev)
    sink = int(jnp.sum(prev))
    wall = (time.perf_counter() - t0) / reps

    # A/B: the SAME plan through the two-transform mul pipeline
    log("bench-sqr: timing mul (same plan, A/B)")
    _ = int(jnp.sum(mstep(da, da)))
    t0 = time.perf_counter()
    prev = da
    for _ in range(reps):
        prev = mstep(prev, da)
    sink += int(jnp.sum(prev))
    mul_wall = (time.perf_counter() - t0) / reps

    log("bench-sqr: checking exactness")
    got = mulmod.int_from_digits(out_host)
    ok = product_matches(got, a, a, bits)
    log("bench-sqr: measuring CPU baseline")
    base = native.gmp_baseline(bits, 2)
    if base is not None or bits in QUIET_HOST_GMP_S:
        base_s, base_info = honest_baseline(
            bits, base["value"] if base is not None else None)
    else:
        t0 = time.perf_counter()
        _ = a * a
        base_s = time.perf_counter() - t0
        base_info = {"kind": "cpython_int", "seconds": round(base_s, 6)}

    return {
        "metric": f"sqr_{bits}bit_walltime",
        "value": round(wall, 6),
        "unit": "s",
        "vs_baseline": round(base_s / wall, 3),
        "exact": bool(ok),
        "mul_same_plan_seconds": round(mul_wall, 6),
        "sqr_vs_mul": round(mul_wall / wall, 3),
        "baseline": base_info,
        "driver": "flagship_sqr",
        "plan": {"depth": plan.depth, "w": plan.w, "sqrt2": plan.sqrt2},
        "plan_source": plan_source,
        "device": str(jax.devices()[0]),
        "reps": reps,
        "sink": sink % 1000,
    }


def bench_floor(bits, reps=None):
    """Dispatch-floor probe: times an EMPTY chained program (one trivial
    elementwise op on the same digit shapes the real multiply uses) so the
    per-dispatch tunnel/runtime overhead can be separated from compute at
    small sizes (VERDICT r3: is the 10^6-bit 0.74 ms the pipeline or the
    tunnel?).  Reports seconds/rep at several chain depths."""
    if reps is None:
        reps = 64

    from mpir_fft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu.ops.limb import DIGIT_BITS
    from mpir_fft_tpu.utils.params import cdiv

    L = cdiv(bits, DIGIT_BITS)
    da = jnp.zeros((L,), jnp.int32)

    @jax.jit
    def step(prev):
        return prev + 1

    _ = int(jnp.sum(step(da)))
    out = {}
    for r in (8, 32, reps):
        t0 = time.perf_counter()
        prev = da
        for _ in range(r):
            prev = step(prev)
        _ = int(jnp.sum(prev))
        out[f"reps_{r}"] = round((time.perf_counter() - t0) / r, 9)
    return {
        "metric": f"dispatch_floor_{bits}bit_shape",
        "value": out[f"reps_{reps}"],
        "unit": "s",
        "vs_baseline": 0.0,
        "per_rep": out,
        "device": str(jax.devices()[0]),
    }


def bench_batch(bits, k, reps=None, driver="flagship", depth=None):
    """Throughput mode: k products per dispatch chain via the batched
    pipeline (models.mul.mul_many's device path).  Reports per-product
    wall time; vs_baseline is against ONE GMP core doing the k products
    serially, i.e. the honest products/sec comparison."""
    if reps is None:
        reps = max(2, min(32, (3 << 28) // (bits * k)))

    from mpir_fft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu import native
    from mpir_fft_tpu.models import mul as mulmod
    from mpir_fft_tpu.models.mul import DRIVERS, flagship_is_huge, flagship_is_staged
    from mpir_fft_tpu.ops.limb import DIGIT_BITS, digits_from_int
    from mpir_fft_tpu.utils.params import cdiv

    rng = np.random.default_rng(1)
    pairs = [(rand_bits(rng, bits), rand_bits(rng, bits)) for _ in range(k)]
    plan, plan_source = _production_plan(bits, bits, driver, depth=depth,
                                         batch=k)
    assert not (driver == "flagship" and (flagship_is_huge(plan) or flagship_is_staged(plan))), \
        "batch mode targets sizes below the staged threshold"
    L = cdiv(bits, DIGIT_BITS)
    da = jnp.asarray(np.stack([digits_from_int(a, L) for a, _ in pairs]))
    db = jnp.asarray(np.stack([digits_from_int(b, L) for _, b in pairs]))
    fn = mulmod._jitted_driver(driver, plan)

    @jax.jit
    def step(prev, db):
        return fn(prev, db)[..., :L]

    log(f"bench-batch: k={k} plan depth={plan.depth} w={plan.w}; compiling")
    out_host = np.asarray(fn(da, db))
    for _ in range(2):
        _ = int(jnp.sum(step(da, db)))

    log("bench-batch: timing")
    t0 = time.perf_counter()
    prev = da
    for _ in range(reps):
        prev = step(prev, db)
    sink = int(jnp.sum(prev))
    per_product = (time.perf_counter() - t0) / (reps * k)

    log("bench-batch: checking exactness")
    ok = all(
        product_matches(mulmod.int_from_digits(out_host[i]), a, b, bits)
        for i, (a, b) in enumerate(pairs)
    )
    log("bench-batch: measuring CPU baseline")
    base = native.gmp_baseline(bits, 2)
    if base is not None or bits in QUIET_HOST_GMP_S:
        base_s, base_info = honest_baseline(
            bits, base["value"] if base is not None else None)
    else:
        t0 = time.perf_counter()
        _ = pairs[0][0] * pairs[0][1]
        base_s = time.perf_counter() - t0
        base_info = {"kind": "cpython_int", "seconds": round(base_s, 6)}

    return {
        "metric": f"mul_{bits}bit_batch{k}_per_product",
        "value": round(per_product, 9),
        "unit": "s",
        "vs_baseline": round(base_s / per_product, 3),
        "exact": bool(ok),
        "throughput_products_per_s": round(1.0 / per_product, 3),
        "baseline": base_info,
        "driver": driver,
        "plan": {"depth": plan.depth, "w": plan.w, "sqrt2": plan.sqrt2},
        "plan_source": plan_source,
        "device": str(jax.devices()[0]),
        "reps": reps,
        "batch": k,
        "sink": sink % 1000,
    }


def bench_mulmod(N, reps=None):
    """Fermat-ring mode (BASELINE config 4): times the user-level
    (a * b) mod 2^N+1 product (ops.mulmod, the fft_mulmod_2expp1 twin --
    ref mul_fft.c:3125-3167 and its timing harness time_mul_with_negacyclic,
    mul_fft.c:4188-4222).  vs_baseline is the host big-int (a*b) %% p."""
    if reps is None:
        reps = max(4, min(64, (3 << 28) // max(N, 1)))

    from mpir_fft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu.ops.limb import DIGIT_BITS, digits_from_int, int_from_digits
    from mpir_fft_tpu.ops.mulmod import _jitted_mulmod, mulmod_plan, MULMOD_BASE_MAX_BITS
    from mpir_fft_tpu.ops.pointwise import base_serves

    assert N % DIGIT_BITS == 0, "N must be a multiple of 16"
    p = (1 << N) + 1
    rng = np.random.default_rng(2)
    a = rand_bits(rng, N) % p
    b = rand_bits(rng, N) % p
    L = N // DIGIT_BITS
    da = jnp.asarray(digits_from_int(a, L))
    db = jnp.asarray(digits_from_int(b, L))
    fn = _jitted_mulmod(N, None)
    plan = None
    if N > MULMOD_BASE_MAX_BITS or not base_serves(L):
        plan = mulmod_plan(N)
    plan_info = ({"path": "fft", "depth": plan.depth, "inner_W": plan.Wp}
                 if plan is not None else {"path": "base_ntt"})

    # chained step: canonical digits out == canonical digits in (the -1
    # residue form [-1, 0, ...] is in-domain for the next call)
    @jax.jit
    def step(prev, db):
        return fn(prev, db)

    log(f"bench-mulmod: N={N} {plan_info}; compiling")
    out_host = np.asarray(fn(da, db))
    for _ in range(2):
        _ = int(jnp.sum(step(da, db)))

    log("bench-mulmod: timing")
    t0 = time.perf_counter()
    prev = da
    for _ in range(reps):
        prev = step(prev, db)
    sink = int(jnp.sum(prev))
    wall = (time.perf_counter() - t0) / reps

    def mod_fermat(x):
        # x mod (2^N+1) via the O(n) fold 2^N == -1 (CPython divmod is
        # O(n*m) schoolbook -- 8+ minutes per rep at N = 2^24)
        mask = (1 << N) - 1
        acc, sign = 0, 1
        while x:
            acc += sign * (x & mask)
            x >>= N
            sign = -sign
        return acc % p

    log("bench-mulmod: checking exactness")
    got = int_from_digits(out_host) % p
    ok = got == mod_fermat(a * b)

    log("bench-mulmod: measuring host baseline")
    t0 = time.perf_counter()
    host_reps = max(1, min(8 if N <= (1 << 22) else 2,
                           int(0.5 / max(wall, 1e-4))))
    for _ in range(host_reps):
        _ = mod_fermat(a * b)
    base_s = (time.perf_counter() - t0) / host_reps

    return {
        "metric": f"mulmod_2exp{N}p1_walltime",
        "value": round(wall, 6),
        "unit": "s",
        "vs_baseline": round(base_s / wall, 3),
        "exact": bool(ok),
        "baseline": {"kind": "cpython_mul_fermat_fold", "seconds": round(base_s, 6)},
        "driver": "mulmod_int",
        "plan": plan_info,
        **limb_ops(N, N, wall),
        "device": str(jax.devices()[0]),
        "reps": reps,
        "sink": sink % 1000,
    }


DEFAULT_SWEEP = (1_000_000, 10_000_000, 100_000_000, 1_000_000_000)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "batch":
        # throughput mode: bench.py batch <bits> <k> [reps] [driver]
        bits, k = int(sys.argv[2]), int(sys.argv[3])
        reps = int(sys.argv[4]) if len(sys.argv) > 4 else None
        driver = sys.argv[5] if len(sys.argv) > 5 else "flagship"
        depth = int(sys.argv[6]) if len(sys.argv) > 6 else None
        print(json.dumps(bench_batch(bits, k, reps, driver, depth)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "sqr":
        bits = int(sys.argv[2])
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else None
        print(json.dumps(bench_sqr(bits, reps)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "floor":
        bits = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else None
        print(json.dumps(bench_floor(bits, reps)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "mulmod":
        N = int(sys.argv[2])
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else None
        print(json.dumps(bench_mulmod(N, reps)))
        return
    if len(sys.argv) > 1:
        # explicit-size A/B mode: bench.py bits [reps] [driver] [depth]
        bits = int(sys.argv[1])
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else None
        driver = sys.argv[3] if len(sys.argv) > 3 else "flagship"
        depth = int(sys.argv[4]) if len(sys.argv) > 4 else None
        print(json.dumps(bench_one(bits, reps, driver, depth)))
        return

    import os

    sizes_env = os.environ.get("BENCH_SIZES")
    sizes = (
        [int(float(s)) for s in sizes_env.split(",")]
        if sizes_env
        else list(DEFAULT_SWEEP)
    )
    sweep = []
    for bits in sizes:
        log(f"bench: === {bits} bits ===")
        sweep.append(bench_one(bits))
    head = sweep[-1]  # headline = largest size (the BASELINE.md north star)
    # batched-throughput datapoints: small single products are dispatch-
    # latency-bound (BASELINE.md), the batch mode is the production answer
    if not sizes_env:
        for bbits, bk in ((1_000_000, 16), (10_000_000, 8)):
            log(f"bench: === {bbits}-bit batch throughput ===")
            try:  # a batch failure must not sink the sweep
                sweep.append(bench_batch(bbits, bk))
            except Exception as e:
                log(f"bench: batch datapoint failed: {e!r}")
        # squaring datapoints: the one-transform saving, proven at the
        # two sizes whose transforms dominate wall time
        for sbits in (100_000_000, 1_000_000_000):
            log(f"bench: === {sbits}-bit sqr ===")
            try:
                sweep.append(bench_sqr(sbits))
            except Exception as e:
                log(f"bench: sqr datapoint failed: {e!r}")
        # Fermat-ring datapoint (BASELINE config 4)
        log("bench: === mulmod 2^(2^24)+1 ===")
        try:
            sweep.append(bench_mulmod(1 << 24))
        except Exception as e:
            log(f"bench: mulmod datapoint failed: {e!r}")
    result = {
        "metric": head["metric"],
        "value": head["value"],
        "unit": "s",
        "vs_baseline": head["vs_baseline"],
        "exact": all(r["exact"] for r in sweep),
        "sweep": sweep,
    }
    # the driver keeps only a ~2 KB stdout tail, which truncates the sweep
    # JSON (VERDICT r4 weak #4): persist the full result to artifacts/ so
    # no record depends on stdout
    try:
        import os as _os

        art = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "artifacts")
        _os.makedirs(art, exist_ok=True)
        with open(_os.path.join(art, "BENCH_sweep.json"), "w") as f:
            json.dump(result, f, indent=1)
    except OSError as e:
        log(f"bench: could not write artifacts/BENCH_sweep.json: {e!r}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
