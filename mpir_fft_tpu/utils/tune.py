"""Empirical on-device plan tuner.

The analytic planner (params.choose_params) picks (depth, w, sqrt2) from a
work model; this module refines that choice by MEASURING candidate plans on
the attached device and caching the winner.  The reference has no tuner at
all -- callers hardcode depth/w and "will just segfault" on bad choices
(mul_fft.c:3186-3188); here mis-tuning costs only speed, never correctness,
so measurement is safe to automate.

Timing uses the chained-execution recipe from bench.py (the attached TPU
reports readiness before cost is visible; chaining forces real execution).

Cache: JSON at MPIR_FFT_TUNE_CACHE (default <repo>/.tune_cache.json), keyed
by (driver, size bucket); geometric buckets make one measurement serve
nearby sizes."""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np

from mpir_fft_tpu.utils.params import MulPlan, cdiv, choose_params, plan_for_depth


def _cache_path() -> str:
    return os.environ.get(
        "MPIR_FFT_TUNE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".tune_cache.json"),
    )


def _bucket(bits: int) -> int:
    """Geometric size bucket: one tuning result serves ~+/-20% sizes."""
    return round(math.log(max(bits, 1), 1.4))


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_cache(cache: dict) -> None:
    try:
        with open(_cache_path(), "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass


def candidate_plans(bits_a: int, bits_b: int, sqrt2: bool) -> list[MulPlan]:
    base = choose_params(bits_a, bits_b, sqrt2)
    plans = {}
    for d in range(max(2, base.depth - 2), base.depth + 3):
        try:
            p = plan_for_depth(bits_a, bits_b, d, sqrt2)
            plans[(p.depth, p.w)] = p
        except AssertionError:
            continue
    return list(plans.values())


def measure_plan(kind: str, plan: MulPlan, reps: int = 3) -> float:
    """Seconds per multiply for one candidate (chained, load-absorbed)."""
    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu.models.mul import _jitted_driver
    from mpir_fft_tpu.ops.limb import DIGIT_BITS, digits_from_int

    rng = np.random.default_rng(42)
    La = cdiv(plan.bits_a, DIGIT_BITS)
    Lb = cdiv(plan.bits_b, DIGIT_BITS)
    a = int.from_bytes(rng.bytes(cdiv(plan.bits_a, 8)), "little") | (1 << (plan.bits_a - 1))
    b = int.from_bytes(rng.bytes(cdiv(plan.bits_b, 8)), "little") | (1 << (plan.bits_b - 1))
    da = jnp.asarray(digits_from_int(a & ((1 << plan.bits_a) - 1), La))
    db = jnp.asarray(digits_from_int(b & ((1 << plan.bits_b) - 1), Lb))
    fn = _jitted_driver(kind, plan)
    for _ in range(2):
        _ = int(jnp.sum(fn(da, db)))
    t0 = time.perf_counter()
    prev = da
    for _ in range(reps):
        prev = fn(prev, db)[..., :La]
    _ = int(jnp.sum(prev))
    return (time.perf_counter() - t0) / reps


def cached_plan(bits_a: int, bits_b: int, driver: str = "flagship") -> MulPlan | None:
    """Plan from a previous tuning run's cache bucket, or None.  Never
    measures -- this is the production fast path models.mul consults on
    every call (the reference's only runtime heuristic is analytic,
    mul_fft.c:3141-3162; here a measured result, once recorded, beats the
    analytic model silently mis-pricing a size)."""
    from mpir_fft_tpu.models.mul import DRIVERS

    sqrt2 = DRIVERS[driver][1]
    key = f"{driver}:{_bucket(bits_a)}:{_bucket(bits_b)}"
    entry = _load_cache().get(key)
    if entry is None:
        return None
    try:
        return plan_for_depth(bits_a, bits_b, entry["depth"], sqrt2)
    except AssertionError:
        return None


def tuned_plan(bits_a: int, bits_b: int, driver: str = "flagship",
               reps: int = 3, use_cache: bool = True) -> MulPlan:
    """Best measured plan for this size/driver (cached)."""
    from mpir_fft_tpu.models.mul import DRIVERS

    sqrt2 = DRIVERS[driver][1]
    key = f"{driver}:{_bucket(bits_a)}:{_bucket(bits_b)}"
    cache = _load_cache() if use_cache else {}
    if key in cache:
        d = cache[key]
        try:
            return plan_for_depth(bits_a, bits_b, d["depth"], sqrt2)
        except AssertionError:
            pass
    best, best_t = None, None
    results = []
    for p in candidate_plans(bits_a, bits_b, sqrt2):
        try:
            t = measure_plan(driver, p, reps)
        except Exception:
            continue
        results.append((p.depth, p.w, t))
        if best_t is None or t < best_t:
            best, best_t = p, t
    if best is None:
        return choose_params(bits_a, bits_b, sqrt2)
    if use_cache:
        cache[key] = {"depth": best.depth, "w": best.w,
                      "seconds": round(best_t, 6),
                      "candidates": [(d, w, round(t, 6)) for d, w, t in results]}
        _save_cache(cache)
    return best
