"""Benchmark CLI: times the flagship multiply on the attached TPU chip and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: measured host big-int multiply (CPython's Karatsuba; GMP is not
installed with headers in this image).  The reference publishes no numbers
(BASELINE.md), so vs_baseline is measured speedup over the host multiply at
the same size: ours_time vs host_time -> vs_baseline = host/ours (>1 means
the TPU path wins)."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def rand_bits(rng, bits):
    words = rng.integers(0, 1 << 32, size=(bits + 31) // 32, dtype=np.uint64)
    v = 0
    for i, wd in enumerate(words.tolist()):
        v |= int(wd) << (32 * i)
    v |= 1 << (bits - 1)
    return v & ((1 << bits) - 1)


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu.models import mul as mulmod
    from mpir_fft_tpu.ops.limb import DIGIT_BITS, digits_from_int
    from mpir_fft_tpu.utils.params import cdiv, choose_params

    rng = np.random.default_rng(0)
    a = rand_bits(rng, bits)
    b = rand_bits(rng, bits)

    # host baseline (one rep; CPython big-int multiply)
    t0 = time.perf_counter()
    want = a * b
    host_s = time.perf_counter() - t0

    driver = sys.argv[3] if len(sys.argv) > 3 else "flagship"
    from mpir_fft_tpu.models.mul import DRIVERS

    plan = choose_params(bits, bits, sqrt2=DRIVERS[driver][1])
    da = jnp.asarray(digits_from_int(a, cdiv(bits, DIGIT_BITS)))
    db = jnp.asarray(digits_from_int(b, cdiv(bits, DIGIT_BITS)))
    fn = mulmod._jitted_driver(driver, plan)
    out = fn(da, db)
    out.block_until_ready()          # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(da, db)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    # correctness spot-check on device result
    got = mulmod.int_from_digits(np.asarray(out))
    ok = got == want

    print(
        json.dumps(
            {
                "metric": f"mul_{bits}bit_walltime",
                "value": round(best, 6),
                "unit": "s",
                "vs_baseline": round(host_s / best, 3),
                "exact": bool(ok),
                "host_baseline_s": round(host_s, 6),
                "plan": {"depth": plan.depth, "w": plan.w},
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
