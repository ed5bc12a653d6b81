"""Micro-profiler for the NTT-CRT pointwise chunk: splits one chunk's wall
time into GEMMs / link kernels / Garner so optimization effort lands where
the milliseconds are.  Shapes default to the 10^9-bit staged flagship's
pointwise chunk ([32768, 2048] int32 digit rows).

Usage: python tools/prof_pointwise.py [B] [M] [reps]

Chained timing per bench.py's recipe: the tunneled device reports readiness
early, so each rep feeds the previous output back in and the loop closes
with a scalar fetch.
"""

import sys
import time

import numpy as np


def timed(fn, args, reps, feed=None):
    """Seconds per rep of jitted fn(*args), chained through feed (index of
    the arg replaced by the previous output; None chains via dummy sum)."""
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    for _ in range(2):
        out = jfn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        _ = int(jnp.sum(first[..., :8].astype(jnp.int32)))
    t0 = time.perf_counter()
    cur = list(args)
    for _ in range(reps):
        out = jfn(*cur)
        first = out[0] if isinstance(out, (tuple, list)) else out
        if feed is not None and first.shape == cur[feed].shape and first.dtype == cur[feed].dtype:
            cur[feed] = first
    _ = int(jnp.sum(first[..., :8].astype(jnp.int32)))
    return (time.perf_counter() - t0) / reps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from mpir_fft_tpu.ops import ntt
    from mpir_fft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (B, M), dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (B, M), dtype=np.int32))

    rows = {}
    rows["mulmod_ntt_full"] = timed(lambda x, y: ntt.mulmod_ntt(x, y), (a, b),
                                    reps, feed=0)

    if M > 1024 and M <= ntt.TIER1_MAX_M and "--ab4" in sys.argv:
        # A/B: force this M through the 4-step tier (tier-2 primes, k=3) to
        # compare MAC-count savings vs dense-GEMM MXU efficiency
        saved = ntt.TIER1_MAX_M
        ntt.TIER1_MAX_M = M // 2
        try:
            rows["mulmod_ntt_4step"] = timed(
                lambda x, y: ntt.mulmod_ntt(x, y), (a, b), reps, feed=0)
        finally:
            ntt.TIER1_MAX_M = saved

    if M <= ntt.TIER1_MAX_M:
        mats = ntt._matrices(M)
        k = mats[0]["k"]

        rows["input_planes_x2"] = timed(
            lambda x, y: (ntt._input_planes(x, mats)[0],
                          ntt._input_planes(y, mats)[0]),
            (a, b), reps)

        # both operands' plane sets, independently generated: jit CSE dedupes
        # byte-identical subexpressions, so feeding the same planes (or the
        # same spectrum) to both sides of a GEMM/fold pair would silently
        # measure half the work (ADVICE r4)
        pa_dev = [jnp.asarray(np.asarray(p)) for p in ntt._input_planes(a, mats)]
        pb_dev = [jnp.asarray(np.asarray(p)) for p in ntt._input_planes(b, mats)]

        def dots6(*planes):
            pas, pbs = planes[: len(mats)], planes[len(mats):]
            outs = []
            for i, mat in enumerate(mats):
                Sa = ntt._dot_raw(pas[i], mat["F"])
                Sb = ntt._dot_raw(pbs[i], mat["F"])
                outs.append(Sa + Sb)
            return tuple(outs)

        rows["fwd_dots_x6"] = timed(dots6, tuple(pa_dev) + tuple(pb_dev), reps)

        Sa = jax.block_until_ready(ntt._dot_raw(pa_dev[0], mats[0]["F"]))
        Sb = jax.block_until_ready(ntt._dot_raw(pb_dev[0], mats[0]["F"]))
        rows["mid_planes_x3"] = timed(
            lambda s, t: tuple(
                ntt._mid_planes(s, t, mat["p"], k) for mat in mats),
            (Sa, Sb), reps)

        pp = ntt._mid_planes(Sa, Sb, mats[0]["p"], k)
        pp = jax.block_until_ready(pp)
        rows["inv_dots_x3"] = timed(
            lambda q: tuple(ntt._dot_raw(q, mat["G"]) for mat in mats),
            (pp,), reps)

        # three independent residue spectra (one per prime's actual pipeline)
        # so no Garner subexpression collapses
        Sgs = []
        for i, mat in enumerate(mats):
            ppi = ntt._mid_planes(
                ntt._dot_raw(pa_dev[i], mat["F"]),
                ntt._dot_raw(pb_dev[i], mat["F"]), mat["p"], k)
            Sgs.append(jax.block_until_ready(ntt._dot_raw(ppi, mat["G"])))
        primes = tuple(mat["p"] for mat in mats)
        rows["garner_raw"] = timed(
            lambda s1, s2, s3: ntt._garner_carry([s1, s2, s3], primes, raw_k=k),
            tuple(Sgs), reps)

    total = rows.get("input_planes_x2", 0) + rows.get("fwd_dots_x6", 0) + \
        rows.get("mid_planes_x3", 0) + rows.get("inv_dots_x3", 0) + \
        rows.get("garner_raw", 0)
    out = {k: round(v * 1e3, 3) for k, v in rows.items()}
    out["sum_parts_ms"] = round(total * 1e3, 3)
    out["B"], out["M"] = B, M
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
