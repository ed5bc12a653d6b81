import time
import numpy as np
def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

import jax, jax.numpy as jnp
from mpir_fft_tpu.models.mul import _staged_flagship, flagship_is_staged
from mpir_fft_tpu.utils.params import cdiv, choose_params
from mpir_fft_tpu.ops.limb import DIGIT_BITS

bits = 1_000_000_000
plan = choose_params(bits, bits, sqrt2=True)
log(f"plan depth={plan.depth} w={plan.w} staged={flagship_is_staged(plan)}")
rng = np.random.default_rng(0)
L = cdiv(bits, DIGIT_BITS)
da = jnp.asarray(rng.integers(0, 1 << 16, L, dtype=np.int64).astype(np.int32))
db = jnp.asarray(rng.integers(0, 1 << 16, L, dtype=np.int64).astype(np.int32))

run = _staged_flagship(plan)
# warm everything with fetches
for _ in range(2):
    out = run(da, db); _ = int(jnp.sum(out))

# timed whole
t0 = time.perf_counter(); out = run(da, db); _ = int(jnp.sum(out))
log(f"staged whole: {time.perf_counter()-t0:.2f}s")

# now time the pieces by instrumenting a copy of the run structure
from mpir_fft_tpu.models.mul import _pointwise, out_len_digits
from mpir_fft_tpu.ops.limb import Ring, div_2expmod, normmod
from mpir_fft_tpu.ops.mfa import mfa_fft_trunc_sqrt2, mfa_ifft_trunc_sqrt2
from mpir_fft_tpu.ops.split import fft_combine_bits, fft_split_bits
import functools
ring = Ring(plan.n, plan.w)
W, n1, t = plan.W, plan.n1, plan.trunc_mfa

@jax.jit
def fwd(d):
    ia = fft_split_bits(d, plan.bits1, plan.conv_len, ring.L)
    return mfa_fft_trunc_sqrt2(ia, plan.w, W, n1, t)[..., :t, :]

@functools.partial(jax.jit, donate_argnums=(0, 1))
def pw_chunk(fa, fb):
    return _pointwise(fa, fb, W, True)

@functools.partial(jax.jit, donate_argnums=0)
def norm_chunk(c):
    return normmod(div_2expmod(c, plan.lg_conv, W))

@functools.partial(jax.jit, donate_argnums=0)
def inv_transform(prod):
    pad = jnp.zeros((plan.conv_len - t, prod.shape[-1]), prod.dtype)
    c = mfa_ifft_trunc_sqrt2(jnp.concatenate([prod, pad], axis=-2), plan.w, W, n1, t)
    return c[..., :t, :]

@functools.partial(jax.jit, donate_argnums=0)
def combine(c):
    return fft_combine_bits(c, plan.bits1, out_len_digits(plan))

def timed(name, fn, *xs):
    outs = fn(*xs); _ = int(jnp.sum(outs))
    t0 = time.perf_counter(); outs = fn(*xs); _ = int(jnp.sum(outs))
    log(f"{name}: {time.perf_counter()-t0:.2f}s")
    return outs

fa = timed("fwd", fwd, da)
fb = fwd(db); fb.block_until_ready()
rows = 16384
# chunked pointwise without donation reuse problems: time one chunk fresh each time
xa, ya = fa[:rows], fb[:rows]
xa2, ya2 = jnp.copy(xa), jnp.copy(ya)
p1 = pw_chunk(xa2, ya2); _ = int(jnp.sum(p1))
xa3, ya3 = jnp.copy(xa), jnp.copy(ya)
t0 = time.perf_counter(); p2 = pw_chunk(xa3, ya3); _ = int(jnp.sum(p2))
log(f"pw_chunk[{rows}] (x{-(-t//rows)}): {time.perf_counter()-t0:.2f}s")
prod = jnp.concatenate([p2] * (-(-t//rows)), axis=0)[:t]
c = timed("inv", inv_transform, prod)
cc = jnp.copy(c[:rows]); n1c = norm_chunk(cc); _ = int(jnp.sum(n1c))
cc = jnp.copy(c[:rows])
t0 = time.perf_counter(); n2c = norm_chunk(cc); _ = int(jnp.sum(n2c))
log(f"norm_chunk[{rows}] (x{-(-t//rows)}): {time.perf_counter()-t0:.2f}s")
timed("combine", combine, jnp.copy(c))
log("DONE")
