"""Transform parameter selection (depth, w, coefficient size).

The reference has *no* auto-tuner: every new_mpn_mul* caller hardcodes
(depth, w) and "will just segfault if n and w2 are not sufficiently large"
(mul_fft.c:3186-3188); the one runtime heuristic is fft_mulmod_2expp1's
size -> (depth, w1) derivation (mul_fft.c:3141-3162).  Here parameter choice
is a first-class, validated component.

Sizing rule (ref mul_fft.c:3194, 3271): with convolution length 2n and ring
width W = n*w bits, each input coefficient may hold
    bits1 = (W - (depth + 1)) // 2
bits so that accumulated pointwise sums never overflow mod p.  (We use the
sqrt2-safe depth+1 slack uniformly.)
"""

from __future__ import annotations

import dataclasses
import math

from mpir_fft_tpu.ops.limb import DIGIT_BITS


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class MulPlan:
    depth: int          # n = 2^depth, convolution length 2n
    w: int              # ring W = n*w bits, p = 2^W + 1
    bits1: int          # input coefficient size in bits
    j1: int             # number of coefficients of operand 1
    j2: int             # number of coefficients of operand 2
    bits_a: int
    bits_b: int

    @property
    def n(self) -> int:
        return 1 << self.depth

    @property
    def W(self) -> int:
        return self.n * self.w

    @property
    def trunc(self) -> int:
        # outputs needed: j1 + j2 - 1, rounded to an even count >= 2
        return max(2, 2 * cdiv(self.j1 + self.j2 - 1, 2))


def validate(plan: MulPlan):
    n, W = plan.n, plan.W
    assert W % DIGIT_BITS == 0
    assert plan.bits1 >= DIGIT_BITS, "coefficient size below one digit"
    assert 2 * plan.bits1 + plan.depth + 1 <= W, "coefficient overflow mod p"
    assert plan.j1 + plan.j2 - 1 <= 2 * n, "convolution wraps"
    assert plan.j1 == cdiv(plan.bits_a, plan.bits1)
    assert plan.j2 == cdiv(plan.bits_b, plan.bits1)
    return plan


def plan_for_depth(bits_a: int, bits_b: int, depth: int) -> MulPlan:
    """Smallest valid w for a given depth (mirrors how reference callers pick
    w after fixing depth, e.g. mul_fft.c:3576-3613)."""
    n = 1 << depth
    total = bits_a + bits_b
    # need j1 + j2 <= 2n  =>  bits1 >= ~total/(2n); then W >= 2*bits1 + depth+1
    for extra in range(0, 1 << 30):
        bits1 = cdiv(total, 2 * n) + extra
        # W must be a multiple of both 16 and n (so w is an integer)
        lcm = n * DIGIT_BITS // math.gcd(n, DIGIT_BITS)
        W = cdiv(2 * bits1 + depth + 1, lcm) * lcm
        w = W // n
        bits1_max = (W - (depth + 1)) // 2
        j1, j2 = cdiv(bits_a, bits1_max), cdiv(bits_b, bits1_max)
        if j1 + j2 - 1 <= 2 * n:
            return validate(
                MulPlan(depth, w, bits1_max, j1, j2, bits_a, bits_b)
            )
    raise AssertionError("unreachable")


def choose_params(bits_a: int, bits_b: int) -> MulPlan:
    """Pick (depth, w) balancing coefficient count vs coefficient size:
    aim for coefficient width ~ sqrt(total bits) (the square-ish rule of
    fft_mulmod_2expp1, mul_fft.c:3141-3162), scanning nearby depths for the
    cheapest plan by a simple work model."""
    total = bits_a + bits_b
    d0 = max(2, (total.bit_length() // 2) - 2)
    best, best_cost = None, None
    for depth in range(max(2, d0 - 2), d0 + 3):
        try:
            plan = plan_for_depth(bits_a, bits_b, depth)
        except AssertionError:
            continue
        n, W = plan.n, plan.W
        L = W // DIGIT_BITS
        # stage cost: 2n coefficients * L digits * (depth+1) stages * 3 passes
        fft_cost = 3 * (2 * n) * L * (depth + 1)
        # pointwise: schoolbook chunks (until recursion lands): 2n * (2L)^2
        pw_cost = (2 * n) * (2 * L) ** 2 // 8
        cost = 3 * fft_cost + pw_cost
        if best_cost is None or cost < best_cost:
            best, best_cost = plan, cost
    assert best is not None, "no valid plan found"
    return best
