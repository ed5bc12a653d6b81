/* Baseline timing harness: times the system GMP assembly multiplier
 * (mpn_mul) so BASELINE.md can record a *measured* CPU big-int baseline --
 * the role of the makefile's absent time_gmp.c comparison harness in the
 * reference (ref makefile:10-11; commented mpn_mul A/B calls at
 * mul_fft.c:5359, 5406, 5452).
 *
 * The image ships libgmp.so.10 without headers; the mpn ABI is stable, so
 * the needed entry points are declared here and linked directly:
 *
 *   cc -O2 -o gmp_baseline gmp_baseline.c -l:libgmp.so.10
 *
 * Usage: gmp_baseline <bits> <reps>   -> one JSON line on stdout.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef unsigned long mp_limb_t; /* 64-bit on x86-64 / aarch64 */

/* GMP's public mpn entry points use the __gmpn_ prefix at the ABI level. */
extern mp_limb_t __gmpn_mul(mp_limb_t *rp, const mp_limb_t *u, long un,
                            const mp_limb_t *v, long vn);

static double now_s(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

int main(int argc, char **argv) {
  long bits = argc > 1 ? atol(argv[1]) : 10000000L;
  int reps = argc > 2 ? atoi(argv[2]) : 3;
  long limbs = (bits + 63) / 64;

  mp_limb_t *a = malloc((size_t)limbs * sizeof *a);
  mp_limb_t *b = malloc((size_t)limbs * sizeof *b);
  mp_limb_t *r = malloc((size_t)(2 * limbs) * sizeof *r);
  if (!a || !b || !r) {
    fprintf(stderr, "alloc failed\n");
    return 1;
  }
  srand(12345);
  for (long i = 0; i < limbs; i++) {
    a[i] = ((mp_limb_t)rand() << 33) ^ ((mp_limb_t)rand() << 10) ^ (mp_limb_t)rand();
    b[i] = ((mp_limb_t)rand() << 33) ^ ((mp_limb_t)rand() << 10) ^ (mp_limb_t)rand();
  }
  a[limbs - 1] |= (mp_limb_t)1 << 63;
  b[limbs - 1] |= (mp_limb_t)1 << 63;

  /* warm-up */
  __gmpn_mul(r, a, limbs, b, limbs);

  double best = 1e30;
  for (int i = 0; i < reps; i++) {
    double t0 = now_s();
    __gmpn_mul(r, a, limbs, b, limbs);
    double dt = now_s() - t0;
    if (dt < best) best = dt;
  }
  /* keep r live */
  volatile mp_limb_t sink = r[0] ^ r[2 * limbs - 1];
  (void)sink;

  printf("{\"metric\": \"gmp_mpn_mul_%ldbit_walltime\", \"value\": %.6f, "
         "\"unit\": \"s\", \"limbs\": %ld}\n",
         bits, best, limbs);
  free(a);
  free(b);
  free(r);
  return 0;
}
