/* Host-side data marshalling runtime: the native layer between raw big-int
 * byte buffers (files, sockets, GMP exports) and the framework's int32
 * base-2^16 digit planes.  Plays the role the reference's in-process limb
 * arrays play at the mpn boundary (ref FFT_split/_combine operate directly
 * on mpn limb memory, mul_fft.c:87-267); here the device arrays are int32
 * planes, and this library converts/validates at memory bandwidth without
 * bouncing through Python objects.
 *
 * Built as a shared library and bound via ctypes (native/__init__.py):
 *
 *   cc -O2 -shared -fPIC -o libmarshal.so marshal.c
 */

#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* little-endian byte buffer -> int32 digit planes (base 2^16).
 * nbytes may be odd; digits beyond the data are zeroed up to L. */
void digits_from_bytes(const uint8_t *src, size_t nbytes, int32_t *dst,
                       size_t L) {
  size_t full = nbytes / 2;
  if (full > L) full = L;
  for (size_t i = 0; i < full; i++)
    dst[i] = (int32_t)((uint32_t)src[2 * i] | ((uint32_t)src[2 * i + 1] << 8));
  size_t i = full;
  if (2 * full < nbytes && full < L) {
    dst[i] = (int32_t)src[2 * full];
    i++;
  }
  for (; i < L; i++) dst[i] = 0;
}

/* canonical digit planes -> little-endian bytes; returns 0 on success,
 * -1 if any digit is out of [0, 2^16) (caller must canonicalize first). */
int bytes_from_digits(const int32_t *src, size_t L, uint8_t *dst) {
  for (size_t i = 0; i < L; i++) {
    int32_t d = src[i];
    if (d < 0 || d > 0xFFFF) return -1;
    dst[2 * i] = (uint8_t)(d & 0xFF);
    dst[2 * i + 1] = (uint8_t)((d >> 8) & 0xFF);
  }
  return 0;
}

/* 64-bit limb buffer (GMP mpn order) <-> digit planes: lets callers feed
 * mpn memory straight into the device path. */
void digits_from_limbs64(const uint64_t *src, size_t nlimbs, int32_t *dst,
                         size_t L) {
  size_t full = nlimbs * 4 > L ? L / 4 : nlimbs;
  for (size_t i = 0; i < full; i++) {
    uint64_t v = src[i];
    dst[4 * i + 0] = (int32_t)(v & 0xFFFF);
    dst[4 * i + 1] = (int32_t)((v >> 16) & 0xFFFF);
    dst[4 * i + 2] = (int32_t)((v >> 32) & 0xFFFF);
    dst[4 * i + 3] = (int32_t)((v >> 48) & 0xFFFF);
  }
  for (size_t i = 4 * full; i < L; i++) dst[i] = 0;
}

int limbs64_from_digits(const int32_t *src, size_t L, uint64_t *dst,
                        size_t nlimbs) {
  size_t full = L / 4 < nlimbs ? L / 4 : nlimbs;
  for (size_t i = 0; i < full; i++) {
    int32_t d0 = src[4 * i], d1 = src[4 * i + 1], d2 = src[4 * i + 2],
            d3 = src[4 * i + 3];
    if ((d0 | d1 | d2 | d3) < 0 || d0 > 0xFFFF || d1 > 0xFFFF ||
        d2 > 0xFFFF || d3 > 0xFFFF)
      return -1;
    dst[i] = (uint64_t)(uint32_t)d0 | ((uint64_t)(uint32_t)d1 << 16) |
             ((uint64_t)(uint32_t)d2 << 32) | ((uint64_t)(uint32_t)d3 << 48);
  }
  for (size_t i = full; i < nlimbs; i++) dst[i] = 0;
  /* leftover digits past 4*nlimbs must be zero to round-trip */
  for (size_t i = 4 * full; i < L; i++)
    if (src[i] != 0) return -2;
  return 0;
}

/* Exact big-int compare of two canonical digit buffers (for host-side
 * verification loops): returns -1/0/1. */
int digits_cmp(const int32_t *a, size_t La, const int32_t *b, size_t Lb) {
  size_t L = La > Lb ? La : Lb;
  for (size_t i = L; i-- > 0;) {
    int32_t av = i < La ? a[i] : 0;
    int32_t bv = i < Lb ? b[i] : 0;
    if (av != bv) return av < bv ? -1 : 1;
  }
  return 0;
}

/* Exact big-int multiply via GMP's assembly mpn_mul (the host oracle for
 * verifying device products at sizes where CPython's multiply is too slow;
 * plays the role of the reference's mpz oracle layer, mul_fft.c:3677-3775).
 * Little-endian byte buffers; returns 0 on success. */
typedef unsigned long mf_limb_t;
extern mf_limb_t __gmpn_mul(mf_limb_t *, const mf_limb_t *, long,
                            const mf_limb_t *, long);

int gmp_mul_bytes(const uint8_t *a, size_t abytes, const uint8_t *b,
                  size_t bbytes, uint8_t *out /* abytes+bbytes */) {
  size_t al = (abytes + 7) / 8, bl = (bbytes + 7) / 8;
  mf_limb_t *la = (mf_limb_t *)calloc(al ? al : 1, 8);
  mf_limb_t *lb = (mf_limb_t *)calloc(bl ? bl : 1, 8);
  mf_limb_t *lr = (mf_limb_t *)calloc(al + bl, 8);
  if (!la || !lb || !lr) return -1;
  memcpy(la, a, abytes);
  memcpy(lb, b, bbytes);
  if (al >= bl)
    __gmpn_mul(lr, la, (long)al, lb, (long)bl);
  else
    __gmpn_mul(lr, lb, (long)bl, la, (long)al);
  memcpy(out, lr, abytes + bbytes);
  free(la); free(lb); free(lr);
  return 0;
}
