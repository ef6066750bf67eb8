/* Minimal shim of noporpoise/sort_r.  Build aid only.
 *
 * Deliberately a STABLE merge sort rather than glibc qsort_r: modern glibc
 * switched qsort to an unstable introsort, which makes the reference's SW
 * hit order for full (score, x) ties depend on the glibc version.  The
 * historical behavior the reference was developed against (glibc mergesort)
 * keeps insertion order for ties; our framework pins that contract, so the
 * parity fixtures are generated against it too. */
#ifndef SORT_R_SHIM_H_
#define SORT_R_SHIM_H_

#include <stdlib.h>
#include <string.h>

static inline void _sort_r_merge(char *base, char *tmp, size_t lo, size_t mid,
                                 size_t hi, size_t w,
                                 int (*cmp)(const void *, const void *, void *),
                                 void *arg) {
  size_t i = lo, j = mid, k = lo;
  while (i < mid && j < hi) {
    if (cmp(base + j * w, base + i * w, arg) < 0)
      memcpy(tmp + (k++) * w, base + (j++) * w, w);
    else
      memcpy(tmp + (k++) * w, base + (i++) * w, w);
  }
  while (i < mid) memcpy(tmp + (k++) * w, base + (i++) * w, w);
  while (j < hi) memcpy(tmp + (k++) * w, base + (j++) * w, w);
  memcpy(base + lo * w, tmp + lo * w, (hi - lo) * w);
}

static inline void _sort_r_ms(char *base, char *tmp, size_t lo, size_t hi,
                              size_t w,
                              int (*cmp)(const void *, const void *, void *),
                              void *arg) {
  if (hi - lo < 2) return;
  size_t mid = lo + (hi - lo) / 2;
  _sort_r_ms(base, tmp, lo, mid, w, cmp, arg);
  _sort_r_ms(base, tmp, mid, hi, w, cmp, arg);
  _sort_r_merge(base, tmp, lo, mid, hi, w, cmp, arg);
}

static inline void sort_r(void *base, size_t nel, size_t width,
                          int (*cmp)(const void *, const void *, void *),
                          void *arg) {
  if (nel < 2) return;
  char *tmp = malloc(nel * width);
  _sort_r_ms((char *)base, tmp, 0, nel, width, cmp, arg);
  free(tmp);
}

#endif
