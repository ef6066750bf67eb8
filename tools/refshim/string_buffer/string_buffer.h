/* Minimal shim of noporpoise/string_buffer: just the surface the reference's
   alignment_scoring_load.c uses.  Build aid for parity fixtures only — not
   part of the framework. */
#ifndef STRING_BUFFER_SHIM_H_
#define STRING_BUFFER_SHIM_H_

#include <ctype.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

typedef struct {
  char *b;
  size_t end;   /* length of string */
  size_t size;  /* buffer capacity */
} StrBuf;

static inline StrBuf *strbuf_new(size_t cap) {
  StrBuf *s = calloc(1, sizeof(StrBuf));
  s->size = cap < 16 ? 16 : cap;
  s->b = malloc(s->size);
  s->b[0] = '\0';
  s->end = 0;
  return s;
}

static inline void strbuf_free(StrBuf *s) {
  free(s->b);
  free(s);
}

static inline void strbuf_chomp(StrBuf *s) {
  while (s->end > 0 && (s->b[s->end - 1] == '\n' || s->b[s->end - 1] == '\r'))
    s->b[--s->end] = '\0';
}

/* read one line (incl. newline) from gz file; returns bytes read, 0 at EOF */
static inline size_t strbuf_reset_gzreadline(StrBuf *s, gzFile gz) {
  s->end = 0;
  s->b[0] = '\0';
  int c;
  while ((c = gzgetc(gz)) != -1) {
    if (s->end + 2 >= s->size) {
      s->size *= 2;
      s->b = realloc(s->b, s->size);
    }
    s->b[s->end++] = (char)c;
    if (c == '\n') break;
  }
  s->b[s->end] = '\0';
  return s->end;
}

static inline char string_is_all_whitespace(const char *s) {
  for (; *s != '\0'; s++)
    if (!isspace((unsigned char)*s)) return 0;
  return 1;
}

static inline char *string_next_nonwhitespace(char *s) {
  if (s == NULL) return NULL;
  for (; *s != '\0'; s++)
    if (!isspace((unsigned char)*s)) return s;
  return NULL;
}

#endif
