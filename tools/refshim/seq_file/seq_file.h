/* Minimal shim of noporpoise/seq_file: FASTA/FASTQ/plain reading with
   transparent gzip, just enough for the reference CLI glue
   (alignment_cmdline.c:570-640).  Build aid for parity fixtures only. */
#ifndef SEQ_FILE_SHIM_H_
#define SEQ_FILE_SHIM_H_

#include <stdbool.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include <zlib.h>

#include "../string_buffer/string_buffer.h"

typedef struct {
  StrBuf name;
  StrBuf seq;
} read_t;

typedef struct {
  gzFile gz;      /* NULL when reading unbuffered from fd */
  int fd;         /* used when gz == NULL (interactive stdin) */
  int pushback;   /* one pushed-back char, or -1 */
} seq_file_t;

static inline seq_file_t *seq_open(const char *path) {
  gzFile gz = strcmp(path, "-") == 0 ? gzdopen(fileno(stdin), "r")
                                     : gzopen(path, "r");
  if (gz == NULL) return NULL;
  seq_file_t *sf = calloc(1, sizeof(seq_file_t));
  sf->gz = gz;
  sf->pushback = -1;
  return sf;
}

/* Interactive path: read the fd UNBUFFERED so later getc(stdin) calls (the
   SW h/a prompt, sw_cmdline.c:84-122) still see the remaining input. */
static inline seq_file_t *seq_dopen(int fd, bool ign1, bool ign2, int ign3) {
  (void)ign1; (void)ign2; (void)ign3;
  seq_file_t *sf = calloc(1, sizeof(seq_file_t));
  sf->gz = NULL;
  sf->fd = fd;
  sf->pushback = -1;
  return sf;
}

static inline void seq_close(seq_file_t *sf) {
  if (sf->gz != NULL) gzclose(sf->gz);
  free(sf);
}

static inline void seq_read_alloc(read_t *r) {
  r->name.b = malloc(64); r->name.size = 64; r->name.end = 0; r->name.b[0] = 0;
  r->seq.b = malloc(64); r->seq.size = 64; r->seq.end = 0; r->seq.b[0] = 0;
}

static inline void seq_read_dealloc(read_t *r) {
  free(r->name.b);
  free(r->seq.b);
}

static inline void _sbuf_push(StrBuf *s, char c) {
  if (s->end + 2 >= s->size) { s->size *= 2; s->b = realloc(s->b, s->size); }
  s->b[s->end++] = c;
  s->b[s->end] = '\0';
}

static inline int _sf_getc(seq_file_t *sf) {
  if (sf->pushback != -1) { int c = sf->pushback; sf->pushback = -1; return c; }
  if (sf->gz != NULL) return gzgetc(sf->gz);
  /* unbuffered: use stdio getc on stdin so the CLI's own getc interleaves */
  if (sf->fd == 0) return getc(stdin);
  { unsigned char ch; return read(sf->fd, &ch, 1) == 1 ? ch : -1; }
}

/* read one line into s (no newline); returns chars read or -1 at EOF */
static inline int _sf_line(seq_file_t *sf, StrBuf *s) {
  s->end = 0; s->b[0] = '\0';
  int c, n = 0;
  while ((c = _sf_getc(sf)) != -1) {
    if (c == '\n') return n;
    if (c != '\r') { _sbuf_push(s, (char)c); n++; }
  }
  return n > 0 ? n : -1;
}

/* Returns >0 when a sequence was read, <=0 at EOF. */
static inline int seq_read(seq_file_t *sf, read_t *r) {
  r->name.end = 0; r->name.b[0] = '\0';
  r->seq.end = 0; r->seq.b[0] = '\0';
  int c;
  /* skip blank lines */
  while ((c = _sf_getc(sf)) != -1 && (c == '\n' || c == '\r')) {}
  if (c == -1) return 0;
  if (c == '>') {
    if (_sf_line(sf, &r->name) < 0) return 0;
    /* read seq lines until next record start or EOF */
    StrBuf tmp; tmp.b = malloc(64); tmp.size = 64; tmp.end = 0;
    while ((c = _sf_getc(sf)) != -1) {
      if (c == '>' || c == '@') { sf->pushback = c; break; }
      if (c == '\n' || c == '\r') continue;
      /* read rest of this seq line */
      _sbuf_push(&r->seq, (char)c);
      while ((c = _sf_getc(sf)) != -1 && c != '\n')
        if (c != '\r') _sbuf_push(&r->seq, (char)c);
      if (c == -1) break;
    }
    free(tmp.b);
    return 1;
  }
  if (c == '@') {
    if (_sf_line(sf, &r->name) < 0) return 0;
    if (_sf_line(sf, &r->seq) < 0) return 0;
    StrBuf tmp; tmp.b = malloc(64); tmp.size = 64; tmp.end = 0; tmp.b[0] = 0;
    _sf_line(sf, &tmp); /* '+' line */
    _sf_line(sf, &tmp); /* quals */
    free(tmp.b);
    return 1;
  }
  /* plain line */
  _sbuf_push(&r->seq, (char)c);
  while ((c = _sf_getc(sf)) != -1 && c != '\n')
    if (c != '\r') _sbuf_push(&r->seq, (char)c);
  return 1;
}

#endif
