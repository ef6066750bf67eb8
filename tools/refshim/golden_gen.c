// Golden-fixture generator: drives the REFERENCE seq-align C library over a
// simple line protocol so tools/gen_golden.py can pin library-level parity
// fixtures (tests/golden/{cases,golden}.tsv).  Built by
// tools/build_reference.sh as /tmp/refbuild/golden_gen against the real
// reference sources (with the SW mask-reset fix, see build_reference.sh).
//
// Input (one case per line, whitespace-separated):
//   <mode> <match> <mismatch> <gap_open> <gap_extend> <flags6> <seqa|.> <seqb|.> [extras]
//   mode:   nw | mat | sw | swmat   (mat/swmat additionally dump matrices)
//   flags6: no_start_gap, no_end_gap, no_gaps_in_a, no_gaps_in_b,
//           no_mismatches, case_sensitive (each '0'/'1')
//   extras: W <c> <s>        scoring_add_wildcard
//           S <a> <b> <s>    scoring_add_mutation
//           U <0|1>          use_match_mismatch
//           P <preset>       PAM30|PAM70|BLOSUM80|BLOSUM62|DNAHYB
//                            (replaces the whole scoring, like the presets)
//           L <min>          SW: stop fetching below this score
//           H <max>          SW: stop fetching after this many hits
// Output (tab-separated; "." encodes an empty string):
//   nw/mat:   [MATRIX <name> <w> <h> <w*h ints (y-major)>]x3?  NW <score> <ra> <rb>
//   sw/swmat: [MATRIX ...]x3?  SWHIT <score> <pa> <pb> <la> <lb> <ra> <rb>... SWEND
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "alignment.h"
#include "alignment_scoring.h"
#include "needleman_wunsch.h"
#include "smith_waterman.h"

#define MAXTOK 64
#define MAXLINE 4096

static void dump_matrices(const aligner_t *al, int nmat)
{
  // nmat = 3 for NW (match, gap_a, gap_b); 1 for SW (a traceback only
  // starts/ends on MATCH cells, smith_waterman.c:176-177)
  const char *names[3] = {"match", "gap_a", "gap_b"};
  const score_t *mats[3] = {al->match_scores, al->gap_a_scores,
                            al->gap_b_scores};
  size_t w = al->score_width, h = al->score_height;
  for(int m = 0; m < nmat; m++)
  {
    printf("MATRIX\t%s\t%zu\t%zu", names[m], w, h);
    for(size_t y = 0; y < h; y++)
      for(size_t x = 0; x < w; x++)
        printf("\t%i", mats[m][y * w + x]);
    printf("\n");
  }
}

static const char* dot(const char *s) { return (s && s[0]) ? s : "."; }

int main(void)
{
  char line[MAXLINE];
  nw_aligner_t *nw = needleman_wunsch_new();
  alignment_t *result = alignment_create(256);

  while(fgets(line, sizeof(line), stdin) != NULL)
  {
    // a case line longer than MAXLINE would be split by fgets and silently
    // parsed as two garbage cases — fail loudly instead
    if(strlen(line) == sizeof(line) - 1 && line[sizeof(line) - 2] != '\n')
    {
      fprintf(stderr, "golden_gen: case line exceeds %d bytes — raise "
              "MAXLINE\n", MAXLINE);
      exit(1);
    }
    char *tok[MAXTOK];
    int ntok = 0;
    for(char *p = strtok(line, " \t\r\n"); p && ntok < MAXTOK;
        p = strtok(NULL, " \t\r\n"))
      tok[ntok++] = p;
    if(ntok < 8) continue;

    const char *mode = tok[0];
    int match = atoi(tok[1]), mismatch = atoi(tok[2]);
    int gap_open = atoi(tok[3]), gap_extend = atoi(tok[4]);
    const char *fl = tok[5];
    const char *seq_a = strcmp(tok[6], ".") ? tok[6] : "";
    const char *seq_b = strcmp(tok[7], ".") ? tok[7] : "";

    scoring_t scoring;
    scoring_init(&scoring, match, mismatch, gap_open, gap_extend,
                 fl[0] == '1', fl[1] == '1', fl[2] == '1', fl[3] == '1',
                 fl[4] == '1', fl[5] == '1');

    long min_score = 0;
    char have_min = 0;
    long max_hits = -1;
    for(int i = 8; i < ntok; )
    {
      if(!strcmp(tok[i], "W") && i + 2 < ntok) {
        scoring_add_wildcard(&scoring, tok[i+1][0], atoi(tok[i+2]));
        i += 3;
      } else if(!strcmp(tok[i], "S") && i + 3 < ntok) {
        scoring_add_mutation(&scoring, tok[i+1][0], tok[i+2][0],
                             atoi(tok[i+3]));
        i += 4;
      } else if(!strcmp(tok[i], "U") && i + 1 < ntok) {
        scoring.use_match_mismatch = (char)atoi(tok[i+1]);
        i += 2;
      } else if(!strcmp(tok[i], "P") && i + 1 < ntok) {
        if(!strcmp(tok[i+1], "PAM30")) scoring_system_PAM30(&scoring);
        else if(!strcmp(tok[i+1], "PAM70")) scoring_system_PAM70(&scoring);
        else if(!strcmp(tok[i+1], "BLOSUM80")) scoring_system_BLOSUM80(&scoring);
        else if(!strcmp(tok[i+1], "BLOSUM62")) scoring_system_BLOSUM62(&scoring);
        else if(!strcmp(tok[i+1], "DNAHYB"))
          scoring_system_DNA_hybridization(&scoring);
        else { fprintf(stderr, "bad preset %s\n", tok[i+1]); exit(1); }
        i += 2;
      } else if(!strcmp(tok[i], "L") && i + 1 < ntok) {
        min_score = atol(tok[i+1]); have_min = 1;
        i += 2;
      } else if(!strcmp(tok[i], "H") && i + 1 < ntok) {
        max_hits = atol(tok[i+1]);
        i += 2;
      } else {
        fprintf(stderr, "bad extra token %s\n", tok[i]);
        exit(1);
      }
    }

    if(!strcmp(mode, "nw") || !strcmp(mode, "mat"))
    {
      needleman_wunsch_align(seq_a, seq_b, &scoring, nw, result);
      if(!strcmp(mode, "mat")) dump_matrices(nw, 3);
      printf("NW\t%i\t%s\t%s\n", result->score,
             dot(result->result_a), dot(result->result_b));
    }
    else if(!strcmp(mode, "sw") || !strcmp(mode, "swmat"))
    {
      sw_aligner_t *sw = smith_waterman_new();
      smith_waterman_align(seq_a, seq_b, &scoring, sw);
      if(!strcmp(mode, "swmat"))
        dump_matrices(smith_waterman_get_aligner(sw), 1);
      long nhits = 0;
      while((max_hits < 0 || nhits < max_hits) &&
            smith_waterman_fetch(sw, result))
      {
        if(have_min && result->score < min_score) break;
        printf("SWHIT\t%i\t%zu\t%zu\t%zu\t%zu\t%s\t%s\n", result->score,
               result->pos_a, result->pos_b, result->len_a, result->len_b,
               dot(result->result_a), dot(result->result_b));
        nhits++;
      }
      printf("SWEND\n");
      smith_waterman_free(sw);
    }
    else { fprintf(stderr, "bad mode %s\n", mode); exit(1); }
  }
  needleman_wunsch_free(nw);
  alignment_free(result);
  return 0;
}
