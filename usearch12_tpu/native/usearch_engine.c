/* Batch search engine: window-at-a-time native plumbing.
 *
 * The reference engine is a lazy per-query loop (src/search.cpp:51-87,
 * src/udbusortedsearcher.cpp:122-152): rank candidates, align one at a
 * time, stop at maxaccepts/maxrejects.  The TPU-first formulation keeps
 * those exact semantics but restructures the work into window-sized
 * batches so the DP can run on the device in large dispatches:
 *
 *   rank_batch_c   - rank a window of queries (SetTopBump + count-sort
 *                    order per query, capped at maxaccepts+maxrejects)
 *   chain_batch_c  - HSP chain each (query, candidate) pair, align small
 *                    inter-HSP holes inline, and EMIT large holes as a
 *                    packed batch for the device wavefront kernel
 *   finish_replay_c- splice device hole paths into full paths, compute
 *                    alignment stats, and replay the accept/terminate
 *                    loop per query in candidate order (bit-identical
 *                    to the serial loop)
 *   fasta_parse_c  - bulk FASTA parse of a whole buffer
 *
 * All functions are stateless between calls except for the EngineScratch
 * growable buffers.  Python orchestrates windows and the device round
 * trip; see usearch12_tpu/engine/.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef uint8_t byte;

typedef struct {
    float open_a, open_b, ext_a, ext_b;
    float l_open_a, l_open_b, r_open_a, r_open_b;
    float l_ext_a, l_ext_b, r_ext_a, r_ext_b;
} GapParams;

/* opaque handles from usearch_native.c */
typedef struct HSPFinderC HSPFinderC;
typedef struct AlignScratch AlignScratch;
typedef struct RankScratch RankScratch;

extern void hsp_set_a(HSPFinderC *hf, const byte *a, uint32_t la);
extern void hsp_set_b(HSPFinderC *hf, const byte *b, uint32_t lb);
extern int global_chain_c(HSPFinderC *hf, AlignScratch *s,
                          const byte *match_mx, uint32_t min_len,
                          float min_fract_id, float min_score, float xdrop_g,
                          int full_dp_always, int fail_if_no_hsps,
                          uint32_t *hsps_out, float *hsp_fract_id);
extern int nw_band(const byte *a, uint32_t la, const byte *b, uint32_t lb,
                   uint32_t dlo, uint32_t dhi, const GapParams *gp,
                   const float *mx, byte *tb, float *mrow, float *drow,
                   char *path_out, float *score_out);
extern int nw_full(const byte *a, uint32_t la, const byte *b, uint32_t lb,
                   const GapParams *gp, const float *mx, byte *tb,
                   float *mrow, float *drow, char *path_out,
                   float *score_out);
extern int path_stats_c(const uint8_t *path, int64_t col_count,
                        const uint8_t *q, const uint8_t *t, int64_t loi,
                        int64_t loj, const uint8_t *match_mx,
                        const uint8_t *to_upper, int64_t *out);
extern int64_t usort_rank_c(
    RankScratch *s, const uint8_t *seq, uint32_t L,
    const uint8_t *char_to_letter, uint32_t alpha_size, uint32_t wlen,
    int64_t slot_count, const int64_t *starts, const int32_t *postings,
    int has_csr, const int64_t *sw, const int32_t *st, int64_t n_sorted,
    const int64_t *pw, const int32_t *pt, int64_t n_pending,
    uint32_t seq_count, uint32_t bump_pct, int mode, uint32_t *out_tix,
    uint32_t *out_counts);

/* ---------------------------------------------------------------- */
/* growable scratch shared across engine calls                      */

typedef struct {
    byte *tb;           /* DP traceback scratch */
    size_t tb_cap;
    float *mrow, *drow;
    size_t row_cap;
    char *path;         /* per-pair spliced path temp */
    size_t path_cap;
    uint32_t *stage_tix;    /* full-length rank staging */
    uint32_t *stage_cnt;
    size_t stage_cap;
    uint32_t hsps[512 * 4]; /* per-pair chained HSPs */
} EngineScratch;

EngineScratch *engine_scratch_create(void)
{
    return (EngineScratch *)calloc(1, sizeof(EngineScratch));
}

void engine_scratch_destroy(EngineScratch *s)
{
    if (!s)
        return;
    free(s->tb);
    free(s->mrow);
    free(s->drow);
    free(s->path);
    free(s->stage_tix);
    free(s->stage_cnt);
    free(s);
}

static void eng_alloc_dp(EngineScratch *s, uint32_t la, uint32_t lb)
{
    size_t need_tb = ((size_t)la + 1) * ((size_t)lb + 1);
    if (need_tb > s->tb_cap) {
        free(s->tb);
        s->tb_cap = need_tb + 4096;
        s->tb = (byte *)malloc(s->tb_cap);
    }
    size_t need_row = (size_t)lb + 2;
    if (need_row > s->row_cap) {
        free(s->mrow);
        free(s->drow);
        s->row_cap = need_row + 1024;
        s->mrow = (float *)malloc(s->row_cap * sizeof(float));
        s->drow = (float *)malloc(s->row_cap * sizeof(float));
    }
}

static void eng_alloc_path(EngineScratch *s, size_t need)
{
    if (need > s->path_cap) {
        free(s->path);
        s->path_cap = need + 4096;
        s->path = (char *)malloc(s->path_cap);
    }
}

/* ---------------------------------------------------------------- */
/* bulk FASTA parse
 *
 * Semantics of io/fastx.py read_fasta(stream=True): labels are the bytes
 * after '>' up to (and excluding) the line end; sequence bytes are
 * filtered through keep[256]; empty-sequence records are SKIPPED but
 * recorded (out_empty) so the caller can emit the reference's warning.
 * Returns the record count (skipped empties excluded), or -1 if caps are
 * exceeded (caller grows and retries). */
int64_t fasta_parse_c(const uint8_t *buf, int64_t n, const uint8_t *keep,
                      uint8_t *seq_buf, int64_t seq_cap,
                      int64_t *seq_off,          /* cap: max_rec + 1 */
                      int64_t *lbl_off, int64_t *lbl_end,
                      int64_t max_rec, int64_t *out_empty)
{
    int64_t nrec = 0, spos = 0, nempty = 0;
    int64_t i = 0;
    int64_t cur_lbl_off = -1, cur_lbl_end = -1;
    seq_off[0] = 0;
    while (i < n) {
        /* find end of line */
        int64_t eol = i;
        while (eol < n && buf[eol] != '\n')
            ++eol;
        int64_t end = eol;
        if (end > i && buf[end - 1] == '\r')
            --end;
        if (i < n && buf[i] == '>') {
            if (cur_lbl_off >= 0) {
                if (spos > seq_off[nrec]) {
                    lbl_off[nrec] = cur_lbl_off;
                    lbl_end[nrec] = cur_lbl_end;
                    ++nrec;
                    if (nrec >= max_rec)
                        return -1;
                    seq_off[nrec] = spos;
                } else {
                    ++nempty;
                }
            }
            cur_lbl_off = i + 1;
            cur_lbl_end = end;
        } else if (cur_lbl_off >= 0) {
            for (int64_t k = i; k < end; ++k) {
                uint8_t c = buf[k];
                if (keep[c]) {
                    if (spos >= seq_cap)
                        return -1;
                    seq_buf[spos++] = c;
                }
            }
        }
        i = eol + 1;
    }
    if (cur_lbl_off >= 0) {
        if (spos > seq_off[nrec]) {
            lbl_off[nrec] = cur_lbl_off;
            lbl_end[nrec] = cur_lbl_end;
            ++nrec;
            seq_off[nrec] = spos;
        } else {
            ++nempty;
        }
    }
    *out_empty = nempty;
    return nrec;
}

/* ---------------------------------------------------------------- */
/* FastMask a concatenated DB in place (out must be pre-uppercased) */
extern void fast_mask_c(const uint8_t *up_unused, uint8_t *out, int64_t L,
                        int hardmask, uint8_t hard_char);

void fast_mask_batch_c(uint8_t *out, const int64_t *offs, int64_t n,
                       int hardmask, uint8_t hard_char)
{
    for (int64_t i = 0; i < n; ++i)
        fast_mask_c(out + offs[i], out + offs[i],
                    offs[i + 1] - offs[i], hardmask, hard_char);
}

/* ---------------------------------------------------------------- */
/* batched ranking: usort_rank_c per job seq, top-K kept.
 * out_tix/out_counts are (n_jobs, K); out_n[j] = kept count (<=K);
 * out_more[j] = 1 if the full candidate list was longer than K (the
 * caller must fall back to an uncapped rank for that job). */
int64_t rank_batch_c(
    RankScratch *rs, EngineScratch *es,
    const uint8_t *jbuf, const int64_t *j_off, int64_t n_jobs,
    const uint8_t *char_to_letter, uint32_t alpha_size, uint32_t wlen,
    int64_t slot_count,
    const int64_t *starts, const int32_t *postings, int has_csr,
    const int64_t *sw, const int32_t *st, int64_t n_sorted,
    const int64_t *pw, const int32_t *pt, int64_t n_pending,
    uint32_t seq_count, uint32_t bump_pct, int mode, int64_t K,
    uint32_t *out_tix, uint32_t *out_counts, int32_t *out_n,
    uint8_t *out_more)
{
    if ((size_t)seq_count + 64 > es->stage_cap) {
        free(es->stage_tix);
        free(es->stage_cnt);
        es->stage_cap = (size_t)seq_count * 2 + 1024;
        es->stage_tix = (uint32_t *)malloc(es->stage_cap * sizeof(uint32_t));
        es->stage_cnt = (uint32_t *)malloc(es->stage_cap * sizeof(uint32_t));
    }
    for (int64_t j = 0; j < n_jobs; ++j) {
        const uint8_t *seq = jbuf + j_off[j];
        int64_t L = j_off[j + 1] - j_off[j];
        int64_t nc = usort_rank_c(rs, seq, (uint32_t)L, char_to_letter,
                                  alpha_size, wlen, slot_count, starts,
                                  postings, has_csr, sw, st, n_sorted, pw,
                                  pt, n_pending, seq_count, bump_pct, mode,
                                  es->stage_tix, es->stage_cnt);
        int64_t keep = nc < K ? nc : K;
        memcpy(out_tix + j * K, es->stage_tix, keep * sizeof(uint32_t));
        memcpy(out_counts + j * K, es->stage_cnt, keep * sizeof(uint32_t));
        out_n[j] = (int32_t)keep;
        out_more[j] = nc > K;
    }
    return n_jobs;
}

/* ---------------------------------------------------------------- */
/* hole gap-parameter class (AlnParams::Init terminal adjustment,
 * mirrored from align_hole in usearch_native.c / ops/batch_align.py) */
static void hole_params(const GapParams *gp, int left_a, int left_b,
                        int right_a, int right_b, GapParams *lp)
{
    lp->open_a = gp->open_a;
    lp->open_b = gp->open_b;
    lp->ext_a = gp->ext_a;
    lp->ext_b = gp->ext_b;
    lp->l_open_a = left_a ? gp->l_open_a : gp->open_a;
    lp->l_ext_a = left_a ? gp->l_ext_a : gp->ext_a;
    lp->l_open_b = left_b ? gp->l_open_b : gp->open_b;
    lp->l_ext_b = left_b ? gp->l_ext_b : gp->ext_b;
    lp->r_open_a = right_a ? gp->r_open_a : gp->open_a;
    lp->r_ext_a = right_a ? gp->r_ext_a : gp->ext_a;
    lp->r_open_b = right_b ? gp->r_open_b : gp->open_b;
    lp->r_ext_b = right_b ? gp->r_ext_b : gp->ext_b;
}

static void eng_band_range(uint32_t la, uint32_t lb, uint32_t band_radius,
                           uint32_t *dlo, uint32_t *dhi)
{
    uint32_t lo = la < lb ? la : lb;
    uint32_t hi = la > lb ? la : lb;
    if (lo > band_radius)
        lo -= band_radius;
    else
        lo = 1;
    hi += band_radius;
    uint32_t maxdiag = la + lb - 1;
    if (hi > maxdiag)
        hi = maxdiag;
    *dlo = lo;
    *dhi = hi;
}

/* segment kinds in the per-pair splice plan */
#define SEG_M 0
#define SEG_I 1
#define SEG_D 2
#define SEG_HOLE 3     /* seg_val = hole index (device-aligned) */
#define SEG_LIT 4      /* seg_val = offset into lit_buf, seg_val2 = len */

/* pair statuses */
#define PAIR_FAIL 0    /* not aligned (gates) */
#define PAIR_PLAN 1    /* plan emitted */

/* Chain a batch of pairs.  Pairs must be grouped by job (pair_j) so the
 * query word dictionary is built once per job.  Holes with
 * leni*lenj >= dev_min_cells are emitted to the hole arrays (device);
 * smaller holes (and everything when dev_min_cells < 0 is given as a
 * huge number) are banded-NW'd inline into lit_buf.
 * Returns the hole count, or -(1+needed_kind) on capacity overflow:
 *   -1 seg cap, -2 hole cap, -3 lit cap.  Caller grows and retries. */
int64_t chain_batch_c(
    HSPFinderC *hf, AlignScratch *as, EngineScratch *es,
    const GapParams *gp, const float *sub_mx, const byte *match_mx,
    uint32_t band_radius, uint32_t min_hsp_len, float min_hsp_fract,
    float min_hsp_score, float xdrop_g, int full_dp_always,
    int fail_if_no_hsps,
    const uint8_t *jbuf, const int64_t *j_off,
    const uint8_t *db, const int64_t *db_off, const int64_t *db_len,
    const int32_t *pair_j, const uint32_t *pair_t, int64_t n_pairs,
    int64_t dev_min_cells,
    uint8_t *status,
    uint8_t *seg_kind, int64_t *seg_val, int64_t *seg_val2,
    int64_t *pair_seg_off, int64_t seg_cap,
    int32_t *hole_pair, int64_t *hole_aoff, int64_t *hole_boff,
    int32_t *hole_alen, int32_t *hole_blen, uint8_t *hole_cls,
    int64_t hole_cap,
    char *lit_buf, int64_t lit_cap)
{
    int64_t n_seg = 0, n_hole = 0, lit_pos = 0;
    int32_t last_j = -1;
    pair_seg_off[0] = 0;
    for (int64_t p = 0; p < n_pairs; ++p) {
        int32_t j = pair_j[p];
        const uint8_t *a = jbuf + j_off[j];
        uint32_t la = (uint32_t)(j_off[j + 1] - j_off[j]);
        if (j != last_j) {
            hsp_set_a(hf, a, la);
            last_j = j;
        }
        uint32_t t = pair_t[p];
        const uint8_t *b = db + db_off[t];
        uint32_t lb = (uint32_t)db_len[t];
        hsp_set_b(hf, b, lb);
        float fract = 0.0f;
        int nch = global_chain_c(hf, as, match_mx, min_hsp_len,
                                 min_hsp_fract, min_hsp_score, xdrop_g,
                                 full_dp_always, fail_if_no_hsps, es->hsps,
                                 &fract);
        if (nch == -1) {
            status[p] = PAIR_FAIL;
            pair_seg_off[p + 1] = n_seg;
            continue;
        }
        status[p] = PAIR_PLAN;
        /* hole list for this pair: chained HSPs with gaps between them,
         * or the whole pair as one terminal hole (fallback / fulldp) */
        int64_t n_items;
        /* item: hloi, hloj, hleni, hlenj, then optional M run */
        if (nch == -2 || nch == -3) {
            /* -2: no chain -> whole-pair banded NW fallback
             * -3: full_dp_always -> whole-pair FULL NW (band 0) */
            if (n_seg + 1 > seg_cap)
                return -1;
            uint64_t cells = (uint64_t)la * lb;
            int force_host = (nch == -3);
            if (!force_host && (int64_t)cells >= dev_min_cells) {
                if (n_hole + 1 > hole_cap)
                    return -2;
                hole_pair[n_hole] = (int32_t)p;
                hole_aoff[n_hole] = j_off[j];
                hole_boff[n_hole] = db_off[t];
                hole_alen[n_hole] = (int32_t)la;
                hole_blen[n_hole] = (int32_t)lb;
                hole_cls[n_hole] = 0xF;   /* all four edges terminal */
                seg_kind[n_seg] = SEG_HOLE;
                seg_val[n_seg] = n_hole;
                ++n_hole;
                ++n_seg;
            } else {
                if (lit_pos + la + lb + 2 > lit_cap)
                    return -3;
                eng_alloc_dp(es, la, lb);
                float score;
                int n;
                if (nch == -3 || band_radius == 0) {
                    n = nw_full(a, la, b, lb, gp, sub_mx, es->tb, es->mrow,
                                es->drow, lit_buf + lit_pos, &score);
                } else {
                    uint32_t dlo, dhi;
                    eng_band_range(la, lb, band_radius, &dlo, &dhi);
                    n = nw_band(a, la, b, lb, dlo, dhi, gp, sub_mx, es->tb,
                                es->mrow, es->drow, lit_buf + lit_pos,
                                &score);
                }
                if (n < 0)
                    return -4;
                seg_kind[n_seg] = SEG_LIT;
                seg_val[n_seg] = lit_pos;
                seg_val2[n_seg] = n;
                lit_pos += n;
                ++n_seg;
            }
            pair_seg_off[p + 1] = n_seg;
            continue;
        }
        /* chained HSPs: holes between them (GlobalAlign_AllOpts walk) */
        uint32_t prev_hii = 0, prev_hij = 0;
        int have_prev = 0;
        n_items = nch + 1;
        for (int64_t i = 0; i < n_items; ++i) {
            uint32_t hloi, hloj, hleni, hlenj;
            if (i < nch) {
                const uint32_t *h = &es->hsps[4 * i];
                if (!have_prev) {
                    hloi = 0;
                    hloj = 0;
                    hleni = h[0];
                    hlenj = h[1];
                } else {
                    hloi = prev_hii + 1;
                    hloj = prev_hij + 1;
                    hleni = h[0] - prev_hii - 1;
                    hlenj = h[1] - prev_hij - 1;
                }
            } else {
                hloi = prev_hii + 1;
                hloj = prev_hij + 1;
                hleni = la - hloi;
                hlenj = lb - hloj;
            }
            /* emit the hole */
            if (hleni == 0 && hlenj > 0) {
                if (n_seg + 1 > seg_cap)
                    return -1;
                seg_kind[n_seg] = SEG_I;
                seg_val[n_seg] = hlenj;
                ++n_seg;
            } else if (hlenj == 0 && hleni > 0) {
                if (n_seg + 1 > seg_cap)
                    return -1;
                seg_kind[n_seg] = SEG_D;
                seg_val[n_seg] = hleni;
                ++n_seg;
            } else if (hleni > 0 && hlenj > 0) {
                if (n_seg + 1 > seg_cap)
                    return -1;
                uint64_t cells = (uint64_t)hleni * hlenj;
                int left_a = hloi == 0, left_b = hloj == 0;
                int right_a = hloi + hleni == la;
                int right_b = hloj + hlenj == lb;
                if ((int64_t)cells >= dev_min_cells) {
                    if (n_hole + 1 > hole_cap)
                        return -2;
                    hole_pair[n_hole] = (int32_t)p;
                    hole_aoff[n_hole] = j_off[j] + hloi;
                    hole_boff[n_hole] = db_off[t] + hloj;
                    hole_alen[n_hole] = (int32_t)hleni;
                    hole_blen[n_hole] = (int32_t)hlenj;
                    hole_cls[n_hole] = (uint8_t)(left_a | (left_b << 1) |
                                                 (right_a << 2) |
                                                 (right_b << 3));
                    seg_kind[n_seg] = SEG_HOLE;
                    seg_val[n_seg] = n_hole;
                    ++n_hole;
                    ++n_seg;
                } else {
                    if (lit_pos + hleni + hlenj + 2 > lit_cap)
                        return -3;
                    GapParams lp;
                    hole_params(gp, left_a, left_b, right_a, right_b, &lp);
                    eng_alloc_dp(es, hleni, hlenj);
                    float score;
                    int n;
                    if (band_radius == 0) {
                        n = nw_full(a + hloi, hleni, b + hloj, hlenj, &lp,
                                    sub_mx, es->tb, es->mrow, es->drow,
                                    lit_buf + lit_pos, &score);
                    } else {
                        uint32_t dlo, dhi;
                        eng_band_range(hleni, hlenj, band_radius, &dlo,
                                       &dhi);
                        n = nw_band(a + hloi, hleni, b + hloj, hlenj, dlo,
                                    dhi, &lp, sub_mx, es->tb, es->mrow,
                                    es->drow, lit_buf + lit_pos, &score);
                    }
                    if (n < 0)
                        return -4;
                    seg_kind[n_seg] = SEG_LIT;
                    seg_val[n_seg] = lit_pos;
                    seg_val2[n_seg] = n;
                    lit_pos += n;
                    ++n_seg;
                }
            }
            if (i < nch) {
                const uint32_t *h = &es->hsps[4 * i];
                if (n_seg + 1 > seg_cap)
                    return -1;
                seg_kind[n_seg] = SEG_M;
                seg_val[n_seg] = h[2];
                ++n_seg;
                prev_hii = h[0] + h[2] - 1;
                prev_hij = h[1] + h[3] - 1;
                have_prev = 1;
            }
        }
        pair_seg_off[p + 1] = n_seg;
    }
    return n_hole;
}

/* Splice + stats + accept/terminate replay.
 *
 * Pairs are grouped by job in candidate order (the same pair arrays that
 * chain_batch_c consumed).  Per job, pairs are consumed until the
 * terminator fires (maxaccepts/maxrejects) exactly as the serial loop
 * (src/terminator.cpp:64-90 with counter defaults).  Accepted hits are
 * appended to the hit arrays with their path and the path_stats_c
 * 10-stat vector.
 *
 * job_state: (n_jobs, 3) int32 [accepts, rejects, done] carried across
 * rounds.  out_used[j] = pairs consumed from this batch.
 * Returns hit count, or -1 if hit_path capacity is too small. */
int64_t finish_replay_c(
    EngineScratch *es,
    const uint8_t *status,
    const uint8_t *seg_kind, const int64_t *seg_val, const int64_t *seg_val2,
    const int64_t *pair_seg_off,
    const int32_t *pair_j, const uint32_t *pair_t, int64_t n_pairs,
    const char *lit_buf,
    const char *hole_paths, const int64_t *hole_off,
    const uint8_t *jbuf, const int64_t *j_off,
    const uint8_t *db, const int64_t *db_off, const int64_t *db_len,
    const uint8_t *id_mx256, const uint8_t *to_upper,
    float min_id, float max_id, int has_max_id,
    int32_t maxaccepts, int32_t maxrejects,
    int32_t *job_state,
    int32_t *out_used,
    int32_t *hit_job, uint32_t *hit_tix,
    char *hit_paths, int64_t *hit_path_off, int64_t hit_path_cap,
    int64_t *hit_stats, int64_t max_hits)
{
    int64_t n_hits = 0, hp_pos = 0;
    hit_path_off[0] = 0;
    for (int64_t p = 0; p < n_pairs; ++p) {
        int32_t j = pair_j[p];
        int32_t *st = job_state + 3 * j;
        if (st[2]) {        /* job already terminated: skip */
            continue;
        }
        out_used[j] += 1;
        int accept = 0;
        if (status[p] == PAIR_PLAN) {
            /* splice the path */
            uint32_t t = pair_t[p];
            const uint8_t *a = jbuf + j_off[j];
            const uint8_t *b = db + db_off[t];
            int64_t la = j_off[j + 1] - j_off[j];
            int64_t lb = db_len[t];
            eng_alloc_path(es, (size_t)(la + lb + 2));
            char *pp = es->path;
            for (int64_t s = pair_seg_off[p]; s < pair_seg_off[p + 1];
                 ++s) {
                switch (seg_kind[s]) {
                case SEG_M:
                    memset(pp, 'M', (size_t)seg_val[s]);
                    pp += seg_val[s];
                    break;
                case SEG_I:
                    memset(pp, 'I', (size_t)seg_val[s]);
                    pp += seg_val[s];
                    break;
                case SEG_D:
                    memset(pp, 'D', (size_t)seg_val[s]);
                    pp += seg_val[s];
                    break;
                case SEG_LIT:
                    memcpy(pp, lit_buf + seg_val[s], (size_t)seg_val2[s]);
                    pp += seg_val2[s];
                    break;
                case SEG_HOLE: {
                    int64_t h = seg_val[s];
                    int64_t hn = hole_off[h + 1] - hole_off[h];
                    memcpy(pp, hole_paths + hole_off[h], (size_t)hn);
                    pp += hn;
                    break;
                }
                }
            }
            int64_t n_col = pp - es->path;
            int64_t stats[10];
            int rc = path_stats_c((const uint8_t *)es->path, n_col, a, b,
                                  0, 0, id_mx256, to_upper, stats);
            if (rc == 0) {
                /* GetFractId: id M-cols / (last_m - first_m + 1) */
                double fract = (double)stats[6] /
                               (double)(stats[1] - stats[0] + 1);
                accept = !(fract < (double)min_id);
                if (accept && has_max_id && fract > (double)max_id)
                    accept = 0;
                if (accept) {
                    if (n_hits >= max_hits ||
                        hp_pos + n_col > hit_path_cap)
                        return -1;
                    hit_job[n_hits] = j;
                    hit_tix[n_hits] = t;
                    memcpy(hit_paths + hp_pos, es->path, (size_t)n_col);
                    hp_pos += n_col;
                    memcpy(hit_stats + 10 * n_hits, stats,
                           10 * sizeof(int64_t));
                    ++n_hits;
                    hit_path_off[n_hits] = hp_pos;
                }
            }
        }
        if (accept) {
            st[0] += 1;
            if (maxaccepts > 0 && st[0] >= maxaccepts)
                st[2] = 1;
        } else {
            st[1] += 1;
            if (maxrejects > 0 && st[1] >= maxrejects)
                st[2] = 1;
        }
    }
    return n_hits;
}
