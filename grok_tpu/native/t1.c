/* Native Tier-1 (EBCOT/MQ) block coder — host hot path.
 *
 * C implementation of the scalar reference model (grok_tpu/t1/t1_scalar.py),
 * bit-exact by construction: same MQ state machine (ISO/IEC 15444-1 Annex C
 * software conventions), same pass structure (Annex D), same mode switches
 * (BYPASS/RESET/TERMALL/VSC/SEGSYM), same per-pass rate/distortion logging
 * for PCRD.  Exposed via ctypes (grok_tpu/native/__init__.py); the Python
 * scalar model remains the behavioral oracle in tests.
 *
 * This is the TPU framework's host-side native runtime analog of the
 * reference's C++ T1 [grok: src/lib/core/t1/t1_part1/].
 */

#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#define CBLK_BYPASS 0x01
#define CBLK_RESET 0x02
#define CBLK_TERMALL 0x04
#define CBLK_VSC 0x08
#define CBLK_PTERM 0x10
#define CBLK_SEGSYM 0x20

#define CTX_RL 17
#define CTX_UNI 18
#define N_CTX 19

static const uint16_t QE[47] = {
    0x5601,0x3401,0x1801,0x0AC1,0x0521,0x0221,0x5601,0x5401,0x4801,0x3801,
    0x3001,0x2401,0x1C01,0x1601,0x5601,0x5401,0x5101,0x4801,0x3801,0x3401,
    0x3001,0x2801,0x2401,0x2201,0x1C01,0x1801,0x1601,0x1401,0x1201,0x1101,
    0x0AC1,0x09C1,0x08A1,0x0521,0x0441,0x02A1,0x0221,0x0141,0x0111,0x0085,
    0x0049,0x0025,0x0015,0x0009,0x0005,0x0001,0x5601};
static const uint8_t NMPS[47] = {
    1,2,3,4,5,38,7,8,9,10,11,12,13,29,15,16,17,18,19,20,21,22,23,24,25,26,
    27,28,29,30,31,32,33,34,35,36,37,38,39,40,41,42,43,44,45,45,46};
static const uint8_t NLPS[47] = {
    1,6,9,12,29,33,6,14,14,14,17,18,20,21,14,14,15,16,17,18,19,19,20,21,22,
    23,24,25,26,27,28,29,30,31,32,33,34,35,36,37,38,39,40,41,42,43,46};
static const uint8_t SWITCH_[47] = {
    1,0,0,0,0,0,1,0,0,0,0,0,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,
    0,0,0,0,0,0,0,0,0,0,0,0};

/* ---- context formation (Tables D.1-D.3, mirrors t1/luts.py) ------------ */

static int zc_ctx(int orient, int h, int v, int d) {
    if (orient == 1) { int t = h; h = v; v = t; }
    if (orient != 3) {
        if (h == 2) return 8;
        if (h == 1) { if (v >= 1) return 7; return d >= 1 ? 6 : 5; }
        if (v == 2) return 4;
        if (v == 1) return 3;
        return d >= 2 ? 2 : (d == 1 ? 1 : 0);
    }
    if (d >= 3) return 8;
    if (d == 2) return h + v >= 1 ? 7 : 6;
    if (d == 1) { int hv = h + v; return hv >= 2 ? 5 : (hv == 1 ? 4 : 3); }
    { int hv = h + v; return hv >= 2 ? 2 : (hv == 1 ? 1 : 0); }
}

static void sc_ctx(int hs, int vs, int *cx, int *xr) {
    if (hs == 1) { *cx = vs == 1 ? 13 : (vs == 0 ? 12 : 11); *xr = 0; }
    else if (hs == 0) {
        if (vs == 1) { *cx = 10; *xr = 0; }
        else if (vs == 0) { *cx = 9; *xr = 0; }
        else { *cx = 10; *xr = 1; }
    } else { *cx = vs == 1 ? 11 : (vs == 0 ? 12 : 13); *xr = 1; }
}

/* packed state row: (qe << 13) | (nmps << 7) | (nlps << 1) | switch —
 * one cache line for the whole table, one load per decision */
static uint32_t MQP[47];
static int g_mqp_ready = 0;
static void build_mqp(void) {
    if (g_mqp_ready) return;
    for (int i = 0; i < 47; i++)
        MQP[i] = ((uint32_t)QE[i] << 13) | ((uint32_t)NMPS[i] << 7)
               | ((uint32_t)NLPS[i] << 1) | SWITCH_[i];
    g_mqp_ready = 1;
}

/* ---- MQ decoder (C.3) -------------------------------------------------- */

typedef struct {
    const uint8_t *data; int n; int bp;
    uint32_t a, c; int ct;
} mqd_t;

typedef struct { uint8_t i, mps; } ctx_t;

static void ctx_init(ctx_t *cx) {
    memset(cx, 0, sizeof(ctx_t) * N_CTX);
    cx[CTX_UNI].i = 46; cx[CTX_RL].i = 3; cx[0].i = 4;
}

static inline int mqd_byte(mqd_t *m, int i) {
    return i < m->n ? m->data[i] : 0xFF;
}

static void mqd_bytein(mqd_t *m) {
    if (mqd_byte(m, m->bp) == 0xFF) {
        if (mqd_byte(m, m->bp + 1) > 0x8F) { m->c += 0xFF00; m->ct = 8; }
        else { m->bp++; m->c += (uint32_t)mqd_byte(m, m->bp) << 9; m->ct = 7; }
    } else {
        m->bp++; m->c += (uint32_t)mqd_byte(m, m->bp) << 8; m->ct = 8;
    }
}

static void mqd_init(mqd_t *m, const uint8_t *data, int start, int end) {
    m->data = data; m->n = end; m->bp = start;
    m->c = (uint32_t)(start < end ? data[start] : 0xFF) << 16;
    mqd_bytein(m);
    m->c <<= 7; m->ct -= 7; m->a = 0x8000;
}

static int mqd_decode(mqd_t *m, ctx_t *st) {
    uint32_t row = MQP[st->i];
    uint32_t qe = row >> 13;
    int d;
    m->a -= qe;
    if ((m->c >> 16) < qe) {
        if (m->a < qe) { d = st->mps; st->i = (row >> 7) & 0x3F; }
        else {
            d = 1 - st->mps;
            st->mps ^= (uint8_t)(row & 1);
            st->i = (row >> 1) & 0x3F;
        }
        m->a = qe;
        do {
            if (m->ct == 0) mqd_bytein(m);
            m->a <<= 1; m->c <<= 1; m->ct--;
        } while (!(m->a & 0x8000));
        m->a &= 0xFFFF;
    } else {
        m->c -= qe << 16;
        if (m->a & 0x8000) { d = st->mps; }
        else {
            if (m->a < qe) {
                d = 1 - st->mps;
                st->mps ^= (uint8_t)(row & 1);
                st->i = (row >> 1) & 0x3F;
            } else { d = st->mps; st->i = (row >> 7) & 0x3F; }
            do {
                if (m->ct == 0) mqd_bytein(m);
                m->a <<= 1; m->c <<= 1; m->ct--;
            } while (!(m->a & 0x8000));
            m->a &= 0xFFFF;
        }
    }
    return d;
}

/* ---- raw (BYPASS) bit reader (MSB-first with stuffing) ------------------ */

typedef struct { const uint8_t *data; int pos, end, cur, nbits, prev, eof; }
rawd_t;

static void rawd_init(rawd_t *r, const uint8_t *d, int start, int end) {
    r->data = d; r->pos = start; r->end = end;
    r->cur = 0; r->nbits = 0; r->prev = 0; r->eof = 0;
}

static int rawd_bit(rawd_t *r) {
    if (r->nbits == 0) {
        if (r->pos >= r->end) { r->eof = 1; return 0; }
        r->nbits = r->prev == 0xFF ? 7 : 8;
        r->cur = r->data[r->pos];
        r->prev = r->cur;
        r->pos++;
    }
    r->nbits--;
    return (r->cur >> r->nbits) & 1;
}

/* ---- block decode (Annex D) -------------------------------------------- */

/* Flag-word layout per sample (grid (h+2)x(w+2) incl. border):
 * bits 0-7: significant neighbor in direction W,E,N,S,NW,NE,SW,SE
 * bits 8-11: negative sign of significant W,E,N,S neighbor
 * bit 12: self significant   bit 13: self negative
 * bit 14: visited            bit 15: refined-before
 * Context LUTs are built once from the normative rules. */

#define F_W 0x01
#define F_E 0x02
#define F_N 0x04
#define F_S 0x08
#define F_NW 0x10
#define F_NE 0x20
#define F_SW 0x40
#define F_SE 0x80
#define F_SGN_W 0x100
#define F_SGN_E 0x200
#define F_SGN_N 0x400
#define F_SGN_S 0x800
#define F_SIG 0x1000
#define F_NEG 0x2000
#define F_VISIT 0x4000
#define F_REF 0x8000

static uint8_t g_zc_lut[4][256];
static uint8_t g_sc_lut[4096][2];
static int g_luts_ready = 0;

static void build_luts(void) {
    if (g_luts_ready) return;
    for (int o = 0; o < 4; o++)
        for (int m = 0; m < 256; m++) {
            int h = ((m & F_W) != 0) + ((m & F_E) != 0);
            int v = ((m & F_N) != 0) + ((m & F_S) != 0);
            int d = ((m & F_NW) != 0) + ((m & F_NE) != 0)
                  + ((m & F_SW) != 0) + ((m & F_SE) != 0);
            g_zc_lut[o][m] = (uint8_t)zc_ctx(o, h, v, d);
        }
    for (int m = 0; m < 4096; m++) {
        /* m = low 12 bits of flags: dir sig bits + dir sign bits */
        int hs = 0, vs = 0;
        if (m & F_W) hs += (m & F_SGN_W) ? -1 : 1;
        if (m & F_E) hs += (m & F_SGN_E) ? -1 : 1;
        if (m & F_N) vs += (m & F_SGN_N) ? -1 : 1;
        if (m & F_S) vs += (m & F_SGN_S) ? -1 : 1;
        hs = hs > 1 ? 1 : (hs < -1 ? -1 : hs);
        vs = vs > 1 ? 1 : (vs < -1 ? -1 : vs);
        int cx, xr;
        sc_ctx(hs, vs, &cx, &xr);
        g_sc_lut[m][0] = (uint8_t)cx;
        g_sc_lut[m][1] = (uint8_t)xr;
    }
    g_luts_ready = 1;
}

#define FW(y, x) fl[((y) + 1) * stride + (x) + 1]

static void set_sig(uint32_t *fl, int stride, int x, int y, int negv) {
    FW(y, x) |= F_SIG | (negv ? F_NEG : 0);
    FW(y, x - 1) |= F_E | (negv ? F_SGN_E : 0);
    FW(y, x + 1) |= F_W | (negv ? F_SGN_W : 0);
    FW(y - 1, x) |= F_S | (negv ? F_SGN_S : 0);
    FW(y + 1, x) |= F_N | (negv ? F_SGN_N : 0);
    FW(y - 1, x - 1) |= F_SE;
    FW(y - 1, x + 1) |= F_SW;
    FW(y + 1, x - 1) |= F_NE;
    FW(y + 1, x + 1) |= F_NW;
}

/* VSC variant of the context word: stripe-causal rows ignore the row
 * below (S/SW/SE and the S sign). */
static inline uint32_t vsc_word(uint32_t f, int y, int vsc) {
    if (vsc && (y % 4) == 3)
        return f & ~(uint32_t)(F_S | F_SW | F_SE | F_SGN_S);
    return f;
}

/* segment schedule (B.10.7, mirrors t1_scalar.segment_pass_counts) */
static int seg_limit(int style, int segno) {
    if (style & CBLK_TERMALL) return 1;
    if (style & CBLK_BYPASS) {
        if (segno == 0) return 10;
        return (segno % 2) == 1 ? 2 : 1;
    }
    return 109;
}

static int is_raw(int passno, int ptype, int style) {
    return (style & CBLK_BYPASS) && passno >= 10 && ptype != 2;
}

#define IDX(y, x) ((y) * w + (x))

/* decode one code-block.
 * data/dlen: concatenated segments; seg_lens/nsegs: their lengths;
 * outputs: mag2 (int32, h*w), negout (uint8, h*w).  Returns 0 on success. */
int grk_t1_decode(const uint8_t *data, int dlen,
                  const int *seg_lens, int nsegs,
                  int numpasses, int numbps, int orient,
                  int w, int h, int style,
                  int32_t *mag2, uint8_t *negout) {
    if (numpasses <= 0 || numbps <= 0 || w <= 0 || h <= 0) {
        memset(mag2, 0, sizeof(int32_t) * (size_t)(w * h));
        memset(negout, 0, (size_t)(w * h));
        return 0;
    }
    build_luts(); build_mqp();
    int wh = w * h;
    int stride = w + 2;
    uint32_t *fl = calloc((size_t)stride * (h + 2), sizeof(uint32_t));
    uint32_t *vknown = calloc((size_t)wh, sizeof(uint32_t));
    int8_t *lastp = malloc((size_t)wh);
    if (!fl || !vknown || !lastp) {
        free(fl); free(vknown); free(lastp);
        return -1;
    }
    memset(lastp, -1, (size_t)wh);
    memset(negout, 0, (size_t)wh);
    int vsc = (style & CBLK_VSC) != 0;

    int default_lens[1];
    if (nsegs == 0) { default_lens[0] = dlen; seg_lens = default_lens;
                      nsegs = 1; }
    int seg_start[64], seg_end[64];
    { int acc = 0;
      for (int s = 0; s < nsegs && s < 64; s++) {
          seg_start[s] = acc; acc += seg_lens[s]; seg_end[s] = acc;
          if (seg_end[s] > dlen) seg_end[s] = dlen;
          if (seg_start[s] > dlen) seg_start[s] = dlen;
      } }

    mqd_t mq; rawd_t rd;
    ctx_t ctx[N_CTX]; ctx_init(ctx);
    int cur_seg = -1, seg_passes_used = 0, segno = 0;
    const uint8_t *zlut = g_zc_lut[orient & 3];

    int total = numpasses;
    int passno = 0;
    for (int bp = numbps - 1; bp >= 0 && passno < total; bp--) {
        int first_plane = (bp == numbps - 1);
        for (int sub = first_plane ? 2 : 0; sub <= 2 && passno < total;
             sub++) {
            int ptype = sub;
            if (segno >= nsegs) goto done;
            if (seg_passes_used >= seg_limit(style, segno)) {
                segno++; seg_passes_used = 0;
                if (segno >= nsegs) goto done;
                cur_seg = -1;
            }
            int raw = is_raw(passno, ptype, style);
            if (cur_seg != segno) {
                if (raw) rawd_init(&rd, data, seg_start[segno],
                                   seg_end[segno]);
                else mqd_init(&mq, data, seg_start[segno], seg_end[segno]);
                cur_seg = segno;
            }
            if ((style & CBLK_RESET) && !raw) ctx_init(ctx);

            if (ptype == 0) {          /* significance propagation */
                for (int y0 = 0; y0 < h; y0 += 4) {
                    int ymax = y0 + 4 < h ? y0 + 4 : h;
                    for (int x = 0; x < w; x++) {
                    uint32_t any = 0;
                    for (int yy = y0; yy < ymax; yy++) any |= FW(yy, x);
                    if (!(any & 0xFF)) continue;  /* all zc contexts 0 */
                    for (int y = y0; y < ymax; y++) {
                        uint32_t f = FW(y, x);
                        if (f & (F_SIG | F_VISIT)) continue;
                        uint32_t fv = vsc_word(f, y, vsc);
                        if (!(fv & 0xFF)) continue;   /* zc == 0 */
                        int zc = zlut[fv & 0xFF];
                        int bit = raw ? rawd_bit(&rd)
                                      : mqd_decode(&mq, &ctx[zc]);
                        if (bit) {
                            int sb;
                            if (raw) sb = rawd_bit(&rd);
                            else {
                                const uint8_t *e = g_sc_lut[fv & 0xFFF];
                                sb = mqd_decode(&mq, &ctx[e[0]]) ^ e[1];
                            }
                            set_sig(fl, stride, x, y, sb);
                            negout[IDX(y, x)] = (uint8_t)sb;
                            vknown[IDX(y, x)] = 1u << bp;
                            lastp[IDX(y, x)] = (int8_t)bp;
                        }
                        FW(y, x) |= F_VISIT;
                    }
                    }
                }
            } else if (ptype == 1) {   /* magnitude refinement */
                for (int y0 = 0; y0 < h; y0 += 4) {
                    int ymax = y0 + 4 < h ? y0 + 4 : h;
                    for (int x = 0; x < w; x++) {
                    uint32_t any = 0;
                    for (int yy = y0; yy < ymax; yy++) any |= FW(yy, x);
                    if (!(any & F_SIG)) continue;
                    for (int y = y0; y < ymax; y++) {
                        uint32_t f = FW(y, x);
                        if (!(f & F_SIG) || (f & F_VISIT)) continue;
                        int bit;
                        if (raw) bit = rawd_bit(&rd);
                        else {
                            uint32_t fv = vsc_word(f, y, vsc);
                            int mr = (f & F_REF) ? 16
                                     : ((fv & 0xFF) ? 15 : 14);
                            bit = mqd_decode(&mq, &ctx[mr]);
                        }
                        FW(y, x) |= F_REF;
                        vknown[IDX(y, x)] |= (uint32_t)bit << bp;
                        lastp[IDX(y, x)] = (int8_t)bp;
                    }
                    }
                }
            } else {                   /* cleanup */
                for (int y0 = 0; y0 < h; y0 += 4) {
                    int ymax = y0 + 4 < h ? y0 + 4 : h;
                    for (int x = 0; x < w; x++) {
                        int y = y0;
                        if (ymax - y0 == 4) {
                            /* no-VSC: zc==0 for a row iff no direction
                             * bits; VSC masks bits, so recheck per row */
                            uint32_t any = FW(y0, x) | FW(y0 + 1, x)
                                         | FW(y0 + 2, x) | FW(y0 + 3, x);
                            int allz = !(any & (0xFF | F_SIG | F_VISIT));
                            if (!allz && vsc && !(any & (F_SIG | F_VISIT))) {
                                allz = 1;
                                for (int dy2 = 0; dy2 < 4 && allz; dy2++) {
                                    uint32_t fv = vsc_word(FW(y0 + dy2, x),
                                                           y0 + dy2, vsc);
                                    if (zlut[fv & 0xFF] != 0) allz = 0;
                                }
                            }
                            if (allz) {
                                if (!mqd_decode(&mq, &ctx[CTX_RL]))
                                    continue;
                                int r = (mqd_decode(&mq, &ctx[CTX_UNI]) << 1)
                                      | mqd_decode(&mq, &ctx[CTX_UNI]);
                                int yf = y0 + r;
                                uint32_t fv = vsc_word(FW(yf, x), yf, vsc);
                                const uint8_t *e = g_sc_lut[fv & 0xFFF];
                                int sb = mqd_decode(&mq, &ctx[e[0]]) ^ e[1];
                                set_sig(fl, stride, x, yf, sb);
                                negout[IDX(yf, x)] = (uint8_t)sb;
                                vknown[IDX(yf, x)] = 1u << bp;
                                lastp[IDX(yf, x)] = (int8_t)bp;
                                y = yf + 1;
                            }
                        }
                        for (; y < ymax; y++) {
                            uint32_t f = FW(y, x);
                            if (f & (F_SIG | F_VISIT)) continue;
                            uint32_t fv = vsc_word(f, y, vsc);
                            int zc = zlut[fv & 0xFF];
                            if (mqd_decode(&mq, &ctx[zc])) {
                                const uint8_t *e = g_sc_lut[fv & 0xFFF];
                                int sb = mqd_decode(&mq, &ctx[e[0]]) ^ e[1];
                                set_sig(fl, stride, x, y, sb);
                                negout[IDX(y, x)] = (uint8_t)sb;
                                vknown[IDX(y, x)] = 1u << bp;
                                lastp[IDX(y, x)] = (int8_t)bp;
                            }
                        }
                    }
                }
                if (style & CBLK_SEGSYM) {
                    for (int s = 0; s < 4; s++)
                        mqd_decode(&mq, &ctx[CTX_UNI]);
                }
                /* clear visited (border rows carry no visit bit) */
                { size_t tot = (size_t)stride * (h + 2);
                  for (size_t q = 0; q < tot; q++)
                      fl[q] &= ~(uint32_t)F_VISIT; }
            }
            seg_passes_used++;
            passno++;
        }
    }
done:
    for (int i = 0; i < wh; i++) {
        if (lastp[i] >= 0)
            mag2[i] = (int32_t)(vknown[i] * 2 + (1u << lastp[i]));
        else mag2[i] = 0;
    }
    free(fl); free(vknown); free(lastp);
    return 0;
}

int grk_t1_decode_fast(const uint8_t *data, int dlen,
                       const int *seg_lens, int nsegs,
                       int numpasses, int numbps, int orient,
                       int w, int h, int style,
                       int32_t *mag2, uint8_t *negout);
static void build_zc9(void);

/* ---- batched tile decode: T1 + dequant + band placement ----------------- */

/* Decode nb blocks, dequantize, and write into band buffers.
 * Flattened descriptors (one entry per block):
 *   off[i]: byte offset of block i's codewords in `data`
 *   seg_off[i], seg_cnt[i]: span in seg_lens_flat
 *   numpasses/numbps/orient/style/w/h: per block
 *   band_id[i]: index into band buffers; bx[i], by[i]: placement offset
 * Bands: bptr[band] -> int32 buffer (reversible: coef = sign*(mag2>>1))
 *        or float32 buffer (irrev: sign*mag2*delta/2), selected by
 *        birrev[band]; bstride[band] row stride; bdelta[band]; broi[band]
 *        (Maxshift restore shift, 0 = none).
 * Scratch mag2/neg sized max_w*max_h are allocated internally. */
typedef struct {
    const uint8_t *data;
    const int *off, *seg_off, *seg_cnt, *seg_lens_flat;
    const int *numpasses, *numbps, *orient, *style, *bw, *bh;
    const int *band_id, *bx, *by;
    int nb;
    void **bptr; const int *bstride; const unsigned char *birrev;
    const float *bdelta; const int *broi;
    int max_w, max_h;
    int next;      /* atomic work index */
    int err;
} dec_tile_ctx_t;

static int grk_num_threads(int nwork) {
    const char *env = getenv("GROK_NUM_THREADS");
    int n = env && *env ? atoi(env) : (int)sysconf(_SC_NPROCESSORS_ONLN);
    if (n < 1) n = 1;
    if (n > nwork) n = nwork;
    if (n > 64) n = 64;
    return n;
}

static int dec_tile_one(dec_tile_ctx_t *c, int i,
                        int32_t *mag2, uint8_t *neg) {
    int w = c->bw[i], h = c->bh[i];
    int rc = grk_t1_decode_fast(c->data + c->off[i], 0x7FFFFFFF,
                           c->seg_lens_flat + c->seg_off[i], c->seg_cnt[i],
                           c->numpasses[i], c->numbps[i], c->orient[i],
                           w, h, c->style[i], mag2, neg);
    if (rc != 0) return rc;
    int b = c->band_id[i];
    int roi = c->broi[b];
    if (roi > 0) {
        int32_t thr = 1 << roi;
        for (int k = 0; k < w * h; k++)
            if (mag2[k] >= thr) mag2[k] >>= roi;
    }
    if (c->birrev[b]) {
        float *dst = (float *)c->bptr[b];
        float half = c->bdelta[b] * 0.5f;
        for (int y = 0; y < h; y++) {
            float *row = dst + (size_t)(c->by[i] + y) * c->bstride[b]
                       + c->bx[i];
            for (int x = 0; x < w; x++) {
                float v = (float)mag2[y * w + x] * half;
                row[x] = neg[y * w + x] ? -v : v;
            }
        }
    } else {
        int32_t *dst = (int32_t *)c->bptr[b];
        for (int y = 0; y < h; y++) {
            int32_t *row = dst + (size_t)(c->by[i] + y) * c->bstride[b]
                         + c->bx[i];
            for (int x = 0; x < w; x++) {
                int32_t v = mag2[y * w + x] >> 1;
                row[x] = neg[y * w + x] ? -v : v;
            }
        }
    }
    return 0;
}

static void *dec_tile_worker(void *arg) {
    dec_tile_ctx_t *c = arg;
    int32_t *mag2 = malloc(sizeof(int32_t) * (size_t)c->max_w * c->max_h);
    uint8_t *neg = malloc((size_t)c->max_w * c->max_h);
    if (!mag2 || !neg) { __atomic_store_n(&c->err, -1, __ATOMIC_RELAXED);
                         free(mag2); free(neg); return NULL; }
    for (;;) {
        int i = __atomic_fetch_add(&c->next, 1, __ATOMIC_RELAXED);
        if (i >= c->nb || __atomic_load_n(&c->err, __ATOMIC_RELAXED)) break;
        int rc = dec_tile_one(c, i, mag2, neg);
        if (rc != 0) __atomic_store_n(&c->err, rc, __ATOMIC_RELAXED);
    }
    free(mag2); free(neg);
    return NULL;
}

int grk_t1_decode_tile(const uint8_t *data,
                       const int *off, const int *seg_off,
                       const int *seg_cnt, const int *seg_lens_flat,
                       const int *numpasses, const int *numbps,
                       const int *orient, const int *style,
                       const int *bw, const int *bh,
                       const int *band_id, const int *bx, const int *by,
                       int nb,
                       void **bptr, const int *bstride,
                       const unsigned char *birrev, const float *bdelta,
                       const int *broi,
                       int max_w, int max_h) {
    build_luts(); build_mqp(); build_zc9();   /* init LUTs before threads */
    dec_tile_ctx_t c = { data, off, seg_off, seg_cnt, seg_lens_flat,
                         numpasses, numbps, orient, style, bw, bh,
                         band_id, bx, by, nb, bptr, bstride, birrev,
                         bdelta, broi, max_w, max_h, 0, 0 };
    int nt = grk_num_threads(nb);
    if (nt <= 1) {
        dec_tile_worker(&c);
    } else {
        pthread_t tid[64];
        int started = 0;
        for (int t = 0; t < nt; t++)
            if (pthread_create(&tid[t], NULL, dec_tile_worker, &c) == 0)
                started++;
            else break;
        if (started == 0) dec_tile_worker(&c);
        for (int t = 0; t < started; t++) pthread_join(tid[t], NULL);
    }
    return c.err;
}

/* ---- inverse 5/3, one 2D level (int32) ---------------------------------- */

/* Horizontal then vertical inverse lifting (Annex F), whole-sample
 * symmetric extension; (x0, y0) are the canvas parities of the resolution
 * rect.  ll (lh,lw), hl (lh, w-lw), lh_ (h-lh, lw), hh; out (h, w) with
 * stride ostride.  Scratch: caller provides tmp of h*w int32. */
static void inv53_row(const int32_t *lo, int nlo, const int32_t *hi,
                      int nhi, int32_t *out, int parity) {
    int n = nlo + nhi;
    if (n == 0) return;
    if (n == 1) {
        out[0] = parity == 0 ? lo[0]
                 : (hi[0] >= 0 ? hi[0] >> 1 : -((-hi[0]) >> 1));
        return;
    }
    /* interleave into out: even abs positions = lo when parity even */
    for (int i = 0; i < nlo; i++) out[(parity == 0 ? 0 : 1) + 2 * i] = lo[i];
    for (int i = 0; i < nhi; i++) out[(parity == 0 ? 1 : 0) + 2 * i] = hi[i];
    /* lifting with symmetric extension: e[j] = y[j] - ((y[j-1]+y[j+1]+2)>>2)
     * at even abs positions; o[j] = y[j] + ((e[j-1]+e[j+1])>>1) at odd. */
    /* whole-sample symmetric extension: index t -> mirror(t), period
     * 2(n-1) (matches numpy reflect padding) */
    int p = 2 * n - 2;
#define MIR(t) ({ int m_ = (((t) % p) + p) % p; m_ >= n ? p - m_ : m_; })
    int32_t stack[4160];
    int32_t *buf = n + 4 <= 4160 ? stack : malloc(sizeof(int32_t) * (n + 4));
    memcpy(buf + 2, out, sizeof(int32_t) * n);
    buf[0] = out[MIR(-2)]; buf[1] = out[MIR(-1)];
    buf[n + 2] = out[MIR(n)]; buf[n + 3] = out[MIR(n + 1)];
    /* even update (abs parity 0) */
    for (int j = 0; j < n; j++)
        if (((j + parity) & 1) == 0)
            out[j] = buf[j + 2] - ((buf[j + 1] + buf[j + 3] + 2) >> 2);
    /* odd update reads updated evens incl. extension */
    memcpy(buf + 2, out, sizeof(int32_t) * n);
    buf[0] = out[MIR(-2)]; buf[1] = out[MIR(-1)];
    buf[n + 2] = out[MIR(n)]; buf[n + 3] = out[MIR(n + 1)];
    for (int j = 0; j < n; j++)
        if (((j + parity) & 1) == 1)
            out[j] = buf[j + 2] + ((buf[j + 1] + buf[j + 3]) >> 1);
#undef MIR
    if (buf != stack) free(buf);
}

int grk_inv53_level(const int32_t *ll, const int32_t *hl,
                    const int32_t *lh, const int32_t *hh,
                    int lw, int lh_n, int w, int h,
                    int x0, int y0, int32_t *out) {
    /* horizontal pass: rows of (ll|hl) -> top rows; (lh|hh) -> bottom */
    int32_t *tmp = malloc(sizeof(int32_t) * (size_t)w * h);
    if (!tmp) return -1;
    int nlo_r = lw, nhi_r = w - lw;
    int nlo_c = lh_n, nhi_c = h - lh_n;
    for (int y = 0; y < nlo_c; y++) {
        inv53_row(ll + (size_t)y * lw, nlo_r, hl + (size_t)y * (w - lw),
                  nhi_r, tmp + (size_t)y * w, x0 & 1);
    }
    for (int y = 0; y < nhi_c; y++) {
        inv53_row(lh + (size_t)y * lw, nlo_r, hh + (size_t)y * (w - lw),
                  nhi_r, tmp + (size_t)(nlo_c + y) * w, x0 & 1);
    }
    /* vertical pass per column */
    int32_t *colbuf = malloc(sizeof(int32_t) * (size_t)h);
    int32_t *lobuf = malloc(sizeof(int32_t) * (size_t)(nlo_c > 0 ? nlo_c : 1));
    int32_t *hibuf = malloc(sizeof(int32_t) * (size_t)(nhi_c > 0 ? nhi_c : 1));
    if (!colbuf || !lobuf || !hibuf) return -1;
    for (int x = 0; x < w; x++) {
        for (int y = 0; y < nlo_c; y++) lobuf[y] = tmp[(size_t)y * w + x];
        for (int y = 0; y < nhi_c; y++)
            hibuf[y] = tmp[(size_t)(nlo_c + y) * w + x];
        inv53_row(lobuf, nlo_c, hibuf, nhi_c, colbuf, y0 & 1);
        for (int y = 0; y < h; y++) out[(size_t)y * w + x] = colbuf[y];
    }
    free(tmp); free(colbuf); free(lobuf); free(hibuf);
    return 0;
}

/* ---- MQ encoder (C.2) --------------------------------------------------- */

typedef struct {
    uint8_t *out;       /* out[0] is the carry sentinel */
    int bp;             /* index of byte "B" */
    uint32_t a, c; int ct;
} mqe_t;

static void mqe_init(mqe_t *e, uint8_t *buf) {
    e->out = buf; e->out[0] = 0; e->bp = 0;
    e->a = 0x8000; e->c = 0; e->ct = 12;
}

static void mqe_byteout(mqe_t *e) {
    if (e->out[e->bp] == 0xFF) {
        e->bp++;
        e->out[e->bp] = (uint8_t)(e->c >> 20);
        e->c &= 0xFFFFF; e->ct = 7;
    } else if (e->c < 0x8000000) {
        e->bp++;
        e->out[e->bp] = (uint8_t)(e->c >> 19);
        e->c &= 0x7FFFF; e->ct = 8;
    } else {
        e->out[e->bp]++;
        if (e->out[e->bp] == 0xFF) {
            e->c &= 0x7FFFFFF;
            e->bp++;
            e->out[e->bp] = (uint8_t)(e->c >> 20);
            e->c &= 0xFFFFF; e->ct = 7;
        } else {
            e->bp++;
            e->out[e->bp] = (uint8_t)(e->c >> 19);
            e->c &= 0x7FFFF; e->ct = 8;
        }
    }
}

static void mqe_encode(mqe_t *e, ctx_t *st, int d) {
    uint32_t row = MQP[st->i];
    uint32_t qe = row >> 13;
    e->a -= qe;
    if (d == st->mps) {
        if (e->a & 0x8000) { e->c += qe; return; }
        if (e->a < qe) e->a = qe; else e->c += qe;
        st->i = (row >> 7) & 0x3F;
    } else {
        if (e->a < qe) e->c += qe; else e->a = qe;
        st->mps ^= (uint8_t)(row & 1);
        st->i = (row >> 1) & 0x3F;
    }
    do {
        e->a <<= 1; e->c = (e->c << 1) & 0xFFFFFFF;
        e->ct--;
        if (e->ct == 0) mqe_byteout(e);
    } while (!(e->a & 0x8000));
    e->a &= 0xFFFF;
}

/* flush; returns final length (sentinel excluded) */
static int mqe_flush(mqe_t *e) {
    uint32_t tempc = e->c + e->a;
    e->c |= 0xFFFF;
    if (e->c >= tempc) e->c -= 0x8000;
    e->c = (e->c << e->ct) & 0xFFFFFFF;
    mqe_byteout(e);
    e->c = (e->c << e->ct) & 0xFFFFFFF;
    mqe_byteout(e);
    if (e->out[e->bp] != 0xFF) e->bp++;
    return e->bp - 1 + 1 - 1;   /* bytes out[1..bp-1] -> bp - 1 */
}

/* ERTERM flush (predictable termination, D.4.2): push the register out
 * without SETBITS; >=12 further register bits are emitted so the decoder
 * (with 0xFF substitution past end-of-data) recovers every decision. */
static int mqe_erterm_flush(mqe_t *e) {
    int k = 12 - e->ct;
    while (k > 0) {
        e->c = (e->c << e->ct) & 0xFFFFFFF;
        e->ct = 0;
        mqe_byteout(e);
        k -= e->ct;
    }
    if (e->out[e->bp] != 0xFF) e->bp++;
    return e->bp - 1;
}

/* raw (BYPASS) bit writer with stuffing */
typedef struct { uint8_t *out; int n; int cur, nbits; } rawe_t;

static void rawe_init(rawe_t *r, uint8_t *buf) {
    r->out = buf; r->n = 0; r->cur = 0; r->nbits = 0;
}

static void rawe_bit(rawe_t *r, int bit) {
    int limit = (r->n > 0 && r->out[r->n - 1] == 0xFF) ? 7 : 8;
    r->cur = (r->cur << 1) | (bit & 1);
    r->nbits++;
    if (r->nbits == limit) {
        r->out[r->n++] = (uint8_t)r->cur;
        r->cur = 0; r->nbits = 0;
    }
}

static int rawe_flush(rawe_t *r, int pterm) {
    if (r->nbits) {
        if (pterm) {           /* predictable padding: 0,1,0,1,... */
            int bit = 0;
            while (r->nbits) { rawe_bit(r, bit); bit ^= 1; }
        } else {
            int limit = (r->n > 0 && r->out[r->n - 1] == 0xFF) ? 7 : 8;
            r->out[r->n++] = (uint8_t)(r->cur << (limit - r->nbits));
            r->cur = 0; r->nbits = 0;
        }
    }
    if (r->n > 0 && r->out[r->n - 1] == 0xFF) r->out[r->n++] = 0;
    return r->n;
}

static int enc_must_terminate(int passno, int ptype, int style, int last) {
    if (last) return 1;
    if (style & CBLK_TERMALL) return 1;
    if (style & CBLK_BYPASS) {
        if (passno >= 9) {
            if (ptype == 2) return 1;
            if (ptype == 1 && passno >= 10) return 1;
        }
    }
    return 0;
}

/* Encode one code-block.
 * mag (int32 h*w, non-negative), neg (uint8).  Outputs:
 *   out: codeword bytes (caller cap >= 2*w*h + 128)
 *   rates/dists/terms: per-pass arrays (cap >= 3*32)
 *   seg_lens/seg_passes (cap >= 128)
 * Returns numpasses (>=0); *numbps_out, *total_len, *nsegs_out filled. */
int grk_t1_encode_ref(const int32_t *mag, const uint8_t *neg,
                      const double *frac,
                      int orient, int w, int h, int style,
                      uint8_t *out, int *total_len,
                      int *rates, double *dists, uint8_t *terms,
                      int *seg_lens, int *seg_passes, int *nsegs_out,
                      int *numbps_out) {
    build_luts(); build_mqp();
    int wh = w * h;
    int32_t maxv = 0;
    for (int i = 0; i < wh; i++) if (mag[i] > maxv) maxv = mag[i];
    int numbps = 0;
    while ((1 << numbps) <= maxv && numbps < 31) numbps++;
    *numbps_out = numbps;
    *total_len = 0; *nsegs_out = 0;
    if (numbps == 0) return 0;

    int stride = w + 2;
    uint32_t *fl = calloc((size_t)stride * (h + 2), sizeof(uint32_t));
    double *rec = calloc((size_t)wh, sizeof(double));
    uint8_t *scratch = malloc((size_t)wh * 8 + 1024);
    if (!fl || !rec || !scratch) {
        free(fl); free(rec); free(scratch);
        return -1;
    }
    const uint8_t *zlut = g_zc_lut[orient & 3];
    int vsc = (style & CBLK_VSC) != 0;

    mqe_t mq; mqe_init(&mq, scratch);
    rawe_t rw; int rw_active = 0;
    ctx_t ctx[N_CTX]; ctx_init(ctx);
    int done_len = 0;              /* bytes in `out` from closed segments */
    int passes_in_seg = 0, nsegs = 0;
    double dist_total = 0.0;
    int total = 3 * numbps - 2;
    int passno = 0;

    for (int bp = numbps - 1; bp >= 0; bp--) {
        int first_plane = (bp == numbps - 1);
        for (int sub = first_plane ? 2 : 0; sub <= 2; sub++) {
            int ptype = sub;
            int raw = is_raw(passno, ptype, style);
            if (raw && !rw_active) { rawe_init(&rw, scratch); rw_active = 1; }
            if ((style & CBLK_RESET) && !raw) ctx_init(ctx);

            if (ptype == 0) {
                for (int y0 = 0; y0 < h; y0 += 4) {
                    int ymax = y0 + 4 < h ? y0 + 4 : h;
                    for (int x = 0; x < w; x++)
                    for (int y = y0; y < ymax; y++) {
                        uint32_t f = FW(y, x);
                        if (f & (F_SIG | F_VISIT)) continue;
                        uint32_t fv = vsc_word(f, y, vsc);
                        if (!(fv & 0xFF)) continue;   /* zc == 0 */
                        int zc = zlut[fv & 0xFF];
                        int bit = (mag[IDX(y, x)] >> bp) & 1;
                        if (raw) rawe_bit(&rw, bit);
                        else mqe_encode(&mq, &ctx[zc], bit);
                        if (bit) {
                            int nb = neg[IDX(y, x)] ? 1 : 0;
                            if (raw) rawe_bit(&rw, nb);
                            else {
                                const uint8_t *e2 = g_sc_lut[fv & 0xFFF];
                                mqe_encode(&mq, &ctx[e2[0]], nb ^ e2[1]);
                            }
                            set_sig(fl, stride, x, y, nb);
                            double m = (double)mag[IDX(y, x)] + (frac ? frac[IDX(y, x)] : 0.0);
                            double nv = 1.5 * (double)(1 << bp);
                            double o = rec[IDX(y, x)];
                            dist_total += (m - o) * (m - o)
                                        - (m - nv) * (m - nv);
                            rec[IDX(y, x)] = nv;
                        }
                        FW(y, x) |= F_VISIT;
                    }
                }
            } else if (ptype == 1) {
                for (int y0 = 0; y0 < h; y0 += 4) {
                    int ymax = y0 + 4 < h ? y0 + 4 : h;
                    for (int x = 0; x < w; x++) {
                    uint32_t any = 0;
                    for (int yy = y0; yy < ymax; yy++) any |= FW(yy, x);
                    if (!(any & F_SIG)) continue;
                    for (int y = y0; y < ymax; y++) {
                        uint32_t f = FW(y, x);
                        if (!(f & F_SIG) || (f & F_VISIT)) continue;
                        int bit = (mag[IDX(y, x)] >> bp) & 1;
                        if (raw) rawe_bit(&rw, bit);
                        else {
                            uint32_t fv = vsc_word(f, y, vsc);
                            int mr = (f & F_REF) ? 16
                                     : ((fv & 0xFF) ? 15 : 14);
                            mqe_encode(&mq, &ctx[mr], bit);
                        }
                        FW(y, x) |= F_REF;
                        double m = (double)mag[IDX(y, x)] + (frac ? frac[IDX(y, x)] : 0.0);
                        double nv = (double)((mag[IDX(y, x)] >> bp) << bp)
                                  + 0.5 * (double)(1 << bp);
                        double o = rec[IDX(y, x)];
                        dist_total += (m - o) * (m - o)
                                    - (m - nv) * (m - nv);
                        rec[IDX(y, x)] = nv;
                    }
                    }
                }
            } else {
                for (int y0 = 0; y0 < h; y0 += 4) {
                    int ymax = y0 + 4 < h ? y0 + 4 : h;
                    for (int x = 0; x < w; x++) {
                        int y = y0;
                        if (ymax - y0 == 4) {
                            uint32_t any = FW(y0, x) | FW(y0 + 1, x)
                                         | FW(y0 + 2, x) | FW(y0 + 3, x);
                            int allz = !(any & (0xFF | F_SIG | F_VISIT));
                            if (!allz && vsc
                                && !(any & (F_SIG | F_VISIT))) {
                                allz = 1;
                                for (int d2 = 0; d2 < 4 && allz; d2++) {
                                    uint32_t fv = vsc_word(FW(y0 + d2, x),
                                                           y0 + d2, vsc);
                                    if (zlut[fv & 0xFF] != 0) allz = 0;
                                }
                            }
                            if (allz) {
                                int bits[4], anyb = 0, r = 3;
                                for (int d2 = 0; d2 < 4; d2++) {
                                    bits[d2] = (mag[IDX(y0 + d2, x)] >> bp)
                                             & 1;
                                    anyb |= bits[d2];
                                }
                                for (int d2 = 3; d2 >= 0; d2--)
                                    if (bits[d2]) r = d2;
                                mqe_encode(&mq, &ctx[CTX_RL], anyb);
                                if (!anyb) continue;
                                mqe_encode(&mq, &ctx[CTX_UNI], (r >> 1) & 1);
                                mqe_encode(&mq, &ctx[CTX_UNI], r & 1);
                                int yf = y0 + r;
                                uint32_t fv = vsc_word(FW(yf, x), yf, vsc);
                                const uint8_t *e2 = g_sc_lut[fv & 0xFFF];
                                int nb = neg[IDX(yf, x)] ? 1 : 0;
                                mqe_encode(&mq, &ctx[e2[0]], nb ^ e2[1]);
                                set_sig(fl, stride, x, yf, nb);
                                double m = (double)mag[IDX(yf, x)] + (frac ? frac[IDX(yf, x)] : 0.0);
                                double nv = 1.5 * (double)(1 << bp);
                                double o = rec[IDX(yf, x)];
                                dist_total += (m - o) * (m - o)
                                            - (m - nv) * (m - nv);
                                rec[IDX(yf, x)] = nv;
                                y = yf + 1;
                            }
                        }
                        for (; y < ymax; y++) {
                            uint32_t f = FW(y, x);
                            if (f & (F_SIG | F_VISIT)) continue;
                            uint32_t fv = vsc_word(f, y, vsc);
                            int zc = zlut[fv & 0xFF];
                            int bit = (mag[IDX(y, x)] >> bp) & 1;
                            mqe_encode(&mq, &ctx[zc], bit);
                            if (bit) {
                                const uint8_t *e2 = g_sc_lut[fv & 0xFFF];
                                int nb = neg[IDX(y, x)] ? 1 : 0;
                                mqe_encode(&mq, &ctx[e2[0]], nb ^ e2[1]);
                                set_sig(fl, stride, x, y, nb);
                                double m = (double)mag[IDX(y, x)] + (frac ? frac[IDX(y, x)] : 0.0);
                                double nv = 1.5 * (double)(1 << bp);
                                double o = rec[IDX(y, x)];
                                dist_total += (m - o) * (m - o)
                                            - (m - nv) * (m - nv);
                                rec[IDX(y, x)] = nv;
                            }
                        }
                    }
                }
                if (style & CBLK_SEGSYM) {
                    mqe_encode(&mq, &ctx[CTX_UNI], 1);
                    mqe_encode(&mq, &ctx[CTX_UNI], 0);
                    mqe_encode(&mq, &ctx[CTX_UNI], 1);
                    mqe_encode(&mq, &ctx[CTX_UNI], 0);
                }
                { size_t tot = (size_t)stride * (h + 2);
                  for (size_t q = 0; q < tot; q++)
                      fl[q] &= ~(uint32_t)F_VISIT; }
            }

            /* end of pass: rate + termination */
            passes_in_seg++;
            int last = (passno == total - 1);
            int term = enc_must_terminate(passno, ptype, style, last);
            if (term) {
                int seg_len;
                if (raw) { seg_len = rawe_flush(&rw, style & CBLK_PTERM);
                           rw_active = 0;
                           memcpy(out + done_len, scratch, (size_t)seg_len);
                           /* the raw writer shares scratch: restore the MQ
                            * carry sentinel for the next MQ segment */
                           { ctx_t saved[N_CTX];
                             memcpy(saved, ctx, sizeof(saved));
                             mqe_init(&mq, scratch);
                             memcpy(ctx, saved, sizeof(saved)); } }
                else {
                    ctx_t saved[N_CTX];
                    memcpy(saved, ctx, sizeof(saved));
                    seg_len = (style & CBLK_PTERM)
                            ? mqe_erterm_flush(&mq) : mqe_flush(&mq);
                    memcpy(out + done_len, scratch + 1, (size_t)seg_len);
                    mqe_init(&mq, scratch);
                    memcpy(ctx, saved, sizeof(saved));
                }
                done_len += seg_len;
                seg_lens[nsegs] = seg_len;
                seg_passes[nsegs] = passes_in_seg;
                nsegs++;
                passes_in_seg = 0;
                rates[passno] = done_len;
                terms[passno] = 1;
            } else {
                int pending;
                if (raw) pending = rw.n + (rw.nbits ? 1 : 0);
                else pending = mq.bp + 5;
                rates[passno] = done_len + pending;
                terms[passno] = 0;
            }
            dists[passno] = dist_total;
            passno++;
            if (passno >= total) goto fin;
        }
    }
fin:
    /* clamp optimistic rates to their segment's real end (mirror of the
     * Python model's post-pass fixups) */
    { int tot2 = 0, pi = 0;
      for (int s = 0; s < nsegs; s++) {
          tot2 += seg_lens[s];
          for (int q = 0; q < seg_passes[s]; q++) {
              if (rates[pi] > tot2) rates[pi] = tot2;
              pi++;
          }
      }
      for (int i = 1; i < total; i++)
          if (rates[i] < rates[i - 1]) rates[i] = rates[i - 1];
    }
    *total_len = done_len;
    *nsegs_out = nsegs;
    free(fl); free(rec); free(scratch);
    return total;
}

/* ---- stripe-packed decode fast path ------------------------------------- */
/* One uint32 word per (stripe, column): 4 rows of state plus the sigma
 * neighborhood needed for context formation, so a whole stripe-column is
 * processed from one load.
 *
 * bit layout:
 *   0..17  sigma of rows -1..4 (6 rows) x columns left/mid/right:
 *          bit = 3*(r+1) + c  (c: 0=left, 1=mid, 2=right)
 *   18..21 visited (pi) rows 0..3
 *   22..25 refined (mu) rows 0..3
 *   26..31 chi (negative) of MID column rows -1..4
 *
 * The 3x3 zc neighborhood of row ci is bits [3*ci .. 3*ci+8]; the self
 * bit (3*ci+4) is part of the index and ignored by the LUT. */

#define SP_SELF(ci)   (1u << (3 * ((ci) + 1) + 1))
#define SP_VIS(ci)    (1u << (18 + (ci)))
#define SP_REF(ci)    (1u << (22 + (ci)))
#define SP_CHI(r1)    (1u << (26 + (r1)))      /* r1 = row + 1, 0..5 */

static uint8_t g_zc9[4][512];
static int g_zc9_ready = 0;

static void build_zc9(void) {
    if (g_zc9_ready) return;
    for (int o = 0; o < 4; o++)
        for (int m = 0; m < 512; m++) {
            int h = ((m >> 3) & 1) + ((m >> 5) & 1);        /* mid row l/r */
            int v = ((m >> 1) & 1) + ((m >> 7) & 1);        /* up/down mid */
            int d = (m & 1) + ((m >> 2) & 1) + ((m >> 6) & 1)
                  + ((m >> 8) & 1);
            g_zc9[o][m] = (uint8_t)zc_ctx(o, h, v, d);
        }
    g_zc9_ready = 1;
}

#define SPF(s, x) fl[((s) + 1) * fstride + (x) + 1]

static void sp_set_sig(uint32_t *fl, int fstride, int x, int y, int neg) {
    int s = y >> 2, ci = y & 3;
    /* own stripe: self + vertical neighbors' rows ci-1/ci+1 via the row
     * structure is implicit (bits belong to the same words) */
    SPF(s, x) |= SP_SELF(ci) | (neg ? SP_CHI(ci + 1) : 0);
    SPF(s, x - 1) |= 1u << (3 * (ci + 1) + 2);
    SPF(s, x + 1) |= 1u << (3 * (ci + 1) + 0);
    if (ci == 0) {          /* stripe above sees this as its row 4 */
        SPF(s - 1, x) |= (1u << (3 * 5 + 1))
                       | (neg ? SP_CHI(5) : 0);
        SPF(s - 1, x - 1) |= 1u << (3 * 5 + 2);
        SPF(s - 1, x + 1) |= 1u << (3 * 5 + 0);
    } else if (ci == 3) {   /* stripe below sees this as its row -1 */
        SPF(s + 1, x) |= (1u << (3 * 0 + 1)) | (neg ? SP_CHI(0) : 0);
        SPF(s + 1, x - 1) |= 1u << (3 * 0 + 2);
        SPF(s + 1, x + 1) |= 1u << (3 * 0 + 0);
    }
}

/* sign context from the packed words (signs of W/E come from neighbor
 * words' chi bits; N/S from the own word) */
static void sp_sc(const uint32_t *fl, int fstride, int x, int y,
                  int *cx, int *xr) {
    int s = y >> 2, ci = y & 3;
    uint32_t fm = SPF(s, x);
    uint32_t fw = SPF(s, x - 1);
    uint32_t fe = SPF(s, x + 1);
    int r1 = ci + 1;
    int hs = 0, vs = 0;
    if (fm & (1u << (3 * r1 + 0)))                 /* west significant */
        hs += (fw & SP_CHI(r1)) ? -1 : 1;
    if (fm & (1u << (3 * r1 + 2)))                 /* east */
        hs += (fe & SP_CHI(r1)) ? -1 : 1;
    if (fm & (1u << (3 * (r1 - 1) + 1)))           /* north */
        vs += (fm & SP_CHI(r1 - 1)) ? -1 : 1;
    if (fm & (1u << (3 * (r1 + 1) + 1)))           /* south */
        vs += (fm & SP_CHI(r1 + 1)) ? -1 : 1;
    hs = hs > 1 ? 1 : (hs < -1 ? -1 : hs);
    vs = vs > 1 ? 1 : (vs < -1 ? -1 : vs);
    sc_ctx(hs, vs, cx, xr);
}

/* any neighbor bits for the 4 rows (zc != 0 anywhere in the column) */
#define SP_ANY_NBR 0x3FFFFu        /* bits 0..17 */
#define SP_ANY_SELF (SP_SELF(0) | SP_SELF(1) | SP_SELF(2) | SP_SELF(3))
#define SP_ANY_VIS (SP_VIS(0) | SP_VIS(1) | SP_VIS(2) | SP_VIS(3))

int grk_t1_decode_fast(const uint8_t *data, int dlen,
                       const int *seg_lens, int nsegs,
                       int numpasses, int numbps, int orient,
                       int w, int h, int style,
                       int32_t *mag2, uint8_t *negout) {
    if (style & CBLK_VSC)
        return grk_t1_decode(data, dlen, seg_lens, nsegs, numpasses,
                             numbps, orient, w, h, style, mag2, negout);
    if (numpasses <= 0 || numbps <= 0 || w <= 0 || h <= 0) {
        memset(mag2, 0, sizeof(int32_t) * (size_t)(w * h));
        memset(negout, 0, (size_t)(w * h));
        return 0;
    }
    build_luts(); build_mqp(); build_zc9();
    int wh = w * h;
    int nstripes = (h + 3) >> 2;
    int fstride = w + 2;
    uint32_t *fl = calloc((size_t)fstride * (nstripes + 2),
                          sizeof(uint32_t));
    uint32_t *vknown = calloc((size_t)wh, sizeof(uint32_t));
    int8_t *lastp = malloc((size_t)wh);
    if (!fl || !vknown || !lastp) {
        free(fl); free(vknown); free(lastp);
        return -1;
    }
    memset(lastp, -1, (size_t)wh);
    memset(negout, 0, (size_t)wh);

    int default_lens[1];
    if (nsegs == 0) { default_lens[0] = dlen; seg_lens = default_lens;
                      nsegs = 1; }
    int seg_start[96], seg_end[96];
    { int acc = 0;
      for (int s = 0; s < nsegs && s < 96; s++) {
          seg_start[s] = acc; acc += seg_lens[s]; seg_end[s] = acc;
          if (seg_end[s] > dlen) seg_end[s] = dlen;
          if (seg_start[s] > dlen) seg_start[s] = dlen;
      } }

    mqd_t mq; rawd_t rd;
    ctx_t ctx[N_CTX]; ctx_init(ctx);
    int cur_seg = -1, seg_passes_used = 0, segno = 0;
    const uint8_t *z9 = g_zc9[orient & 3];

    int total = numpasses;
    int passno = 0;
    for (int bp = numbps - 1; bp >= 0 && passno < total; bp--) {
        int first_plane = (bp == numbps - 1);
        for (int sub = first_plane ? 2 : 0; sub <= 2 && passno < total;
             sub++) {
            int ptype = sub;
            if (segno >= nsegs) goto done;
            if (seg_passes_used >= seg_limit(style, segno)) {
                segno++; seg_passes_used = 0;
                if (segno >= nsegs) goto done;
                cur_seg = -1;
            }
            int raw = is_raw(passno, ptype, style);
            if (cur_seg != segno) {
                if (raw) rawd_init(&rd, data, seg_start[segno],
                                   seg_end[segno]);
                else mqd_init(&mq, data, seg_start[segno], seg_end[segno]);
                cur_seg = segno;
            }
            if ((style & CBLK_RESET) && !raw) ctx_init(ctx);

            if (ptype == 0) {          /* significance propagation */
                for (int s = 0; s < nstripes; s++) {
                    int ymax = (s * 4 + 4 < h ? 4 : h - s * 4);
                    for (int x = 0; x < w; x++) {
                        uint32_t f = SPF(s, x);
                        if (!(f & SP_ANY_NBR)) continue;
                        for (int ci = 0; ci < ymax; ci++) {
                            if (f & (SP_SELF(ci) | SP_VIS(ci))) continue;
                            int nb9 = (f >> (3 * ci)) & 0x1FF;
                            int zc = z9[nb9];
                            if (zc == 0) continue;
                            int y = s * 4 + ci;
                            int bit = raw ? rawd_bit(&rd)
                                          : mqd_decode(&mq, &ctx[zc]);
                            if (bit) {
                                int sb;
                                if (raw) sb = rawd_bit(&rd);
                                else {
                                    int cxs, xr;
                                    sp_sc(fl, fstride, x, y, &cxs, &xr);
                                    sb = mqd_decode(&mq, &ctx[cxs]) ^ xr;
                                }
                                sp_set_sig(fl, fstride, x, y, sb);
                                f = SPF(s, x);
                                negout[IDX(y, x)] = (uint8_t)sb;
                                vknown[IDX(y, x)] = 1u << bp;
                                lastp[IDX(y, x)] = (int8_t)bp;
                            }
                            SPF(s, x) |= SP_VIS(ci);
                            f |= SP_VIS(ci);
                        }
                    }
                }
            } else if (ptype == 1) {   /* magnitude refinement */
                for (int s = 0; s < nstripes; s++) {
                    int ymax = (s * 4 + 4 < h ? 4 : h - s * 4);
                    for (int x = 0; x < w; x++) {
                        uint32_t f = SPF(s, x);
                        if (!(f & SP_ANY_SELF)) continue;
                        for (int ci = 0; ci < ymax; ci++) {
                            if (!(f & SP_SELF(ci)) || (f & SP_VIS(ci)))
                                continue;
                            int y = s * 4 + ci;
                            int bit;
                            if (raw) bit = rawd_bit(&rd);
                            else {
                                int nb9 = (f >> (3 * ci)) & 0x1FF;
                                int mr = (f & SP_REF(ci)) ? 16
                                         : ((nb9 & ~0x10) ? 15 : 14);
                                bit = mqd_decode(&mq, &ctx[mr]);
                            }
                            SPF(s, x) |= SP_REF(ci);
                            f |= SP_REF(ci);
                            vknown[IDX(y, x)] |= (uint32_t)bit << bp;
                            lastp[IDX(y, x)] = (int8_t)bp;
                        }
                    }
                }
            } else {                   /* cleanup */
                for (int s = 0; s < nstripes; s++) {
                    int y0 = s * 4;
                    int ymax = (y0 + 4 < h ? 4 : h - y0);
                    for (int x = 0; x < w; x++) {
                        uint32_t f = SPF(s, x);
                        int ci = 0;
                        if (ymax == 4
                            && !(f & (SP_ANY_NBR | SP_ANY_VIS))) {
                            if (!mqd_decode(&mq, &ctx[CTX_RL]))
                                continue;
                            int r = (mqd_decode(&mq, &ctx[CTX_UNI]) << 1)
                                  | mqd_decode(&mq, &ctx[CTX_UNI]);
                            int yf = y0 + r;
                            int cxs, xr;
                            sp_sc(fl, fstride, x, yf, &cxs, &xr);
                            int sb = mqd_decode(&mq, &ctx[cxs]) ^ xr;
                            sp_set_sig(fl, fstride, x, yf, sb);
                            f = SPF(s, x);
                            negout[IDX(yf, x)] = (uint8_t)sb;
                            vknown[IDX(yf, x)] = 1u << bp;
                            lastp[IDX(yf, x)] = (int8_t)bp;
                            ci = r + 1;
                        }
                        for (; ci < ymax; ci++) {
                            if (f & (SP_SELF(ci) | SP_VIS(ci))) continue;
                            int nb9 = (f >> (3 * ci)) & 0x1FF;
                            int zc = z9[nb9];
                            int y = y0 + ci;
                            if (mqd_decode(&mq, &ctx[zc])) {
                                int cxs, xr;
                                sp_sc(fl, fstride, x, y, &cxs, &xr);
                                int sb = mqd_decode(&mq, &ctx[cxs]) ^ xr;
                                sp_set_sig(fl, fstride, x, y, sb);
                                f = SPF(s, x);
                                negout[IDX(y, x)] = (uint8_t)sb;
                                vknown[IDX(y, x)] = 1u << bp;
                                lastp[IDX(y, x)] = (int8_t)bp;
                            }
                        }
                    }
                }
                if (style & CBLK_SEGSYM) {
                    for (int q2 = 0; q2 < 4; q2++)
                        mqd_decode(&mq, &ctx[CTX_UNI]);
                }
                { size_t tot = (size_t)fstride * (nstripes + 2);
                  for (size_t q2 = 0; q2 < tot; q2++)
                      fl[q2] &= ~(uint32_t)SP_ANY_VIS; }
            }
            seg_passes_used++;
            passno++;
        }
    }
done:
    for (int i = 0; i < wh; i++) {
        if (lastp[i] >= 0)
            mag2[i] = (int32_t)(vknown[i] * 2 + (1u << lastp[i]));
        else mag2[i] = 0;
    }
    free(fl); free(vknown); free(lastp);
    return 0;
}

/* ---- stripe-packed encode fast path -------------------------------------
 * Same packed (stripe, column) flag words as the decode fast path: the
 * whole 4-row state + sigma neighborhood in one uint32, so the skip-heavy
 * early bitplanes touch one word per column instead of four flag rows.
 * Byte-identical to grk_t1_encode_ref by construction (same scan order,
 * same MQ decisions, same distortion arithmetic order).  VSC needs the
 * per-row masked context words, so it routes to the reference path. */

static int t1_encode_fast(const int32_t *mag, const uint8_t *neg,
                          const double *frac,
                          int orient, int w, int h, int style,
                          uint8_t *out, int *total_len,
                          int *rates, double *dists, uint8_t *terms,
                          int *seg_lens, int *seg_passes, int *nsegs_out,
                          int *numbps_out) {
    build_luts(); build_mqp(); build_zc9();
    int wh = w * h;
    int32_t maxv = 0;
    for (int i = 0; i < wh; i++) if (mag[i] > maxv) maxv = mag[i];
    int numbps = 0;
    while ((1 << numbps) <= maxv && numbps < 31) numbps++;
    *numbps_out = numbps;
    *total_len = 0; *nsegs_out = 0;
    if (numbps == 0) return 0;

    int nstripes = (h + 3) >> 2;
    int fstride = w + 2;
    uint32_t *fl = calloc((size_t)fstride * (nstripes + 2),
                          sizeof(uint32_t));
    double *rec = calloc((size_t)wh, sizeof(double));
    uint8_t *scratch = malloc((size_t)wh * 8 + 1024);
    if (!fl || !rec || !scratch) {
        free(fl); free(rec); free(scratch);
        return -1;
    }
    const uint8_t *z9 = g_zc9[orient & 3];

    mqe_t mq; mqe_init(&mq, scratch);
    rawe_t rw; int rw_active = 0;
    ctx_t ctx[N_CTX]; ctx_init(ctx);
    int done_len = 0;
    int passes_in_seg = 0, nsegs = 0;
    double dist_total = 0.0;
    int total = 3 * numbps - 2;
    int passno = 0;

    for (int bp = numbps - 1; bp >= 0; bp--) {
        int first_plane = (bp == numbps - 1);
        for (int sub = first_plane ? 2 : 0; sub <= 2; sub++) {
            int ptype = sub;
            int raw = is_raw(passno, ptype, style);
            if (raw && !rw_active) { rawe_init(&rw, scratch); rw_active = 1; }
            if ((style & CBLK_RESET) && !raw) ctx_init(ctx);

            if (ptype == 0) {          /* significance propagation */
                for (int s = 0; s < nstripes; s++) {
                    int ymax = (s * 4 + 4 < h ? 4 : h - s * 4);
                    for (int x = 0; x < w; x++) {
                        uint32_t f = SPF(s, x);
                        if (!(f & SP_ANY_NBR)) continue;
                        for (int ci = 0; ci < ymax; ci++) {
                            if (f & (SP_SELF(ci) | SP_VIS(ci))) continue;
                            int nb9 = (f >> (3 * ci)) & 0x1FF;
                            if (!(nb9 & ~0x10)) continue;   /* zc == 0 */
                            int y = s * 4 + ci;
                            int bit = (mag[IDX(y, x)] >> bp) & 1;
                            if (raw) rawe_bit(&rw, bit);
                            else mqe_encode(&mq, &ctx[z9[nb9]], bit);
                            if (bit) {
                                int nb = neg[IDX(y, x)] ? 1 : 0;
                                if (raw) rawe_bit(&rw, nb);
                                else {
                                    int cxs, xr;
                                    sp_sc(fl, fstride, x, y, &cxs, &xr);
                                    mqe_encode(&mq, &ctx[cxs], nb ^ xr);
                                }
                                sp_set_sig(fl, fstride, x, y, nb);
                                f = SPF(s, x);
                                double m = (double)mag[IDX(y, x)] + (frac ? frac[IDX(y, x)] : 0.0);
                                double nv = 1.5 * (double)(1 << bp);
                                double o = rec[IDX(y, x)];
                                dist_total += (m - o) * (m - o)
                                            - (m - nv) * (m - nv);
                                rec[IDX(y, x)] = nv;
                            }
                            SPF(s, x) |= SP_VIS(ci);
                            f |= SP_VIS(ci);
                        }
                    }
                }
            } else if (ptype == 1) {   /* magnitude refinement */
                for (int s = 0; s < nstripes; s++) {
                    int ymax = (s * 4 + 4 < h ? 4 : h - s * 4);
                    for (int x = 0; x < w; x++) {
                        uint32_t f = SPF(s, x);
                        if (!(f & SP_ANY_SELF)) continue;
                        for (int ci = 0; ci < ymax; ci++) {
                            if (!(f & SP_SELF(ci)) || (f & SP_VIS(ci)))
                                continue;
                            int y = s * 4 + ci;
                            int bit = (mag[IDX(y, x)] >> bp) & 1;
                            if (raw) rawe_bit(&rw, bit);
                            else {
                                int nb9 = (f >> (3 * ci)) & 0x1FF;
                                int mr = (f & SP_REF(ci)) ? 16
                                         : ((nb9 & ~0x10) ? 15 : 14);
                                mqe_encode(&mq, &ctx[mr], bit);
                            }
                            SPF(s, x) |= SP_REF(ci);
                            f |= SP_REF(ci);
                            double m = (double)mag[IDX(y, x)] + (frac ? frac[IDX(y, x)] : 0.0);
                            double nv = (double)((mag[IDX(y, x)] >> bp) << bp)
                                      + 0.5 * (double)(1 << bp);
                            double o = rec[IDX(y, x)];
                            dist_total += (m - o) * (m - o)
                                        - (m - nv) * (m - nv);
                            rec[IDX(y, x)] = nv;
                        }
                    }
                }
            } else {                   /* cleanup */
                for (int s = 0; s < nstripes; s++) {
                    int y0 = s * 4;
                    int ymax = (y0 + 4 < h ? 4 : h - y0);
                    for (int x = 0; x < w; x++) {
                        uint32_t f = SPF(s, x);
                        int ci = 0;
                        if (ymax == 4
                            && !(f & (SP_ANY_NBR | SP_ANY_VIS))) {
                            int bits[4], anyb = 0, r = 3;
                            for (int d2 = 0; d2 < 4; d2++) {
                                bits[d2] = (mag[IDX(y0 + d2, x)] >> bp) & 1;
                                anyb |= bits[d2];
                            }
                            for (int d2 = 3; d2 >= 0; d2--)
                                if (bits[d2]) r = d2;
                            mqe_encode(&mq, &ctx[CTX_RL], anyb);
                            if (!anyb) continue;
                            mqe_encode(&mq, &ctx[CTX_UNI], (r >> 1) & 1);
                            mqe_encode(&mq, &ctx[CTX_UNI], r & 1);
                            int yf = y0 + r;
                            int cxs, xr;
                            sp_sc(fl, fstride, x, yf, &cxs, &xr);
                            int nb = neg[IDX(yf, x)] ? 1 : 0;
                            mqe_encode(&mq, &ctx[cxs], nb ^ xr);
                            sp_set_sig(fl, fstride, x, yf, nb);
                            f = SPF(s, x);
                            double m = (double)mag[IDX(yf, x)] + (frac ? frac[IDX(yf, x)] : 0.0);
                            double nv = 1.5 * (double)(1 << bp);
                            double o = rec[IDX(yf, x)];
                            dist_total += (m - o) * (m - o)
                                        - (m - nv) * (m - nv);
                            rec[IDX(yf, x)] = nv;
                            ci = r + 1;
                        }
                        for (; ci < ymax; ci++) {
                            if (f & (SP_SELF(ci) | SP_VIS(ci))) continue;
                            int nb9 = (f >> (3 * ci)) & 0x1FF;
                            int y = y0 + ci;
                            int bit = (mag[IDX(y, x)] >> bp) & 1;
                            mqe_encode(&mq, &ctx[z9[nb9]], bit);
                            if (bit) {
                                int cxs, xr;
                                sp_sc(fl, fstride, x, y, &cxs, &xr);
                                int nb = neg[IDX(y, x)] ? 1 : 0;
                                mqe_encode(&mq, &ctx[cxs], nb ^ xr);
                                sp_set_sig(fl, fstride, x, y, nb);
                                f = SPF(s, x);
                                double m = (double)mag[IDX(y, x)] + (frac ? frac[IDX(y, x)] : 0.0);
                                double nv = 1.5 * (double)(1 << bp);
                                double o = rec[IDX(y, x)];
                                dist_total += (m - o) * (m - o)
                                            - (m - nv) * (m - nv);
                                rec[IDX(y, x)] = nv;
                            }
                        }
                    }
                }
                if (style & CBLK_SEGSYM) {
                    mqe_encode(&mq, &ctx[CTX_UNI], 1);
                    mqe_encode(&mq, &ctx[CTX_UNI], 0);
                    mqe_encode(&mq, &ctx[CTX_UNI], 1);
                    mqe_encode(&mq, &ctx[CTX_UNI], 0);
                }
                { size_t tot = (size_t)fstride * (nstripes + 2);
                  for (size_t q2 = 0; q2 < tot; q2++)
                      fl[q2] &= ~(uint32_t)SP_ANY_VIS; }
            }

            /* end of pass: rate + termination (identical to the ref path) */
            passes_in_seg++;
            int last = (passno == total - 1);
            int term = enc_must_terminate(passno, ptype, style, last);
            if (term) {
                int seg_len;
                if (raw) { seg_len = rawe_flush(&rw, style & CBLK_PTERM);
                           rw_active = 0;
                           memcpy(out + done_len, scratch, (size_t)seg_len);
                           { ctx_t saved[N_CTX];
                             memcpy(saved, ctx, sizeof(saved));
                             mqe_init(&mq, scratch);
                             memcpy(ctx, saved, sizeof(saved)); } }
                else {
                    ctx_t saved[N_CTX];
                    memcpy(saved, ctx, sizeof(saved));
                    seg_len = (style & CBLK_PTERM)
                            ? mqe_erterm_flush(&mq) : mqe_flush(&mq);
                    memcpy(out + done_len, scratch + 1, (size_t)seg_len);
                    mqe_init(&mq, scratch);
                    memcpy(ctx, saved, sizeof(saved));
                }
                done_len += seg_len;
                seg_lens[nsegs] = seg_len;
                seg_passes[nsegs] = passes_in_seg;
                nsegs++;
                passes_in_seg = 0;
                rates[passno] = done_len;
                terms[passno] = 1;
            } else {
                int pending;
                if (raw) pending = rw.n + (rw.nbits ? 1 : 0);
                else pending = mq.bp + 5;
                rates[passno] = done_len + pending;
                terms[passno] = 0;
            }
            dists[passno] = dist_total;
            passno++;
            if (passno >= total) goto fin;
        }
    }
fin:
    { int tot2 = 0, pi = 0;
      for (int s = 0; s < nsegs; s++) {
          tot2 += seg_lens[s];
          for (int q = 0; q < seg_passes[s]; q++) {
              if (rates[pi] > tot2) rates[pi] = tot2;
              pi++;
          }
      }
      for (int i = 1; i < total; i++)
          if (rates[i] < rates[i - 1]) rates[i] = rates[i - 1];
    }
    *total_len = done_len;
    *nsegs_out = nsegs;
    free(fl); free(rec); free(scratch);
    return total;
}

int grk_t1_encode(const int32_t *mag, const uint8_t *neg,
                  const double *frac,
                  int orient, int w, int h, int style,
                  uint8_t *out, int *total_len,
                  int *rates, double *dists, uint8_t *terms,
                  int *seg_lens, int *seg_passes, int *nsegs_out,
                  int *numbps_out) {
    if (style & CBLK_VSC)
        return grk_t1_encode_ref(mag, neg, frac, orient, w, h, style, out,
                                 total_len, rates, dists, terms, seg_lens,
                                 seg_passes, nsegs_out, numbps_out);
    return t1_encode_fast(mag, neg, frac, orient, w, h, style, out,
                          total_len,
                          rates, dists, terms, seg_lens, seg_passes,
                          nsegs_out, numbps_out);
}

/* ---- forward 5/3, one 2D level (int32) ---------------------------------- */

static void fwd53_row(const int32_t *x, int n, int parity,
                      int32_t *lo, int32_t *hi) {
    if (n == 0) return;
    if (n == 1) {
        if (parity == 0) lo[0] = x[0]; else hi[0] = 2 * x[0];
        return;
    }
    int p = 2 * n - 2;
#define MIR2(t) ({ int m_ = (((t) % p) + p) % p; m_ >= n ? p - m_ : m_; })
    int32_t stack[4160];
    int32_t *buf = n + 4 <= 4160 ? stack
                 : malloc(sizeof(int32_t) * (n + 4));
    memcpy(buf + 2, x, sizeof(int32_t) * n);
    buf[0] = x[MIR2(-2)]; buf[1] = x[MIR2(-1)];
    buf[n + 2] = x[MIR2(n)]; buf[n + 3] = x[MIR2(n + 1)];
    /* h at odd abs positions: h[j] = y[j] - ((y[j-1]+y[j+1])>>1) */
    int32_t hstack[4160];
    int32_t *hbuf = n + 4 <= 4160 ? hstack
                  : malloc(sizeof(int32_t) * (n + 4));
    for (int j = 0; j < n + 2; j++) {
        int abspar = (j - 1 + parity) & 1;  /* buf index j-1 rel start-2 */
        (void)abspar;
    }
    /* compute h over buf interior [1 .. n+2) (abs index j-2) */
    for (int j = 1; j < n + 3; j++)
        hbuf[j] = buf[j] - ((buf[j - 1] + buf[j + 1]) >> 1);
    int nlo = 0, nhi = 0;
    for (int j = 0; j < n; j++) {
        int abspar = (j + parity) & 1;
        if (abspar == 0) {
            /* low: l[j] = y[j] + ((h[j-1]+h[j+1]+2)>>2) */
            lo[nlo++] = buf[j + 2]
                + ((hbuf[j + 1] + hbuf[j + 3] + 2) >> 2);
        } else {
            hi[nhi++] = hbuf[j + 2];
        }
    }
#undef MIR2
    if (buf != stack) free(buf);
    if (hbuf != hstack) free(hbuf);
}

/* forward one level: vertical split then horizontal, matching
 * transform/dwt_np.fwd_2d_level.  in (h, w) int32; outputs ll/hl/lh/hh
 * with the standard ceil split sizes; x0/y0 canvas parities. */
int grk_fwd53_level(const int32_t *in, int w, int h, int x0, int y0,
                    int32_t *ll, int32_t *hl, int32_t *lh, int32_t *hh) {
    int ylo = (h + ((y0 & 1) ? 0 : 1)) / 2;      /* rows at even abs y */
    int xlo = (w + ((x0 & 1) ? 0 : 1)) / 2;
    int32_t *col = malloc(sizeof(int32_t) * (size_t)h);
    int32_t *clo = malloc(sizeof(int32_t) * (size_t)(ylo > 0 ? ylo : 1));
    int32_t *chi = malloc(sizeof(int32_t) * (size_t)(h - ylo > 0 ?
                                                     h - ylo : 1));
    int32_t *tmp = malloc(sizeof(int32_t) * (size_t)w * h);
    if (!col || !clo || !chi || !tmp) return -1;
    /* vertical pass per column -> tmp rows [0..ylo) = low, rest = high */
    for (int x = 0; x < w; x++) {
        for (int y = 0; y < h; y++) col[y] = in[(size_t)y * w + x];
        fwd53_row(col, h, y0 & 1, clo, chi);
        for (int y = 0; y < ylo; y++) tmp[(size_t)y * w + x] = clo[y];
        for (int y = 0; y < h - ylo; y++)
            tmp[(size_t)(ylo + y) * w + x] = chi[y];
    }
    /* horizontal pass per row */
    int32_t *rlo = malloc(sizeof(int32_t) * (size_t)(xlo > 0 ? xlo : 1));
    int32_t *rhi = malloc(sizeof(int32_t) * (size_t)(w - xlo > 0 ?
                                                     w - xlo : 1));
    if (!rlo || !rhi) return -1;
    for (int y = 0; y < ylo; y++) {
        fwd53_row(tmp + (size_t)y * w, w, x0 & 1, rlo, rhi);
        memcpy(ll + (size_t)y * xlo, rlo, sizeof(int32_t) * xlo);
        memcpy(hl + (size_t)y * (w - xlo), rhi,
               sizeof(int32_t) * (w - xlo));
    }
    for (int y = 0; y < h - ylo; y++) {
        fwd53_row(tmp + (size_t)(ylo + y) * w, w, x0 & 1, rlo, rhi);
        memcpy(lh + (size_t)y * xlo, rlo, sizeof(int32_t) * xlo);
        memcpy(hh + (size_t)y * (w - xlo), rhi,
               sizeof(int32_t) * (w - xlo));
    }
    free(col); free(clo); free(chi); free(tmp); free(rlo); free(rhi);
    return 0;
}

/* ---- batched tile encode (threaded) ------------------------------------- */

typedef struct {
    const int32_t *mag_flat; const uint8_t *neg_flat;
    const double *frac_flat;      /* NULL or per-element PCRD residual */
    const long long *moff;        /* element offset of block i */
    const int *orient, *style, *bw, *bh;
    int nb;
    uint8_t *out_flat; const long long *ooff;   /* byte offset, cap 8*wh+1024 */
    int *total_len;               /* per block */
    int *rates; double *dists; uint8_t *terms;  /* nb x 96 */
    int *seg_lens; int *seg_passes;             /* nb x 128 */
    int *nsegs; int *numbps; int *npass;        /* per block */
    int next;
    int err;
} enc_tile_ctx_t;

static void *enc_tile_worker(void *arg) {
    enc_tile_ctx_t *c = arg;
    for (;;) {
        int i = __atomic_fetch_add(&c->next, 1, __ATOMIC_RELAXED);
        if (i >= c->nb || __atomic_load_n(&c->err, __ATOMIC_RELAXED)) break;
        int np = grk_t1_encode(c->mag_flat + c->moff[i],
                               c->neg_flat + c->moff[i],
                               c->frac_flat ? c->frac_flat + c->moff[i]
                                            : NULL,
                               c->orient[i], c->bw[i], c->bh[i], c->style[i],
                               c->out_flat + c->ooff[i], c->total_len + i,
                               c->rates + (size_t)i * 96,
                               c->dists + (size_t)i * 96,
                               c->terms + (size_t)i * 96,
                               c->seg_lens + (size_t)i * 128,
                               c->seg_passes + (size_t)i * 128,
                               c->nsegs + i, c->numbps + i);
        if (np < 0) __atomic_store_n(&c->err, np, __ATOMIC_RELAXED);
        else c->npass[i] = np;
    }
    return NULL;
}

int grk_t1_encode_tile(const int32_t *mag_flat, const uint8_t *neg_flat,
                       const double *frac_flat,
                       const long long *moff,
                       const int *orient, const int *style,
                       const int *bw, const int *bh, int nb,
                       uint8_t *out_flat, const long long *ooff,
                       int *total_len, int *rates, double *dists,
                       uint8_t *terms, int *seg_lens, int *seg_passes,
                       int *nsegs, int *numbps, int *npass) {
    build_luts(); build_mqp(); build_zc9();
    enc_tile_ctx_t c = { mag_flat, neg_flat, frac_flat, moff, orient,
                         style, bw, bh,
                         nb, out_flat, ooff, total_len, rates, dists, terms,
                         seg_lens, seg_passes, nsegs, numbps, npass, 0, 0 };
    int nt = grk_num_threads(nb);
    if (nt <= 1) {
        enc_tile_worker(&c);
    } else {
        pthread_t tid[64];
        int started = 0;
        for (int t = 0; t < nt; t++)
            if (pthread_create(&tid[t], NULL, enc_tile_worker, &c) == 0)
                started++;
            else break;
        if (started == 0) enc_tile_worker(&c);
        for (int t = 0; t < started; t++) pthread_join(tid[t], NULL);
    }
    return c.err;
}

/* ---- 9/7 irreversible lifting, one 2D level (float64) -------------------
 * Bit-identical to transform/dwt_np.fwd97_1d/inv97_1d: same extension,
 * same in-place alternating-parity updates (neighbors of a target index
 * are untouched in that pass, so in-place == the NumPy Jacobi update),
 * same operation order `a + coef * (left + right)`.  The build uses
 * -ffp-contract=off so no FMA contraction can change the rounding. */

static const double W97_ALPHA = -1.586134342059924;
static const double W97_BETA = -0.052980118572961;
static const double W97_GAMMA = 0.882911075530934;
static const double W97_DELTA = 0.443506852043971;
static const double W97_K = 1.230174104914001;

static int mir97(int t, int n) {
    int p = 2 * n - 2;
    int m = ((t % p) + p) % p;
    return m >= n ? p - m : m;
}

static void lift97(double *a, int len, double coef, int tpar, int off) {
    for (int j = 1; j < len - 1; j++)
        if (((j + off) & 1) == tpar)
            a[j] = a[j] + coef * (a[j - 1] + a[j + 1]);
}

/* forward along a row; x[n] -> lo/hi (caller-sized by parity split) */
static void fwd97_row(const double *x, int n, int off,
                      double *lo, double *hi, double *buf) {
    if (n == 0) return;
    if (n == 1) {
        if ((off & 1) == 0) lo[0] = x[0]; else hi[0] = x[0] * 2.0;
        return;
    }
    for (int j = 0; j < n + 8; j++)
        buf[j] = x[mir97(j - 4, n)];
    /* abs parity of buf[j] == (j + off) & 1  (j-4+off ≡ j+off mod 2) */
    lift97(buf, n + 8, W97_ALPHA, 1, off & 1);
    lift97(buf, n + 8, W97_BETA, 0, off & 1);
    lift97(buf, n + 8, W97_GAMMA, 1, off & 1);
    lift97(buf, n + 8, W97_DELTA, 0, off & 1);
    int nl = 0, nh = 0;
    for (int i = 0; i < n; i++) {
        if (((i + off) & 1) == 0) lo[nl++] = buf[i + 4] * (1.0 / W97_K);
        else hi[nh++] = buf[i + 4] * (W97_K / 2.0);
    }
}

/* inverse along a row; lo[nlo], hi[n-nlo] -> out[n] */
static void inv97_row(const double *lo, int nlo, const double *hi,
                      int n, int off, double *out, double *buf) {
    if (n == 0) return;
    if (n == 1) {
        out[0] = (off & 1) == 0 ? lo[0] : hi[0] / 2.0;
        return;
    }
    int nl = 0, nh = 0;
    for (int i = 0; i < n; i++) {
        if (((i + off) & 1) == 0) out[i] = lo[nl++] * W97_K;
        else out[i] = hi[nh++] * (2.0 / W97_K);
    }
    for (int j = 0; j < n + 8; j++)
        buf[j] = out[mir97(j - 4, n)];
    lift97(buf, n + 8, -W97_DELTA, 0, off & 1);
    lift97(buf, n + 8, -W97_GAMMA, 1, off & 1);
    lift97(buf, n + 8, -W97_BETA, 0, off & 1);
    lift97(buf, n + 8, -W97_ALPHA, 1, off & 1);
    for (int i = 0; i < n; i++) out[i] = buf[i + 4];
}

/* forward one level: VERTICAL split then horizontal (dwt_np order).
 * in (h, w) f64; outputs ll/hl/lh/hh with ceil parity splits. */
int grk_fwd97_level(const double *in, int w, int h, int x0, int y0,
                    double *ll, double *hl, double *lh, double *hh) {
    int ylo = (h + ((y0 & 1) ? 0 : 1)) / 2;
    int xlo = (w + ((x0 & 1) ? 0 : 1)) / 2;
    int xhi = w - xlo, yhi = h - ylo;
    double *tmp = malloc(sizeof(double) * (size_t)w * h);
    double *col = malloc(sizeof(double) * (size_t)(h > 0 ? h : 1));
    double *clo = malloc(sizeof(double) * (size_t)(ylo > 0 ? ylo : 1));
    double *chi = malloc(sizeof(double) * (size_t)(yhi > 0 ? yhi : 1));
    double *buf = malloc(sizeof(double) * (size_t)((w > h ? w : h) + 8));
    double *rlo = malloc(sizeof(double) * (size_t)(xlo > 0 ? xlo : 1));
    double *rhi = malloc(sizeof(double) * (size_t)(xhi > 0 ? xhi : 1));
    if (!tmp || !col || !clo || !chi || !buf || !rlo || !rhi) {
        free(tmp); free(col); free(clo); free(chi); free(buf);
        free(rlo); free(rhi);
        return -1;
    }
    for (int x = 0; x < w; x++) {
        for (int y = 0; y < h; y++) col[y] = in[(size_t)y * w + x];
        fwd97_row(col, h, y0, clo, chi, buf);
        for (int y = 0; y < ylo; y++) tmp[(size_t)y * w + x] = clo[y];
        for (int y = 0; y < yhi; y++)
            tmp[(size_t)(ylo + y) * w + x] = chi[y];
    }
    for (int y = 0; y < ylo; y++) {
        fwd97_row(tmp + (size_t)y * w, w, x0, rlo, rhi, buf);
        memcpy(ll + (size_t)y * xlo, rlo, sizeof(double) * (size_t)xlo);
        memcpy(hl + (size_t)y * xhi, rhi, sizeof(double) * (size_t)xhi);
    }
    for (int y = 0; y < yhi; y++) {
        fwd97_row(tmp + (size_t)(ylo + y) * w, w, x0, rlo, rhi, buf);
        memcpy(lh + (size_t)y * xlo, rlo, sizeof(double) * (size_t)xlo);
        memcpy(hh + (size_t)y * xhi, rhi, sizeof(double) * (size_t)xhi);
    }
    free(tmp); free(col); free(clo); free(chi); free(buf);
    free(rlo); free(rhi);
    return 0;
}

/* inverse one level: horizontal first then vertical (dwt_np order). */
int grk_inv97_level(const double *ll, const double *hl,
                    const double *lh, const double *hh,
                    int lw, int lh_n, int w, int h,
                    int x0, int y0, double *out) {
    int nlo_c = lh_n, nhi_c = h - lh_n;
    double *tmp = malloc(sizeof(double) * (size_t)w * h);
    double *buf = malloc(sizeof(double) * (size_t)((w > h ? w : h) + 8));
    double *col = malloc(sizeof(double) * (size_t)(h > 0 ? h : 1));
    double *lob = malloc(sizeof(double) * (size_t)(nlo_c > 0 ? nlo_c : 1));
    double *hib = malloc(sizeof(double) * (size_t)(nhi_c > 0 ? nhi_c : 1));
    if (!tmp || !buf || !col || !lob || !hib) {
        free(tmp); free(buf); free(col); free(lob); free(hib);
        return -1;
    }
    for (int y = 0; y < nlo_c; y++)
        inv97_row(ll + (size_t)y * lw, lw, hl + (size_t)y * (w - lw),
                  w, x0, tmp + (size_t)y * w, buf);
    for (int y = 0; y < nhi_c; y++)
        inv97_row(lh + (size_t)y * lw, lw, hh + (size_t)y * (w - lw),
                  w, x0, tmp + (size_t)(nlo_c + y) * w, buf);
    for (int x = 0; x < w; x++) {
        for (int y = 0; y < nlo_c; y++) lob[y] = tmp[(size_t)y * w + x];
        for (int y = 0; y < nhi_c; y++)
            hib[y] = tmp[(size_t)(nlo_c + y) * w + x];
        inv97_row(lob, nlo_c, hib, h, y0, col, buf);
        for (int y = 0; y < h; y++) out[(size_t)y * w + x] = col[y];
    }
    free(tmp); free(buf); free(col); free(lob); free(hib);
    return 0;
}
