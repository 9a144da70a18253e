/* ASan/UBSan fuzz harness over the native decoder entries (SURVEY §4.5).
 *
 * Reads one fuzz input file:
 *   byte 0   mode: 0 = T1 block decode, 1 = T2 packet parse
 *   bytes 1..7  clamped parameters (dims, passes, style)
 *   bytes 8..   payload (codeword / packet bytes, possibly garbage)
 *
 * Exit 0 means "no memory fault, no UB" — decode *errors* are fine and
 * expected; the sanitizers turn faults into nonzero exits.  Built and
 * driven by tests/test_native_hardening.py.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int grk_t1_decode_fast(const uint8_t *data, int dlen, int *seg_lens,
                       int nsegs, int numpasses, int numbps, int orient,
                       int w, int h, int style, int32_t *mag2,
                       uint8_t *neg);

int grk_t2_parse(const uint8_t *body, int blen,
                 int n_ctx, const int *ctx_style, const int *ctx_band_start,
                 const int *band_ttw, const int *band_tth,
                 const int *band_blk_start,
                 const int *blk_x, const int *blk_y,
                 int n_pkts, const int *pkt_ctx, const int *pkt_layer,
                 int sop, int eph,
                 int *blk_included, int *blk_zb, int *blk_numpasses,
                 int *chunks, int chunk_cap, int *out_counts);

int main(int argc, char **argv) {
    if (argc < 2) return 2;
    FILE *f = fopen(argv[1], "rb");
    if (!f) return 2;
    static uint8_t buf[1 << 20];
    int len = (int)fread(buf, 1, sizeof(buf), f);
    fclose(f);
    if (len < 8) return 0;

    int mode = buf[0] & 1;
    int w = 1 + (buf[1] & 63);
    int h = 1 + (buf[2] & 63);
    int numpasses = 1 + (buf[3] % 60);
    int numbps = 1 + (buf[4] % 30);
    int orient = buf[5] & 3;
    int style = buf[6] & 0x7F;
    const uint8_t *payload = buf + 8;
    int plen = len - 8;

    if (mode == 0) {
        int nsegs = 1 + (buf[7] & 3);
        int seg_lens[4];
        for (int i = 0; i < nsegs; i++)
            seg_lens[i] = plen / nsegs;
        int32_t *mag2 = calloc((size_t)w * h, sizeof(int32_t));
        uint8_t *neg = calloc((size_t)w * h, 1);
        if (!mag2 || !neg) return 2;
        grk_t1_decode_fast(payload, plen, seg_lens, nsegs, numpasses,
                           numbps, orient, w, h, style, mag2, neg);
        free(mag2);
        free(neg);
        return 0;
    }

    /* T2: one precinct context, one band, 2x2 code-block grid */
    int ctx_style[1] = { style };
    int ctx_band_start[2] = { 0, 1 };
    int band_ttw[1] = { 2 }, band_tth[1] = { 2 };
    int band_blk_start[2] = { 0, 4 };
    int blk_x[4] = { 0, 1, 0, 1 }, blk_y[4] = { 0, 0, 1, 1 };
    int n_pkts = 1 + (buf[7] & 7);
    int pkt_ctx[8] = { 0 }, pkt_layer[8];
    for (int i = 0; i < n_pkts; i++) pkt_layer[i] = i;
    int incl[4], zb[4], np_[4];
    int chunks[6 * 256];
    int counts[2];
    grk_t2_parse(payload, plen, 1, ctx_style, ctx_band_start,
                 band_ttw, band_tth, band_blk_start, blk_x, blk_y,
                 n_pkts, pkt_ctx, pkt_layer, buf[5] >> 7, buf[6] >> 7,
                 incl, zb, np_, chunks, 256, counts);
    return 0;
}
