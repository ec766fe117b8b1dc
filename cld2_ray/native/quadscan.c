/* Hot-loop kernel: quadgram + octagram candidate extraction, hashing,
 * last-2 ring dedupe and open-addressed table probe in ONE C pass.
 *
 * Semantics are bit-equal to the numpy reference path
 * (cld2_ray/functions/hits.py quad_hits_dense/octa_hits +
 * cld2_ray/state/model.py HashTable.lookup); the Python shim
 * (cld2_ray/native/__init__.py) cross-checks them in tests.  The
 * n-gram walk and hashes mirror the reference engine's GetQuadHits /
 * GetOctaHits / QuadHashV2 / OctaHash40 (reference:
 * internal/cldutil.cc:315-533, internal/cldutil_shared.cc:167-358)
 * with this engine's documented dense-sampling deviation.
 *
 * Build: cc -O2 -shared -fPIC quadscan.c -o quadscan.so  (done by the
 * package shim, cached next to this file).
 */

#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>

static const uint32_t kWordMask0[4] = {0xFFFFFFFFu, 0x000000FFu,
                                       0x0000FFFFu, 0x00FFFFFFu};
static const uint32_t kPreSpace = 0x00004444u;
static const uint32_t kPostSpace = 0x44440000u;

/* little-endian 32-bit load of window bytes [4k, 4k+4); bytes at or
 * past `limit` read as 0x20 (space padding, as the numpy path pads) */
static inline uint32_t le32(const uint8_t *buf, int64_t pos, int64_t limit) {
    uint32_t w = 0;
    for (int i = 0; i < 4; i++) {
        uint32_t b = (pos + i < limit) ? buf[pos + i] : 0x20u;
        w |= b << (8 * i);
    }
    return w;
}

static inline uint32_t quad_hash(const uint8_t *buf, int64_t s, int64_t bc,
                                 int64_t limit, int pre, int post) {
    uint32_t mask = kWordMask0[bc & 3];
    uint32_t prepost = (pre ? kPreSpace : 0u) | (post ? kPostSpace : 0u);
    uint32_t w0 = le32(buf, s, limit);
    if (bc <= 4) {
        uint32_t a = w0 & mask;
        a = a ^ (a >> 3);
        return a ^ prepost;
    }
    uint32_t a = w0 ^ (w0 >> 3);
    uint32_t w1 = le32(buf, s + 4, limit);
    if (bc <= 8) {
        uint32_t b = w1 & mask;
        b = b ^ (b << 4);
        return (a ^ prepost) + b;
    }
    uint32_t w2 = le32(buf, s + 8, limit);
    uint32_t c = w2 & mask;
    c = c ^ (c << 2);
    return (a ^ prepost) + (w1 ^ (w1 << 4)) + c;
}

static inline uint64_t octa_hash40(const uint8_t *buf, int64_t s, int64_t bc,
                                   int64_t limit) {
    /* pre = post = 1 (words are always space-delimited) */
    uint64_t prepost = (uint64_t)(kPreSpace | kPostSpace);
    uint32_t mask = kWordMask0[bc & 3];
    int64_t ncase = (bc - 1) >> 2;   /* 0..5 */
    if (ncase > 5) ncase = 5;
    uint64_t word0 = 0, summ = 0;
    static const int dirs[6] = {0, 1, 1, 0, 0, 0};  /* 0=right,1=left */
    static const int amts[6] = {3, 4, 2, 8, 4, 6};
    for (int k = 0; k <= ncase; k++) {
        uint64_t wk = le32(buf, s + 4 * k, limit);
        if (k == ncase) wk &= mask;
        summ += wk;
        word0 += wk ^ (dirs[k] ? (wk << amts[k]) : (wk >> amts[k]));
    }
    summ += summ >> 17;
    summ += summ >> 9;
    summ = (summ & 0xFFu) << 32;
    return (word0 ^ prepost) + summ;
}

/* open-addressed lookup, same mix as model.py _mix */
static inline uint64_t table_lookup(const uint64_t *keys, const uint64_t *vals,
                                    uint64_t mask, uint64_t q) {
    if (q == 0) q = 1;
    uint64_t k = q * 0x9E3779B97F4A7C15ull;
    k ^= k >> 29;
    uint64_t idx = k & mask;
    for (;;) {
        uint64_t key = keys[idx];
        if (key == q) return vals[idx];
        if (key == 0) return 0;
        idx = (idx + 1) & mask;
    }
}

/* CLD2 4-way-associative bucket probes (reference:
 * internal/cldutil_shared.h:383-455 OctaFPJustHash/QuadFPJustHash +
 * {Octa,Quad}HashV3Lookup4). The matched entry's low bits (below
 * keymask) index a pre-decoded packed-langprob array built at
 * artifact time (state/model.py _build_ref_tables); 0 = miss. */
static inline uint64_t bucket_lookup40(const uint32_t *buckets,
                                       uint64_t nbuckets_mask,
                                       uint32_t keymask,
                                       const uint64_t *packed,
                                       uint64_t h) {
    uint64_t subscr = (h + (h >> 12)) & nbuckets_mask;
    uint32_t key = ((uint32_t)(h >> 4)) & keymask;
    const uint32_t *b = buckets + 4 * subscr;
    for (int k = 0; k < 4; k++)
        if (((key ^ b[k]) & keymask) == 0)
            return packed[b[k] & ~keymask];
    return 0;
}

static inline uint64_t bucket_lookup32(const uint32_t *buckets,
                                       uint32_t nbuckets_mask,
                                       uint32_t keymask,
                                       const uint64_t *packed,
                                       uint32_t h) {
    uint32_t subscr = (h + (h >> 12)) & nbuckets_mask;
    uint32_t key = h & keymask;
    const uint32_t *b = buckets + 4 * (uint64_t)subscr;
    for (int k = 0; k < 4; k++)
        if (((key ^ b[k]) & keymask) == 0)
            return packed[b[k] & ~keymask];
    return 0;
}

/* BiHashV2 (reference: internal/cldutil_shared.cc:107-122), used for
 * CJK bigrams over the raw bytes of two adjacent chars (<= 8 bytes;
 * bytes past bytecount are always masked, so padding never leaks). */
static inline uint32_t bi_hash32(const uint8_t *buf, int64_t s, int64_t bc,
                                 int64_t limit) {
    uint32_t mask = kWordMask0[bc & 3];
    uint32_t w0 = le32(buf, s, limit);
    if (bc <= 4) {
        uint32_t a = w0 & mask;
        return a ^ (a >> 3);
    }
    uint32_t a = w0 ^ (w0 >> 3);
    uint32_t w1 = le32(buf, s + 4, limit) & mask;
    return a + (w1 ^ (w1 << 18));
}

/* 12-bit-context next-char predictor (cld2_ray/functions/repeats.py,
 * reference CountPredictedBytes compact_lang_det_impl.cc:541-580):
 * per char, mask[i] = "char equals the value last stored under the
 * rolling hash of the previous 3 chars". tbl: int64[4096] filled with
 * -1 by the caller (reset per call); outputs per-char mask and UTF-8
 * byte length. Returns the number of chars. */
int64_t predict_mask(const uint8_t *b, int64_t n, int64_t *tbl,
                     uint8_t *mask, uint8_t *nbytes) {
    uint32_t h = 0;
    int64_t ci = 0;
    for (int64_t i = 0; i < n;) {
        uint8_t c0 = b[i];
        int len = c0 < 0x80 ? 1 : (c0 < 0xE0 ? 2 : (c0 < 0xF0 ? 3 : 4));
        if (i + len > n) len = (int)(n - i);
        int64_t c = 0;
        for (int k = 0; k < len; k++) c = (c << 8) | b[i + k];
        mask[ci] = tbl[h] == c;
        nbytes[ci] = (uint8_t)len;
        tbl[h] = c;
        h = ((h << 4) ^ (uint32_t)c) & 0xFFF;
        i += len;
        ci++;
    }
    return ci;
}

#include <math.h>

/* Character-trigram LM scoring (cld2_ray/functions/perplexity.py):
 * per doc, walk the framed lowered UTF-8 bytes, hash each char to a
 * 4096-bucket value, and accumulate -log2 P(c3|c1c2) with add-0.1
 * smoothing and unigram*0.1 backoff — no intermediate key/prob
 * arrays.  lang_ids: per-doc LM row (<0 = skip doc).  uni: per-lang
 * 4096 float64 unigram probs.  Outputs per-doc total bits and trigram
 * count. */
int ppl_score(const uint8_t *cat, const int64_t *bounds, int64_t n_docs,
              const int64_t *lang_ids,
              const uint64_t *keys, const uint64_t *vals, uint64_t mask,
              const double *uni, int64_t v,
              double *bits_out, int64_t *n_out) {
    int64_t start = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t end = bounds[d];
        int64_t lang = lang_ids[d];
        double bits = 0.0;
        int64_t cnt = 0;
        if (lang >= 0) {
            const double *urow = uni + lang * v;
            uint64_t base = (uint64_t)lang << 40;
            uint64_t bflag = 1ull << 39;
            int64_t c0 = -1, c1 = -1;
            for (int64_t i = start; i < end;) {
                uint8_t lead = cat[i];
                int len = lead < 0x80 ? 1
                          : (lead < 0xE0 ? 2 : (lead < 0xF0 ? 3 : 4));
                if (i + len > end) len = (int)(end - i);
                uint32_t cp;
                if (len == 1) cp = lead;
                else if (len == 2)
                    cp = ((lead & 0x1Fu) << 6) | (cat[i + 1] & 0x3Fu);
                else if (len == 3)
                    cp = ((lead & 0x0Fu) << 12) | ((cat[i + 1] & 0x3Fu) << 6)
                         | (cat[i + 2] & 0x3Fu);
                else
                    cp = ((lead & 0x07u) << 18) | ((cat[i + 1] & 0x3Fu) << 12)
                         | ((cat[i + 2] & 0x3Fu) << 6) | (cat[i + 3] & 0x3Fu);
                int64_t c2 = (int64_t)(((uint64_t)cp * 2654435761ull) % v);
                if (c0 >= 0 && c1 >= 0) {
                    uint64_t b = (uint64_t)(c0 * v + c1);
                    uint64_t tri = base | (b * (uint64_t)v + (uint64_t)c2);
                    uint64_t bi = base | bflag | b;
                    uint64_t ct = table_lookup(keys, vals, mask, tri);
                    uint64_t cb = table_lookup(keys, vals, mask, bi);
                    double p = cb > 0
                        ? ((double)ct + 0.1) / ((double)cb + 0.1 * 64)
                        : urow[c2] * 0.1;
                    bits += -log2(p);
                    cnt++;
                }
                c0 = c1;
                c1 = c2;
                i += len;
            }
        }
        bits_out[d] = bits;
        n_out[d] = cnt;
        start = end;
    }
    return 0;
}

/* Vectorized open-addressed lookup over a query array (the HashTable
 * fast path: model.py HashTable.lookup's probe loop in C). */
int table_lookup_batch(const uint64_t *keys, const uint64_t *vals,
                       uint64_t mask, const uint64_t *queries, int64_t n,
                       uint64_t *out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = table_lookup(keys, vals, mask, queries[i]);
    return 0;
}

/* Fused hashed-n-gram linear classifier scoring
 * (cld2_ray/functions/fastlangid.py): per document, hash every char
 * 2/3/4-byte window (h = h*31 + byte, wrapping uint64; bucket =
 * (h * golden) >> 46), look up the bucket's weight row, count
 * occurrences per row, then one count-weighted accumulation per
 * distinct row.  No intermediate feature arrays.
 *
 *   cat     : concatenated " framed lowered docs " utf-8 bytes
 *   bounds  : per-doc END offsets into cat (ascending)
 *   idx     : bucket -> weight row + 1 (0 = absent), 2^18 entries
 *   w       : (n_rows, k) float32 weight table
 *   cnt     : scratch int32[n_rows], ZEROED by caller (restored to 0)
 *   touched : scratch int32[>= 3*max_doc_len]
 *   scores  : out (n_docs, k) float32, zeroed by caller
 *   nfeats  : out per-doc total feature count (incl. absent buckets)
 *   nrows   : out per-doc distinct present-row count
 */
int fastlangid_score(const uint8_t *cat, const int64_t *bounds,
                     int64_t n_docs, const int32_t *idx, const float *w,
                     int64_t k_langs, int32_t *cnt, int32_t *touched,
                     float *scores, int64_t *nfeats, int64_t *nrows) {
    const uint64_t gold = 0x9E3779B97F4A7C15ull;
    int64_t start = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t end = bounds[d];
        int64_t nt = 0, nf = 0;
        for (int n = 2; n <= 4; n++) {
            for (int64_t i = start; i + n <= end; i++) {
                uint64_t h = 0;
                for (int k = 0; k < n; k++) h = h * 31u + cat[i + k];
                h = (h * gold) >> 46;
                nf++;
                int32_t r = idx[h];
                if (!r) continue;
                if (cnt[r] == 0) touched[nt++] = r;
                cnt[r]++;
            }
        }
        float *s = scores + d * k_langs;
        for (int64_t t = 0; t < nt; t++) {
            if (t + 8 < nt) {   /* hide the random weight-row latency */
                const float *pf = w + (int64_t)touched[t + 8] * k_langs;
                __builtin_prefetch(pf, 0, 1);
                __builtin_prefetch(pf + 64, 0, 1);
            }
            int32_t r = touched[t];
            float c = (float)cnt[r];
            const float *wr = w + (int64_t)r * k_langs;
            for (int64_t j = 0; j < k_langs; j++) s[j] += c * wr[j];
            cnt[r] = 0;
        }
        nfeats[d] = nf;
        nrows[d] = nt;
        start = end;
    }
    return 0;
}

/* Scan ONE span (framed " w1 w2 " utf-8 bytes). Appends table HITS
 * (val != 0) to the output arrays at *nq_io / *no_io, with offsets
 * biased by `base`. Ring-dedupe state is local (reset per span), same
 * as the numpy path. */
static void scan_one_span(const uint8_t *sp, int64_t len, int64_t base,
                          const uint64_t *qkeys, const uint64_t *qvals,
                          uint64_t qmask,
                          const uint64_t *skeys, const uint64_t *svals,
                          uint64_t smask,
                          const uint32_t *db, uint64_t dbmask,
                          uint32_t dkeymask, const uint64_t *dpacked,
                          const uint32_t *xb, uint64_t xbmask,
                          uint32_t xkeymask, const uint64_t *xpacked,
                          uint64_t *out_qvals, int64_t *out_qoffs,
                          int64_t *nq_io,
                          uint64_t *out_ovals, int64_t *out_ooffs,
                          uint8_t *out_odist,
                          int64_t *no_io) {
    int64_t nq = *nq_io, no = *no_io;
    int64_t span_start = base;

    /* ring state, reset per span */
    uint32_t qr1 = 0, qr2 = 0; int qrn = 0;

    {
        qr1 = qr2 = 0; qrn = 0;
        if (len <= 0) { *nq_io = nq; *no_io = no; return; }

        /* --- one forward pass over chars: quads + octas ---
         * Spans are " w1 w2 " framed: byte 0 is a space, last char is
         * a space.  Mirror of hits.py: a char starts where
         * (b & 0xC0) != 0x80; is_space = first byte == 0x20. */

        /* Pass A: the GetOctaHits walk (reference cldutil.cc:416-533,
         * mirrored by hits.octa_word_and_pair_hits): per word
         * (truncated to 8 CHARS) an OctaHash40; the last-2 repeat
         * ring updates only on non-repeats; non-repeats probe the
         * distinct-octa table (word), the distinct-octa table again
         * with PairHash(prev, cur) at the PRIOR word's offset, and
         * the delta-octa table (word). dpacked/xpacked are already
         * selected for this span's script class by the caller. */
        {
            uint64_t r1 = 0, r2 = 0; int nxt = 0;
            int64_t prior_start = -1;
            int64_t prev_space = -1;
            int64_t nchars_word = 0;
            int64_t trunc = -1;
            for (int64_t b = 0; b < len; b++) {
                if ((sp[b] & 0xC0) == 0x80) continue;   /* cont. byte */
                if (sp[b] != 0x20) {
                    if (prev_space >= 0) {
                        nchars_word++;
                        if (nchars_word == 9 && trunc < 0) trunc = b;
                    }
                    continue;
                }
                if (prev_space >= 0) {
                    int64_t ws = prev_space + 1;
                    int64_t we = (trunc >= 0) ? trunc : b;
                    if (we > ws) {
                        /* bc is UNCAPPED (<= 32): OctaHash40 reads at
                         * most 24 bytes but masks with bc & 3 */
                        int64_t bc = we - ws;
                        uint64_t h = octa_hash40(sp, ws, bc, len);
                        if (h != r1 && h != r2) {
                            if (nxt == 0) r1 = h; else r2 = h;
                            nxt = 1 - nxt;
                            uint64_t prior_h = (nxt == 0) ? r1 : r2;
                            if (prior_h != 0 && prior_h != h &&
                                    prior_start >= 0) {
                                uint64_t ph = ((prior_h >> 13) |
                                               (prior_h << 51)) + h;
                                uint64_t v = bucket_lookup40(
                                    xb, xbmask, xkeymask, xpacked, ph);
                                if (v) {
                                    out_ovals[no] = v;
                                    out_ooffs[no] = span_start + prior_start;
                                    out_odist[no] = 1;
                                    no++;
                                }
                            }
                            uint64_t v = bucket_lookup40(
                                xb, xbmask, xkeymask, xpacked, h);
                            if (v) {
                                out_ovals[no] = v;
                                out_ooffs[no] = span_start + ws;
                                out_odist[no] = 1;
                                no++;
                            }
                            v = bucket_lookup40(
                                db, dbmask, dkeymask, dpacked, h);
                            if (v) {
                                out_ovals[no] = v;
                                out_ooffs[no] = span_start + ws;
                                out_odist[no] = 0;
                                no++;
                            }
                            /* seed-trained word stats (model.socta) */
                            v = table_lookup(skeys, svals, smask, h);
                            if (v) {
                                out_ovals[no] = v;
                                out_ooffs[no] = span_start + ws;
                                out_odist[no] = 0;
                                no++;
                            }
                        }
                        prior_start = ws;
                    }
                }
                prev_space = b;
                nchars_word = 0;
                trunc = -1;
            }
        }

        /* Pass B: quads — need char indexing.  Collect char starts
         * into a queue of up to 8 pending positions: for char i we
         * need next_space(i) (could be far) and cstart[min(i+4, ns)].
         * Strategy: scan chars once, remembering for each letter run
         * the positions; since e = min(i+4, next_space_char), and
         * next_space is the end of the current word, process word by
         * word: within a word of chars w[0..m-1] with byte starts
         * c[0..m-1] and word-end byte offset wend:
         *   for each j in 0..m-1 (char index within span <= n-2):
         *     e_char = min(j+4, m); ebyte = (e_char==m) ? wend : c[e_char]
         *     keep if (e_char - j) >= 3 or j == 0   [word_start]
         *     bc = min(ebyte - c[j], 12); keep bc > 0
         *     pre = byte before c[j] is space; post = byte at
         *           min(c[j]+bc, len-1) is space
         * Words never exceed span length; buffer char starts per word
         * in a fixed chunk (words can be long; cap chunk at 4096 and
         * spill — chunking is safe because e looks ahead only 4). */
        {
            #define WCAP 4100
            int64_t cpos[WCAP];
            int64_t m = 0;
            int word_head = 1;   /* cpos[0] is the word's true first char */
            int64_t word_first_char_global = 0;  /* char idx in span of cpos[0] */
            int64_t char_idx = 0;                /* char idx in span */
            int64_t nchars_limit;                /* last char excluded */
            /* count chars (cheap byte scan) to know n-1 limit */
            {
                int64_t nc = 0;
                for (int64_t b = 0; b < len; b++)
                    if ((sp[b] & 0xC0) != 0x80) nc++;
                if (nc < 3) { *nq_io = nq; *no_io = no; return; }
                nchars_limit = nc - 1;   /* letters = ~is_space[:n-1] */
            }
            for (int64_t b = 0; b <= len; b++) {
                int is_end = (b == len);
                if (!is_end && (sp[b] & 0xC0) == 0x80) continue;
                int is_space = is_end || sp[b] == 0x20;
                if (!is_space) {
                    if (m == 0) { word_first_char_global = char_idx; word_head = 1; }
                    if (m < WCAP) cpos[m++] = b;
                    else {
                        /* pathological giant word: flush all but last
                         * 4 chars, preserving lookahead semantics */
                        int64_t wend_tmp = -1; /* not known yet: flush
                            only entries with full 4-char lookahead */
                        (void)wend_tmp;
                        int64_t flush = m - 4;
                        for (int64_t j = 0; j < flush; j++) {
                            int64_t gj = word_first_char_global + j;
                            if (gj >= nchars_limit) break;
                            int64_t ebyte = cpos[j + 4];
                            int64_t bc = ebyte - cpos[j];
                            int keep = 1; /* e-i==4 >= 3 */
                            if (bc > 12) bc = 12;
                            if (keep && bc > 0) {
                                int pre = cpos[j] > 0 &&
                                          sp[cpos[j] - 1] == 0x20;
                                int64_t pp = cpos[j] + bc;
                                if (pp > len - 1) pp = len - 1;
                                int post = sp[pp] == 0x20;
                                uint32_t h = quad_hash(sp, cpos[j], bc,
                                                       len, pre, post);
                                int dup = (qrn >= 1 && h == qr1) ||
                                          (qrn >= 2 && h == qr2);
                                qr2 = qr1; qr1 = h;
                                if (qrn < 2) qrn++;
                                if (!dup) {
                                    uint64_t v = table_lookup(
                                        qkeys, qvals, qmask, (uint64_t)h);
                                    if (v) {
                                        out_qvals[nq] = v;
                                        out_qoffs[nq] = span_start + cpos[j];
                                        nq++;
                                    }
                                }
                            }
                        }
                        for (int64_t j = 0; j < 4; j++)
                            cpos[j] = cpos[m - 4 + j];
                        word_first_char_global += flush;
                        word_head = 0;   /* cpos[0] is now mid-word */
                        m = 4;
                        cpos[m++] = b;
                    }
                } else if (m > 0) {
                    /* word ended at byte b (the space/end): emit */
                    int64_t wend = b;
                    for (int64_t j = 0; j < m; j++) {
                        int64_t gj = word_first_char_global + j;
                        if (gj >= nchars_limit) break;
                        int64_t e_char = j + 4 > m ? m : j + 4;
                        int64_t ebyte = (e_char == m) ? wend : cpos[e_char];
                        /* word_start: a whole short word (preceded by a
                         * space char — single-byte 0x20, so a byte test
                         * equals the char test) */
                        int keep = (e_char - j) >= 3 ||
                                   (j == 0 && word_head && cpos[0] > 0 &&
                                    sp[cpos[0] - 1] == 0x20);
                        int64_t bc = ebyte - cpos[j];
                        if (bc > 12) bc = 12;
                        if (keep && bc > 0) {
                            int pre = cpos[j] > 0 && sp[cpos[j] - 1] == 0x20;
                            int64_t pp = cpos[j] + bc;
                            if (pp > len - 1) pp = len - 1;
                            int post = sp[pp] == 0x20;
                            uint32_t h = quad_hash(sp, cpos[j], bc, len,
                                                   pre, post);
                            int dup = (qrn >= 1 && h == qr1) ||
                                      (qrn >= 2 && h == qr2);
                            qr2 = qr1; qr1 = h;
                            if (qrn < 2) qrn++;
                            if (!dup) {
                                uint64_t v = table_lookup(qkeys, qvals,
                                                          qmask, (uint64_t)h);
                                if (v) {
                                    out_qvals[nq] = v;
                                    out_qoffs[nq] = span_start + cpos[j];
                                    nq++;
                                }
                            }
                        }
                    }
                    m = 0;
                }
                if (!is_end) char_idx++;
            }
            #undef WCAP
        }
    }
    (void)span_start;
    *nq_io = nq;
    *no_io = no;
}

/* Single-pass quality statistics (cld2_ray/functions/quality.py
 * word_stats + apply_rules counts): replaces five full RE2 scans +
 * a token flatten/match pass with ONE walk over the concatenated
 * STRIPPED utf-8 docs.  Semantics pinned to the Arrow/RE2 kernels:
 *   - \s = [\t\n\f\r ] exactly (ASCII; NOT \v, NOT NBSP) — verified
 *     against pyarrow.compute
 *   - words = maximal \S+ runs; alpha word = contains >=1 cp with
 *     is_letter[cp] (unicodedata L*, the \pL analogue)
 *   - stopword token match = ^['"(]*(?:STOP)[.,;:!?'")]*$ ignore_case:
 *     strip leading {'"(}, strip trailing {.,;:!?'")}, simple-fold
 *     (fold[] = RE2-derived orbit map onto the stopword alphabet,
 *     identity elsewhere; see quality._fold_lut), compare against the
 *     packed-utf8 stopword set (keys = folded bytes, <=8, LE uint64)
 *   - sentences = cps {. ! ? 0x3002 0xFF01 0xFF1F}; symbols =
 *     '#' + floor(dot_run/3) + 0x2026; lorem = case-insensitive
 *     "lorem ipsum" substring; brace = '{'
 * out: n_docs x 9 int64 rows:
 *   [n_words, n_chars, n_ws, alpha_words, n_stop, n_sentences,
 *    symbols, has_lorem, has_brace] */
static inline int stop_token_match(const uint8_t *cat, int64_t ts,
                                   int64_t te,
                                   const uint32_t *fold, int64_t fold_lim,
                                   const uint64_t *sw_keys, int64_t sw_cap) {
    while (ts < te && (cat[ts] == '\'' || cat[ts] == '"'
                       || cat[ts] == '(')) ts++;
    while (te > ts) {
        uint8_t c = cat[te - 1];
        if (c == '.' || c == ',' || c == ';' || c == ':'
            || c == '!' || c == '?' || c == '\'' || c == '"'
            || c == ')') te--;
        else break;
    }
    if (te <= ts || te - ts > 16) return 0;
    uint8_t kb[8]; int kn = 0;
    for (int64_t j = ts; j < te;) {
        uint8_t ld = cat[j];
        int jl = ld < 0x80 ? 1 : (ld < 0xE0 ? 2 : (ld < 0xF0 ? 3 : 4));
        if (j + jl > te) jl = (int)(te - j);
        uint32_t c2;
        if (jl == 1) c2 = ld;
        else if (jl == 2)
            c2 = ((ld & 0x1Fu) << 6) | (cat[j+1] & 0x3Fu);
        else if (jl == 3)
            c2 = ((ld & 0x0Fu) << 12) | ((cat[j+1] & 0x3Fu) << 6)
                 | (cat[j+2] & 0x3Fu);
        else
            c2 = ((ld & 0x07u) << 18) | ((cat[j+1] & 0x3Fu) << 12)
                 | ((cat[j+2] & 0x3Fu) << 6) | (cat[j+3] & 0x3Fu);
        if (c2 < (uint32_t)fold_lim) c2 = fold[c2];
        if (c2 < 0x80) {
            if (kn + 1 > 8) return 0;
            kb[kn++] = (uint8_t)c2;
        } else if (c2 < 0x800) {
            if (kn + 2 > 8) return 0;
            kb[kn++] = 0xC0 | (c2 >> 6);
            kb[kn++] = 0x80 | (c2 & 0x3F);
        } else if (c2 < 0x10000) {
            if (kn + 3 > 8) return 0;
            kb[kn++] = 0xE0 | (c2 >> 12);
            kb[kn++] = 0x80 | ((c2 >> 6) & 0x3F);
            kb[kn++] = 0x80 | (c2 & 0x3F);
        } else {
            if (kn + 4 > 8) return 0;
            kb[kn++] = 0xF0 | (c2 >> 18);
            kb[kn++] = 0x80 | ((c2 >> 12) & 0x3F);
            kb[kn++] = 0x80 | ((c2 >> 6) & 0x3F);
            kb[kn++] = 0x80 | (c2 & 0x3F);
        }
        j += jl;
    }
    if (kn == 0) return 0;
    uint64_t key = 0;
    for (int b2 = 0; b2 < kn; b2++)
        key |= (uint64_t)kb[b2] << (8 * b2);
    uint64_t m = (uint64_t)sw_cap - 1;
    uint64_t h = key * 0x9E3779B97F4A7C15ull;
    h ^= h >> 29;
    uint64_t idx = h & m;
    for (;;) {
        uint64_t k2 = sw_keys[idx];
        if (k2 == key) return 1;
        if (k2 == 0) return 0;
        idx = (idx + 1) & m;
    }
}

static inline int is_re2_space(uint32_t cp) {
    return cp == 32 || cp == 9 || cp == 10 || cp == 12 || cp == 13;
}

/* Python str.isspace() / str.strip() whitespace set */
static inline int is_py_space(uint32_t cp) {
    return (cp >= 9 && cp <= 13) || (cp >= 0x1C && cp <= 0x20)
        || cp == 0x85 || cp == 0xA0 || cp == 0x1680
        || (cp >= 0x2000 && cp <= 0x200A)
        || cp == 0x2028 || cp == 0x2029 || cp == 0x202F
        || cp == 0x205F || cp == 0x3000;
}

/* per-process dup-line hash table with epoch tags (no per-doc clear) */
static uint64_t *g_line_h = NULL;
static uint64_t *g_line_ep = NULL;
static int64_t g_line_cap = 0;   /* power of two */

/* one stripped non-empty line [ts, te): update bullet/ellipsis/dup.
 * first_cp is the first codepoint at ts; returns 1 if it was a dup. */
static inline int line_commit(const uint8_t *cat, int64_t ts, int64_t te,
                              uint32_t first_cp, uint64_t ep,
                              int64_t *bullets, int64_t *ellipsis) {
    if (first_cp == '-' || first_cp == '*' || first_cp == 0x2022
        || first_cp == 0x00B7) (*bullets)++;
    if ((te - ts >= 3 && cat[te-1] == '.' && cat[te-2] == '.'
         && cat[te-3] == '.')
        || (te - ts >= 3 && cat[te-1] == 0xA6 && cat[te-2] == 0x80
            && cat[te-3] == 0xE2)) (*ellipsis)++;
    uint64_t h = 0xCBF29CE484222325ull;             /* FNV-1a 64 */
    for (int64_t i = ts; i < te; i++)
        h = (h ^ cat[i]) * 0x100000001B3ull;
    uint64_t m = (uint64_t)g_line_cap - 1;
    uint64_t idx = h & m;
    for (;;) {
        if (g_line_ep[idx] != ep) {
            g_line_ep[idx] = ep; g_line_h[idx] = h; return 0;
        }
        if (g_line_h[idx] == h) return 1;
        idx = (idx + 1) & m;
    }
}

/* line stats for one doc [start, end): split on '\n', strip each line
 * (Python str.strip() semantics), drop empties; count non-empty lines,
 * bullet starts, "..."/ellipsis ends, and duplicate lines (64-bit FNV
 * equality - collision odds negligible). Mirrors quality.line_stats. */
static void line_scan_doc(const uint8_t *cat, int64_t start, int64_t end,
                          int64_t *row) {
    static uint64_t epoch = 0;
    int64_t need = ((end - start) / 2 + 8) * 2;
    if (need > g_line_cap) {
        int64_t cap = g_line_cap > 64 ? g_line_cap : 64;
        while (cap < need) cap <<= 1;
        free(g_line_h); free(g_line_ep);
        g_line_h = (uint64_t *)malloc((size_t)cap * 8);
        g_line_ep = (uint64_t *)calloc((size_t)cap, 8);
        g_line_cap = cap;
    }
    epoch++;
    int64_t n_lines = 0, bullets = 0, ellipsis = 0, dups = 0;
    int64_t i = start;
    while (i <= end) {
        /* line = [i, next \n or end) */
        int64_t le = i;
        while (le < end && cat[le] != '\n') le++;
        /* strip: find first/last non-space codepoints */
        int64_t ts = -1, te = -1;
        uint32_t first_cp = 0;
        for (int64_t j = i; j < le;) {
            uint8_t lead = cat[j];
            int l = lead < 0x80 ? 1 : (lead < 0xE0 ? 2
                        : (lead < 0xF0 ? 3 : 4));
            if (j + l > le) l = (int)(le - j);
            uint32_t cp;
            if (l == 1) cp = lead;
            else if (l == 2)
                cp = ((lead & 0x1Fu) << 6) | (cat[j+1] & 0x3Fu);
            else if (l == 3)
                cp = ((lead & 0x0Fu) << 12) | ((cat[j+1] & 0x3Fu) << 6)
                     | (cat[j+2] & 0x3Fu);
            else
                cp = ((lead & 0x07u) << 18) | ((cat[j+1] & 0x3Fu) << 12)
                     | ((cat[j+2] & 0x3Fu) << 6) | (cat[j+3] & 0x3Fu);
            if (!is_py_space(cp)) {
                if (ts < 0) { ts = j; first_cp = cp; }
                te = j + l;
            }
            j += l;
        }
        if (ts >= 0) {
            n_lines++;
            dups += line_commit(cat, ts, te, first_cp, epoch,
                                &bullets, &ellipsis);
        }
        if (le >= end) break;
        i = le + 1;
    }
    row[9] = n_lines; row[10] = bullets;
    row[11] = ellipsis; row[12] = dups;
}

int quality_scan(const uint8_t *cat, const int64_t *bounds, int64_t n_docs,
                 const uint8_t *is_letter, int64_t letter_lim,
                 const uint32_t *fold, int64_t fold_lim,
                 const uint64_t *sw_keys, int64_t sw_cap,
                 int64_t *out) {
    static const char lorem[] = "lorem ipsum";
    int64_t start = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t end = bounds[d];
        int64_t n_words = 0, n_chars = 0, n_ws = 0, alpha_words = 0;
        int64_t n_stop = 0, n_sent = 0, symbols = 0;
        int64_t has_lorem = 0, has_brace = 0;
        int in_word = 0, word_has_letter = 0;
        int64_t tok_start = -1;       /* byte offset of current token */
        int64_t dot_run = 0;
        int64_t lorem_pos = 0;        /* chars of "lorem ipsum" matched */
        for (int64_t i = start; i < end;) {
            uint8_t lead = cat[i];
            int l = lead < 0x80 ? 1 : (lead < 0xE0 ? 2
                        : (lead < 0xF0 ? 3 : 4));
            if (i + l > end) l = (int)(end - i);
            uint32_t cp;
            if (l == 1) cp = lead;
            else if (l == 2)
                cp = ((lead & 0x1Fu) << 6) | (cat[i + 1] & 0x3Fu);
            else if (l == 3)
                cp = ((lead & 0x0Fu) << 12) | ((cat[i + 1] & 0x3Fu) << 6)
                     | (cat[i + 2] & 0x3Fu);
            else
                cp = ((lead & 0x07u) << 18) | ((cat[i + 1] & 0x3Fu) << 12)
                     | ((cat[i + 2] & 0x3Fu) << 6) | (cat[i + 3] & 0x3Fu);
            n_chars++;
            /* dot-run for the non-overlapping "..." count */
            if (cp == '.') dot_run++;
            else { symbols += dot_run / 3; dot_run = 0; }
            if (cp == '#') symbols++;
            else if (cp == 0x2026) symbols++;
            if (cp == '.' || cp == '!' || cp == '?' || cp == 0x3002
                || cp == 0xFF01 || cp == 0xFF1F) n_sent++;
            if (cp == '{') has_brace = 1;
            /* case-insensitive "lorem ipsum" tracker (ASCII needle) */
            if (!has_lorem) {
                uint32_t lc = (cp >= 'A' && cp <= 'Z') ? cp + 32 : cp;
                if (lc == (uint32_t)lorem[lorem_pos]) {
                    lorem_pos++;
                    if (lorem[lorem_pos] == 0) has_lorem = 1;
                } else {
                    lorem_pos = lc == (uint32_t)lorem[0] ? 1 : 0;
                }
            }
            if (is_re2_space(cp)) {
                n_ws++;
                if (in_word) {
                    /* token [tok_start, i) ended */
                    if (word_has_letter) alpha_words++;
                    goto end_token;
                }
            } else {
                if (!in_word) { in_word = 1; word_has_letter = 0;
                                tok_start = i; n_words++; }
                if (cp < (uint32_t)letter_lim && is_letter[cp])
                    word_has_letter = 1;
            }
            i += l;
            continue;
        end_token:
            n_stop += stop_token_match(cat, tok_start, i, fold,
                                       fold_lim, sw_keys, sw_cap);
            in_word = 0;
            i += l;
        }
        /* flush tail state */
        symbols += dot_run / 3;
        if (in_word) {
            if (word_has_letter) alpha_words++;
            n_stop += stop_token_match(cat, tok_start, end, fold,
                                       fold_lim, sw_keys, sw_cap);
        }
        int64_t *row = out + d * 13;
        row[0] = n_words; row[1] = n_chars; row[2] = n_ws;
        row[3] = alpha_words; row[4] = n_stop; row[5] = n_sent;
        row[6] = symbols; row[7] = has_lorem; row[8] = has_brace;
        line_scan_doc(cat, start, end, row);
        start = end;
    }
    return 0;
}

/* Scan concatenated spans. bounds: nb ascending END byte offsets, one
 * per span (bounds[nb-1] == n). Emits table HITS only (val != 0).
 * Output arrays sized >= n by the caller. Returns 0. */
int quad_octa_scan(const uint8_t *buf, int64_t n,
                   const int64_t *bounds, int64_t nb,
                   const uint64_t *qkeys, const uint64_t *qvals, uint64_t qmask,
                   const uint64_t *skeys, const uint64_t *svals, uint64_t smask,
                   const uint32_t *db, int64_t dnb, uint32_t dkeymask,
                   const uint64_t *dpl, const uint64_t *dpo,
                   const uint32_t *xb, int64_t xnb, uint32_t xkeymask,
                   const uint64_t *xpl, const uint64_t *xpo,
                   const uint8_t *span_latin,
                   uint64_t *out_qvals, int64_t *out_qoffs, int64_t *nq_out,
                   uint64_t *out_ovals, int64_t *out_ooffs,
                   uint8_t *out_odist, int64_t *no_out) {
    int64_t nq = 0, no = 0;
    int64_t span_start = 0;
    uint64_t dbmask = (uint64_t)(dnb - 1);
    uint64_t xbmask = (uint64_t)(xnb - 1);
    (void)n;
    for (int64_t span_i = 0; span_i < nb; span_i++) {
        int64_t span_end = bounds[span_i];
        scan_one_span(buf + span_start, span_end - span_start, span_start,
                      qkeys, qvals, qmask, skeys, svals, smask,
                      db, dbmask, dkeymask, span_latin[span_i] ? dpl : dpo,
                      xb, xbmask, xkeymask, span_latin[span_i] ? xpl : xpo,
                      out_qvals, out_qoffs, &nq,
                      out_ovals, out_ooffs, out_odist, &no);
        span_start = span_end;
    }
    *nq_out = nq;
    *no_out = no;
    return 0;
}

/* Fused scan + chunk scoring: the whole _many_hits ->
 * score_chunks_multi chain (cld2_ray/functions/langid.py:_fill_totes,
 * score.py:score_chunks_multi) in ONE C pass per span, emitting only
 * per-CHUNK results — per-hit arrays never exist, which removes the
 * ~100x memory-traffic amplification the numpy path pays (hits are
 * ~1 per 2 text bytes; each flowed through concat/argsort/unpack/
 * bincount as multiple int64 lanes).
 *
 * Bit-equal to the numpy chain (cross-checked in tests/test_native.py):
 *  - quads before octas at equal offset (stable concat order)
 *  - nchunks = max(1, nh/chunk_size); hit i -> chunk min(i/cs, nch-1)
 *  - per-chunk lang scores = sum of decoded qprob lanes; UNKNOWN (0)
 *    lane suppressed
 *  - hint boost 12 + grams*12/16 to hinted langs with evidence
 *  - deterministic top-2 (ties -> smaller lang id, = score.py _top2)
 *  - ReliabilityDelta integer math + the reference's exact
 *    ReliabilityExpected ramp in double (same expressions, same
 *    truncation as score.reliability_expected_exact)
 *
 * hint_csr: nb+1 offsets into hint_flat (per-span hinted lang ids).
 * Scratch: sc_qvals/sc_qoffs/sc_ovals/sc_ooffs sized >= max span len+8;
 * sc_scores int64[num_langs] ZEROED by caller (left zeroed on return).
 * Outputs sized >= n/chunk_size + nb + 8. Returns chunk count. */
/* Chunk-score ONE span's merged hit stream (primary a = quads/unis,
 * secondary b = octas/bis; a-before-b at equal offsets — the stable
 * concat order). Appends per-chunk rows at *nchunks_io; returns the
 * number of chunks appended. Offsets are LOCAL to the span and already
 * in the span's byte space (CJK callers pre-scale char positions x3).
 * sc_scores: int64[num_langs] zeroed, left zeroed. */
static int64_t chunk_score_merged(
        const uint64_t *av, const int64_t *ao, int64_t na,
        const uint64_t *bv, const int64_t *bo, const uint8_t *bd,
        int64_t nb_,
        int64_t span_len, int64_t chunk_size,
        const int32_t *expected_1kb, int32_t exp_script4,
        const int8_t *close_set,
        int64_t num_langs,
        const int64_t *hints, int64_t nhints,
        int64_t *sc_scores, int64_t span_i,
        int16_t *out_lang1, int64_t *out_cbytes, int64_t *out_s1,
        int64_t *out_rel, int64_t *out_span, int64_t *nchunks_io,
        int64_t *out_rel_delta /* nullable: rel BEFORE the expected
                                  fold (= the zeros-expected rel the
                                  ranges path scores with) */) {
    int64_t nchunks_total = *nchunks_io;
    int32_t touched[4 * 4096 + 64];   /* lanes touched per chunk */
    int64_t nh = na + nb_;
    if (nh == 0) return 0;
    int64_t nch = nh / chunk_size;
    if (nch < 1) nch = 1;

    int64_t ai = 0, bi = 0;
    int64_t hit_idx = 0;
    int64_t prev_chunk_start = -1;   /* local byte offset */
    /* distinct-boost ring: last 4 distinct-octa langprobs, re-added to
     * every chunk's tote (AddDistinctBoost2 + ScoreBoosts, reference
     * scoreonescriptspan.cc:112-152); scoped to this span */
    uint64_t dring[4] = {0, 0, 0, 0};
    int dring_n = 0;
    for (int64_t c = 0; c < nch; c++) {
        int64_t lo = c * chunk_size;
        int64_t hi = (c == nch - 1) ? nh : lo + chunk_size;
        int64_t grams = hi - lo;
        int64_t first_off = -1;
        int64_t nt = 0;
        for (; hit_idx < hi; hit_idx++) {
            uint64_t v; int64_t off; int is_distinct;
            if (ai < na && (bi >= nb_ || ao[ai] <= bo[bi])) {
                v = av[ai]; off = ao[ai]; ai++; is_distinct = 0;
            } else {
                v = bv[bi]; off = bo[bi];
                is_distinct = bd ? bd[bi] : 0;
                bi++;
            }
            if (first_off < 0) first_off = off;
            for (int lane = 0; lane < 4; lane++) {
                int64_t l = (int64_t)((v >> (16 * lane)) & 0xFF);
                int64_t q = (int64_t)((v >> (16 * lane + 8)) & 0xFF);
                if (l == 0) continue;    /* UNKNOWN lane suppressed */
                if (sc_scores[l] == 0) touched[nt++] = (int32_t)l;
                sc_scores[l] += q;
            }
            if (is_distinct) {
                dring[dring_n & 3] = v;
                dring_n++;
            }
        }
        /* re-add the ring (<= 4 most recent distinct hits) */
        for (int k = 0; k < 4; k++) {
            uint64_t v = dring[k];
            if (!v) continue;
            for (int lane = 0; lane < 4; lane++) {
                int64_t l = (int64_t)((v >> (16 * lane)) & 0xFF);
                int64_t q = (int64_t)((v >> (16 * lane + 8)) & 0xFF);
                if (l == 0) continue;
                if (sc_scores[l] == 0) touched[nt++] = (int32_t)l;
                sc_scores[l] += q;
            }
        }
        /* per-chunk language priors (functions/hints.py payloads:
         * boost = lid | (w << 16) adds unconditionally; whack = -lid
         * zeroes; boosts precede whacks in the payload) */
        for (int64_t hj = 0; hj < nhints; hj++) {
            int64_t v = hints[hj];
            if (v >= 0) {
                int64_t l = v & 0xFFFF;
                if (sc_scores[l] == 0) touched[nt++] = (int32_t)l;
                sc_scores[l] += v >> 16;
            } else {
                sc_scores[-v] = 0;
            }
        }
        /* deterministic top-2 (ties -> smaller id, = score.py _top2) */
        int64_t s1 = sc_scores[0], s2 = sc_scores[1];
        int64_t t1 = 0, t2 = 1;
        if (s2 > s1) { int64_t tmp = t1; t1 = t2; t2 = tmp;
                       int64_t ts = s1; s1 = s2; s2 = ts; }
        for (int64_t l = 2; l < num_langs; l++) {
            int64_t s = sc_scores[l];
            if (s > s1) { s2 = s1; t2 = t1; s1 = s; t1 = l; }
            else if (s > s2) { s2 = s; t2 = l; }
        }
        /* chunk byte extent: patch the previous chunk's end */
        int64_t c_start = first_off;
        if (c > 0) {
            out_cbytes[nchunks_total - 1] =
                c_start - prev_chunk_start > 0
                    ? c_start - prev_chunk_start : 1;
        }
        prev_chunk_start = c_start;
        /* reliability: delta part (cldutil.cc:553-571) */
        int64_t max_rel = grams < 8 ? 12 * grams : 100;
        int64_t thresh = (grams * 5) >> 3;
        if (thresh < 3) thresh = 3;
        if (thresh > 16) thresh = 16;
        int64_t delta = s1 - s2;
        int64_t rel_d;
        if (delta >= thresh) rel_d = max_rel;
        else if (delta <= 0) rel_d = 0;
        else {
            rel_d = (100 * delta) / thresh;
            if (rel_d > max_rel) rel_d = max_rel;
        }
        int8_t cs1 = close_set[t1];
        if (cs1 > 0 && cs1 == close_set[t2]) rel_d = 100;
        out_lang1[nchunks_total] = (int16_t)t1;
        out_s1[nchunks_total] = s1;
        out_rel[nchunks_total] = rel_d;   /* rel_e folded in below */
        if (out_rel_delta) out_rel_delta[nchunks_total] = rel_d;
        out_span[nchunks_total] = span_i;
        out_cbytes[nchunks_total] = -1;
        nchunks_total++;
        for (int64_t t = 0; t < nt; t++) sc_scores[touched[t]] = 0;
    }
    /* last chunk ends at span_len */
    {
        int64_t cb = span_len - prev_chunk_start;
        out_cbytes[nchunks_total - 1] = cb > 0 ? cb : 1;
    }
    /* fold in ReliabilityExpected — the reference's EXACT ramp
     * (cldutil.cc:586-605, = score.reliability_expected_exact):
     * symmetric ratio, <= 1.5 -> 100, > 4.0 -> 0, linear between,
     * int truncation. exp_script4 >= 0 selects the LScript4 slot of
     * a [num_langs][4] kAvgDeltaOctaScore-layout table; -1 means a
     * plain per-language table (CJK unigram rates). */
    for (int64_t c = nchunks_total - nch; c < nchunks_total; c++) {
        int64_t s1 = out_s1[c];
        int64_t cb = out_cbytes[c];
        int64_t actual = (s1 << 10) / cb;
        int32_t exp1kb = exp_script4 >= 0
            ? expected_1kb[out_lang1[c] * 4 + exp_script4]
            : expected_1kb[out_lang1[c]];
        int64_t rel_e = 100;
        if (exp1kb != 0) {
            if (actual == 0) rel_e = 0;
            else {
                double a = (double)actual, e = (double)exp1kb;
                double ratio = e > a ? e / a : a / e;
                if (ratio > 1.5) {
                    rel_e = ratio > 4.0 ? 0
                        : (int64_t)(100.0 * (4.0 - ratio) / (4.0 - 1.5));
                }
            }
        }
        if (rel_e < out_rel[c]) out_rel[c] = rel_e;
    }
    *nchunks_io = nchunks_total;
    return nch;
}

int64_t quad_octa_chunk_score(
        const uint8_t *buf, int64_t n,
        const int64_t *bounds, int64_t nb,
        const uint64_t *qkeys, const uint64_t *qvals, uint64_t qmask,
        const uint64_t *skeys, const uint64_t *svals, uint64_t smask,
        const uint32_t *db, int64_t dnb, uint32_t dkeymask,
        const uint64_t *dpl, const uint64_t *dpo,
        const uint32_t *xb, int64_t xnb, uint32_t xkeymask,
        const uint64_t *xpl, const uint64_t *xpo,
        const uint8_t *span_latin, const uint8_t *span_script4,
        int64_t chunk_size,
        const int32_t *expected_1kb, const int8_t *close_set,
        int64_t num_langs,
        const int64_t *hint_csr, const int64_t *hint_flat,
        uint64_t *sc_qvals, int64_t *sc_qoffs,
        uint64_t *sc_ovals, int64_t *sc_ooffs, uint8_t *sc_odist,
        int64_t *sc_scores,
        int16_t *out_lang1, int64_t *out_cbytes, int64_t *out_s1,
        int64_t *out_rel, int64_t *out_span) {
    int64_t nchunks_total = 0;
    int64_t span_start = 0;
    uint64_t dbmask = (uint64_t)(dnb - 1);
    uint64_t xbmask = (uint64_t)(xnb - 1);
    (void)n;
    for (int64_t span_i = 0; span_i < nb; span_i++) {
        int64_t span_end = bounds[span_i];
        int64_t len = span_end - span_start;
        const uint8_t *sp = buf + span_start;
        int64_t nq = 0, no = 0;
        const uint64_t *dpacked = span_latin[span_i] ? dpl : dpo;
        const uint64_t *xpacked = span_latin[span_i] ? xpl : xpo;
        scan_one_span(sp, len, 0, qkeys, qvals, qmask,
                      skeys, svals, smask,
                      db, dbmask, dkeymask, dpacked,
                      xb, xbmask, xkeymask, xpacked,
                      sc_qvals, sc_qoffs, &nq, sc_ovals, sc_ooffs,
                      sc_odist, &no);
        span_start = span_end;
        chunk_score_merged(sc_qvals, sc_qoffs, nq, sc_ovals, sc_ooffs,
                           sc_odist, no,
                           len, chunk_size, expected_1kb,
                           (int32_t)span_script4[span_i], close_set,
                           num_langs,
                           hint_flat + hint_csr[span_i],
                           hint_csr[span_i + 1] - hint_csr[span_i],
                           sc_scores, span_i,
                           out_lang1, out_cbytes, out_s1, out_rel,
                           out_span, &nchunks_total, NULL);
    }
    return nchunks_total;
}

/* CJK fused scan + chunk scoring — the cjk_candidates -> uni/bi table
 * lookup -> score_chunks_multi chain (hits.py cjk_candidates,
 * langid.py:_fill_totes cjk branch) in one C pass per span.
 *
 * cat: concatenated utf-8 of the CJK span texts; bounds: END byte
 * offsets per span; pseudo_lens: per-span "byte length" used for
 * chunk extents (sp.text_bytes — positions are char indices scaled
 * x3, per the numpy path). Unigram key = codepoint, open-address
 * table enumerated from the reference CjkUni trie; bigram = BiHashV2
 * over the raw bytes of two adjacent chars with combined length >= 6
 * (GetBiHits, reference cldutil.cc:248-310), probed into the CJK
 * delta-bi bucket table. No repeat filtering on either stream (the
 * reference walks have none); unis before bis at equal position. */
int64_t cjk_chunk_score(
        const uint8_t *cat, int64_t n,
        const int64_t *bounds, int64_t nb,
        const int64_t *pseudo_lens,
        const uint64_t *ukeys, const uint64_t *uvals, uint64_t umask,
        const uint32_t *bb, int64_t bnb, uint32_t bkeymask,
        const uint64_t *bpacked,
        int64_t chunk_size,
        const int32_t *expected_1kb, const int8_t *close_set,
        int64_t num_langs,
        const int64_t *hint_csr, const int64_t *hint_flat,
        uint64_t *sc_uvals, int64_t *sc_uoffs,
        uint64_t *sc_bvals, int64_t *sc_boffs,
        int64_t *sc_scores,
        int16_t *out_lang1, int64_t *out_cbytes, int64_t *out_s1,
        int64_t *out_rel, int64_t *out_span) {
    int64_t nchunks_total = 0;
    int64_t span_start = 0;
    uint32_t bbmask = (uint32_t)(bnb - 1);
    (void)n;
    for (int64_t span_i = 0; span_i < nb; span_i++) {
        int64_t span_end = bounds[span_i];
        const uint8_t *sp = cat + span_start;
        int64_t len = span_end - span_start;
        span_start = span_end;

        int64_t nu = 0, nbi = 0;
        int64_t char_idx = 0;
        int64_t prev_pos = -2;     /* char pos of previous NON-SPACE cp */
        int64_t prev_byte = -1;    /* byte start of that char */
        int prev_len = 0;
        for (int64_t i = 0; i < len; char_idx++) {
            uint8_t lead = sp[i];
            int l = lead < 0x80 ? 1 : (lead < 0xE0 ? 2
                        : (lead < 0xF0 ? 3 : 4));
            if (i + l > len) l = (int)(len - i);
            uint32_t cp;
            int64_t byte_start = i;
            if (l == 1) cp = lead;
            else if (l == 2)
                cp = ((lead & 0x1Fu) << 6) | (sp[i + 1] & 0x3Fu);
            else if (l == 3)
                cp = ((lead & 0x0Fu) << 12) | ((sp[i + 1] & 0x3Fu) << 6)
                     | (sp[i + 2] & 0x3Fu);
            else
                cp = ((lead & 0x07u) << 18) | ((sp[i + 1] & 0x3Fu) << 12)
                     | ((sp[i + 2] & 0x3Fu) << 6) | (sp[i + 3] & 0x3Fu);
            i += l;
            if (cp == 32) continue;
            /* unigram */
            uint64_t v = table_lookup(ukeys, uvals, umask, (uint64_t)cp);
            if (v) {
                sc_uvals[nu] = v;
                sc_uoffs[nu] = char_idx * 3;
                nu++;
            }
            /* bigram: adjacent chars, combined utf-8 length >= 6 */
            if (prev_pos == char_idx - 1 && prev_len + l >= 6) {
                uint32_t h = bi_hash32(sp, prev_byte,
                                       (int64_t)(prev_len + l), len);
                uint64_t bv = bucket_lookup32(bb, bbmask, bkeymask,
                                              bpacked, h);
                if (bv) {
                    sc_bvals[nbi] = bv;
                    sc_boffs[nbi] = prev_pos * 3;
                    nbi++;
                }
            }
            prev_pos = char_idx;
            prev_byte = byte_start;
            prev_len = l;
        }
        chunk_score_merged(sc_uvals, sc_uoffs, nu, sc_bvals, sc_boffs,
                           (const uint8_t *)0, nbi,
                           pseudo_lens[span_i], chunk_size,
                           expected_1kb, -1, close_set, num_langs,
                           hint_flat + hint_csr[span_i],
                           hint_csr[span_i + 1] - hint_csr[span_i],
                           sc_scores, span_i,
                           out_lang1, out_cbytes, out_s1, out_rel,
                           out_span, &nchunks_total, NULL);
    }
    return nchunks_total;
}

/* Script-run segmentation (cld2_ray/functions/spans.py script_spans)
 * in ONE C pass: utf-8 decode, script LUT, pinned 1:1 lowercase,
 * 160KB letter budget, single-foreign-letter absorption, word gaps,
 * span breaks, giant-run splitting at word gaps near MAX_SCRIPT_BYTES
 * multiples, and framed " w1 w2 " utf-8 emission — bit-equal to the
 * numpy path (cross-checked in tests).
 *
 * Scratch (caller-alloc, reused; capacities >= n_chars+8):
 *   lt_idx  int64  — original char index per kept letter
 *   lt_sc   uint8  — RAW script per letter (absorption applied in place)
 *   lt_low  uint32 — lowered codepoint per letter
 *   lt_len  uint8  — utf8 length of the LOWERED codepoint
 * Outputs:
 *   out_buf  uint8, cap >= 4*n + 2*(n+2)    framed span texts
 *   meta     int64 x 7 per span: [script, char_off, char_end,
 *            out_start, out_bytes, lp_start, lp_end]
 *            (lp_* index into lt_idx; out_bytes == text_bytes)
 * Returns the span count. */
static inline int utf8_enc_len(uint32_t cp) {
    return cp < 0x80 ? 1 : (cp < 0x800 ? 2 : (cp < 0x10000 ? 3 : 4));
}

int64_t script_spans_scan(const uint8_t *text, int64_t n,
                          const uint8_t *script_lut,
                          const uint32_t *lower_lut, int64_t lut_size,
                          int64_t text_limit, int64_t max_span_bytes,
                          int64_t *lt_idx, uint8_t *lt_sc,
                          uint32_t *lt_low, uint8_t *lt_len,
                          uint8_t *out_buf, int64_t *meta) {
    /* ---- pass 1: letters ---- */
    int64_t nl = 0;
    int64_t ci = 0;
    int64_t lb_sum = 0;
    int64_t budget_keep = -1;     /* letter count at the 160KB budget */
    for (int64_t i = 0; i < n; ci++) {
        uint8_t lead = text[i];
        int l = lead < 0x80 ? 1 : (lead < 0xE0 ? 2
                    : (lead < 0xF0 ? 3 : 4));
        if (i + l > n) l = (int)(n - i);
        uint32_t cp;
        if (l == 1) cp = lead;
        else if (l == 2)
            cp = ((lead & 0x1Fu) << 6) | (text[i + 1] & 0x3Fu);
        else if (l == 3)
            cp = ((lead & 0x0Fu) << 12) | ((text[i + 1] & 0x3Fu) << 6)
                 | (text[i + 2] & 0x3Fu);
        else
            cp = ((lead & 0x07u) << 18) | ((text[i + 1] & 0x3Fu) << 12)
                 | ((text[i + 2] & 0x3Fu) << 6) | (text[i + 3] & 0x3Fu);
        i += l;
        uint8_t sc = cp < (uint32_t)lut_size ? script_lut[cp] : 0;
        if (sc == 0) continue;
        uint32_t low = cp < (uint32_t)lut_size ? lower_lut[cp] : cp;
        int ll = utf8_enc_len(low);
        lt_idx[nl] = ci;
        lt_sc[nl] = sc;
        lt_low[nl] = low;
        lt_len[nl] = (uint8_t)ll;
        nl++;
        if (budget_keep < 0) {
            lb_sum += ll;
            if (lb_sum > text_limit) budget_keep = nl - 1;
        }
    }
    if (nl == 0) return 0;
    /* numpy: keep = searchsorted(cumsum(lb), limit, 'right'), min 1 —
     * the first letter index whose cumulative length exceeds limit */
    if (budget_keep >= 0) {
        nl = budget_keep > 0 ? budget_keep : 1;
    }

    /* ---- pass 2: single-foreign-letter absorption (in place) ---- */
    {
        /* find raw runs; replicate _absorb_single_foreign */
        int64_t run_start = 0;
        uint8_t cur_s = lt_sc[0];
        int64_t cur_a = 0;
        /* iterate run by run */
        int64_t k = 0;
        while (k < nl) {
            int64_t a = k;
            uint8_t s = lt_sc[a];
            while (k < nl && lt_sc[k] == s) k++;
            int64_t b = k;
            if (a == 0) { cur_s = s; cur_a = a; continue; }
            if (s == cur_s) continue;     /* same-script: extend */
            if (b - a == 1) {
                int64_t j = a;
                int follows_nonletter = (j == nl - 1)
                    || (lt_idx[j + 1] != lt_idx[j] + 1);
                if (follows_nonletter
                    || (j + 1 < nl && lt_sc[j + 1] == cur_s)) {
                    lt_sc[j] = cur_s;     /* absorbed */
                    continue;
                }
            }
            /* break: previous run [cur_a, a) keeps cur_s (already) */
            cur_s = s;
            cur_a = a;
        }
        (void)run_start; (void)cur_a;
    }

    /* ---- pass 3: spans ---- */
    int64_t nspans = 0;
    int64_t out_pos = 0;
    int64_t s = 0;
    while (s < nl) {
        int64_t e = s + 1;
        while (e < nl && lt_sc[e] == lt_sc[s]) e++;
        /* segment [s, e): split at ~max_span_bytes on word gaps.
         * approx[j] = cumulative (lb + gap) within the segment, where
         * gap excludes position 0 (seg_gap[0] = False) */
        int64_t total = 0;
        for (int64_t j = s; j < e; j++) {
            int gapj = (j > s) && (lt_idx[j] != lt_idx[j - 1] + 1);
            total += lt_len[j] + gapj;
        }
        int64_t n_chunks = total / max_span_bytes + 1;
        /* bounds (indices local to segment) */
        int64_t b_prev = 0;
        int64_t emitted_end = 0;
        for (int64_t chunk = 1; chunk <= n_chunks; chunk++) {
            int64_t b1;
            if (chunk == n_chunks) {
                b1 = e - s;
            } else {
                /* target = first local idx with approx >= chunk*max;
                 * pos = last gap position <= target (local), else
                 * target */
                int64_t want = chunk * max_span_bytes;
                int64_t acc = 0;
                int64_t target = e - s;    /* if never reached */
                int64_t last_gap_le = -1;
                for (int64_t j = s; j < e; j++) {
                    int gapj = (j > s) && (lt_idx[j] != lt_idx[j - 1] + 1);
                    acc += lt_len[j] + gapj;
                    if (acc >= want) { target = j - s; break; }
                }
                /* last gap position STRICTLY before target (numpy:
                 * gap_pos[searchsorted(gap_pos, target) - 1]) */
                int64_t start_j = target - 1 < e - s - 1
                    ? target - 1 : e - s - 1;
                for (int64_t j = s + start_j; j > s; j--) {
                    if (lt_idx[j] != lt_idx[j - 1] + 1) {
                        last_gap_le = j - s;
                        break;
                    }
                }
                b1 = last_gap_le >= 0 ? last_gap_le : target;
                if (b1 <= b_prev) continue;   /* numpy: only if > last */
            }
            if (chunk == n_chunks && b1 <= b_prev) break;
            /* emit piece [s+b_prev, s+b1) */
            int64_t p0 = s + b_prev, p1 = s + b1;
            int64_t os = out_pos;
            out_buf[out_pos++] = 0x20;
            for (int64_t j = p0; j < p1; j++) {
                if (j > p0 && lt_idx[j] != lt_idx[j - 1] + 1)
                    out_buf[out_pos++] = 0x20;
                uint32_t cp = lt_low[j];
                if (cp < 0x80) out_buf[out_pos++] = (uint8_t)cp;
                else if (cp < 0x800) {
                    out_buf[out_pos++] = 0xC0 | (cp >> 6);
                    out_buf[out_pos++] = 0x80 | (cp & 0x3F);
                } else if (cp < 0x10000) {
                    out_buf[out_pos++] = 0xE0 | (cp >> 12);
                    out_buf[out_pos++] = 0x80 | ((cp >> 6) & 0x3F);
                    out_buf[out_pos++] = 0x80 | (cp & 0x3F);
                } else {
                    out_buf[out_pos++] = 0xF0 | (cp >> 18);
                    out_buf[out_pos++] = 0x80 | ((cp >> 12) & 0x3F);
                    out_buf[out_pos++] = 0x80 | ((cp >> 6) & 0x3F);
                    out_buf[out_pos++] = 0x80 | (cp & 0x3F);
                }
            }
            out_buf[out_pos++] = 0x20;
            int64_t *m = meta + nspans * 7;
            m[0] = lt_sc[s];
            m[1] = lt_idx[p0];
            m[2] = lt_idx[p1 - 1] + 1;
            m[3] = os;
            m[4] = out_pos - os;
            m[5] = p0;
            m[6] = p1;
            nspans++;
            emitted_end = b1;
            b_prev = b1;
        }
        (void)emitted_end;
        s = e;
    }
    return nspans;
}

/* HTML visible-text extraction (cld2_ray/functions/extract.py
 * extract_text) in ONE C pass — bit-equal to the Python path
 * (cross-checked in tests): whitespace-run compression to the run's
 * FIRST char with cross-segment state, tag skipping with the
 * reference's comment / script / style / quoted-attribute / unmatched-
 * '<' semantics, <p|<br|<tr newline substitution, and entity
 * expansion (numeric with FixUnicodeValue via low_map, named via the
 * packed-name table with the IE6 ';' rule). Input must be valid UTF-8
 * with \r already normalized to \n (the shim does both).
 *
 * ent table: open-addressed uint64 keys (name bytes LE, <= 8) with
 * int32 values; low_map: uint32[256] FixUnicodeValue low mapping.
 * out cap >= n + 8. Returns output length. */
static inline int ext_is_alnum(uint8_t c) {
    return (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z')
        || (c >= 'a' && c <= 'z');
}

static inline int64_t ext_fix_uv(int64_t uv, const uint32_t *low_map) {
    if (uv < 0) return 0xFFFD;
    if (uv < 0x100) return low_map[uv];
    if (uv < 0xD800) return uv;
    if ((uv & ~0x0FLL) == 0xFDD0 || (uv & ~0x0FLL) == 0xFDE0)
        return 0xFFFD;
    if ((uv & 0xFFFE) == 0xFFFE) return 0xFFFD;
    if (uv >= 0xE000 && uv <= 0x10FFFF) return uv;
    return 0xFFFD;
}

/* returns codepoint (or -1) and sets *consumed; b[i] == '&' */
static int64_t ext_read_entity(const uint8_t *b, int64_t n, int64_t i,
                               const uint64_t *ekeys, const int32_t *evals,
                               int64_t ecap, const uint32_t *low_map,
                               int64_t *consumed) {
    int64_t j = i + 1;
    int64_t val;
    if (j < n && b[j] == '#') {
        int hex = (j + 1 < n && (b[j + 1] == 'x' || b[j + 1] == 'X'));
        int64_t d0 = j + 1 + (hex ? 1 : 0);
        int64_t k = d0;
        if (hex) {
            while (k < n && ((b[k] >= '0' && b[k] <= '9')
                             || (b[k] >= 'a' && b[k] <= 'f')
                             || (b[k] >= 'A' && b[k] <= 'F'))) k++;
        } else {
            while (k < n && b[k] >= '0' && b[k] <= '9') k++;
        }
        if (k == d0) { *consumed = 1; return -1; }
        /* strip leading zeros */
        int64_t s = d0;
        while (s < k - 1 && b[s] == '0') s++;
        int64_t nd = k - s;
        if (hex) {
            if (nd > 8 || (nd == 8 && b[s] >= '8')) val = 0xFFFD;
            else {
                int64_t v = 0;
                for (int64_t t = s; t < k; t++) {
                    uint8_t c = b[t];
                    int64_t d = c <= '9' ? c - '0'
                        : (c <= 'F' ? c - 'A' + 10 : c - 'a' + 10);
                    v = v * 16 + d;
                }
                val = ext_fix_uv(v, low_map);
            }
        } else {
            if (nd > 10) val = 0xFFFD;
            else {
                /* compare against 2147483647 at 10 digits */
                int over = 0;
                if (nd == 10) {
                    static const char lim[] = "2147483647";
                    for (int64_t t = 0; t < 10; t++) {
                        if (b[s + t] != (uint8_t)lim[t]) {
                            over = b[s + t] > (uint8_t)lim[t];
                            break;
                        }
                    }
                }
                if (over) val = 0xFFFD;
                else {
                    int64_t v = 0;
                    for (int64_t t = s; t < k; t++)
                        v = v * 10 + (b[t] - '0');
                    val = ext_fix_uv(v, low_map);
                }
            }
        }
        int64_t end = k;
        if (end < n && b[end] == ';') end++;
        *consumed = end - i;
        return val;
    }
    /* named entity */
    int64_t k = j;
    while (k < n && ext_is_alnum(b[k])) k++;
    if (k == j) { *consumed = 1; return -1; }
    int64_t nlen = k - j;
    if (nlen > 8) { *consumed = 1; return -1; }
    uint64_t key = 0;
    for (int64_t t = 0; t < nlen; t++)
        key |= (uint64_t)b[j + t] << (8 * t);
    uint64_t m = (uint64_t)ecap - 1;
    uint64_t h = key * 0x9E3779B97F4A7C15ull;
    h ^= h >> 29;
    uint64_t idx = h & m;
    int64_t v = -1;
    for (;;) {
        uint64_t k2 = ekeys[idx];
        if (k2 == key) { v = evals[idx]; break; }
        if (k2 == 0) break;
        idx = (idx + 1) & m;
    }
    if (v < 0) { *consumed = 1; return -1; }
    int terminated = (k < n && b[k] == ';');
    if (v >= 256 && !terminated) { *consumed = 1; return -1; }
    int64_t end = k + (terminated ? 1 : 0);
    *consumed = end - i;
    return v;
}

/* ci-compare b[i..] against lowercase name; returns 1 on match */
static inline int ext_ci_match(const uint8_t *b, int64_t n, int64_t i,
                               const char *name, int len) {
    if (i + len > n) return 0;
    for (int t = 0; t < len; t++)
        if ((b[i + t] | 0x20) != (uint8_t)name[t]) return 0;
    return 1;
}

/* find "</" [\x00-\x20]* name(ci) ">" starting at or after j */
static int64_t ext_find_close(const uint8_t *b, int64_t n, int64_t j,
                              const char *name, int len) {
    for (; j + 1 < n; j++) {
        if (b[j] != '<' || b[j + 1] != '/') continue;
        int64_t k = j + 2;
        while (k < n && b[k] <= 0x20) k++;
        if (ext_ci_match(b, n, k, name, len) && k + len < n
            && b[k + len] == '>')
            return k + len + 1;
    }
    return -1;
}

static int64_t ext_scan_tag_end(const uint8_t *b, int64_t n, int64_t i) {
    if (i + 3 < n && b[i + 1] == '!' && b[i + 2] == '-' && b[i + 3] == '-') {
        for (int64_t j = i + 4; j + 2 < n; j++)
            if (b[j] == '-' && b[j + 1] == '-' && b[j + 2] == '>')
                return j + 3;
        return n;
    }
    if (ext_ci_match(b, n, i + 1, "script", 6) && i + 7 < n
        && (b[i + 7] == '>' || b[i + 7] <= 0x20)) {
        int64_t e = ext_find_close(b, n, i + 8, "script", 6);
        return e < 0 ? n : e;
    }
    if (ext_ci_match(b, n, i + 1, "style", 5) && i + 6 < n
        && (b[i + 6] == '>' || b[i + 6] <= 0x20)) {
        int64_t e = ext_find_close(b, n, i + 7, "style", 5);
        return e < 0 ? n : e;
    }
    int64_t j = i + 1;
    while (j < n) {
        uint8_t c = b[j];
        if (c == '>') return j + 1;
        if (c == '<') return i + 1;
        if (c == '"' || c == '\'') {
            int64_t q = j + 1;
            while (q < n && b[q] != c && b[q] != '\n') q++;
            if (q >= n) return n;
            if (b[q] == c) { j = q + 1; continue; }
            /* newline inside quote: only > or < end the tag */
            int64_t r = q + 1;
            while (r < n && b[r] != '>' && b[r] != '<') r++;
            if (r >= n) return n;
            if (b[r] == '>') return r + 1;
            return i + 1;
        }
        j++;
    }
    return n;
}

static inline int ext_newline_tag(const uint8_t *b, int64_t n, int64_t i) {
    if (i >= n - 3) return 0;
    uint8_t c1 = b[i + 1] | 0x20;
    if (c1 == 'p' && b[i + 2] < 0x40) return 1;
    uint8_t c2 = b[i + 2] | 0x20;
    if (c1 == 'b' && c2 == 'r' && b[i + 3] < 0x40) return 1;
    if (c1 == 't' && c2 == 'r' && b[i + 3] < 0x40) return 1;
    return 0;
}

int64_t extract_scan(const uint8_t *b, int64_t n,
                     const uint64_t *ekeys, const int32_t *evals,
                     int64_t ecap, const uint32_t *low_map,
                     uint8_t *out) {
    int64_t op = 0;
    int last_ws = 0;
    int64_t pos = 0;
    while (pos < n) {
        uint8_t c = b[pos];
        if (c == '<') {
            uint8_t rep = ext_newline_tag(b, n, pos) ? 0x0A : 0x20;
            if (!last_ws) { out[op++] = rep; last_ws = 1; }
            pos = ext_scan_tag_end(b, n, pos);
        } else if (c == '>') {
            out[op++] = '>';   /* stray '>': last_ws untouched (quirk) */
            pos++;
        } else if (c == '&') {
            int64_t consumed;
            int64_t v = ext_read_entity(b, n, pos, ekeys, evals, ecap,
                                        low_map, &consumed);
            if (v >= 0) {
                /* utf-8 emit; last_ws bypassed (reference quirk) */
                uint32_t cp = (uint32_t)v;
                if (cp < 0x80) out[op++] = (uint8_t)cp;
                else if (cp < 0x800) {
                    out[op++] = 0xC0 | (cp >> 6);
                    out[op++] = 0x80 | (cp & 0x3F);
                } else if (cp < 0x10000) {
                    out[op++] = 0xE0 | (cp >> 12);
                    out[op++] = 0x80 | ((cp >> 6) & 0x3F);
                    out[op++] = 0x80 | (cp & 0x3F);
                } else {
                    out[op++] = 0xF0 | (cp >> 18);
                    out[op++] = 0x80 | ((cp >> 12) & 0x3F);
                    out[op++] = 0x80 | ((cp >> 6) & 0x3F);
                    out[op++] = 0x80 | (cp & 0x3F);
                }
            }
            pos += consumed;
        } else if (c == 0x20 || c == 0x0A) {
            if (!last_ws) { out[op++] = c; last_ws = 1; }
            pos++;
        } else {
            out[op++] = c;
            last_ws = 0;
            pos++;
        }
    }
    return op;
}

/* Batched script_spans_scan: one call per BATCH instead of per doc
 * (the per-call ctypes marshaling was ~15% of the fused stage).
 * Per-doc scratch regions are pre-partitioned with the same margins
 * the single-call Python wrapper uses (lt: len+8, out: 8*len+64), so
 * the inner calls never overlap. meta rows get their out/lp indexes
 * rebased to the shared buffers; ns_doc[d] = span count of doc d. */
int64_t script_spans_scan_multi(
        const uint8_t *cat, const int64_t *bounds, int64_t n_docs,
        const uint8_t *script_lut, const uint32_t *lower_lut,
        int64_t lut_size, int64_t text_limit, int64_t max_span_bytes,
        int64_t *lt_idx, uint8_t *lt_sc, uint32_t *lt_low,
        uint8_t *lt_len, uint8_t *out_buf, int64_t *meta,
        int64_t *ns_doc) {
    int64_t meta_total = 0, lt_base = 0, out_base = 0, prev = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t len = bounds[d] - prev;
        int64_t ns = script_spans_scan(
            cat + prev, len, script_lut, lower_lut, lut_size,
            text_limit, max_span_bytes,
            lt_idx + lt_base, lt_sc + lt_base, lt_low + lt_base,
            lt_len + lt_base, out_buf + out_base,
            meta + meta_total * 7);
        for (int64_t r = 0; r < ns; r++) {
            int64_t *m = meta + (meta_total + r) * 7;
            m[3] += out_base;
            m[5] += lt_base;
            m[6] += lt_base;
        }
        meta_total += ns;
        ns_doc[d] = ns;
        lt_base += len + 8;
        out_base += 8 * len + 64;
        prev = bounds[d];
    }
    return meta_total;
}

/* ====================================================================
 * Batched cryptographic hash kernels for the dedup/sampling pipelines
 * (pipelines/dedup.py, pipelines/queries.py). Python's hashlib costs
 * ~1us of call/object overhead per digest, which dominates when the
 * inputs are millions of short tokens/segments per batch; these
 * kernels hash a whole concatenated batch in one GIL-released call.
 * MD5 implemented from RFC 1321, BLAKE2b from RFC 7693 (both public
 * specifications); outputs are cross-checked bit-equal to hashlib in
 * tests/test_native.py.
 * ================================================================ */

static const uint32_t MD5_S[64] = {
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21};

static uint32_t MD5_K[64];
static int md5_k_ready = 0;

static void md5_init_k(void) {
    if (md5_k_ready) return;
    for (int i = 0; i < 64; i++)
        MD5_K[i] = (uint32_t)(fabs(sin((double)(i + 1)))
                              * 4294967296.0);
    md5_k_ready = 1;
}

static inline uint32_t rotl32(uint32_t x, uint32_t c) {
    return (x << c) | (x >> (32 - c));
}

static void md5_block(uint32_t st[4], const uint8_t *p) {
    uint32_t m[16];
    for (int j = 0; j < 16; j++)
        m[j] = (uint32_t)p[4 * j] | ((uint32_t)p[4 * j + 1] << 8)
             | ((uint32_t)p[4 * j + 2] << 16)
             | ((uint32_t)p[4 * j + 3] << 24);
    uint32_t a = st[0], b = st[1], c = st[2], d = st[3];
    for (int i = 0; i < 64; i++) {
        uint32_t f, g;
        if (i < 16)      { f = (b & c) | (~b & d);  g = i; }
        else if (i < 32) { f = (d & b) | (~d & c);  g = (5 * i + 1) & 15; }
        else if (i < 48) { f = b ^ c ^ d;           g = (3 * i + 5) & 15; }
        else             { f = c ^ (b | ~d);        g = (7 * i) & 15; }
        uint32_t tmp = d;
        d = c;
        c = b;
        b = b + rotl32(a + f + MD5_K[i] + m[g], MD5_S[i]);
        a = tmp;
    }
    st[0] += a; st[1] += b; st[2] += c; st[3] += d;
}

static void md5_one(const uint8_t *msg, int64_t len, uint8_t out[16]) {
    uint32_t st[4] = {0x67452301u, 0xefcdab89u, 0x98badcfeu,
                      0x10325476u};
    int64_t i = 0;
    for (; i + 64 <= len; i += 64) md5_block(st, msg + i);
    uint8_t tail[128];
    int64_t r = len - i;
    for (int64_t j = 0; j < r; j++) tail[j] = msg[i + j];
    tail[r] = 0x80;
    int64_t pad_end = (r < 56) ? 56 : 120;
    for (int64_t j = r + 1; j < pad_end; j++) tail[j] = 0;
    uint64_t bits = (uint64_t)len << 3;
    for (int j = 0; j < 8; j++)
        tail[pad_end + j] = (uint8_t)(bits >> (8 * j));
    md5_block(st, tail);
    if (pad_end == 120) md5_block(st, tail + 64);
    for (int j = 0; j < 4; j++)
        for (int k = 0; k < 4; k++)
            out[4 * j + k] = (uint8_t)(st[j] >> (8 * k));
}

/* digests of data[offsets[i]:offsets[i+1]] -> out + 16*i */
int md5_batch(const uint8_t *data, const int64_t *offsets, int64_t n,
              uint8_t *out) {
    md5_init_k();
    for (int64_t i = 0; i < n; i++)
        md5_one(data + offsets[i], offsets[i + 1] - offsets[i],
                out + 16 * i);
    return 0;
}

/* Stride-1 rolling token windows, md5 of each window's
 * space-joined text (pipelines/dedup.substring_dedup's md5 variant):
 * word_data/word_offsets hold each doc's tokens back to back
 * (doc d's tokens are word index doc_bounds[d-1]..doc_bounds[d]);
 * every doc with >= `window` tokens emits (n_tokens - window + 1)
 * digests at out (16 B each, doc-major, window-ascending). Returns
 * the digest count. The window text is rebuilt in a local buffer by
 * memcpy — the Python equivalent (" ".join + hashlib) spends most of
 * its time constructing the window strings. */
int64_t md5_windows(const uint8_t *word_data, const int64_t *word_offsets,
                    const int64_t *doc_bounds, int64_t n_docs,
                    int64_t window, uint8_t *out) {
    md5_init_k();
    int64_t n_out = 0;
    int64_t buf_cap = 4096;
    uint8_t *buf = (uint8_t *)malloc(buf_cap);
    if (!buf) return -1;
    int64_t w0 = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t w1 = doc_bounds[d];
        int64_t nw = w1 - w0;
        for (int64_t s = 0; s + window <= nw; s++) {
            int64_t a = word_offsets[w0 + s];
            int64_t need = word_offsets[w0 + s + window] - a
                           + window;   /* + separators, 1 spare */
            if (need > buf_cap) {
                while (buf_cap < need) buf_cap *= 2;
                uint8_t *nb = (uint8_t *)realloc(buf, buf_cap);
                if (!nb) { free(buf); return -1; }
                buf = nb;
            }
            int64_t len = 0;
            for (int64_t k = 0; k < window; k++) {
                int64_t b0 = word_offsets[w0 + s + k];
                int64_t b1 = word_offsets[w0 + s + k + 1];
                if (k) buf[len++] = ' ';
                for (int64_t j = b0; j < b1; j++)
                    buf[len++] = word_data[j];
            }
            md5_one(buf, len, out + 16 * n_out);
            n_out++;
        }
        w0 = w1;
    }
    free(buf);
    return n_out;
}

/* ---- BLAKE2b (RFC 7693), keyless, nn-byte digests --------------- */

static const uint64_t B2B_IV[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL,
    0x3c6ef372fe94f82bULL, 0xa54ff53a5f1d36f1ULL,
    0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};

static const uint8_t B2B_SIGMA[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

static inline uint64_t rotr64(uint64_t x, uint64_t c) {
    return (x >> c) | (x << (64 - c));
}

#define B2B_G(v, a, b, c, d, x, y)                      \
    do {                                                \
        v[a] += v[b] + (x); v[d] = rotr64(v[d] ^ v[a], 32); \
        v[c] += v[d];       v[b] = rotr64(v[b] ^ v[c], 24); \
        v[a] += v[b] + (y); v[d] = rotr64(v[d] ^ v[a], 16); \
        v[c] += v[d];       v[b] = rotr64(v[b] ^ v[c], 63); \
    } while (0)

static void b2b_compress(uint64_t h[8], const uint8_t *p, uint64_t t,
                         int last) {
    uint64_t v[16], m[16];
    for (int i = 0; i < 8; i++) { v[i] = h[i]; v[i + 8] = B2B_IV[i]; }
    v[12] ^= t;                     /* t0 (inputs < 2^64 bytes) */
    if (last) v[14] = ~v[14];
    for (int i = 0; i < 16; i++) {
        m[i] = 0;
        for (int j = 7; j >= 0; j--)
            m[i] = (m[i] << 8) | p[8 * i + j];
    }
    for (int r = 0; r < 12; r++) {
        const uint8_t *s = B2B_SIGMA[r];
        B2B_G(v, 0, 4, 8, 12, m[s[0]], m[s[1]]);
        B2B_G(v, 1, 5, 9, 13, m[s[2]], m[s[3]]);
        B2B_G(v, 2, 6, 10, 14, m[s[4]], m[s[5]]);
        B2B_G(v, 3, 7, 11, 15, m[s[6]], m[s[7]]);
        B2B_G(v, 0, 5, 10, 15, m[s[8]], m[s[9]]);
        B2B_G(v, 1, 6, 11, 12, m[s[10]], m[s[11]]);
        B2B_G(v, 2, 7, 8, 13, m[s[12]], m[s[13]]);
        B2B_G(v, 3, 4, 9, 14, m[s[14]], m[s[15]]);
    }
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[i + 8];
}

static void b2b_one(const uint8_t *msg, int64_t len, int64_t nn,
                    uint8_t *out) {
    uint64_t h[8];
    for (int i = 0; i < 8; i++) h[i] = B2B_IV[i];
    h[0] ^= 0x01010000ULL ^ (uint64_t)nn;   /* kk=0, fanout=depth=1 */
    int64_t i = 0;
    /* all full blocks except the last one (last block is special
     * even when full; empty input still compresses one zero block) */
    while (len - i > 128) {
        b2b_compress(h, msg + i, (uint64_t)(i + 128), 0);
        i += 128;
    }
    uint8_t tail[128];
    int64_t r = len - i;
    for (int64_t j = 0; j < r; j++) tail[j] = msg[i + j];
    for (int64_t j = r; j < 128; j++) tail[j] = 0;
    b2b_compress(h, tail, (uint64_t)len, 1);
    for (int64_t j = 0; j < nn; j++)
        out[j] = (uint8_t)(h[j >> 3] >> (8 * (j & 7)));
}

/* nn-byte digests of data[offsets[i]:offsets[i+1]] -> out + nn*i */
int blake2b_batch(const uint8_t *data, const int64_t *offsets,
                  int64_t n, int64_t nn, uint8_t *out) {
    if (nn < 1 || nn > 64) return -1;
    for (int64_t i = 0; i < n; i++)
        b2b_one(data + offsets[i], offsets[i + 1] - offsets[i], nn,
                out + nn * i);
    return 0;
}

/* ====================================================================
 * Ranges variant of the fused kernel: same scan + chunk scoring as
 * quad_octa_chunk_score (bit-equal totes feed), PLUS the per-chunk
 * outputs the ResultChunkVector path needs (functions/langid.py
 * detect_ranges; reference scoreonescriptspan.cc:389-509 +
 * SharpenBoundaries :671-774): the zeros-expected reliability
 * (out_rel_delta) and the BetterBoundary-sharpened chunk start
 * offset (out_cstart, span-local bytes). The hit stream is merged
 * once into caller scratch so sharpening has random access; chunk
 * scoring consumes the SAME merged stream (a empty, b = merged with
 * distinct flags), which reproduces the two-stream merge order
 * exactly (a-before-b at equal offsets == the merged array order).
 * ================================================================ */

static int64_t merge_hits(
        const uint64_t *av, const int64_t *ao, int64_t na,
        const uint64_t *bv, const int64_t *bo, const uint8_t *bd,
        int64_t nb_, uint64_t *mv, int64_t *mo, uint8_t *md) {
    int64_t ai = 0, bi = 0, k = 0;
    while (ai < na || bi < nb_) {
        if (ai < na && (bi >= nb_ || ao[ai] <= bo[bi])) {
            mv[k] = av[ai]; mo[k] = ao[ai]; md[k] = 0; ai++;
        } else {
            mv[k] = bv[bi]; mo[k] = bo[bi];
            md[k] = bd ? bd[bi] : 0; bi++;
        }
        k++;
    }
    return k;
}

static inline int64_t lang_score(uint64_t v, int64_t lang) {
    int64_t s = 0;
    for (int lane = 0; lane < 4; lane++) {
        int64_t l = (int64_t)((v >> (16 * lane)) & 0xFF);
        if (l == lang) s += (int64_t)((v >> (16 * lane + 8)) & 0xFF);
    }
    return s;
}

/* BetterBoundary port (= langid._sharpen_boundaries, bit-equal): per
 * chunk k the sharpened boundary HIT index mapped to its span-local
 * byte offset. lang1 points at this span's nch chunk langs. */
static void sharpen_starts(
        const uint64_t *mv, const int64_t *mo, int64_t nh,
        const int16_t *lang1, int64_t nch, int64_t chunk_size,
        const int8_t *close_set, int64_t *out_start) {
    int64_t bidx0 = 0 < nh - 1 ? 0 : nh - 1;
    out_start[0] = mo[bidx0 < 0 ? 0 : bidx0];
    int64_t prior_linear = 0;
    for (int64_t k = 1; k < nch; k++) {
        int64_t this_linear = k * chunk_size;
        int64_t bidx = this_linear < nh - 1 ? this_linear : nh - 1;
        int64_t next_linear = (k + 1 < nch) ? (k + 1) * chunk_size : nh;
        int64_t lang0 = lang1[k - 1], langk = lang1[k];
        int skip = (langk == lang0);
        if (!skip) {
            int8_t cs0 = close_set[lang0];
            if (cs0 > 0 && cs0 == close_set[langk]) skip = 1;
        }
        if (skip) {
            out_start[k] = mo[bidx];
            prior_linear = this_linear;
            continue;
        }
        int64_t linear0 = prior_linear, linear2 = next_linear;
        if (linear2 - linear0 > 8) {
            /* first strictly-better max ("<" update rule) of the
             * 8-hit sliding window (first-4 diffs) - (last-4 diffs),
             * requiring both positive and negative diffs present.
             * Windows are 8 hits over <= 2*chunk_size hits — the
             * direct O(8n) recompute is fine. */
            int64_t n = linear2 - linear0;
            int64_t best_val = INT64_MIN;
            int64_t best = -1;
            for (int64_t s = 0; s < n - 8; s++) {
                int64_t run = 0, pm_p = 0, pm_n = 0;
                for (int64_t j = 0; j < 8; j++) {
                    int64_t d = lang_score(mv[linear0 + s + j], lang0)
                              - lang_score(mv[linear0 + s + j], langk);
                    run += (j < 4) ? d : -d;
                    if (d > 0) pm_p = 1;
                    if (d < 0) pm_n = 1;
                }
                int64_t cand = (pm_p && pm_n) ? run : INT64_MIN;
                if (cand > best_val) { best_val = cand; best = s; }
            }
            if (best >= 0 && best_val > 0)
                this_linear = linear0 + best + 4;
        }
        out_start[k] = mo[this_linear < nh - 1 ? this_linear : nh - 1];
        prior_linear = this_linear;
    }
}

int64_t quad_octa_chunk_score_ranges(
        const uint8_t *buf, int64_t n,
        const int64_t *bounds, int64_t nb,
        const uint64_t *qkeys, const uint64_t *qvals, uint64_t qmask,
        const uint64_t *skeys, const uint64_t *svals, uint64_t smask,
        const uint32_t *db, int64_t dnb, uint32_t dkeymask,
        const uint64_t *dpl, const uint64_t *dpo,
        const uint32_t *xb, int64_t xnb, uint32_t xkeymask,
        const uint64_t *xpl, const uint64_t *xpo,
        const uint8_t *span_latin, const uint8_t *span_script4,
        int64_t chunk_size,
        const int32_t *expected_1kb, const int8_t *close_set,
        int64_t num_langs,
        const int64_t *hint_csr, const int64_t *hint_flat,
        uint64_t *sc_qvals, int64_t *sc_qoffs,
        uint64_t *sc_ovals, int64_t *sc_ooffs, uint8_t *sc_odist,
        uint64_t *sc_mvals, int64_t *sc_moffs, uint8_t *sc_mdist,
        int64_t *sc_scores,
        int16_t *out_lang1, int64_t *out_cbytes, int64_t *out_s1,
        int64_t *out_rel, int64_t *out_span,
        int64_t *out_rel_delta, int64_t *out_cstart) {
    int64_t nchunks_total = 0;
    int64_t span_start = 0;
    uint64_t dbmask = (uint64_t)(dnb - 1);
    uint64_t xbmask = (uint64_t)(xnb - 1);
    (void)n;
    for (int64_t span_i = 0; span_i < nb; span_i++) {
        int64_t span_end = bounds[span_i];
        int64_t len = span_end - span_start;
        const uint8_t *sp = buf + span_start;
        int64_t nq = 0, no = 0;
        const uint64_t *dpacked = span_latin[span_i] ? dpl : dpo;
        const uint64_t *xpacked = span_latin[span_i] ? xpl : xpo;
        scan_one_span(sp, len, 0, qkeys, qvals, qmask,
                      skeys, svals, smask,
                      db, dbmask, dkeymask, dpacked,
                      xb, xbmask, xkeymask, xpacked,
                      sc_qvals, sc_qoffs, &nq, sc_ovals, sc_ooffs,
                      sc_odist, &no);
        span_start = span_end;
        int64_t nh = merge_hits(sc_qvals, sc_qoffs, nq,
                                sc_ovals, sc_ooffs, sc_odist, no,
                                sc_mvals, sc_moffs, sc_mdist);
        int64_t base = nchunks_total;
        int64_t nch = chunk_score_merged(
            NULL, NULL, 0, sc_mvals, sc_moffs, sc_mdist, nh,
            len, chunk_size, expected_1kb,
            (int32_t)span_script4[span_i], close_set, num_langs,
            hint_flat + hint_csr[span_i],
            hint_csr[span_i + 1] - hint_csr[span_i],
            sc_scores, span_i,
            out_lang1, out_cbytes, out_s1, out_rel,
            out_span, &nchunks_total, out_rel_delta);
        if (nch > 0)
            sharpen_starts(sc_mvals, sc_moffs, nh,
                           out_lang1 + base, nch, chunk_size,
                           close_set, out_cstart + base);
    }
    return nchunks_total;
}

/* extract_scan with (a) inline CRLF canonicalization (so it runs on
 * the RAW page bytes — extract_text pre-replaces \r\n/\r with \n
 * before calling extract_scan, which would shift offsets) and (b) a
 * per-OUTPUT-byte source-offset array: src_of[k] = raw-page position
 * that produced out[k] (tag separators -> the '<', entity bytes ->
 * the '&', lone-\r newlines -> the '\r'). This replaces the Python
 * OffsetMap in the chunks path (functions/offsetmap.py stays for the
 * standalone detect_ranges_html API): mapping a text range back to
 * raw offsets is one array index. Output text is byte-identical to
 * extract_text (leftmost \r\n pairing == Python's two-pass replace).
 */
int64_t extract_scan_map(const uint8_t *b, int64_t n,
                         const uint64_t *ekeys, const int32_t *evals,
                         int64_t ecap, const uint32_t *low_map,
                         uint8_t *out, int64_t *src_of) {
    int64_t op = 0;
    int last_ws = 0;
    int64_t pos = 0;
    while (pos < n) {
        uint8_t c = b[pos];
        if (c == '\r') {
            if (pos + 1 < n && b[pos + 1] == '\n') { pos++; continue; }
            c = 0x0A;   /* lone \r -> \n, falls into the ws branch */
        }
        if (c == '<') {
            uint8_t rep = ext_newline_tag(b, n, pos) ? 0x0A : 0x20;
            if (!last_ws) { src_of[op] = pos; out[op++] = rep;
                            last_ws = 1; }
            pos = ext_scan_tag_end(b, n, pos);
        } else if (c == '>') {
            src_of[op] = pos;
            out[op++] = '>';   /* stray '>': last_ws untouched */
            pos++;
        } else if (c == '&') {
            int64_t consumed;
            int64_t v = ext_read_entity(b, n, pos, ekeys, evals, ecap,
                                        low_map, &consumed);
            if (v >= 0) {
                uint32_t cp = (uint32_t)v;
                int64_t e0 = op;
                if (cp < 0x80) out[op++] = (uint8_t)cp;
                else if (cp < 0x800) {
                    out[op++] = 0xC0 | (cp >> 6);
                    out[op++] = 0x80 | (cp & 0x3F);
                } else if (cp < 0x10000) {
                    out[op++] = 0xE0 | (cp >> 12);
                    out[op++] = 0x80 | ((cp >> 6) & 0x3F);
                    out[op++] = 0x80 | (cp & 0x3F);
                } else {
                    out[op++] = 0xF0 | (cp >> 18);
                    out[op++] = 0x80 | ((cp >> 12) & 0x3F);
                    out[op++] = 0x80 | ((cp >> 6) & 0x3F);
                    out[op++] = 0x80 | (cp & 0x3F);
                }
                for (int64_t k = e0; k < op; k++) src_of[k] = pos;
            }
            pos += consumed;
        } else if (c == 0x20 || c == 0x0A) {
            if (!last_ws) { src_of[op] = pos; out[op++] = c;
                            last_ws = 1; }
            pos++;
        } else {
            src_of[op] = pos;
            out[op++] = c;
            last_ws = 0;
            pos++;
        }
    }
    return op;
}
