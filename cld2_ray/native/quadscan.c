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

/* Scan concatenated spans. bounds: nb ascending END byte offsets, one
 * per span (bounds[nb-1] == n). Emits table HITS only (val != 0).
 * Output arrays sized >= n by the caller. Returns 0. */
int quad_octa_scan(const uint8_t *buf, int64_t n,
                   const int64_t *bounds, int64_t nb,
                   const uint64_t *qkeys, const uint64_t *qvals, uint64_t qmask,
                   const uint64_t *okeys, const uint64_t *ovals, uint64_t omask,
                   uint64_t *out_qvals, int64_t *out_qoffs, int64_t *nq_out,
                   uint64_t *out_ovals, int64_t *out_ooffs, int64_t *no_out) {
    int64_t nq = 0, no = 0;
    int64_t span_i = 0;
    int64_t span_start = 0;

    /* ring state, reset per span */
    uint32_t qr1 = 0, qr2 = 0; int qrn = 0;
    uint64_t or1 = 0, or2 = 0; int orn = 0;

    for (span_i = 0; span_i < nb; span_i++) {
        int64_t span_end = bounds[span_i];
        int64_t len = span_end - span_start;
        const uint8_t *sp = buf + span_start;
        qr1 = qr2 = 0; qrn = 0;
        or1 = or2 = 0; orn = 0;
        if (len <= 0) { span_start = span_end; continue; }

        /* --- one forward pass over chars: quads + octas ---
         * Spans are " w1 w2 " framed: byte 0 is a space, last char is
         * a space.  Mirror of hits.py: a char starts where
         * (b & 0xC0) != 0x80; is_space = first byte == 0x20. */

        /* char starts (byte offsets) gathered on the fly; we need
         * next_space and e = i+4 chars lookahead, so keep a small
         * sliding window of the last/next few char starts.  Simpler:
         * first collect char starts into a stack buffer chunk-wise is
         * messy — instead do two mini-passes per span using a local
         * heap-free scan: pass 1 for octas (byte-level), pass 2 for
         * quads with a 6-slot lookahead queue. */

        /* Pass A: octas — words between consecutive single-byte
         * spaces. */
        {
            int64_t prev_space = -1;
            for (int64_t b = 0; b < len; b++) {
                if ((sp[b] & 0xC0) == 0x80) continue;   /* cont. byte */
                if (sp[b] != 0x20) continue;
                if (prev_space >= 0) {
                    int64_t ws = prev_space + 1;
                    int64_t we = b;
                    if (we > ws) {
                        int64_t bc = we - ws;
                        if (bc > 24) bc = 24;
                        uint64_t h = octa_hash40(sp, ws, bc, len);
                        int dup = (orn >= 1 && h == or1) ||
                                  (orn >= 2 && h == or2);
                        or2 = or1; or1 = h;
                        if (orn < 2) orn++;
                        if (!dup) {
                            uint64_t v = table_lookup(okeys, ovals, omask, h);
                            if (v) {
                                out_ovals[no] = v;
                                out_ooffs[no] = span_start + ws;
                                no++;
                            }
                        }
                    }
                }
                prev_space = b;
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
                if (nc < 3) { span_start = span_end; continue; }
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
        span_start = span_end;
    }
    *nq_out = nq;
    *no_out = no;
    return 0;
}
