/* Native host-runtime kernels for zstd_tpu.
 *
 * The compute path is JAX/XLA/Pallas on the TPU; these C routines cover
 * the host-side runtime around it (SURVEY.md §2: "host-side C++ where a
 * serial CPU prepass is truly required"):
 *
 *   - xxh64: content checksums (reference uses the twox-hash crate,
 *     frame.rs:240); implemented from the public XXH64 spec.
 *   - execute_sequences: LZ77 sequence execution — the reference's
 *     byte-at-a-time loop (decoding_context.rs:78-107) as memcpy-chunked
 *     copies with overlap-correct period replication.  Used by the
 *     engine's host-assembly stage; the device wavefront kernel is the
 *     pure-TPU alternative.
 *   - huffman_decode_streams: serial flat-table Huffman decode used by
 *     the host oracle fallback path.
 *
 * Built with plain gcc -O2 -shared; loaded via ctypes (no pybind11 in
 * the environment).  Return codes mirror the Python error taxonomy.
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

/* ------------------------------ XXH64 ---------------------------------- */

#define P1 0x9E3779B185EBCA87ULL
#define P2 0xC2B2AE3D27D4EB4FULL
#define P3 0x165667B19E3779F9ULL
#define P4 0x85EBCA77C2B2AE63ULL
#define P5 0x27D4EB2F165667C5ULL

static inline uint64_t rotl64(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t read64(const uint8_t *p) {
    uint64_t v;
    memcpy(&v, p, 8);
    return v; /* little-endian hosts only (x86/ARM LE) */
}

static inline uint32_t read32(const uint8_t *p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return v;
}

static inline uint64_t xxh_round(uint64_t acc, uint64_t input) {
    acc += input * P2;
    acc = rotl64(acc, 31);
    return acc * P1;
}

static inline uint64_t xxh_merge(uint64_t h, uint64_t v) {
    h ^= xxh_round(0, v);
    return h * P1 + P4;
}

EXPORT uint64_t zt_xxh64(const uint8_t *data, size_t n, uint64_t seed) {
    const uint8_t *p = data;
    const uint8_t *end = data + n;
    uint64_t h;

    if (n >= 32) {
        uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
        const uint8_t *limit = end - 32;
        do {
            v1 = xxh_round(v1, read64(p));
            v2 = xxh_round(v2, read64(p + 8));
            v3 = xxh_round(v3, read64(p + 16));
            v4 = xxh_round(v4, read64(p + 24));
            p += 32;
        } while (p <= limit);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        h = xxh_merge(h, v1);
        h = xxh_merge(h, v2);
        h = xxh_merge(h, v3);
        h = xxh_merge(h, v4);
    } else {
        h = seed + P5;
    }
    h += (uint64_t)n;
    while (p + 8 <= end) {
        h ^= xxh_round(0, read64(p));
        h = rotl64(h, 27) * P1 + P4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= (uint64_t)read32(p) * P1;
        h = rotl64(h, 23) * P2 + P3;
        p += 4;
    }
    while (p < end) {
        h ^= (uint64_t)(*p) * P5;
        h = rotl64(h, 11) * P1;
        p++;
    }
    h ^= h >> 33;
    h *= P2;
    h ^= h >> 29;
    h *= P3;
    h ^= h >> 32;
    return h;
}

/* ------------------------ LZ77 sequence execution ----------------------- */

/* Overlap-correct append of `length` bytes from `offset` back.
 * Precondition: offset <= out_len, capacity checked by caller. */
static inline void copy_match(uint8_t *out, size_t out_len, size_t offset,
                              size_t length) {
    const uint8_t *src = out + out_len - offset;
    uint8_t *dst = out + out_len;
    if (offset >= length) {
        memcpy(dst, src, length);
    } else if (offset == 1) {
        memset(dst, src[0], length);
    } else {
        /* Period replication: double the materialized span each memcpy. */
        size_t filled = offset;
        memcpy(dst, src, offset);
        while (filled < length) {
            size_t take = filled < length - filled ? filled : length - filled;
            memcpy(dst + filled, dst, take);
            filled += take;
        }
    }
}

/* Status codes (keep in sync with zstd_tpu/native/__init__.py). */
enum {
    ZT_OK = 0,
    ZT_ERR_NULL_OFFSET = 1,
    ZT_ERR_LITERALS_OVERRUN = 2,
    ZT_ERR_OFFSET_TOO_FAR = 3,
    ZT_ERR_OUTPUT_OVERFLOW = 4,
};

/* Execute `n` sequences (ll[i], offset_value[i], ml[i]) into `out`
 * (which already holds `out_len` bytes of earlier frame output),
 * consuming `literals` and maintaining the 3-slot repeat history `rep`
 * (RFC 8878 §3.1.1.5; decoding_context.rs:50-107).  Trailing literals
 * are appended.  Returns ZT_OK or an error code; *out_len_io is updated
 * to the new output length on success. */
EXPORT int zt_execute_sequences(
    uint8_t *out, size_t cap, size_t *out_len_io,
    const uint8_t *literals, size_t lit_len,
    const int32_t *ll_arr, const uint32_t *ofv_arr, const int32_t *ml_arr,
    size_t n, uint64_t *rep /* [3] */) {
    size_t out_len = *out_len_io;
    size_t lit_pos = 0;

    for (size_t i = 0; i < n; i++) {
        size_t ll = (size_t)ll_arr[i];
        size_t ml = (size_t)ml_arr[i];
        uint64_t ofv = ofv_arr[i];
        uint64_t offset;

        if (ofv == 0) return ZT_ERR_NULL_OFFSET;
        if (ofv > 3) {
            offset = ofv - 3;
            rep[2] = rep[1];
            rep[1] = rep[0];
            rep[0] = offset;
        } else {
            uint64_t idx = (ll != 0) ? ofv - 1 : ofv;
            if (idx == 0) {
                offset = rep[0];
            } else if (idx == 1) {
                offset = rep[1];
                rep[1] = rep[0];
                rep[0] = offset;
            } else if (idx == 2) {
                offset = rep[2];
                rep[2] = rep[1];
                rep[1] = rep[0];
                rep[0] = offset;
            } else { /* idx == 3: ll == 0 && ofv == 3 -> rep0 - 1 */
                offset = rep[0] - 1;
                if (offset == 0) return ZT_ERR_NULL_OFFSET;
                rep[2] = rep[1];
                rep[1] = rep[0];
                rep[0] = offset;
            }
        }

        if (ll > lit_len - lit_pos) return ZT_ERR_LITERALS_OVERRUN;
        if (out_len + ll + ml > cap) return ZT_ERR_OUTPUT_OVERFLOW;
        memcpy(out + out_len, literals + lit_pos, ll);
        out_len += ll;
        lit_pos += ll;
        if (offset > out_len) return ZT_ERR_OFFSET_TOO_FAR;
        copy_match(out, out_len, (size_t)offset, ml);
        out_len += ml;
    }

    size_t tail = lit_len - lit_pos;
    if (out_len + tail > cap) return ZT_ERR_OUTPUT_OVERFLOW;
    memcpy(out + out_len, literals + lit_pos, tail);
    out_len += tail;

    *out_len_io = out_len;
    return ZT_OK;
}

/* --------------------------- LZ77 greedy matcher ------------------------ */

/* Greedy hash-chain-free matcher (single-entry hash table, LZ4-style)
 * for the encoder.  Scans src[block_start, block_end); matches may
 * reach back into earlier blocks of the same frame (down to
 * max(0, i - window)).  The 2^16-entry hash table `htab` (int32,
 * -1-initialized) persists across per-block calls so cross-block
 * matches resolve.  Emits (ll, offset, ml) runs plus the literal bytes;
 * returns the number of sequences.  Trailing literals after the last
 * sequence are appended to lit_out and counted in *lit_len_io.
 */
#define ZT_HASH_LOG 16
#define ZT_MIN_MATCH 4

static inline uint32_t zt_hash4(const uint8_t *p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return (v * 2654435761u) >> (32 - ZT_HASH_LOG);
}

EXPORT size_t zt_lz77_greedy(
    const uint8_t *src, size_t block_start, size_t block_end, size_t window,
    int32_t *htab /* [1<<ZT_HASH_LOG] */,
    int32_t *ll_out, int32_t *off_out, int32_t *ml_out, size_t max_seqs,
    uint8_t *lit_out, size_t *lit_len_io) {
    size_t n_seq = 0;
    size_t lit_len = 0;
    size_t i = block_start;
    size_t anchor = block_start;
    /* Stop matching near the end so 4-byte loads stay in bounds. */
    size_t match_limit = block_end >= ZT_MIN_MATCH ? block_end - ZT_MIN_MATCH : 0;

    while (i < match_limit && n_seq < max_seqs) {
        uint32_t h = zt_hash4(src + i);
        int64_t cand = htab[h];
        htab[h] = (int32_t)i;
        size_t lo = i > window ? i - window : 0;
        if (cand >= (int64_t)lo && cand >= 0 &&
            memcmp(src + cand, src + i, ZT_MIN_MATCH) == 0) {
            /* Extend forwards within the block. */
            size_t len = ZT_MIN_MATCH;
            size_t maxlen = block_end - i;
            while (len < maxlen && src[cand + len] == src[i + len]) len++;
            size_t ll = i - anchor;
            memcpy(lit_out + lit_len, src + anchor, ll);
            lit_len += ll;
            ll_out[n_seq] = (int32_t)ll;
            off_out[n_seq] = (int32_t)(i - (size_t)cand);
            ml_out[n_seq] = (int32_t)len;
            n_seq++;
            /* Sparse insertions inside the match keep the table warm. */
            {
                size_t step = len > 64 ? 16 : 4;
                for (size_t j = i + 1; j + ZT_MIN_MATCH < i + len; j += step)
                    htab[zt_hash4(src + j)] = (int32_t)j;
            }
            i += len;
            anchor = i;
        } else {
            i++;
        }
    }
    /* Trailing literals. */
    memcpy(lit_out + lit_len, src + anchor, block_end - anchor);
    lit_len += block_end - anchor;
    *lit_len_io = lit_len;
    return n_seq;
}

/* --------------------- serial flat-table Huffman ------------------------ */

/* Decode one backward Huffman stream with an 11-bit flat LUT
 * (packed int16 entries: symbol << 4 | nbits).  Writes exactly `regen`
 * bytes or returns nonzero.  Host fallback path counterpart of the
 * batched device kernel. */
EXPORT int zt_huffman_decode_stream(
    const uint8_t *stream, size_t stream_len,
    const int16_t *lut, int index_bits,
    uint8_t *out, size_t regen) {
    if (stream_len == 0 || stream[stream_len - 1] == 0) return 1;
    /* Sentinel position. */
    int64_t pos = 8 * (int64_t)(stream_len - 1);
    {
        uint8_t last = stream[stream_len - 1];
        int bl = 0;
        while (last) { bl++; last >>= 1; }
        pos += bl - 1;
    }
    for (size_t i = 0; i < regen; i++) {
        int64_t avail = pos < index_bits ? pos : index_bits;
        int64_t s = pos - avail;
        /* Read up to 3 bytes around bit s. */
        uint32_t window = 0;
        size_t byte0 = (size_t)(s >> 3);
        for (int b = 2; b >= 0; b--) {
            size_t bi = byte0 + (size_t)b;
            window = (window << 8) | (bi < stream_len ? stream[bi] : 0);
        }
        uint32_t raw = (window >> (s & 7)) & ((1u << avail) - 1);
        uint32_t idx = raw << (index_bits - avail);
        int16_t entry = lut[idx];
        int nb = entry & 0xF;
        out[i] = (uint8_t)((entry >> 4) & 0xFF);
        pos -= nb;
        if (pos < 0) return 2;
    }
    return pos == 0 ? 0 : 3;
}
