// pcp_native: C++ runtime accelerators for pointcloudprocessing_tpu.
//
// Exposed via ctypes (see pointcloudprocessing_tpu/utils/native.py):
//   - crc32c: Castagnoli CRC for TFRecord framing (hardware SSE4.2 when
//     available, slicing-by-8 software fallback).
//   - parse_aftr_frame: hot-loop parser for AftrBurner LiDAR text frames
//     "(x, y, z) class part" — replaces the reference's pure-Python line
//     loop (point_cloud_analysis/pointcloud/PointCloudSet.py:154-214,
//     ~0.17 Mpts/s) with a single-pass scanner.
//
// Build: g++ -O3 -shared -fPIC -o libpcp_native.so pcp_native.cpp
//        (+ -msse4.2 on x86_64; handled by the build driver).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>

#if defined(__SSE4_2__)
#include <nmmintrin.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// CRC32C
// ---------------------------------------------------------------------------

static uint32_t crc32c_table[8][256];
static bool crc32c_table_ready = false;

static void crc32c_init() {
    const uint32_t poly = 0x82F63B78u;
    for (int i = 0; i < 256; ++i) {
        uint32_t crc = (uint32_t)i;
        for (int j = 0; j < 8; ++j)
            crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
        crc32c_table[0][i] = crc;
    }
    for (int i = 0; i < 256; ++i) {
        uint32_t crc = crc32c_table[0][i];
        for (int t = 1; t < 8; ++t) {
            crc = crc32c_table[0][crc & 0xFF] ^ (crc >> 8);
            crc32c_table[t][i] = crc;
        }
    }
    crc32c_table_ready = true;
}

uint32_t pcp_crc32c(const uint8_t* data, uint64_t n, uint32_t crc_in) {
    uint32_t crc = ~crc_in;
#if defined(__SSE4_2__)
    while (n >= 8) {
        crc = (uint32_t)_mm_crc32_u64(crc, *(const uint64_t*)data);
        data += 8;
        n -= 8;
    }
    while (n--) crc = _mm_crc32_u8(crc, *data++);
#else
    if (!crc32c_table_ready) crc32c_init();
    while (((uintptr_t)data & 7) && n) {
        crc = crc32c_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
        --n;
    }
    while (n >= 8) {
        uint64_t word;
        memcpy(&word, data, 8);
        word ^= crc;
        crc = crc32c_table[7][word & 0xFF] ^
              crc32c_table[6][(word >> 8) & 0xFF] ^
              crc32c_table[5][(word >> 16) & 0xFF] ^
              crc32c_table[4][(word >> 24) & 0xFF] ^
              crc32c_table[3][(word >> 32) & 0xFF] ^
              crc32c_table[2][(word >> 40) & 0xFF] ^
              crc32c_table[1][(word >> 48) & 0xFF] ^
              crc32c_table[0][(word >> 56) & 0xFF];
        data += 8;
        n -= 8;
    }
    while (n--) crc = crc32c_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
#endif
    return ~crc;
}

// ---------------------------------------------------------------------------
// AftrBurner frame parsing
// ---------------------------------------------------------------------------
//
// Input line format (PointCloudSet.add_from_aftr_output):
//     (x, y, z) class_label part_label
// Vocabulary is passed as '\n'-joined label strings; output label values are
// vocabulary indices, or -1 for unknown labels. A line whose label is
// unknown sets *had_unknown so the caller can reject the frame (matching
// the reference's raise-on-unknown behavior, PointCloudSet.py:179-185).
// Non-finite coordinates mark the point invalid (valid[i]=0), matching the
// reference's skip-and-count (PointCloudSet.py:188,198).

struct Vocab {
    const char* data;
    int count;
    const char* starts[512];
    int lens[512];
};

static void vocab_build(Vocab* v, const char* joined) {
    v->data = joined;
    v->count = 0;
    const char* p = joined;
    while (*p && v->count < 512) {
        const char* start = p;
        while (*p && *p != '\n') ++p;
        v->starts[v->count] = start;
        v->lens[v->count] = (int)(p - start);
        ++v->count;
        if (*p) ++p;
    }
}

static int vocab_lookup(const Vocab* v, const char* s, int len) {
    for (int i = 0; i < v->count; ++i)
        if (v->lens[i] == len && memcmp(v->starts[i], s, (size_t)len) == 0)
            return i;
    return -1;
}

// Lookup with a caller-held last-hit hint: frame files carry one class
// label per file and long runs of identical part labels, so checking the
// previous match first turns the linear scan into a single memcmp on the
// hot path.
static inline int vocab_lookup_hinted(const Vocab* v, const char* s, int len,
                                      int* hint) {
    int h = *hint;
    if (h >= 0 && h < v->count && v->lens[h] == len &&
        memcmp(v->starts[h], s, (size_t)len) == 0)
        return h;
    int idx = vocab_lookup(v, s, len);
    if (idx >= 0) *hint = idx;
    return idx;
}

// Fast decimal parse for the frame format's printf-style floats
// ([-]ddd[.ddd][e±dd]). strtod was the scanner's whole cost (~81 MB/s
// measured — locale machinery per token); this path accumulates the
// mantissa in a uint64 (exact to 19 digits) and scales by a pow10 table
// (~1 ulp of double — far inside the float32 rounding of the output).
// Anything unusual (nan/inf/hex/empty) falls back to strtod so semantics
// are unchanged; the text from ctypes is NUL-terminated, so strtod's
// unbounded scan is safe.
static const double kPow10[23] = {
    1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,
    1e8,  1e9,  1e10, 1e11, 1e12, 1e13, 1e14, 1e15,
    1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22};

static double parse_coord_careful(const char* p, const char* end,
                                  const char** next_out) {
    const char* start = p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) {
        neg = (*p == '-');
        ++p;
    }
    uint64_t mant = 0;
    int digs = 0, exp10 = 0;
    bool any = false;
    // hex floats ("0x1p3") must take the strtod fallback whole: the fast
    // path would otherwise consume the leading '0' and leave "x1p3"
    // dangling, rejecting a token strtod accepts (round-2 advisor)
    if (p + 1 < end && p[0] == '0' && (p[1] == 'x' || p[1] == 'X')) {
        char* next = nullptr;
        double v = strtod(start, &next);
        *next_out = next;
        return v;
    }
    // leading zeros must not consume the 19-significant-digit budget
    // ("00000000000000000005" and "0.0000000000000000001234" would
    // otherwise parse as 0): digs counts SIGNIFICANT digits only
    while (p < end && *p >= '0' && *p <= '9') {
        if (mant == 0 && *p == '0') {
            // leading zero: no value, no exponent shift
        } else if (digs < 19) {
            mant = mant * 10u + (uint64_t)(*p - '0');
            ++digs;
        } else {
            ++exp10;  // integer digits beyond exact range
        }
        any = true;
        ++p;
    }
    if (p < end && *p == '.') {
        ++p;
        while (p < end && *p >= '0' && *p <= '9') {
            if (mant == 0 && *p == '0') {
                --exp10;  // leading fraction zero: pure exponent shift
            } else if (digs < 19) {
                mant = mant * 10u + (uint64_t)(*p - '0');
                ++digs;
                --exp10;
            }
            any = true;
            ++p;
        }
    }
    bool fallback = !any;
    if (!fallback && p < end && (*p == 'e' || *p == 'E')) {
        ++p;
        bool eneg = false;
        if (p < end && (*p == '-' || *p == '+')) {
            eneg = (*p == '-');
            ++p;
        }
        int ev = 0;
        bool edig = false;
        while (p < end && *p >= '0' && *p <= '9') {
            if (ev < 10000) ev = ev * 10 + (*p - '0');
            edig = true;
            ++p;
        }
        if (!edig) fallback = true;
        exp10 += eneg ? -ev : ev;
    }
    if (fallback || exp10 > 300 || exp10 < -300) {
        char* next = nullptr;
        double v = strtod(start, &next);
        *next_out = next;
        return v;
    }
    double val = (double)mant;
    if (exp10 > 0) {
        while (exp10 > 22) {
            val *= 1e22;
            exp10 -= 22;
        }
        val *= kPow10[exp10];
    } else if (exp10 < 0) {
        int e = -exp10;
        while (e > 22) {
            val /= 1e22;
            e -= 22;
        }
        val /= kPow10[e];
    }
    *next_out = p;
    return neg ? -val : val;
}

// Branch-light fast path for the dominant token shape [-]ddd.dddddd (no
// exponent, <= 17 digits): one multiply-add per digit, one table division.
// Produces bit-identical doubles to parse_coord_careful for every token it
// keeps (same mantissa accumulation, same single kPow10 divide); anything
// unusual — exponents, hex, nan/inf, digit overflow — is handed to the
// careful path whole.
static inline double parse_coord_loop(const char* p, const char* end,
                                      const char** next_out) {
    const char* start = p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) {
        neg = (*p == '-');
        ++p;
    }
    uint64_t mant = 0;
    const char* ip = p;
    while (p < end && (uint8_t)(*p - '0') < 10u) {
        mant = mant * 10u + (uint64_t)(*p - '0');
        ++p;
    }
    int idigs = (int)(p - ip);
    int fdigs = 0;
    if (p < end && *p == '.') {
        ++p;
        const char* fp = p;
        while (p < end && (uint8_t)(*p - '0') < 10u) {
            mant = mant * 10u + (uint64_t)(*p - '0');
            ++p;
        }
        fdigs = (int)(p - fp);
    }
    int total = idigs + fdigs;
    if (total == 0 || total > 17 ||
        (p < end && (*p == 'e' || *p == 'E' || *p == 'x' || *p == 'X')))
        return parse_coord_careful(start, end, next_out);
    *next_out = p;
    double val = (double)mant;
    if (fdigs) val /= kPow10[fdigs];
    return neg ? -val : val;
}

#if defined(__SSE4_2__)
// SIMD token classification + SWAR digit conversion for the dominant coord
// shape: a <= 8-char digits-and-one-dot token ("5.799", "-12.345"). One
// 16-byte load classifies the token (digit / '.' / terminator), then the
// digits are compacted into a u64 and converted with the classic two-step
// parallel multiply — no per-digit loop. Produces the same (mantissa,
// fdigs) pair as parse_coord_loop, hence bit-identical doubles; any token
// it cannot prove simple (> 8 chars, no digits, two dots, exponent/hex
// terminator, < 16 readable bytes) falls back whole.
static inline double parse_coord(const char* p, const char* end,
                                 const char** next_out) {
    const char* start = p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) {
        neg = (*p == '-');
        ++p;
    }
    if (end - p < 16) return parse_coord_loop(start, end, next_out);

    __m128i v = _mm_loadu_si128((const __m128i*)p);
    __m128i digit = _mm_and_si128(
        _mm_cmpgt_epi8(v, _mm_set1_epi8('0' - 1)),
        _mm_cmpgt_epi8(_mm_set1_epi8('9' + 1), v));
    __m128i dot = _mm_cmpeq_epi8(v, _mm_set1_epi8('.'));
    uint32_t okm = (uint32_t)_mm_movemask_epi8(_mm_or_si128(digit, dot));
    uint32_t dotm = (uint32_t)_mm_movemask_epi8(dot);

    // token length = first byte that is neither digit nor dot
    uint32_t nd = (uint32_t)__builtin_ctz(~okm & 0x1FFFF);  // 0..16
    if (nd == 0 || nd > 8) return parse_coord_loop(start, end, next_out);
    char term = p[nd];
    if (term == 'e' || term == 'E' || term == 'x' || term == 'X')
        return parse_coord_loop(start, end, next_out);

    uint64_t w;
    memcpy(&w, p, 8);
    uint32_t dots = dotm & ((1u << nd) - 1u);
    int fdigs = 0;
    uint32_t n = nd;
    if (dots) {
        if (dots & (dots - 1))  // two dots inside the token
            return parse_coord_loop(start, end, next_out);
        uint32_t k = (uint32_t)__builtin_ctz(dots);  // dot position
        fdigs = (int)(nd - k - 1);
        n = nd - 1;
        if (n == 0) return parse_coord_loop(start, end, next_out);  // "."
        // drop byte k: bytes below stay, bytes above shift down one
        uint64_t lowmask = (k == 0) ? 0 : ((~0ULL) >> (8 * (8 - k)));
        w = (w & lowmask) | ((w >> 8) & ~lowmask);
    }
    // keep the n digit bytes, pad the rest with '0'
    uint64_t keep = (n == 8) ? ~0ULL : ((~0ULL) >> (8 * (8 - n)));
    w = (w & keep) | (0x3030303030303030ULL & ~keep);
    w -= 0x3030303030303030ULL;          // bytes now 0..9
    w <<= 8 * (8 - n);                   // left-pad with leading zeros
    // two-level parallel digit combine (first char = most significant)
    w = w * 10 + (w >> 8);               // byte pairs -> 0..99
    uint64_t m1 = (w & 0x000000FF000000FFULL) * 0x000F424000000064ULL;
    uint64_t m2 = ((w >> 16) & 0x000000FF000000FFULL) * 0x0000271000000001ULL;
    uint64_t mant = (m1 + m2) >> 32;

    *next_out = p + nd;
    double val = (double)mant;
    if (fdigs) val /= kPow10[fdigs];
    return neg ? -val : val;
}
#else
static inline double parse_coord(const char* p, const char* end,
                                 const char** next_out) {
    return parse_coord_loop(p, end, next_out);
}
#endif

// Returns number of parsed lines (points), or -1 on malformed input.
// Caller provides output arrays sized for max_points.
int64_t pcp_parse_aftr_frame(
    const char* text, int64_t text_len,
    const char* class_vocab_joined,
    const char* part_vocab_joined,
    int64_t max_points,
    float* xyz_out,        // (max_points, 3)
    int32_t* class_out,    // (max_points,)
    int32_t* part_out,     // (max_points,)
    uint8_t* valid_out,    // (max_points,)  1 = finite coords
    int32_t* had_unknown,  // set to 1 if any label missing from vocab
    int32_t* non_finite    // count of non-finite points
) {
    Vocab cls_vocab, part_vocab;
    vocab_build(&cls_vocab, class_vocab_joined);
    vocab_build(&part_vocab, part_vocab_joined);
    *had_unknown = 0;
    *non_finite = 0;

    const char* p = text;
    const char* end = text + text_len;
    int64_t n = 0;
    int cls_hint = -1, part_hint = -1;
    const char* last_tail = nullptr;
    size_t last_tail_len = 0;
    int32_t last_cls = -2, last_part = -2;

    while (p < end && n < max_points) {
        // skip whitespace/newlines
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t')) ++p;
        if (p >= end) break;
        if (*p != '(') return -1;
        ++p;

        double coords[3];
        for (int c = 0; c < 3; ++c) {
            const char* next = nullptr;
            coords[c] = parse_coord(p, end, &next);
            if (next == p) {
                // neither the fast path nor strtod consumed anything
                return -1;
            }
            p = next;
            // dominant separator is exactly ", "
            if (c < 2 && end - p > 2 && p[0] == ',' && p[1] == ' ' &&
                p[2] != ' ' && p[2] != ',')
                p += 2;
            else
                while (p < end && (*p == ',' || *p == ' ')) ++p;
        }
        if (p >= end || *p != ')') return -1;
        ++p;

        // labels: tokens separated by spaces until end of line; tokens of
        // length <= 1 are discarded (reference quirk, PointCloudSet.py:177)
        //
        // Fast path: real frames carry one class per file and long runs of
        // identical parts, so the whole tail of the line (" kc-46 engine")
        // usually repeats verbatim — one memchr + one memcmp against the
        // previous line's tail replaces the token scan entirely.
        int32_t cls_idx = -2, part_idx = -2;  // -2 = not yet seen
        const char* tail = p;
        const char* nl = (const char*)memchr(p, '\n', (size_t)(end - p));
        size_t tail_len = (size_t)((nl ? nl : end) - p);
        if (tail_len == last_tail_len && last_tail != nullptr &&
            memcmp(tail, last_tail, tail_len) == 0) {
            cls_idx = last_cls;
            part_idx = last_part;
            p = nl ? nl : end;
        } else {
            while (p < end && *p != '\n') {
                while (p < end && (*p == ' ' || *p == '\r' || *p == '\t')) ++p;
                const char* tok = p;
                while (p < end && *p != ' ' && *p != '\n' && *p != '\r' && *p != '\t') ++p;
                int len = (int)(p - tok);
                if (len <= 1) continue;
                if (cls_idx == -2)
                    cls_idx = vocab_lookup_hinted(&cls_vocab, tok, len, &cls_hint);
                else if (part_idx == -2)
                    part_idx = vocab_lookup_hinted(&part_vocab, tok, len, &part_hint);
                else return -1;  // more than two labels
            }
            if (cls_idx != -2 && part_idx != -2) {
                last_tail = tail;
                last_tail_len = tail_len;
                last_cls = cls_idx;
                last_part = part_idx;
            }
        }
        if (cls_idx == -2 || part_idx == -2) return -1;  // missing labels
        if (cls_idx < 0 || part_idx < 0) *had_unknown = 1;

        bool finite = std::isfinite(coords[0]) && std::isfinite(coords[1]) &&
                      std::isfinite(coords[2]);
        xyz_out[n * 3 + 0] = (float)coords[0];
        xyz_out[n * 3 + 1] = (float)coords[1];
        xyz_out[n * 3 + 2] = (float)coords[2];
        class_out[n] = cls_idx;
        part_out[n] = part_idx;
        valid_out[n] = finite ? 1 : 0;
        if (!finite) ++*non_finite;
        ++n;
    }
    return n;
}

// ---------------------------------------------------------------------------
// TFRecord + tf.train.Example decoding
// ---------------------------------------------------------------------------
//
// Schema-specific fast path for the reference's feature layout
// (PointCloudSet.py:100-105): observations (width*3 floats), class_label
// (int64), part_labels (width int64s), se3 (9 floats). Returns the number of
// records decoded into the caller's contiguous arrays, or a negative error
// code: -1 I/O, -2 CRC, -3 malformed proto, -4 capacity exceeded,
// -5 unexpected feature length.

#include <cstdio>

static const uint32_t kMaskDelta = 0xa282ead8u;

static uint32_t masked_crc32c(const uint8_t* p, uint64_t n) {
    uint32_t crc = pcp_crc32c(p, n, 0);
    return (((crc >> 15) | (crc << 17)) + kMaskDelta);
}

static bool read_varint(const uint8_t*& p, const uint8_t* end, uint64_t* out) {
    uint64_t result = 0;
    int shift = 0;
    while (p < end) {
        uint8_t b = *p++;
        result |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) { *out = result; return true; }
        shift += 7;
        if (shift > 63) return false;
    }
    return false;
}

struct ExampleOut {
    float* obs;       // width*3
    int64_t* cls;     // 1
    int64_t* parts;   // width
    float* se3;       // 9
};

// Decode one serialized Example into out; width = expected point count.
static int decode_example(const uint8_t* buf, uint64_t len, int64_t width,
                          ExampleOut out) {
    const uint8_t* p = buf;
    const uint8_t* end = buf + len;
    // every length field is validated against its enclosing buffer before use
    while (p < end) {
        uint64_t tag;
        if (!read_varint(p, end, &tag)) return -3;
        if ((tag >> 3) != 1 || (tag & 7) != 2) return -3;  // Example.features
        uint64_t flen;
        if (!read_varint(p, end, &flen)) return -3;
        if (flen > (uint64_t)(end - p)) return -3;
        const uint8_t* fend = p + flen;
        while (p < fend) {
            uint64_t ftag;
            if (!read_varint(p, fend, &ftag)) return -3;
            if ((ftag >> 3) != 1 || (ftag & 7) != 2) return -3;  // map entry
            uint64_t elen;
            if (!read_varint(p, fend, &elen)) return -3;
            if (elen > (uint64_t)(fend - p)) return -3;
            const uint8_t* eend = p + elen;

            const uint8_t* key = nullptr; uint64_t keylen = 0;
            const uint8_t* val = nullptr; uint64_t vallen = 0;
            while (p < eend) {
                uint64_t etag;
                if (!read_varint(p, eend, &etag)) return -3;
                uint64_t blen;
                if (!read_varint(p, eend, &blen)) return -3;
                if (blen > (uint64_t)(eend - p)) return -3;
                if ((etag >> 3) == 1) { key = p; keylen = blen; }
                else if ((etag >> 3) == 2) { val = p; vallen = blen; }
                p += blen;
            }
            if (!key || !val) return -3;

            // val is a Feature: float_list=2 / int64_list=3, then field 1
            const uint8_t* v = val;
            const uint8_t* vend = val + vallen;
            uint64_t vtag, vlen;
            if (!read_varint(v, vend, &vtag)) return -3;
            if (!read_varint(v, vend, &vlen)) return -3;
            if (vlen > (uint64_t)(vend - v)) return -3;
            const uint8_t* list = v;
            const uint8_t* listend = v + vlen;
            uint64_t ltag, llen;
            if (!read_varint(list, listend, &ltag)) return -3;
            if (!read_varint(list, listend, &llen)) return -3;
            if (llen > (uint64_t)(listend - list)) return -3;
            // list now points at packed payload of length llen

            if (keylen == 12 && memcmp(key, "observations", 12) == 0) {
                if ((int64_t)llen != width * 3 * 4) return -5;
                memcpy(out.obs, list, llen);
            } else if (keylen == 11 && memcmp(key, "class_label", 11) == 0) {
                const uint8_t* q = list;
                uint64_t value;
                if (!read_varint(q, list + llen, &value)) return -3;
                *out.cls = (int64_t)value;
            } else if (keylen == 11 && memcmp(key, "part_labels", 11) == 0) {
                const uint8_t* q = list;
                const uint8_t* qend = list + llen;
                int64_t i = 0;
                while (q < qend && i < width) {
                    uint64_t value;
                    if (!read_varint(q, qend, &value)) return -3;
                    out.parts[i++] = (int64_t)value;
                }
                if (i != width) return -5;
            } else if (keylen == 3 && memcmp(key, "se3", 3) == 0) {
                if (llen != 9 * 4) return -5;
                memcpy(out.se3, list, llen);
            }
        }
    }
    return 0;
}

// Shared record-loop. stop_at_capacity: return the records read so far when
// max_records is hit (chunked streaming) instead of erroring (-4).
// next_offset_out (optional): byte offset to resume from; -1 once EOF is hit.
static int64_t read_tfrecords(
    const char* path, int64_t byte_offset, int64_t width, int64_t max_records,
    float* obs_out, int64_t* cls_out, int64_t* parts_out, float* se3_out,
    bool stop_at_capacity, int64_t* next_offset_out
) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    if (byte_offset > 0 && fseek(f, (long)byte_offset, SEEK_SET) != 0) {
        fclose(f);
        return -1;
    }

    int64_t count = 0;
    uint8_t header[12];
    uint8_t* buf = nullptr;
    uint64_t buf_cap = 0;
    if (next_offset_out) *next_offset_out = -1;

    while (true) {
        long record_start = ftell(f);
        size_t got = fread(header, 1, 12, f);
        if (got == 0) break;  // clean EOF — a file of exactly max_records is fine
        if (got < 12) { fclose(f); free(buf); return -3; }
        if (count >= max_records) {
            // a further record exists beyond capacity
            if (stop_at_capacity) {
                if (next_offset_out) *next_offset_out = (int64_t)record_start;
                break;
            }
            fclose(f); free(buf); return -4;
        }
        uint64_t length;
        memcpy(&length, header, 8);
        uint32_t len_crc;
        memcpy(&len_crc, header + 8, 4);
        if (masked_crc32c(header, 8) != len_crc) { fclose(f); free(buf); return -2; }

        if (length + 4 > buf_cap) {
            buf_cap = length + 4;
            buf = (uint8_t*)realloc(buf, buf_cap);
            if (!buf) { fclose(f); return -1; }
        }
        if (fread(buf, 1, length + 4, f) != length + 4) { fclose(f); free(buf); return -3; }
        uint32_t data_crc;
        memcpy(&data_crc, buf + length, 4);
        if (masked_crc32c(buf, length) != data_crc) { fclose(f); free(buf); return -2; }

        ExampleOut out{
            obs_out + count * width * 3,
            cls_out + count,
            parts_out + count * width,
            se3_out + count * 9,
        };
        int rc = decode_example(buf, length, width, out);
        if (rc != 0) { fclose(f); free(buf); return rc; }
        ++count;
    }
    fclose(f);
    free(buf);
    return count;
}

int64_t pcp_read_tfrecord_file(
    const char* path, int64_t width, int64_t max_records,
    float* obs_out,      // (max_records, width, 3)
    int64_t* cls_out,    // (max_records,)
    int64_t* parts_out,  // (max_records, width)
    float* se3_out       // (max_records, 3, 3)
) {
    return read_tfrecords(
        path, 0, width, max_records, obs_out, cls_out, parts_out, se3_out,
        /*stop_at_capacity=*/false, /*next_offset_out=*/nullptr);
}

// Chunked streaming read: decode up to max_records starting at byte_offset.
// Writes the resume offset to next_offset_out (-1 when the file is
// exhausted). Bounded-memory dataset streaming builds on this.
int64_t pcp_read_tfrecord_chunk(
    const char* path, int64_t byte_offset, int64_t width, int64_t max_records,
    float* obs_out, int64_t* cls_out, int64_t* parts_out, float* se3_out,
    int64_t* next_offset_out
) {
    return read_tfrecords(
        path, byte_offset, width, max_records, obs_out, cls_out, parts_out,
        se3_out, /*stop_at_capacity=*/true, next_offset_out);
}


// ---------------------------------------------------------------------------
// TFRecord example encoder (schema-specific)
// ---------------------------------------------------------------------------
//
// Byte-identical to data/tfrecord.py::encode_example: an Example proto with
// the reference's four features (observations f32, class_label i64,
// part_labels i64, se3 f32) in that map-entry order, int64 lists packed.
// Returns the encoded length, or -1 if the caller's buffer is too small.

static inline uint8_t* emit_varint(uint8_t* p, uint64_t v) {
    while (v >= 0x80) {
        *p++ = (uint8_t)(v | 0x80);
        v >>= 7;
    }
    *p++ = (uint8_t)v;
    return p;
}

static inline int varint_len(uint64_t v) {
    int n = 1;
    while (v >= 0x80) {
        v >>= 7;
        ++n;
    }
    return n;
}

// Feature{ float_list | int64_list } wrapped in a Features.feature map
// entry under the given key. kind_field: 2 = float_list, 3 = int64_list.
static uint8_t* emit_map_entry(uint8_t* p, const char* key,
                               const uint8_t* list_body, uint64_t body_len,
                               int kind_field) {
    uint64_t key_len = strlen(key);
    // inner list message: field 1, wire 2 (packed values)
    uint64_t list_msg_len = 1 + (uint64_t)varint_len(body_len) + body_len;
    // Feature message: kind_field, wire 2
    uint64_t feat_len = 1 + (uint64_t)varint_len(list_msg_len) + list_msg_len;
    // map entry: key (field 1) + value Feature (field 2)
    uint64_t entry_len = 1 + (uint64_t)varint_len(key_len) + key_len +
                         1 + (uint64_t)varint_len(feat_len) + feat_len;
    p = emit_varint(p, (1u << 3) | 2u);  // Features.feature entry
    p = emit_varint(p, entry_len);
    p = emit_varint(p, (1u << 3) | 2u);  // key
    p = emit_varint(p, key_len);
    memcpy(p, key, key_len);
    p += key_len;
    p = emit_varint(p, (2u << 3) | 2u);  // value (Feature)
    p = emit_varint(p, feat_len);
    p = emit_varint(p, ((uint64_t)kind_field << 3) | 2u);  // float/int64 list
    p = emit_varint(p, list_msg_len);
    p = emit_varint(p, (1u << 3) | 2u);  // list.value, packed
    p = emit_varint(p, body_len);
    memcpy(p, list_body, body_len);
    p += body_len;
    return p;
}

int64_t pcp_encode_example(
    const float* obs, int64_t n_obs,      // width*3 floats
    int64_t class_label,
    const int64_t* parts, int64_t n_parts,
    const float* se3,                     // 9 floats
    uint8_t* out, int64_t out_cap
) {
    // packed int64 varint bodies
    uint8_t cls_body[10];
    uint64_t cls_len =
        (uint64_t)(emit_varint(cls_body, (uint64_t)class_label) - cls_body);
    uint8_t* parts_body = (uint8_t*)malloc((size_t)n_parts * 10 + 1);
    if (!parts_body) return -1;
    uint8_t* pp = parts_body;
    for (int64_t i = 0; i < n_parts; ++i)
        pp = emit_varint(pp, (uint64_t)parts[i]);
    uint64_t parts_len = (uint64_t)(pp - parts_body);

    // generous bound: floats are memcpy'd, scaffolding < 256 bytes
    int64_t bound = (int64_t)(n_obs * 4 + 36 + parts_len + cls_len + 512);
    if (out_cap < bound) {
        free(parts_body);
        return -1;
    }

    // features payload goes after a small headroom so the Example header
    // can be prepended without a second copy
    uint8_t* f = out + 16;
    f = emit_map_entry(f, "observations", (const uint8_t*)obs,
                       (uint64_t)n_obs * 4, 2);
    f = emit_map_entry(f, "class_label", cls_body, cls_len, 3);
    f = emit_map_entry(f, "part_labels", parts_body, parts_len, 3);
    f = emit_map_entry(f, "se3", (const uint8_t*)se3, 36, 2);
    free(parts_body);
    uint64_t features_len = (uint64_t)(f - (out + 16));

    // Example: field 1 (features), wire 2
    uint8_t hdr[16];
    uint8_t* h = hdr;
    h = emit_varint(h, (1u << 3) | 2u);
    h = emit_varint(h, features_len);
    int64_t hdr_len = (int64_t)(h - hdr);
    memmove(out + hdr_len, out + 16, features_len);
    memcpy(out, hdr, (size_t)hdr_len);
    return hdr_len + (int64_t)features_len;
}

// ---------------------------------------------------------------------------
// numpy-parity RNG: SeedSequence + PCG64 (XSL-RR 128/64)
// ---------------------------------------------------------------------------
//
// The ingest resample (ops/resample.py::adjust_to_input_width_np) draws its
// repeat indices from np.random.default_rng([base_seed, frame_idx]) —
// uniform(0, n) doubles truncated to int. Moving the resample into the
// one-pass C++ ingest must not change those draws, or seeded ingest would
// stop being bit-reproducible against the Python path. This is a faithful
// reimplementation of numpy's default bit-generator chain, pinned by golden
// tests against numpy itself (tests/test_native_reader.py).

static const uint32_t SS_INIT_A = 0x43b0d7e5u;
static const uint32_t SS_MULT_A = 0x931e8875u;
static const uint32_t SS_INIT_B = 0x8b51f9ddu;
static const uint32_t SS_MULT_B = 0x58f38dedu;
static const uint32_t SS_MIX_MULT_L = 0xca01f9ddu;
static const uint32_t SS_MIX_MULT_R = 0x4973f715u;
static const int SS_XSHIFT = 16;
static const int SS_POOL = 4;

static inline uint32_t ss_hashmix(uint32_t a, uint32_t* hash_const) {
    a ^= *hash_const;
    *hash_const *= SS_MULT_A;
    a *= *hash_const;
    a ^= a >> SS_XSHIFT;
    return a;
}

static inline uint32_t ss_mix(uint32_t x, uint32_t y) {
    uint32_t r = x * SS_MIX_MULT_L - y * SS_MIX_MULT_R;
    r ^= r >> SS_XSHIFT;
    return r;
}

// SeedSequence.mix_entropy over a 4-word pool (bit_generator.pyx semantics).
static void ss_mix_entropy(const uint32_t* entropy, int n, uint32_t pool[SS_POOL]) {
    uint32_t hash_const = SS_INIT_A;
    for (int i = 0; i < SS_POOL; ++i)
        pool[i] = ss_hashmix(i < n ? entropy[i] : 0u, &hash_const);
    for (int i_src = 0; i_src < SS_POOL; ++i_src)
        for (int i_dst = 0; i_dst < SS_POOL; ++i_dst)
            if (i_src != i_dst)
                pool[i_dst] = ss_mix(pool[i_dst], ss_hashmix(pool[i_src], &hash_const));
    for (int i_src = SS_POOL; i_src < n; ++i_src)
        for (int i_dst = 0; i_dst < SS_POOL; ++i_dst)
            pool[i_dst] = ss_mix(pool[i_dst], ss_hashmix(entropy[i_src], &hash_const));
}

// SeedSequence.generate_state(n64, uint64): 2*n64 uint32 draws cycled over
// the pool, paired little-endian (low word first).
static void ss_generate_state64(const uint32_t pool[SS_POOL], uint64_t* out, int n64) {
    uint32_t hash_const = SS_INIT_B;
    int cyc = 0;
    for (int i = 0; i < n64; ++i) {
        uint32_t words[2];
        for (int half = 0; half < 2; ++half) {
            uint32_t v = pool[cyc];
            cyc = (cyc + 1) % SS_POOL;
            v ^= hash_const;
            hash_const *= SS_MULT_B;
            v *= hash_const;
            v ^= v >> SS_XSHIFT;
            words[half] = v;
        }
        out[i] = ((uint64_t)words[1] << 32) | words[0];
    }
}

struct Pcg64 {
    __uint128_t state, inc;
};

static const __uint128_t PCG_MULT =
    (((__uint128_t)0x2360ed051fc65da4ULL) << 64) | 0x4385df649fccf645ULL;

static inline void pcg64_step(Pcg64* r) { r->state = r->state * PCG_MULT + r->inc; }

static inline uint64_t pcg64_next64(Pcg64* r) {
    pcg64_step(r);
    uint64_t xored = (uint64_t)(r->state >> 64) ^ (uint64_t)r->state;
    unsigned rot = (unsigned)(r->state >> 122);
    return (xored >> rot) | (xored << ((64u - rot) & 63u));
}

// pcg64_set_seed: generate_state(4) -> initstate (words 0,1: high,low) and
// initseq (words 2,3), then the canonical srandom init sequence.
static void pcg64_from_entropy(const uint32_t* entropy, int n, Pcg64* r) {
    uint32_t pool[SS_POOL];
    ss_mix_entropy(entropy, n, pool);
    uint64_t s[4];
    ss_generate_state64(pool, s, 4);
    __uint128_t initstate = (((__uint128_t)s[0]) << 64) | s[1];
    __uint128_t initseq = (((__uint128_t)s[2]) << 64) | s[3];
    r->state = 0;
    r->inc = (initseq << 1) | 1;
    pcg64_step(r);
    r->state += initstate;
    pcg64_step(r);
}

static inline double pcg64_next_double(Pcg64* r) {
    return (double)(pcg64_next64(r) >> 11) * (1.0 / 9007199254740992.0);
}

// Golden-test export: n uniforms in [low, high) exactly as
// np.random.default_rng(<entropy ints>).uniform(low, high, n).
int64_t pcp_numpy_uniform(
    const uint32_t* entropy, int64_t n_entropy,
    double low, double high, double* out, int64_t n
) {
    Pcg64 r;
    pcg64_from_entropy(entropy, (int)n_entropy, &r);
    for (int64_t i = 0; i < n; ++i)
        out[i] = low + (high - low) * pcg64_next_double(&r);
    return n;
}

// ---------------------------------------------------------------------------
// One-pass frame ingest: parse -> finite filter -> resample -> Example
// encode -> TFRecord framing, one C call per frame.
// ---------------------------------------------------------------------------
//
// Replaces the ingest chain data/frames.py::parse_frame_text ->
// ops/resample.py::adjust_to_input_width_np -> tfrecord.encode_example ->
// TFRecordWriter framing with a single native pass (reference chain:
// PointCloudSet.py:154-214 -> :443-470 -> :251-288). Output bytes are
// identical to the Python chain, including the seeded resample draws.
//
// status codes mirror data/frames.py's FrameError branches so the caller
// can log the same skip messages: 0 ok, 1 unknown label, 2 empty frame,
// 3 no finite points, 4 malformed text. Returns the framed record length
// (12-byte header + payload + 4-byte CRC), or -1 when status != 0 or the
// output buffer is too small (status 5).

int64_t pcp_ingest_frame(
    const char* text, int64_t text_len,
    const char* class_vocab_joined,
    const char* part_vocab_joined,
    int64_t width,
    const uint32_t* entropy, int64_t n_entropy,
    const float* se3,            // 9 floats
    uint8_t* record_out, int64_t record_cap,
    int32_t* class_id_out,
    int64_t* part_hist_out, int64_t n_part_vocab,
    int32_t* status_out
) {
    *status_out = 0;
    *class_id_out = -1;
    for (int64_t i = 0; i < n_part_vocab; ++i) part_hist_out[i] = 0;

    // grow-only thread-local scratch: per-call malloc of ~1 MB was the
    // dominant ingest cost (mmap + page-zeroing every frame, measured
    // ~1.2 ms of a 2.5 ms call); reusing warm pages removes it entirely
    struct Scratch {
        void* buf = nullptr;
        size_t cap = 0;
        ~Scratch() { free(buf); }
        void* ensure(size_t want) {
            if (want > cap) {
                free(buf);
                buf = malloc(want + want / 2);
                cap = buf ? want + want / 2 : 0;
            }
            return buf;
        }
    };
    static thread_local Scratch scratch;

    int64_t max_points = text_len / 10 + 16;
    size_t xyz_b = (size_t)max_points * 3 * sizeof(float);
    size_t i32_b = (size_t)max_points * sizeof(int32_t);
    size_t obs_b = (size_t)width * 3 * sizeof(float);
    size_t p64_b = (size_t)width * sizeof(int64_t);
    uint8_t* base = (uint8_t*)scratch.ensure(
        xyz_b + 2 * i32_b + (size_t)max_points + obs_b + p64_b + 64);
    if (!base) {
        *status_out = 5;
        return -1;
    }
    float* xyz = (float*)base;
    int32_t* cls = (int32_t*)(base + xyz_b);
    int32_t* part = (int32_t*)(base + xyz_b + i32_b);
    uint8_t* valid = base + xyz_b + 2 * i32_b;
    int32_t had_unknown = 0, non_finite = 0;
    int64_t n = pcp_parse_aftr_frame(
        text, text_len, class_vocab_joined, part_vocab_joined, max_points,
        xyz, cls, part, valid, &had_unknown, &non_finite);

    int64_t rc = -1;
    size_t off = xyz_b + 2 * i32_b + (size_t)max_points;
    off = (off + 7) & ~(size_t)7;
    float* obs_f = (float*)(base + off);
    off = (off + obs_b + 7) & ~(size_t)7;
    int64_t* parts64 = (int64_t*)(base + off);
    do {
        if (n < 0) { *status_out = 4; break; }
        if (had_unknown) { *status_out = 1; break; }
        if (n == 0) { *status_out = 2; break; }

        // compact to finite points (reference drops per point,
        // PointCloudSet.py:188); frame class = last finite point's class.
        // All-finite frames (the common case) skip the identity pass.
        int64_t m;
        int32_t cls_last;
        if (non_finite == 0) {
            m = n;
            cls_last = cls[n - 1];
        } else {
            m = 0;
            cls_last = -1;
            for (int64_t i = 0; i < n; ++i) {
                if (!valid[i]) continue;
                xyz[m * 3 + 0] = xyz[i * 3 + 0];
                xyz[m * 3 + 1] = xyz[i * 3 + 1];
                xyz[m * 3 + 2] = xyz[i * 3 + 2];
                part[m] = part[i];
                cls_last = cls[i];
                ++m;
            }
        }
        if (m == 0) { *status_out = 3; break; }

        int64_t keep = m < width ? m : width;
        memcpy(obs_f, xyz, (size_t)keep * 3 * sizeof(float));
        for (int64_t i = 0; i < keep; ++i) parts64[i] = (int64_t)part[i];
        if (m < width) {
            // uniform repeat-sample, bit-identical to
            // default_rng([base_seed, idx]).uniform(0, m, width-m).astype(int_)
            Pcg64 rng;
            pcg64_from_entropy(entropy, (int)n_entropy, &rng);
            for (int64_t i = m; i < width; ++i) {
                double d = (double)m * pcg64_next_double(&rng);
                int64_t idx = (int64_t)d;
                obs_f[i * 3 + 0] = xyz[idx * 3 + 0];
                obs_f[i * 3 + 1] = xyz[idx * 3 + 1];
                obs_f[i * 3 + 2] = xyz[idx * 3 + 2];
                parts64[i] = (int64_t)part[idx];
            }
        }

        for (int64_t i = 0; i < width; ++i) {
            int64_t pid = parts64[i];
            if (pid >= 0 && pid < n_part_vocab) ++part_hist_out[pid];
        }

        if (record_cap < 16) { *status_out = 5; break; }
        int64_t payload_len = pcp_encode_example(
            obs_f, width * 3, (int64_t)cls_last, parts64, width, se3,
            record_out + 12, record_cap - 16);
        if (payload_len < 0) { *status_out = 5; break; }

        // TFRecord framing: u64 length + masked CRC(length bytes) +
        // payload + masked CRC(payload) (data/tfrecord.py::TFRecordWriter)
        uint64_t len_le = (uint64_t)payload_len;
        memcpy(record_out, &len_le, 8);
        uint32_t len_crc = masked_crc32c(record_out, 8);
        memcpy(record_out + 8, &len_crc, 4);
        uint32_t data_crc = masked_crc32c(record_out + 12, (uint64_t)payload_len);
        memcpy(record_out + 12 + payload_len, &data_crc, 4);

        *class_id_out = cls_last;
        rc = 12 + payload_len + 4;
    } while (false);

    return rc;
}

// numpy SeedSequence entropy coercion for one integer: little-endian uint32
// words, at least one. Matches utils/native.py::seed_entropy_words.
static int coerce_words(uint64_t v, uint32_t* out) {
    if (v == 0) {
        out[0] = 0;
        return 1;
    }
    int n = 0;
    while (v) {
        out[n++] = (uint32_t)(v & 0xFFFFFFFFu);
        v >>= 32;
    }
    return n;
}

// Whole-chunk ingest: per frame, read the file + pcp_ingest_frame into a
// shared output arena — one native call per few hundred frames removes the
// per-frame Python overhead entirely (read/alloc/marshal measured at
// ~0.36 ms/frame of a 1.1 ms loop).
//
// paths: n NUL-terminated path strings, back to back. pose_ok[k]=0 marks a
// frame with no pose entry (status 6, skipped without reading). offsets has
// n+1 entries: record k occupies arena[offsets[k]:offsets[k+1]] (empty when
// statuses[k] != 0; status 7 = unreadable file). Returns the number of
// successful records, or -1 when the arena runs out of space.
int64_t pcp_ingest_frames(
    const char* paths, int64_t n,
    const char* class_vocab_joined,
    const char* part_vocab_joined,
    int64_t width,
    uint64_t base_seed, int64_t idx0,
    const uint8_t* pose_ok,
    const float* se3,            // (n, 9)
    uint8_t* arena, int64_t arena_cap,
    int64_t* offsets,            // (n+1,)
    int32_t* class_ids,          // (n,)
    int64_t* part_hists,         // (n, n_part_vocab)
    int64_t n_part_vocab,
    int32_t* statuses            // (n,)
) {
    struct FileBuf {
        char* buf = nullptr;
        size_t cap = 0;
        ~FileBuf() { free(buf); }
    };
    static thread_local FileBuf fb;

    const char* path = paths;
    int64_t off = 0, ok_count = 0;
    offsets[0] = 0;
    for (int64_t k = 0; k < n; ++k) {
        size_t path_len = strlen(path);
        statuses[k] = 0;
        class_ids[k] = -1;
        int64_t rec_len = 0;
        if (!pose_ok[k]) {
            statuses[k] = 6;
            for (int64_t i = 0; i < n_part_vocab; ++i)
                part_hists[k * n_part_vocab + i] = 0;
        } else {
            FILE* f = fopen(path, "rb");
            int64_t text_len = -1;
            if (f) {
                fseek(f, 0, SEEK_END);
                long sz = ftell(f);
                fseek(f, 0, SEEK_SET);
                if (sz >= 0) {
                    if ((size_t)sz + 1 > fb.cap) {
                        free(fb.buf);
                        fb.cap = (size_t)sz + (size_t)sz / 2 + 4096;
                        fb.buf = (char*)malloc(fb.cap);
                    }
                    if (fb.buf && fread(fb.buf, 1, (size_t)sz, f) == (size_t)sz) {
                        fb.buf[sz] = '\0';
                        text_len = sz;
                    }
                }
                fclose(f);
            }
            if (text_len < 0) {
                statuses[k] = 7;
                for (int64_t i = 0; i < n_part_vocab; ++i)
                    part_hists[k * n_part_vocab + i] = 0;
            } else {
                uint32_t entropy[4];
                int ne = coerce_words(base_seed, entropy);
                ne += coerce_words((uint64_t)(idx0 + k), entropy + ne);
                rec_len = pcp_ingest_frame(
                    fb.buf, text_len, class_vocab_joined, part_vocab_joined,
                    width, entropy, ne, se3 + k * 9,
                    arena + off, arena_cap - off,
                    class_ids + k, part_hists + k * n_part_vocab,
                    n_part_vocab, statuses + k);
                if (rec_len < 0) {
                    if (statuses[k] == 5 || statuses[k] == 0) return -1;  // arena full
                    rec_len = 0;
                } else {
                    ++ok_count;
                }
            }
        }
        off += rec_len;
        offsets[k + 1] = off;
        path += path_len + 1;
    }
    return ok_count;
}

}  // extern "C"

