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

static inline double parse_coord(const char* p, const char* end,
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
            while (p < end && (*p == ',' || *p == ' ')) ++p;
        }
        if (p >= end || *p != ')') return -1;
        ++p;

        // labels: tokens separated by spaces until end of line; tokens of
        // length <= 1 are discarded (reference quirk, PointCloudSet.py:177)
        int32_t cls_idx = -2, part_idx = -2;  // -2 = not yet seen
        while (p < end && *p != '\n') {
            while (p < end && (*p == ' ' || *p == '\r' || *p == '\t')) ++p;
            const char* tok = p;
            while (p < end && *p != ' ' && *p != '\n' && *p != '\r' && *p != '\t') ++p;
            int len = (int)(p - tok);
            if (len <= 1) continue;
            if (cls_idx == -2) cls_idx = vocab_lookup(&cls_vocab, tok, len);
            else if (part_idx == -2) part_idx = vocab_lookup(&part_vocab, tok, len);
            else return -1;  // more than two labels
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

}  // extern "C"

