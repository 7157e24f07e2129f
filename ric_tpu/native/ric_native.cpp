// ric_tpu native host runtime.
//
// The reference is native C++ end-to-end; in this framework the compute
// path is JAX/XLA on TPU and the host-side runtime lives here:
//   * a serial adaptive range coder ("archival" entropy profile) that is a
//     drop-in alternative to the interleaved-rANS backend: Python/JAX
//     computes the section symbol/context arrays, this module does the
//     genuinely serial adaptive coding at native speed (the analogue of
//     the reference's CMuxCodec+CBitCodec+CGeomCodec stack, re-designed:
//     64-bit-low carry-free range coder + count-based adaptive models)
//   * PNM header parsing and CRC32 for container integrity
//
// Built as a plain shared object; loaded via ctypes (no pybind11).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <array>
#include <algorithm>

namespace {

constexpr int kAlphabet = 32;
constexpr uint32_t kTop = 1u << 24;
constexpr uint32_t kBot = 1u << 16;

// Count-based adaptive model bank. Counts adapt with +32 increments and
// halve when the total crosses 2^13 (fast adaptation early, stable later).
struct Models {
    // dynamically sized: the fine-context layout passes ~1k tables
    std::vector<std::array<uint32_t, kAlphabet>> freq;
    std::vector<uint32_t> total;

    void init(const int32_t* seed, int n_tables) {
        freq.assign(n_tables, {});
        total.assign(n_tables, 0);
        for (int t = 0; t < n_tables; t++) {
            uint32_t tot = 0;
            for (int s = 0; s < kAlphabet; s++) {
                uint32_t f = seed ? (uint32_t)(seed[t * kAlphabet + s] >> 4)
                                  : 8u;
                if (seed && seed[t * kAlphabet + s] == 0) f = 0;
                else if (f == 0) f = 1;
                freq[t][s] = f;
                tot += f;
            }
            if (tot == 0) { freq[t][0] = 1; tot = 1; }
            total[t] = tot;
        }
    }

    void update(int t, int s) {
        freq[t][s] += 32;
        total[t] += 32;
        if (total[t] > (1u << 13)) {
            uint32_t tot = 0;
            for (int i = 0; i < kAlphabet; i++) {
                uint32_t f = freq[t][i];
                f = f > 1 ? f >> 1 : f;
                freq[t][i] = f;
                tot += f;
            }
            total[t] = tot;
        }
    }
};

// Range encoder with deferred carry propagation (the classic 64-bit-low /
// cache construction): the first emitted byte is a zero placeholder that
// the decoder skips.
struct RangeEncoder {
    uint64_t low = 0;
    uint32_t range = 0xFFFFFFFFu;
    uint8_t cache = 0;
    uint64_t cache_size = 1;
    std::vector<uint8_t> out;

    void shift_low() {
        if ((uint32_t)low < 0xFF000000u || (low >> 32) != 0) {
            uint8_t carry = (uint8_t)(low >> 32);
            uint8_t temp = cache;
            do {
                out.push_back((uint8_t)(temp + carry));
                temp = 0xFF;
            } while (--cache_size != 0);
            cache = (uint8_t)(low >> 24);
        }
        cache_size++;
        low = (uint32_t)low << 8;
    }

    void encode(uint32_t cum, uint32_t f, uint32_t tot) {
        uint32_t r = range / tot;
        low += (uint64_t)r * cum;
        range = r * f;
        while (range < kTop) {
            range <<= 8;
            shift_low();
        }
    }

    void finish() {
        for (int i = 0; i < 5; i++) shift_low();
    }
};

struct RangeDecoder {
    const uint8_t* p;
    const uint8_t* end;
    uint32_t code = 0;
    uint32_t range = 0xFFFFFFFFu;

    void init(const uint8_t* data, long len) {
        p = data;
        end = data + len;
        next();  // skip the encoder's placeholder byte
        code = 0;
        for (int i = 0; i < 4; i++) code = (code << 8) | next();
        range = 0xFFFFFFFFu;
    }
    uint8_t next() { return p < end ? *p++ : 0; }

    uint32_t decode_cum(uint32_t tot, uint32_t* r_out) {
        uint32_t r = range / tot;
        *r_out = r;
        uint32_t v = code / r;
        return v < tot ? v : tot - 1;
    }
    void decode_update(uint32_t r, uint32_t cum, uint32_t f) {
        code -= r * cum;
        range = r * f;
        while (range < kTop) {
            code = (code << 8) | next();
            range <<= 8;
        }
    }
};

struct EncHandle {
    Models models;
    RangeEncoder rc;
};

struct DecHandle {
    Models models;
    RangeDecoder rc;
    std::vector<uint8_t> data;
};

}  // namespace

extern "C" {

void* rc_enc_new(const int32_t* seed_freqs, int n_tables) {
    auto* h = new EncHandle();
    h->models.init(seed_freqs, n_tables);
    return h;
}

void rc_enc_symbols(void* vh, const int32_t* syms, const int32_t* tids,
                    const uint8_t* act, long n) {
    auto* h = (EncHandle*)vh;
    for (long i = 0; i < n; i++) {
        if (!act[i]) continue;
        int t = tids[i], s = syms[i];
        uint32_t cum = 0;
        for (int j = 0; j < s; j++) cum += h->models.freq[t][j];
        h->rc.encode(cum, h->models.freq[t][s], h->models.total[t]);
        h->models.update(t, s);
    }
}

long rc_enc_finish(void* vh, uint8_t* outbuf, long cap) {
    auto* h = (EncHandle*)vh;
    h->rc.finish();
    long n = (long)h->rc.out.size();
    if (n <= cap) std::memcpy(outbuf, h->rc.out.data(), n);
    delete h;
    return n;
}

void* rc_dec_new(const int32_t* seed_freqs, int n_tables,
                 const uint8_t* data, long len) {
    auto* h = new DecHandle();
    h->models.init(seed_freqs, n_tables);
    h->data.assign(data, data + len);
    h->rc.init(h->data.data(), (int)len);
    return h;
}

void rc_dec_symbols(void* vh, const int32_t* tids, const uint8_t* act,
                    long n, int32_t* out_syms) {
    auto* h = (DecHandle*)vh;
    for (long i = 0; i < n; i++) {
        if (!act[i]) { out_syms[i] = 0; continue; }
        int t = tids[i];
        uint32_t r;
        uint32_t target = h->rc.decode_cum(h->models.total[t], &r);
        uint32_t cum = 0;
        int s = 0;
        while (s < kAlphabet - 1 && cum + h->models.freq[t][s] <= target)
            cum += h->models.freq[t][s], s++;
        h->rc.decode_update(r, cum, h->models.freq[t][s]);
        h->models.update(t, s);
        out_syms[i] = s;
    }
}

void rc_dec_free(void* vh) { delete (DecHandle*)vh; }

// Raw `width`-bit fields through the same range coder (uniform model:
// cum=value, freq=1, total=1<<width). Widths are <= 12 bits (the entropy
// layer splits wider fields), so total stays far below range/kTop.
void rc_enc_raw(void* vh, const int32_t* vals, const int32_t* widths,
                const uint8_t* act, long n) {
    auto* h = (EncHandle*)vh;
    for (long i = 0; i < n; i++) {
        if (!act[i] || widths[i] <= 0) continue;
        h->rc.encode((uint32_t)vals[i], 1u, 1u << widths[i]);
    }
}

void rc_dec_raw(void* vh, const int32_t* widths, const uint8_t* act, long n,
                int32_t* out_vals) {
    auto* h = (DecHandle*)vh;
    for (long i = 0; i < n; i++) {
        if (!act[i] || widths[i] <= 0) { out_vals[i] = 0; continue; }
        uint32_t r;
        uint32_t v = h->rc.decode_cum(1u << widths[i], &r);
        h->rc.decode_update(r, v, 1u);
        out_vals[i] = (int32_t)v;
    }
}

// ---------------------------------------------------------------------
// CRC32 (zlib polynomial) for container integrity checks
// ---------------------------------------------------------------------

uint32_t ric_crc32(const uint8_t* data, long n) {
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
        for (uint32_t i = 0; i < 256; i++) {
            uint32_t c = i;
            for (int k = 0; k < 8; k++)
                c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
            table[i] = c;
        }
        init = true;
    }
    uint32_t c = 0xFFFFFFFFu;
    for (long i = 0; i < n; i++) c = table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------
// PNM header parse: returns 0 on success and fills w/h/channels/maxval/
// data_offset. (Payload handling stays zero-copy on the Python side.)
// ---------------------------------------------------------------------

int pnm_parse(const uint8_t* data, long n, int* w, int* h, int* channels,
              int* maxval, long* data_offset) {
    if (n < 2 || data[0] != 'P' || (data[1] != '5' && data[1] != '6'))
        return -1;
    *channels = data[1] == '6' ? 3 : 1;
    long i = 2;
    int vals[3], nv = 0;
    while (nv < 3 && i < n) {
        while (i < n && (data[i] == ' ' || data[i] == '\t' ||
                         data[i] == '\n' || data[i] == '\r'))
            i++;
        if (i < n && data[i] == '#') {
            while (i < n && data[i] != '\n') i++;
            continue;
        }
        long v = 0;
        bool any = false;
        while (i < n && data[i] >= '0' && data[i] <= '9') {
            v = v * 10 + (data[i] - '0');
            i++;
            any = true;
        }
        if (!any) return -2;
        vals[nv++] = (int)v;
    }
    if (nv < 3 || i >= n) return -3;
    i++;  // single whitespace after maxval
    *w = vals[0];
    *h = vals[1];
    *maxval = vals[2];
    *data_offset = i;
    return 0;
}

// ---------------------------------------------------------------------
// Serpentine error-diffusion dither: 12-bit working-domain plane ->
// 8-bit samples. Covers the reference CLI's -d output pass
// (ric.cpp:51-74 is a serial diffusion dither); ours runs in the native
// runtime with classic Floyd–Steinberg weights (7,3,5,1)/16 and
// direction flipping per row. The quantization error of each emitted
// sample feeds the not-yet-visited neighbors, so truncation noise is
// shaped instead of banded.
// ---------------------------------------------------------------------

void ric_dither_ed(const int32_t* plane, int h, int w, int shift,
                   uint8_t* out) {
    std::vector<int32_t> err_row(w + 2, 0), next_row(w + 2, 0);
    const int half = 1 << (shift - 1);
    for (int y = 0; y < h; y++) {
        std::fill(next_row.begin(), next_row.end(), 0);
        const bool ltr = (y & 1) == 0;
        int carry = 0;  // error flowing to the next pixel in walk order
        for (int i = 0; i < w; i++) {
            const int x = ltr ? i : w - 1 - i;
            const int32_t acc =
                plane[(long)y * w + x] + err_row[x + 1] + carry;
            int v = ((acc + half) >> shift) + 128;
            if (v < 0) v = 0;
            if (v > 255) v = 255;
            out[(long)y * w + x] = (uint8_t)v;
            const int32_t e = acc - ((v - 128) << shift);
            carry = (e * 7) / 16;
            const int back = ltr ? x : x + 2;   // behind the walk
            const int fwd = ltr ? x + 2 : x;    // ahead of the walk
            next_row[back] += (e * 3) / 16;
            next_row[x + 1] += (e * 5) / 16;
            next_row[fwd] += e - (e * 7) / 16 - (e * 3) / 16 - (e * 5) / 16;
        }
        err_row.swap(next_row);
    }
}

// ---------------------------------------------------------------------
// MV-field median reconstruction (decode side of the video codec's MV
// coding, models/video_codec.py). The coder ships median-predictor
// residuals; reconstruction is a raster recurrence (each vector needs
// its decoded left/up/upright neighbors), which is host-serial by
// nature — MV grids are tiny (160x90 at 720p), so a tight loop here
// costs microseconds. Prediction rule (ours; the reference's MV coder
// at obmc.cpp:344-440 also predicts by neighbor median, with different
// context/escape machinery): row 0 -> left; first/last column -> up;
// interior -> median(left, up, upright). Intra blocks hold vector 0 in
// the prediction field. dy/dx arrive as residuals and leave as absolute
// vectors, in place.
// ---------------------------------------------------------------------

static inline int32_t med3(int32_t a, int32_t b, int32_t c) {
    const int32_t lo = a < b ? a : b;
    const int32_t hi = a < b ? b : a;
    return c < lo ? lo : (c > hi ? hi : c);
}

void ric_mv_recon(int32_t* dy, int32_t* dx, const uint8_t* intra,
                  int gy, int gx) {
    for (int j = 0; j < gy; j++) {
        for (int i = 0; i < gx; i++) {
            const long p = (long)j * gx + i;
            if (intra[p]) {
                dy[p] = 0;
                dx[p] = 0;
                continue;
            }
            int32_t py = 0, px = 0;
            if (j == 0) {
                if (i) { py = dy[p - 1]; px = dx[p - 1]; }
            } else if (i == 0 || i == gx - 1) {
                py = dy[p - gx];
                px = dx[p - gx];
            } else {
                py = med3(dy[p - 1], dy[p - gx], dy[p - gx + 1]);
                px = med3(dx[p - 1], dx[p - gx], dx[p - gx + 1]);
            }
            dy[p] += py;
            dx[p] += px;
        }
    }
}

}  // extern "C"
