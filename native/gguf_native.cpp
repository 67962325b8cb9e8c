// Native data-loader codecs for the TPU llama.cpp framework.
//
// Role: the load-path equivalent of the reference's native weight repacking
// (ggml/src/ggml-cpu/repack.cpp) and GGUF tensor ingestion — extract ggml
// block-quant formats into canonical (q int8, scales f32, mins f32) planes
// and perform the TPU-layout transposes, multithreaded, called from Python
// via ctypes. Semantics mirror quant/repack.py exactly (bitwise-identical
// outputs are enforced by tests/test_native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float fp16_to_fp32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {
            // subnormal: normalize
            int e = -1;
            uint32_t m = mant;
            do {
                e++;
                m <<= 1;
            } while ((m & 0x400) == 0);
            bits = sign | ((uint32_t)(127 - 15 - e) << 23) | ((m & 0x3FF) << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

inline float f16at(const uint8_t* p) {
    uint16_t h;
    std::memcpy(&h, p, 2);
    return fp16_to_fp32(h);
}

inline float e8m0_half(uint8_t e) {
    // 2^(e-127) * 0.5 (reference ggml-impl.h:498)
    uint32_t bits = e < 2 ? (0x00200000u << e) : ((uint32_t)(e - 1) << 23);
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

const int8_t KVALUES_IQ4NL[16] = {-127, -104, -83, -65, -49, -35, -22, -10,
                                  1, 13, 25, 38, 53, 69, 89, 113};
const int8_t KVALUES_FP4[16] = {0, 1, 2, 3, 4, 6, 8, 12,
                                0, -1, -2, -3, -4, -6, -8, -12};

typedef void (*block_fn)(const uint8_t*, int8_t*, float*, float*);

// ---- simple 32-element blocks --------------------------------------------

void blk_q4_0(const uint8_t* b, int8_t* q, float* sc, float*) {
    sc[0] = f16at(b);
    for (int i = 0; i < 16; i++) {
        q[i] = (int8_t)((b[2 + i] & 0x0F) - 8);
        q[16 + i] = (int8_t)((b[2 + i] >> 4) - 8);
    }
}

void blk_q4_1(const uint8_t* b, int8_t* q, float* sc, float* mn) {
    sc[0] = f16at(b);
    mn[0] = f16at(b + 2);
    for (int i = 0; i < 16; i++) {
        q[i] = (int8_t)(b[4 + i] & 0x0F);
        q[16 + i] = (int8_t)(b[4 + i] >> 4);
    }
}

void blk_q5_0(const uint8_t* b, int8_t* q, float* sc, float*) {
    sc[0] = f16at(b);
    uint32_t qh;
    std::memcpy(&qh, b + 2, 4);
    for (int i = 0; i < 16; i++) {
        int xh0 = ((qh >> i) << 4) & 0x10;
        int xh1 = (qh >> (i + 12)) & 0x10;
        q[i] = (int8_t)(((b[6 + i] & 0x0F) | xh0) - 16);
        q[16 + i] = (int8_t)(((b[6 + i] >> 4) | xh1) - 16);
    }
}

void blk_q5_1(const uint8_t* b, int8_t* q, float* sc, float* mn) {
    sc[0] = f16at(b);
    mn[0] = f16at(b + 2);
    uint32_t qh;
    std::memcpy(&qh, b + 4, 4);
    for (int i = 0; i < 16; i++) {
        int xh0 = ((qh >> i) << 4) & 0x10;
        int xh1 = (qh >> (i + 12)) & 0x10;
        q[i] = (int8_t)((b[8 + i] & 0x0F) | xh0);
        q[16 + i] = (int8_t)((b[8 + i] >> 4) | xh1);
    }
}

void blk_q8_0(const uint8_t* b, int8_t* q, float* sc, float*) {
    sc[0] = f16at(b);
    std::memcpy(q, b + 2, 32);
}

void blk_iq4_nl(const uint8_t* b, int8_t* q, float* sc, float*) {
    sc[0] = f16at(b);
    for (int i = 0; i < 16; i++) {
        q[i] = KVALUES_IQ4NL[b[2 + i] & 0x0F];
        q[16 + i] = KVALUES_IQ4NL[b[2 + i] >> 4];
    }
}

void blk_mxfp4(const uint8_t* b, int8_t* q, float* sc, float*) {
    sc[0] = e8m0_half(b[0]);
    for (int i = 0; i < 16; i++) {
        q[i] = KVALUES_FP4[b[1 + i] & 0x0F];
        q[16 + i] = KVALUES_FP4[b[1 + i] >> 4];
    }
}

// ---- K-quant superblocks (256 elements) -----------------------------------

inline void k4_scale_min(const uint8_t* s, int* sc, int* mn) {
    for (int j = 0; j < 4; j++) {
        sc[j] = s[j] & 63;
        mn[j] = s[j + 4] & 63;
        sc[j + 4] = (s[j + 8] & 0x0F) | ((s[j] >> 6) << 4);
        mn[j + 4] = (s[j + 8] >> 4) | ((s[j + 4] >> 6) << 4);
    }
}

void blk_q4_K(const uint8_t* b, int8_t* q, float* sc, float* mn) {
    float d = f16at(b), dmin = f16at(b + 2);
    int s6[8], m6[8];
    k4_scale_min(b + 4, s6, m6);
    for (int k = 0; k < 8; k++) {
        sc[k] = d * (float)s6[k];
        mn[k] = -(dmin * (float)m6[k]);
    }
    const uint8_t* qs = b + 16;
    for (int c = 0; c < 4; c++) {
        for (int i = 0; i < 32; i++) {
            uint8_t byte = qs[c * 32 + i];
            q[(2 * c) * 32 + i] = (int8_t)(byte & 0x0F);
            q[(2 * c + 1) * 32 + i] = (int8_t)(byte >> 4);
        }
    }
}

void blk_q5_K(const uint8_t* b, int8_t* q, float* sc, float* mn) {
    float d = f16at(b), dmin = f16at(b + 2);
    int s6[8], m6[8];
    k4_scale_min(b + 4, s6, m6);
    for (int k = 0; k < 8; k++) {
        sc[k] = d * (float)s6[k];
        mn[k] = -(dmin * (float)m6[k]);
    }
    const uint8_t* qh = b + 16;
    const uint8_t* qs = b + 48;
    for (int c = 0; c < 4; c++) {
        uint8_t u1 = (uint8_t)(1u << (2 * c));
        uint8_t u2 = (uint8_t)(2u << (2 * c));
        for (int i = 0; i < 32; i++) {
            uint8_t byte = qs[c * 32 + i];
            int hb_lo = (qh[i] & u1) ? 16 : 0;
            int hb_hi = (qh[i] & u2) ? 16 : 0;
            q[(2 * c) * 32 + i] = (int8_t)((byte & 0x0F) + hb_lo);
            q[(2 * c + 1) * 32 + i] = (int8_t)((byte >> 4) + hb_hi);
        }
    }
}

void blk_q6_K(const uint8_t* b, int8_t* q, float* sc, float*) {
    const uint8_t* ql = b;
    const uint8_t* qh = b + 128;
    const int8_t* s8 = (const int8_t*)(b + 192);
    float d = f16at(b + 208);
    for (int k = 0; k < 16; k++) sc[k] = d * (float)s8[k];
    for (int h = 0; h < 2; h++) {
        const uint8_t* l0 = ql + h * 64;
        const uint8_t* l1 = ql + h * 64 + 32;
        const uint8_t* hh = qh + h * 32;
        int8_t* out = q + h * 128;
        for (int i = 0; i < 32; i++) {
            out[i] = (int8_t)(((l0[i] & 0x0F) | (((hh[i] >> 0) & 3) << 4)) - 32);
            out[32 + i] = (int8_t)(((l1[i] & 0x0F) | (((hh[i] >> 2) & 3) << 4)) - 32);
            out[64 + i] = (int8_t)(((l0[i] >> 4) | (((hh[i] >> 4) & 3) << 4)) - 32);
            out[96 + i] = (int8_t)(((l1[i] >> 4) | (((hh[i] >> 6) & 3) << 4)) - 32);
        }
    }
}

void blk_iq4_xs(const uint8_t* b, int8_t* q, float* sc, float*) {
    float d = f16at(b);
    uint16_t scales_h;
    std::memcpy(&scales_h, b + 2, 2);
    const uint8_t* scales_l = b + 4;
    const uint8_t* qs = b + 8;
    for (int ib = 0; ib < 8; ib++) {
        int ls = ((scales_l[ib / 2] >> (4 * (ib % 2))) & 0x0F) |
                 (((scales_h >> (2 * ib)) & 3) << 4);
        sc[ib] = d * (float)(ls - 32);
        const uint8_t* src = qs + ib * 16;
        int8_t* out = q + ib * 32;
        for (int i = 0; i < 16; i++) {
            out[i] = KVALUES_IQ4NL[src[i] & 0x0F];
            out[16 + i] = KVALUES_IQ4NL[src[i] >> 4];
        }
    }
}

struct FormatSpec {
    int block_bytes;
    int block_elems;
    int group;      // elements per scale group
    bool has_mins;
    block_fn fn;
};

// indices = GGMLType values (gguf/constants.py): Q4_0=2 Q4_1=3 Q5_0=6 Q5_1=7
// Q8_0=8 Q2_K=10 Q3_K=11 Q4_K=12 Q5_K=13 Q6_K=14 IQ4_NL=20 IQ4_XS=23 MXFP4=39
bool get_spec(int t, FormatSpec* out) {
    switch (t) {
        case 2:  *out = {18, 32, 32, false, blk_q4_0}; return true;
        case 3:  *out = {20, 32, 32, true, blk_q4_1}; return true;
        case 6:  *out = {22, 32, 32, false, blk_q5_0}; return true;
        case 7:  *out = {24, 32, 32, true, blk_q5_1}; return true;
        case 8:  *out = {34, 32, 32, false, blk_q8_0}; return true;
        case 12: *out = {144, 256, 32, true, blk_q4_K}; return true;
        case 13: *out = {176, 256, 32, true, blk_q5_K}; return true;
        case 14: *out = {210, 256, 16, false, blk_q6_K}; return true;
        case 20: *out = {18, 32, 32, false, blk_iq4_nl}; return true;
        case 23: *out = {136, 256, 32, false, blk_iq4_xs}; return true;
        case 39: *out = {17, 32, 32, false, blk_mxfp4}; return true;
        default: return false;
    }
}

inline void run_chunks(int64_t n, int n_threads,
                       void (*chunk)(void*, int64_t, int64_t), void* ctx) {
    if (n_threads <= 1 || n < 1024) {
        chunk(ctx, 0, n);
        return;
    }
    std::vector<std::thread> ts;
    int64_t per = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
        if (lo >= hi) break;
        ts.emplace_back(chunk, ctx, lo, hi);
    }
    for (auto& t : ts) t.join();
}

struct ExtractCtx {
    FormatSpec spec;
    const uint8_t* raw;
    int8_t* q;
    float* sc;
    float* mn;
};

void extract_chunk(void* p, int64_t lo, int64_t hi) {
    auto* c = (ExtractCtx*)p;
    const auto& s = c->spec;
    int groups = s.block_elems / s.group;
    float mn_dummy[16];
    for (int64_t i = lo; i < hi; i++) {
        c->spec.fn(c->raw + i * s.block_bytes, c->q + i * s.block_elems,
                   c->sc + i * groups, c->mn ? c->mn + i * groups : mn_dummy);
    }
}

struct F16Ctx { const uint16_t* src; float* dst; };
void f16_chunk(void* p, int64_t lo, int64_t hi) {
    auto* c = (F16Ctx*)p;
    for (int64_t i = lo; i < hi; i++) c->dst[i] = fp16_to_fp32(c->src[i]);
}

template <typename T>
struct TransCtx { const T* src; T* dst; int64_t rows, cols; };

template <typename T>
void trans_chunk(void* p, int64_t lo, int64_t hi) {
    auto* c = (TransCtx<T>*)p;
    const int64_t B = 64;  // cache-blocked transpose over dst rows [lo, hi)
    for (int64_t j0 = lo; j0 < hi; j0 += B) {
        int64_t j1 = std::min(hi, j0 + B);
        for (int64_t i0 = 0; i0 < c->rows; i0 += B) {
            int64_t i1 = std::min(c->rows, i0 + B);
            for (int64_t j = j0; j < j1; j++)
                for (int64_t i = i0; i < i1; i++)
                    c->dst[j * c->rows + i] = c->src[i * c->cols + j];
        }
    }
}

}  // namespace

extern "C" {

// returns group size on success, -1 on unsupported type
int gnat_extract_planes(int ggml_type, const uint8_t* raw, int64_t n_elements,
                        int8_t* q_out, float* sc_out, float* mn_out,
                        int n_threads) {
    FormatSpec spec;
    if (!get_spec(ggml_type, &spec)) return -1;
    int64_t nb = n_elements / spec.block_elems;
    ExtractCtx ctx{spec, raw, q_out, sc_out, spec.has_mins ? mn_out : nullptr};
    run_chunks(nb, n_threads, extract_chunk, &ctx);
    return spec.group;
}

int gnat_has_mins(int ggml_type) {
    return ggml_type == 3 || ggml_type == 7 || ggml_type == 12 || ggml_type == 13;
}

int gnat_supported(int ggml_type) {
    FormatSpec s;
    return get_spec(ggml_type, &s) ? 1 : 0;
}

void gnat_f16_to_f32(const uint16_t* src, float* dst, int64_t n, int n_threads) {
    F16Ctx ctx{src, dst};
    run_chunks(n, n_threads, f16_chunk, &ctx);
}

void gnat_transpose_i8(const int8_t* src, int8_t* dst, int64_t rows,
                       int64_t cols, int n_threads) {
    TransCtx<int8_t> ctx{src, dst, rows, cols};
    run_chunks(cols, n_threads, trans_chunk<int8_t>, &ctx);
}

void gnat_transpose_f32(const float* src, float* dst, int64_t rows,
                        int64_t cols, int n_threads) {
    TransCtx<float> ctx{src, dst, rows, cols};
    run_chunks(cols, n_threads, trans_chunk<float>, &ctx);
}

}  // extern "C"
