// Test-only oracle shim: compiles the reference RIC library (read-only at
// /root/reference) into a shared object so golden tests can compare the
// TPU codec's integers against the original C++ bit-for-bit.
// This file is ours; the reference sources are linked, not copied.
//
// Exposed surface mirrors the call sequences of reference ric.cpp:123-251.

#include <cstring>
#include <cstdint>

#include <wavelet2d.h>
#include <muxcodec.h>

using namespace rududu;

namespace {

// Walk the wavelet pyramid finest->coarsest collecting band pointers in the
// order D,H,V per level, then the final L. Copies into out (int32), each
// band row-major DimY x DimX with no alignment padding.
int collect_bands(CWavelet2D *w, int *out) {
    int n = 0;
    CWavelet2D *cur = w;
    while (cur) {
        CBandCodec *bands[3] = {&cur->DBand, &cur->HBand, &cur->VBand};
        for (int b = 0; b < 3; b++) {
            CBandCodec *bd = bands[b];
            for (unsigned j = 0; j < bd->DimY; j++) {
                if (bd->type == sshort) {
                    short *p = (short *)bd->pBand + j * bd->DimXAlign;
                    for (unsigned i = 0; i < bd->DimX; i++) out[n++] = p[i];
                } else {
                    int *p = (int *)bd->pBand + j * bd->DimXAlign;
                    for (unsigned i = 0; i < bd->DimX; i++) out[n++] = p[i];
                }
            }
        }
        if (!cur->pLow) {
            CBandCodec *bd = &cur->LBand;
            for (unsigned j = 0; j < bd->DimY; j++) {
                if (bd->type == sshort) {
                    short *p = (short *)bd->pBand + j * bd->DimXAlign;
                    for (unsigned i = 0; i < bd->DimX; i++) out[n++] = p[i];
                } else {
                    int *p = (int *)bd->pBand + j * bd->DimXAlign;
                    for (unsigned i = 0; i < bd->DimX; i++) out[n++] = p[i];
                }
            }
        }
        cur = cur->pLow;
    }
    return n;
}

}  // namespace

extern "C" {

// Forward transform of one plane; dumps all band coefficients (int32).
// Returns the number of ints written.
int oracle_transform(const short *img, int w, int h, int levels, int level_chg,
                     int trans, int *out_bands) {
    short *buf = new short[(size_t)w * h];
    std::memcpy(buf, img, sizeof(short) * (size_t)w * h);
    CWavelet2D wav(w, h, levels, level_chg);
    wav.Transform(buf, w, (rududu::trans)trans);
    int n = collect_bands(&wav, out_bands);
    delete[] buf;
    return n;
}

// Full single-plane encode: Transform + CodeBand + endCoding.
// Returns byte size of the stream written to out (logical stream, from
// buffer offset 2 as in ric.cpp:176).
int oracle_encode(const short *img, int w, int h, int levels, int level_chg,
                  int trans, int quant, int lambda, unsigned char *out,
                  int out_cap) {
    short *buf = new short[(size_t)w * h];
    std::memcpy(buf, img, sizeof(short) * (size_t)w * h);
    unsigned char *stream = new unsigned char[(size_t)w * h * 4 + 1024];
    CMuxCodec codec(stream, 0);
    CWavelet2D wav(w, h, levels, level_chg);
    wav.SetWeight((rududu::trans)trans);
    wav.Transform(buf, w, (rududu::trans)trans);
    wav.CodeBand(&codec, quant, lambda);
    unsigned char *end = codec.endCoding();
    int size = (int)(end - stream) - 2;
    if (size > out_cap) size = -1;
    else std::memcpy(out, stream + 2, size);
    delete[] stream;
    delete[] buf;
    return size;
}

// Full single-plane decode: DecodeBand + TSUQi + TransformI.
void oracle_decode(const unsigned char *stream_in, int stream_len, int w,
                   int h, int levels, int level_chg, int trans, int quant,
                   short *out) {
    unsigned char *stream = new unsigned char[(size_t)stream_len + 1024];
    std::memcpy(stream + 2, stream_in, stream_len);
    CMuxCodec codec(stream);
    CWavelet2D wav(w, h, levels, level_chg);
    wav.SetWeight((rududu::trans)trans);
    wav.DecodeBand(&codec);
    if (quant != 0) wav.TSUQi(quant);
    wav.TransformI(out + (size_t)w * h, w, (rududu::trans)trans);
    delete[] stream;
}

}  // extern "C"
