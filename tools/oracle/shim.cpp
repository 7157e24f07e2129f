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
// test-only shim: expose CImage's plane pointers for golden comparison
#define private public
#define protected public
#include <rududucodec.h>
#include <image.h>
#include <imagebuffer.h>
#include <obmc.h>
#include <obme.h>
#include <bitcodec.h>
#include <huffcodec.h>
#include <utils.h>
#undef private
#undef protected

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

// ---------------------------------------------------------------------------
// Video oracle: the reference CRududuCodec pipeline (rududucodec.cpp:87-143)
// composed from the reference's own components so testmotion.py can print
// ours-vs-reference bpp + PSNR per frame.
//
// Trunk's CRududuCodec::encodeImage/decodeImage cannot be called directly:
// rududucodec.cpp:74,84 pass the plane BASE pointer to TransformI, which
// expects a PAST-THE-END pointer (the convention every working caller uses,
// ric.cpp:216,225 — the inverse walks backward, wavelet2d.cpp:494-591).
// Under ASan this is a heap-buffer overflow on the first frame at every
// size/quant tried; the experimental video path in trunk is broken as
// shipped. This shim replays the exact same call sequence with the intended
// pointer convention (pImage[c] + dimXAlign*dimY), changing nothing else.
//
// Frames are passed in SGI planar layout (R,G,B planes, bottom-up rows)
// exactly as utils/testmotion.cpp feeds inputSGI.
// ---------------------------------------------------------------------------

#define VID_WAV_LEVELS 3     /* rududucodec.cpp:26 */
#define VID_TRANSFORM cdf97  /* rududucodec.cpp:27 */

namespace {

// The reference's quarter-pel interpolators index `in[i-1]` with an
// UNSIGNED 32-bit i==0 (image.cpp:290-301, 317-330): on 64-bit hosts the
// wrapped index walks ~8 GB off the buffer and segfaults (32-bit-era UB —
// pointer arithmetic used to wrap). These are the same filters with signed
// indexing; taps/rounding are identical, so the oracle's arithmetic is
// still the reference's.
template <int pos>
void shim_interH(CImage *dst, const CImage *src) {
    for (int c = 0; c < dst->component; c++) {
        short *out = dst->pImage[c];
        const short *in = src->pImage[c];
        for (int j = 0; j < (int)dst->dimY; j++) {
            for (int i = 0; i < (int)dst->dimX; i++) {
                if (pos == 1)
                    out[i] = (53 * (int)in[i] + 18 * in[i + 1] - 4 * in[i - 1] - 3 * in[i + 2] + 32) >> 6;
                else if (pos == 2)
                    out[i] = (((int)in[i] + in[i + 1]) * 9 - in[i - 1] - in[i + 2] + 8) >> 4;
                else
                    out[i] = (18 * (int)in[i] + 53 * in[i + 1] - 3 * in[i - 1] - 4 * in[i + 2] + 32) >> 6;
            }
            out += dst->dimXAlign;
            in += src->dimXAlign;
        }
    }
}

template <int pos>
void shim_interV(CImage *dst, const CImage *src) {
    for (int c = 0; c < dst->component; c++) {
        short *out = dst->pImage[c];
        const short *in = src->pImage[c];
        const int s = src->dimXAlign;
        for (int j = 0; j < (int)dst->dimY; j++) {
            for (int i = 0; i < (int)dst->dimX; i++) {
                if (pos == 1)
                    out[i] = (53 * (int)in[i] + 18 * in[i + s] - 4 * in[i - s] - 3 * in[i + 2 * s] + 32) >> 6;
                else if (pos == 2)
                    out[i] = (((int)in[i] + in[i + s]) * 9 - in[i - s] - in[i + 2 * s] + 8) >> 4;
                else
                    out[i] = (18 * (int)in[i] + 53 * in[i + s] - 3 * in[i - s] - 4 * in[i + 2 * s] + 32) >> 6;
            }
            out += dst->dimXAlign;
            in += s;
        }
    }
}

// obme.cpp:171-244 EPZS outer loop and obmc.cpp:344-440 MV field coding
// share another 32-bit-era UB: neighbor accesses like pCurMV[i - dimX]
// with UNSIGNED 32-bit operands wrap to a ~17 GB positive offset on
// 64-bit hosts (on 32-bit they wrapped back to the intended negative
// offset). Transcribed below with signed indices; every comparison,
// predictor and coder call is otherwise identical, and the heavy lifting
// (SAD cascade, diamond/subpel search, adaptive Huffman, range coder)
// still runs the linked reference code.

// obme.cpp:44-57 SAD and 110-132 subpxl, transcribed because the
// compiler emits no out-of-line symbols for these private templates.
unsigned short shim_sad8(const short *pSrc, const short *pDst,
                         const int stride) {
    unsigned int ret = 0;
    for (int j = 0; j < 8; j++) {
        for (int i = 0; i < 8; i++) {
            int tmp = pDst[i] - pSrc[i];
            ret += tmp < 0 ? -tmp : tmp;
        }
        pDst += stride;
        pSrc += stride;
    }
    return ret < 65535 ? ret : 65535;
}

template <int level>
void shim_subpxl(int cur_x, int cur_y, int im_x, int im_y, int stride,
                 short *pRef, short **pSub, sFullMV &MVBest) {
    short *pCur = pRef + cur_x + cur_y * stride;
    static const short x_mov[8] = {1, 0, -1, -1, 0, 0, 1, 1};
    static const short y_mov[8] = {0, -1, 0, 0, 1, 1, 0, 0};
    sFullMV MVTemp = MVBest;
    for (int i = 0; i < 8; i++) {
        MVTemp.MV.x += x_mov[i] << level;
        MVTemp.MV.y += y_mov[i] << level;
        int pic = ((MVTemp.MV.x & 3) << 2) | (MVTemp.MV.y & 3);
        int x = cur_x + (MVTemp.MV.x >> 2);
        int y = cur_y + (MVTemp.MV.y >> 2);
        if (x < -7) x = -7;
        if (x >= im_x) x = im_x - 1;
        if (y < -7) y = -7;
        if (y >= im_y) y = im_y - 1;
        int src_pos = x + y * stride;
        MVTemp.dist = shim_sad8(pSub[pic] + src_pos, pCur, stride);
        if (MVBest.dist > MVTemp.dist) MVBest = MVTemp;
    }
}

void shim_epzs(COBME *me, CImageBuffer &Images) {
    sFullMV MVPred[16];
    sMotionVector *pCurMV = me->pMV;
    unsigned char *pCurRef = me->pRef;
    unsigned short *pCurDist = me->pDist;
    int im_x = Images[0][0]->dimX, im_y = Images[0][0]->dimY,
        stride = Images[0][0]->dimXAlign;
    short *pIm[2] = {Images[0][0]->pImage[0], Images[1][0]->pImage[0]};
    short *pSub[SUB_IMAGE_CNT];
    for (int i = 0; i < SUB_IMAGE_CNT; i++)
        pSub[i] = Images[1][i]->pImage[0];
    const int dimX = me->dimX, dimY = me->dimY;

    for (int j = 0; j < dimY; j++) {
        for (int i = 0; i < dimX; i++) {
            int n = 1;
            MVPred[0].MV.all = 0;
            if (j == 0) {
                if (i != 0) MVPred[0].MV = pCurMV[i - 1];
            } else {
                if (i == 0 || i == dimX - 1)
                    MVPred[0].MV = pCurMV[i - dimX];
                else {
                    MVPred[0].MV = me->median_mv(
                        pCurMV[i - 1], pCurMV[i - dimX],
                        pCurMV[i - dimX + 1]);
                    MVPred[n++].MV = pCurMV[i - 1];
                    MVPred[n++].MV = pCurMV[i - dimX];
                    MVPred[n++].MV = pCurMV[i - dimX + 1];
                }
            }
            MVPred[n].MV.x = (pCurMV[i].x + 2) >> 2;
            MVPred[n++].MV.y = (pCurMV[i].y + 2) >> 2;
            MVPred[n++].MV.all = 0;
            for (int k = 0; k < n; k++) {
                MVPred[k].ref = 0;
                MVPred[k].dist = 0xFFFF;
            }
            sFullMV MVBest = COBME::EPZS(8 * i, 8 * j, im_x, im_y, stride,
                                         pIm, MVPred, n - 2, 1, 0);
            pCurMV[i] = MVBest.MV;
            pCurRef[i] = MVBest.ref;
            pCurDist[i] = MVBest.dist;
        }
        pCurMV += dimX;
        pCurRef += dimX;
        pCurDist += dimX;
    }

    pCurMV = me->pMV;
    pCurRef = me->pRef;
    pCurDist = me->pDist;
    for (int j = 0; j < dimY; j++) {
        for (int i = 0; i < dimX; i++) {
            if (pCurDist[i] < 65535 /* THRES_D */) {
                sFullMV MVBest = {pCurMV[i], pCurRef[i], 0, pCurDist[i]};
                MVBest.MV.x <<= 2;
                MVBest.MV.y <<= 2;
                shim_subpxl<1>(8 * i, 8 * j, im_x, im_y, stride, pIm[0],
                               pSub, MVBest);
                shim_subpxl<0>(8 * i, 8 * j, im_x, im_y, stride, pIm[0],
                               pSub, MVBest);
                pCurMV[i] = MVBest.MV;
                pCurDist[i] = MVBest.dist;
            } else
                pCurMV[i].all = MV_INTRA;
        }
        pCurMV += dimX;
        pCurRef += dimX;
        pCurDist += dimX;
    }
}

// obmc.cpp:344-393 / 395-440 with signed neighbor indices.
template <bool enc_mode>
void shim_mv_code(COBMC *mc, CMuxCodec *codec) {
    sMotionVector *pCurMV = mc->pMV;
    CBitCodec intraCodec(codec), zeroCodec(codec);
    CHuffCodec huff_x(enc_mode ? rududu::encode : rududu::decode, 0, 128);
    CHuffCodec huff_y(enc_mode ? rududu::encode : rududu::decode, 0, 128);
    CHuffCodec huff(enc_mode ? rududu::encode : rududu::decode, 0, 255);
    const int dimX = mc->dimX, dimY = mc->dimY;

    for (int j = 0; j < dimY; j++) {
        for (int i = 0; i < dimX; i++) {
            if (enc_mode && pCurMV[i].all == MV_INTRA) {
                intraCodec.code1(0);
                continue;
            }
            if (!enc_mode && intraCodec.decode(0)) {
                pCurMV[i].all = MV_INTRA;
                continue;
            }
            if (enc_mode) intraCodec.code0(0);
            sMotionVector MVPred = {0};
            if (j == 0) {
                if (i != 0) MVPred = pCurMV[i - 1];
            } else {
                if (i == 0 || i == dimX - 1)
                    MVPred = pCurMV[i - dimX];
                else
                    MVPred = mc->median_mv(pCurMV[i - 1], pCurMV[i - dimX],
                                           pCurMV[i - dimX + 1]);
            }
            if (enc_mode) {
                if (pCurMV[i].x == MVPred.x && pCurMV[i].y == MVPred.y)
                    zeroCodec.code0(0);
                else {
                    zeroCodec.code1(0);
                    int x = s2u(pCurMV[i].x - MVPred.x);
                    int y = s2u(pCurMV[i].y - MVPred.y);
                    int tmp = (MIN(x, 15) | (MIN(y, 15) << 4)) - 1;
                    huff.code(tmp, codec);
                    if (x >= 15) {
                        huff_x.code(MIN(x - 15, 127), codec);
                        if (x >= 127 + 15)
                            codec->golombLinCode(x - 127 - 15, 5, 0);
                    }
                    if (y >= 15) {
                        huff_y.code(MIN(y - 15, 127), codec);
                        if (y >= 127 + 15)
                            codec->golombLinCode(y - 127 - 15, 5, 0);
                    }
                }
            } else {
                if (zeroCodec.decode(0)) {
                    int tmp = huff.decode(codec) + 1;
                    int x = tmp & 0xF;
                    int y = tmp >> 4;
                    if (x == 15) {
                        x += huff_x.decode(codec);
                        if (x == 127 + 15) x += codec->golombLinDecode(5, 0);
                    }
                    pCurMV[i].x = u2s(x) + MVPred.x;
                    if (y == 15) {
                        y += huff_y.decode(codec);
                        if (y == 127 + 15) y += codec->golombLinDecode(5, 0);
                    }
                    pCurMV[i].y = u2s(y) + MVPred.y;
                } else {
                    pCurMV[i].x = MVPred.x;
                    pCurMV[i].y = MVPred.y;
                }
            }
        }
        pCurMV += dimX;
    }
}

// imagebuffer.cpp:90-121 calc_sub, using the fixed interpolators above.
// One more intent fix: the reference interpolates BEFORE extending sub[0]'s
// borders, so edge taps read uninitialized heap (encoder and decoder would
// each read their own garbage -> reconstruction drift). Extending first is
// the only ordering under which the path can work at all.
void shim_calc_sub(CImageBuffer &images, int index) {
    sSubImage &e = images.image_list[index];
    e.sub[0]->extend();
    if (e.sub[4] == 0) e.sub[4] = images.getFree();
    shim_interH<1>(e.sub[4], e.sub[0]);
    if (e.sub[8] == 0) e.sub[8] = images.getFree();
    shim_interH<2>(e.sub[8], e.sub[0]);
    if (e.sub[12] == 0) e.sub[12] = images.getFree();
    shim_interH<3>(e.sub[12], e.sub[0]);
    for (int i = 0; i < 16; i += 4) {
        if (e.sub[i + 1] == 0) e.sub[i + 1] = images.getFree();
        shim_interV<1>(e.sub[i + 1], e.sub[i]);
        if (e.sub[i + 2] == 0) e.sub[i + 2] = images.getFree();
        shim_interV<2>(e.sub[i + 2], e.sub[i]);
        if (e.sub[i + 3] == 0) e.sub[i + 3] = images.getFree();
        shim_interV<3>(e.sub[i + 3], e.sub[i]);
    }
    for (int i = 0; i < 16; i++) e.sub[i]->extend();
}

struct VOracle {
    int w, h, quant, key_count, mode;
    // stream bytes consumed by the MV field coder of the last P frame
    // (obmc.cpp:344-440 adaptive-Huffman MV coding) — the MV/residual
    // split for video rate parity (getSize() is exact to mux buffering)
    int last_mv_bytes = 0;
    CImageBuffer images;
    COBMC *obmc;
    CImage *predImage;
    CWavelet2D *wavelet;
    CMuxCodec codec;

    VOracle(int w_, int h_, int mode_, int quant_)
        : w(w_), h(h_), quant(quant_), key_count(0), mode(mode_),
          images(w_, h_, 3, SUB_IMAGE_CNT + 1),
          codec(0, 0) {
        wavelet = new CWavelet2D(w, h, VID_WAV_LEVELS);
        wavelet->SetWeight(VID_TRANSFORM);
        if (mode == 0)
            obmc = (COBMC *)new COBME(w >> 3, h >> 3);
        else
            obmc = new COBMC(w >> 3, h >> 3);
        predImage = new CImage(w, h, 3, 32);
    }
    ~VOracle() {
        delete predImage;
        delete obmc;
        delete wavelet;
    }

    short q(int idx) { return CRududuCodec::quants(idx); }

    // rududucodec.cpp:67-76 with the TransformI pointer convention fixed
    void encodeImage(CImage *im) {
        for (int c = 0; c < 3; c++) {
            wavelet->Transform(im->pImage[c], im->dimXAlign, VID_TRANSFORM);
            wavelet->CodeBand(&codec, q(quant + 20), q(quant + 12));
            wavelet->TSUQi(q(quant + 20));
            wavelet->TransformI(
                im->pImage[c] + (size_t)im->dimXAlign * im->dimY,
                im->dimXAlign, VID_TRANSFORM);
        }
    }

    void decodeImage(CImage *im) {
        for (int c = 0; c < 3; c++) {
            wavelet->DecodeBand(&codec);
            wavelet->TSUQi(q(quant + 20));
            wavelet->TransformI(
                im->pImage[c] + (size_t)im->dimXAlign * im->dimY,
                im->dimXAlign, VID_TRANSFORM);
        }
    }

    // rududucodec.cpp:87-118
    int encode(const unsigned char *sgi, unsigned char *buf, CImage **out) {
        last_mv_bytes = 0;  // key frames carry no MV field
        codec.initCoder(0, buf);
        images.insert(0);
        images[0][0]->inputSGI((unsigned char *)sgi, w, -128);
        if (key_count != 0) {
            COBME *obme = (COBME *)obmc;
            shim_calc_sub(images, 1);
            shim_epzs(obme, images);
            unsigned int pre_mv = codec.getSize();
            shim_mv_code<true>(obme, &codec);
            last_mv_bytes = (int)(codec.getSize() - pre_mv);
            obme->apply_mv(images, *predImage);
            *images[0][0] -= *predImage;
            encodeImage(images[0][0]);
            *images[0][0] += *predImage;
            buf[0] |= 0x80;
        } else {
            encodeImage(images[0][0]);
        }
        key_count++;
        if (key_count == 10) key_count = 0;
        *out = images[0][0];
        images.remove(1);
        return codec.endCoding() - buf - 2;
    }

    // rududucodec.cpp:122-139
    int decode(unsigned char *buf, CImage **out) {
        codec.initDecoder(buf);
        images.insert(0);
        if (buf[0] & 0x80) {
            shim_calc_sub(images, 1);
            shim_mv_code<false>(obmc, &codec);
            obmc->apply_mv(images, *predImage);
            decodeImage(images[0][0]);
            *images[0][0] += *predImage;
        } else {
            decodeImage(images[0][0]);
        }
        *out = images[0][0];
        images.remove(1);
        return codec.getSize();
    }
};

// Copy the codec's 3 YCoCg planes (aligned stride) into packed int16.
void copy_planes(CImage *im, int w, int h, short *out) {
    for (int c = 0; c < 3; c++) {
        for (int j = 0; j < h; j++) {
            std::memcpy(out + ((size_t)c * h + j) * w,
                        im->pImage[c] + (size_t)j * im->dimXAlign,
                        sizeof(short) * w);
        }
    }
}

}  // namespace

extern "C" {

void *oracle_video_create(int w, int h, int mode, int quant) {
    return new VOracle(w, h, mode, quant);
}

void oracle_video_destroy(void *p) { delete (VOracle *)p; }

// Encode one frame; returns stream byte size. recon gets the encoder-side
// reconstruction as 3 packed (h, w) int16 YCoCg planes (Y<<4, Co/Cg<<3
// domain, offset -128 on Y like inputSGI).
int oracle_video_encode(void *p, const unsigned char *sgi, int w, int h,
                        unsigned char *stream, short *recon) {
    VOracle *c = (VOracle *)p;
    CImage *out = 0;
    int n = c->encode(sgi, stream, &out);
    if (out && recon) copy_planes(out, w, h, recon);
    return n;
}

// MV-field bytes of the last encoded frame (0 for key frames).
int oracle_video_mv_bytes(void *p) {
    return ((VOracle *)p)->last_mv_bytes;
}

// Decode one frame; returns consumed byte size; recon as in encode.
int oracle_video_decode(void *p, const unsigned char *stream, int w, int h,
                        short *recon) {
    VOracle *c = (VOracle *)p;
    CImage *out = 0;
    int n = c->decode((unsigned char *)stream, &out);
    if (out && recon) copy_planes(out, w, h, recon);
    return n;
}

}  // extern "C"
