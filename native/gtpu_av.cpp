// gst-libav analog: a thin C ABI over the system libavcodec for the
// codec families the framework does not implement natively
// (H.264/HEVC/AV1/MPEG-2/MPEG-4/ProRes/... decode, and whatever
// encoders the system build ships, e.g. libx264).
//
// Reference architecture: the reference framework's gst-libav
// subproject wraps exactly this library (gst-libav/ext/libav/
// gstavviddec.c:1, gstavvidenc.c:1) — codecs are NOT reimplemented
// there either.  Video is normalized to I420 via libswscale; audio to
// interleaved float via manual interleave of the planar formats.
//
// Built by gstreamer_tpu/native/_build.py with
//   -lavcodec -lavutil -lswscale

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/channel_layout.h>
#include <libswscale/swscale.h>
}

#include <cstring>

namespace {

struct Dec {
    AVCodecContext *ctx = nullptr;
    AVPacket *pkt = nullptr;
    AVFrame *frame = nullptr;
    SwsContext *sws = nullptr;
    AVFrame *i420 = nullptr;
    bool pending = false;       // frame holds undelivered data
};

struct Enc {
    AVCodecContext *ctx = nullptr;
    AVPacket *pkt = nullptr;
    AVFrame *frame = nullptr;
    long npts = 0;
    bool pending = false;       // pkt holds undelivered data
};

}  // namespace

extern "C" {

void gtpu_av_quiet() { av_log_set_level(AV_LOG_ERROR); }

int gtpu_av_have_codec(const char *name, int enc) {
    return enc ? avcodec_find_encoder_by_name(name) != nullptr
               : avcodec_find_decoder_by_name(name) != nullptr;
}

// ------------------------------------------------------------- decode

void *gtpu_avdec_new(const char *codec_name, const unsigned char *extra,
                     int exlen, int w, int h) {
    const AVCodec *codec = avcodec_find_decoder_by_name(codec_name);
    if (!codec) return nullptr;
    Dec *d = new Dec();
    d->ctx = avcodec_alloc_context3(codec);
    if (w > 0) d->ctx->width = w;
    if (h > 0) d->ctx->height = h;
    if (extra && exlen > 0) {
        d->ctx->extradata = (uint8_t *)av_mallocz(
            exlen + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(d->ctx->extradata, extra, exlen);
        d->ctx->extradata_size = exlen;
    }
    if (avcodec_open2(d->ctx, codec, nullptr) < 0) {
        avcodec_free_context(&d->ctx);
        delete d;
        return nullptr;
    }
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    return d;
}

void gtpu_avdec_free(void *h) {
    Dec *d = (Dec *)h;
    if (!d) return;
    av_packet_free(&d->pkt);
    av_frame_free(&d->frame);
    av_frame_free(&d->i420);
    sws_freeContext(d->sws);
    avcodec_free_context(&d->ctx);
    delete d;
}

// 0 ok; <0 error.  data=NULL => flush.
int gtpu_avdec_send(void *h, const unsigned char *data, long size) {
    Dec *d = (Dec *)h;
    if (!data) return avcodec_send_packet(d->ctx, nullptr);
    uint8_t *buf = (uint8_t *)av_malloc(
        size + AV_INPUT_BUFFER_PADDING_SIZE);
    memcpy(buf, data, size);
    memset(buf + size, 0, AV_INPUT_BUFFER_PADDING_SIZE);
    AVPacket *pkt = av_packet_alloc();
    av_packet_from_data(pkt, buf, size);
    int r = avcodec_send_packet(d->ctx, pkt);
    av_packet_free(&pkt);
    return r;
}

// Pull one video frame as I420.  Returns bytes written; 0 = no frame
// ready; negative = -(needed bytes) when cap is too small (w/h are
// still filled so the caller can resize and retry).
long gtpu_avdec_recv_video(void *h, unsigned char *buf, long cap,
                           int *w, int *hh) {
    Dec *d = (Dec *)h;
    if (!d->pending) {
        if (avcodec_receive_frame(d->ctx, d->frame) != 0) return 0;
        d->pending = true;
    }
    AVFrame *fr = d->frame;
    int W = fr->width, H = fr->height;
    *w = W;
    *hh = H;
    long need = (long)W * H + 2L * ((W + 1) / 2) * ((H + 1) / 2);
    if (cap < need) return -need;
    AVFrame *src = fr;
    if (fr->format != AV_PIX_FMT_YUV420P) {
        if (!d->i420 || d->i420->width != W || d->i420->height != H) {
            av_frame_free(&d->i420);
            d->i420 = av_frame_alloc();
            d->i420->format = AV_PIX_FMT_YUV420P;
            d->i420->width = W;
            d->i420->height = H;
            av_frame_get_buffer(d->i420, 0);
        }
        d->sws = sws_getCachedContext(
            d->sws, W, H, (AVPixelFormat)fr->format, W, H,
            AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr, nullptr,
            nullptr);
        if (!d->sws) { d->pending = false; return 0; }
        sws_scale(d->sws, fr->data, fr->linesize, 0, H, d->i420->data,
                  d->i420->linesize);
        src = d->i420;
    }
    unsigned char *p = buf;
    for (int pl = 0; pl < 3; pl++) {
        int pw = pl ? (W + 1) / 2 : W;
        int ph = pl ? (H + 1) / 2 : H;
        for (int r = 0; r < ph; r++, p += pw)
            memcpy(p, src->data[pl] + r * src->linesize[pl], pw);
    }
    d->pending = false;
    return need;
}

// Pull one audio frame as interleaved float.  Returns sample count
// (per channel); 0 = none; negative = -(needed FLOATS, i.e. the
// total interleaved n*channels size) so the caller can size the
// buffer without guessing the channel count up front.
long gtpu_avdec_recv_audio(void *h, float *buf, long cap_floats,
                           int *rate, int *ch) {
    Dec *d = (Dec *)h;
    if (!d->pending) {
        if (avcodec_receive_frame(d->ctx, d->frame) != 0) return 0;
        d->pending = true;
    }
    AVFrame *fr = d->frame;
    int C = d->ctx->ch_layout.nb_channels;
    *rate = fr->sample_rate;
    *ch = C;
    long n = fr->nb_samples;
    if (cap_floats < n * C) return -(n * C);
    for (long i = 0; i < n; i++)
        for (int k = 0; k < C; k++) {
            float v = 0.f;
            switch (fr->format) {
                case AV_SAMPLE_FMT_FLTP:
                    v = ((float *)fr->data[k])[i];
                    break;
                case AV_SAMPLE_FMT_FLT:
                    v = ((float *)fr->data[0])[i * C + k];
                    break;
                case AV_SAMPLE_FMT_S16P:
                    v = ((int16_t *)fr->data[k])[i] / 32768.f;
                    break;
                case AV_SAMPLE_FMT_S16:
                    v = ((int16_t *)fr->data[0])[i * C + k] / 32768.f;
                    break;
                case AV_SAMPLE_FMT_S32P:
                    v = ((int32_t *)fr->data[k])[i] / 2147483648.f;
                    break;
                case AV_SAMPLE_FMT_S32:
                    v = ((int32_t *)fr->data[0])[i * C + k]
                        / 2147483648.f;
                    break;
                case AV_SAMPLE_FMT_DBLP:
                    v = (float)((double *)fr->data[k])[i];
                    break;
                case AV_SAMPLE_FMT_U8:
                    v = (((uint8_t *)fr->data[0])[i * C + k] - 128)
                        / 128.f;
                    break;
                case AV_SAMPLE_FMT_U8P:
                    v = (((uint8_t *)fr->data[k])[i] - 128) / 128.f;
                    break;
                default:
                    break;
            }
            buf[i * C + k] = v;
        }
    d->pending = false;
    return n;
}

// ------------------------------------------------------------- encode

void *gtpu_avenc_new(const char *codec_name, int w, int h, int fps_n,
                     int fps_d, long bitrate, const char *opts,
                     int global_header) {
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return nullptr;
    Enc *e = new Enc();
    e->ctx = avcodec_alloc_context3(codec);
    e->ctx->width = w;
    e->ctx->height = h;
    e->ctx->time_base = {fps_d, fps_n};
    e->ctx->framerate = {fps_n, fps_d};
    e->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    if (bitrate > 0) e->ctx->bit_rate = bitrate;
    e->ctx->gop_size = 30;
    e->ctx->max_b_frames = 0;   // no reorder delay (batch drain model)
    if (global_header)
        e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (opts && opts[0])
        av_set_options_string(e->ctx->priv_data, opts, "=", ":");
    if (avcodec_open2(e->ctx, codec, nullptr) < 0) {
        avcodec_free_context(&e->ctx);
        delete e;
        return nullptr;
    }
    e->pkt = av_packet_alloc();
    e->frame = av_frame_alloc();
    e->frame->format = AV_PIX_FMT_YUV420P;
    e->frame->width = w;
    e->frame->height = h;
    av_frame_get_buffer(e->frame, 0);
    return e;
}

void gtpu_avenc_free(void *h) {
    Enc *e = (Enc *)h;
    if (!e) return;
    av_packet_free(&e->pkt);
    av_frame_free(&e->frame);
    avcodec_free_context(&e->ctx);
    delete e;
}

// y/u/v = tightly packed planes; y=NULL => flush.  0 ok, <0 error.
int gtpu_avenc_send_frame(void *h, const unsigned char *y,
                          const unsigned char *u,
                          const unsigned char *v) {
    Enc *e = (Enc *)h;
    if (!y) return avcodec_send_frame(e->ctx, nullptr);
    av_frame_make_writable(e->frame);
    int W = e->ctx->width, H = e->ctx->height;
    const unsigned char *src[3] = {y, u, v};
    for (int pl = 0; pl < 3; pl++) {
        int pw = pl ? (W + 1) / 2 : W;
        int ph = pl ? (H + 1) / 2 : H;
        for (int r = 0; r < ph; r++)
            memcpy(e->frame->data[pl] + r * e->frame->linesize[pl],
                   src[pl] + (long)r * pw, pw);
    }
    e->frame->pts = e->npts++;
    return avcodec_send_frame(e->ctx, e->frame);
}

// Returns bytes written; 0 = none ready; negative = -(needed).
long gtpu_avenc_recv_packet(void *h, unsigned char *buf, long cap,
                            int *key) {
    Enc *e = (Enc *)h;
    if (!e->pending) {
        if (avcodec_receive_packet(e->ctx, e->pkt) != 0) return 0;
        e->pending = true;
    }
    long need = e->pkt->size;
    if (cap < need) return -need;
    memcpy(buf, e->pkt->data, need);
    *key = (e->pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
    av_packet_unref(e->pkt);
    e->pending = false;
    return need;
}

// ------------------------------------------------------- audio encode

void *gtpu_avaenc_new(const char *codec_name, int rate, int ch,
                      long bitrate) {
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return nullptr;
    Enc *e = new Enc();
    e->ctx = avcodec_alloc_context3(codec);
    e->ctx->sample_rate = rate;
    e->ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    if (codec->sample_fmts) {
        bool ok = false;
        for (const enum AVSampleFormat *f = codec->sample_fmts;
             *f != AV_SAMPLE_FMT_NONE; f++)
            if (*f == AV_SAMPLE_FMT_FLTP) ok = true;
        if (!ok) e->ctx->sample_fmt = codec->sample_fmts[0];
    }
    if (bitrate > 0) e->ctx->bit_rate = bitrate;
    av_channel_layout_default(&e->ctx->ch_layout, ch);
    if (avcodec_open2(e->ctx, codec, nullptr) < 0) {
        avcodec_free_context(&e->ctx);
        delete e;
        return nullptr;
    }
    e->pkt = av_packet_alloc();
    e->frame = av_frame_alloc();
    e->frame->format = e->ctx->sample_fmt;
    e->frame->nb_samples =
        e->ctx->frame_size > 0 ? e->ctx->frame_size : 1024;
    av_channel_layout_copy(&e->frame->ch_layout, &e->ctx->ch_layout);
    if (av_frame_get_buffer(e->frame, 0) < 0) {
        gtpu_avenc_free(e);
        return nullptr;
    }
    return e;
}

int gtpu_avaenc_frame_size(void *h) {
    Enc *e = (Enc *)h;
    return e->ctx->frame_size > 0 ? e->ctx->frame_size : 1024;
}

// interleaved float frame of exactly frame_size samples (zero-pad the
// tail yourself); NULL => flush.
int gtpu_avaenc_send(void *h, const float *pcm) {
    Enc *e = (Enc *)h;
    if (!pcm) return avcodec_send_frame(e->ctx, nullptr);
    av_frame_make_writable(e->frame);
    int C = e->ctx->ch_layout.nb_channels;
    int N = e->frame->nb_samples;
    if (e->ctx->sample_fmt == AV_SAMPLE_FMT_FLTP) {
        for (int k = 0; k < C; k++) {
            float *d = (float *)e->frame->data[k];
            for (int i = 0; i < N; i++) d[i] = pcm[i * C + k];
        }
    } else if (e->ctx->sample_fmt == AV_SAMPLE_FMT_FLT) {
        memcpy(e->frame->data[0], pcm, sizeof(float) * N * C);
    } else if (e->ctx->sample_fmt == AV_SAMPLE_FMT_S16) {
        int16_t *d = (int16_t *)e->frame->data[0];
        for (int i = 0; i < N * C; i++) {
            float v = pcm[i] * 32768.f;
            d[i] = v > 32767.f ? 32767 : v < -32768.f ? -32768
                                                      : (int16_t)v;
        }
    } else if (e->ctx->sample_fmt == AV_SAMPLE_FMT_S16P) {
        for (int k = 0; k < C; k++) {
            int16_t *d = (int16_t *)e->frame->data[k];
            for (int i = 0; i < N; i++) {
                float v = pcm[i * C + k] * 32768.f;
                d[i] = v > 32767.f ? 32767 : v < -32768.f
                    ? -32768 : (int16_t)v;
            }
        }
    } else if (e->ctx->sample_fmt == AV_SAMPLE_FMT_S32 ||
               e->ctx->sample_fmt == AV_SAMPLE_FMT_S32P) {
        // s32(p) encoders (aptx, aptx_hd): scale to full 32-bit range
        bool planar = e->ctx->sample_fmt == AV_SAMPLE_FMT_S32P;
        for (int k = 0; k < (planar ? C : 1); k++) {
            int32_t *d = (int32_t *)e->frame->data[k];
            int count = planar ? N : N * C;
            for (int i = 0; i < count; i++) {
                double v = (double)(planar ? pcm[i * C + k] : pcm[i])
                           * 2147483648.0;
                d[i] = v > 2147483647.0 ? 2147483647
                     : v < -2147483648.0 ? INT32_MIN : (int32_t)v;
            }
        }
    } else {
        return -1;
    }
    e->frame->pts = e->npts;
    e->npts += N;
    return avcodec_send_frame(e->ctx, e->frame);
}

// Encoder global header (e.g. avcC-style extradata), 0 if none.
long gtpu_avenc_extradata(void *h, unsigned char *buf, long cap) {
    Enc *e = (Enc *)h;
    if (!e->ctx->extradata || e->ctx->extradata_size <= 0) return 0;
    long need = e->ctx->extradata_size;
    if (cap < need) return -need;
    memcpy(buf, e->ctx->extradata, need);
    return need;
}


// Audio decoder with full stream parameters (RealAudio cook/sipr and
// other container-carried codecs need rate/channels/block_align set
// on the context in addition to the extradata).
void *gtpu_avdec_new2(const char *codec_name, const unsigned char *extra,
                      int exlen, int rate, int channels,
                      int block_align) {
    const AVCodec *codec = avcodec_find_decoder_by_name(codec_name);
    if (!codec) return nullptr;
    Dec *d = new Dec();
    d->ctx = avcodec_alloc_context3(codec);
    if (rate > 0) d->ctx->sample_rate = rate;
    if (channels > 0)
        av_channel_layout_default(&d->ctx->ch_layout, channels);
    if (block_align > 0) d->ctx->block_align = block_align;
    if (extra && exlen > 0) {
        d->ctx->extradata = (uint8_t *)av_mallocz(
            exlen + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(d->ctx->extradata, extra, exlen);
        d->ctx->extradata_size = exlen;
    }
    if (avcodec_open2(d->ctx, codec, nullptr) < 0) {
        avcodec_free_context(&d->ctx);
        delete d;
        return nullptr;
    }
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    return d;
}

// Test-oracle helper: author a genuine RealMedia file (RV20 video +
// RealAudio 14.4 audio) through libavformat's rm muxer, so the
// clean-room rmdemux can be validated against authentic containers.
int gtpu_av_write_rm(const char *path, int w, int h, int nframes) {
    AVFormatContext *oc = nullptr;
    if (avformat_alloc_output_context2(&oc, nullptr, "rm", path) < 0)
        return -1;
    const AVCodec *vc = avcodec_find_encoder_by_name("rv20");
    const AVCodec *ac = avcodec_find_encoder_by_name("real_144");
    if (!vc || !ac) return -2;
    AVStream *vs = avformat_new_stream(oc, nullptr);
    AVStream *as = avformat_new_stream(oc, nullptr);
    AVCodecContext *vctx = avcodec_alloc_context3(vc);
    vctx->width = w; vctx->height = h;
    vctx->pix_fmt = AV_PIX_FMT_YUV420P;
    vctx->time_base = {1, 25};
    vctx->bit_rate = 200000;
    AVCodecContext *actx = avcodec_alloc_context3(ac);
    actx->sample_rate = 8000;
    av_channel_layout_default(&actx->ch_layout, 1);
    actx->sample_fmt = ac->sample_fmts ? ac->sample_fmts[0]
                                       : AV_SAMPLE_FMT_S16;
    actx->time_base = {1, 8000};
    actx->bit_rate = 8000;
    if (avcodec_open2(vctx, vc, nullptr) < 0) return -3;
    if (avcodec_open2(actx, ac, nullptr) < 0) return -4;
    avcodec_parameters_from_context(vs->codecpar, vctx);
    avcodec_parameters_from_context(as->codecpar, actx);
    vs->time_base = vctx->time_base;
    as->time_base = actx->time_base;
    if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) return -5;
    if (avformat_write_header(oc, nullptr) < 0) return -6;
    AVFrame *vf = av_frame_alloc();
    vf->format = AV_PIX_FMT_YUV420P; vf->width = w; vf->height = h;
    av_frame_get_buffer(vf, 0);
    AVFrame *af = av_frame_alloc();
    af->format = actx->sample_fmt;
    af->nb_samples = actx->frame_size > 0 ? actx->frame_size : 160;
    av_channel_layout_default(&af->ch_layout, 1);
    af->sample_rate = 8000;
    av_frame_get_buffer(af, 0);
    AVPacket *pkt = av_packet_alloc();
    long asamples = 0;
    for (int i = 0; i < nframes; i++) {
        av_frame_make_writable(vf);
        for (int y = 0; y < h; y++)
            memset(vf->data[0] + y * vf->linesize[0],
                   (16 * i + y) & 0xFF, w);
        memset(vf->data[1], 128, vf->linesize[1] * h / 2);
        memset(vf->data[2], 128, vf->linesize[2] * h / 2);
        vf->pts = i;
        avcodec_send_frame(vctx, vf);
        while (avcodec_receive_packet(vctx, pkt) == 0) {
            av_packet_rescale_ts(pkt, vctx->time_base, vs->time_base);
            pkt->stream_index = vs->index;
            av_interleaved_write_frame(oc, pkt);
        }
        // ~1/25s of audio per video frame
        while (asamples < (long)(i + 1) * 8000 / 25) {
            av_frame_make_writable(af);
            int16_t *s = (int16_t *)af->data[0];
            for (int k = 0; k < af->nb_samples; k++)
                s[k] = (int16_t)(6000.0 *
                    __builtin_sinf(2 * 3.14159265f * 440.0f *
                                   (asamples + k) / 8000.0f));
            af->pts = asamples;
            asamples += af->nb_samples;
            avcodec_send_frame(actx, af);
            while (avcodec_receive_packet(actx, pkt) == 0) {
                av_packet_rescale_ts(pkt, actx->time_base,
                                     as->time_base);
                pkt->stream_index = as->index;
                av_interleaved_write_frame(oc, pkt);
            }
        }
    }
    avcodec_send_frame(vctx, nullptr);
    while (avcodec_receive_packet(vctx, pkt) == 0) {
        av_packet_rescale_ts(pkt, vctx->time_base, vs->time_base);
        pkt->stream_index = vs->index;
        av_interleaved_write_frame(oc, pkt);
    }
    avcodec_send_frame(actx, nullptr);
    while (avcodec_receive_packet(actx, pkt) == 0) {
        av_packet_rescale_ts(pkt, actx->time_base, as->time_base);
        pkt->stream_index = as->index;
        av_interleaved_write_frame(oc, pkt);
    }
    av_write_trailer(oc);
    avio_closep(&oc->pb);
    av_packet_free(&pkt);
    av_frame_free(&vf);
    av_frame_free(&af);
    avcodec_free_context(&vctx);
    avcodec_free_context(&actx);
    avformat_free_context(oc);
    return 0;
}

// Write a real WMA+WMV ASF file via libavformat (test-input
// generator for the asfdemux interop tests): wmav2 stereo sine +
// wmv2 gradient video.
int gtpu_av_write_asf(const char *path, int w, int h, int nframes,
                      int with_video) {
    AVFormatContext *oc = nullptr;
    if (avformat_alloc_output_context2(&oc, nullptr, "asf", path) < 0)
        return -1;
    const AVCodec *ac = avcodec_find_encoder_by_name("wmav2");
    const AVCodec *vc = with_video
        ? avcodec_find_encoder_by_name("wmv2") : nullptr;
    if (!ac || (with_video && !vc)) return -2;
    AVStream *as = avformat_new_stream(oc, nullptr);
    AVCodecContext *actx = avcodec_alloc_context3(ac);
    actx->sample_rate = 44100;
    av_channel_layout_default(&actx->ch_layout, 2);
    actx->sample_fmt = ac->sample_fmts ? ac->sample_fmts[0]
                                       : AV_SAMPLE_FMT_FLTP;
    actx->time_base = {1, 44100};
    actx->bit_rate = 128000;
    if (avcodec_open2(actx, ac, nullptr) < 0) return -3;
    avcodec_parameters_from_context(as->codecpar, actx);
    as->time_base = actx->time_base;
    AVStream *vs = nullptr;
    AVCodecContext *vctx = nullptr;
    if (with_video) {
        vs = avformat_new_stream(oc, nullptr);
        vctx = avcodec_alloc_context3(vc);
        vctx->width = w; vctx->height = h;
        vctx->pix_fmt = AV_PIX_FMT_YUV420P;
        vctx->time_base = {1, 25};
        vctx->bit_rate = 400000;
        if (avcodec_open2(vctx, vc, nullptr) < 0) return -4;
        avcodec_parameters_from_context(vs->codecpar, vctx);
        vs->time_base = vctx->time_base;
    }
    if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) return -5;
    if (avformat_write_header(oc, nullptr) < 0) return -6;
    AVPacket *pkt = av_packet_alloc();
    AVFrame *af = av_frame_alloc();
    af->format = actx->sample_fmt;
    af->nb_samples = actx->frame_size > 0 ? actx->frame_size : 1024;
    av_channel_layout_default(&af->ch_layout, 2);
    af->sample_rate = 44100;
    av_frame_get_buffer(af, 0);
    AVFrame *vf = nullptr;
    if (with_video) {
        vf = av_frame_alloc();
        vf->format = AV_PIX_FMT_YUV420P;
        vf->width = w; vf->height = h;
        av_frame_get_buffer(vf, 0);
    }
    long asamples = 0;
    for (int i = 0; i < nframes; i++) {
        if (with_video) {
            av_frame_make_writable(vf);
            for (int y = 0; y < h; y++)
                memset(vf->data[0] + y * vf->linesize[0],
                       (16 * i + y) & 0xFF, w);
            memset(vf->data[1], 128, vf->linesize[1] * h / 2);
            memset(vf->data[2], 128, vf->linesize[2] * h / 2);
            vf->pts = i;
            avcodec_send_frame(vctx, vf);
            while (avcodec_receive_packet(vctx, pkt) == 0) {
                av_packet_rescale_ts(pkt, vctx->time_base,
                                     vs->time_base);
                pkt->stream_index = vs->index;
                av_interleaved_write_frame(oc, pkt);
            }
        }
        while (asamples < (long)(i + 1) * 44100 / 25) {
            av_frame_make_writable(af);
            for (int c = 0; c < 2; c++) {
                float *s = (float *)af->data[c];
                for (int k = 0; k < af->nb_samples; k++)
                    s[k] = 0.4f * __builtin_sinf(
                        2 * 3.14159265f * (c ? 660.f : 440.f) *
                        (asamples + k) / 44100.0f);
            }
            af->pts = asamples;
            asamples += af->nb_samples;
            avcodec_send_frame(actx, af);
            while (avcodec_receive_packet(actx, pkt) == 0) {
                av_packet_rescale_ts(pkt, actx->time_base,
                                     as->time_base);
                pkt->stream_index = as->index;
                av_interleaved_write_frame(oc, pkt);
            }
        }
    }
    avcodec_send_frame(actx, nullptr);
    while (avcodec_receive_packet(actx, pkt) == 0) {
        av_packet_rescale_ts(pkt, actx->time_base, as->time_base);
        pkt->stream_index = as->index;
        av_interleaved_write_frame(oc, pkt);
    }
    if (with_video) {
        avcodec_send_frame(vctx, nullptr);
        while (avcodec_receive_packet(vctx, pkt) == 0) {
            av_packet_rescale_ts(pkt, vctx->time_base, vs->time_base);
            pkt->stream_index = vs->index;
            av_interleaved_write_frame(oc, pkt);
        }
    }
    av_write_trailer(oc);
    avio_closep(&oc->pb);
    av_packet_free(&pkt);
    av_frame_free(&af);
    if (vf) av_frame_free(&vf);
    avcodec_free_context(&actx);
    if (vctx) avcodec_free_context(&vctx);
    avformat_free_context(oc);
    return 0;
}

// Write a real MXF (OP1a, mpeg2video + pcm_s16le) via libavformat:
// reverse-direction oracle input for the clean-room mxfdemux.
int gtpu_av_write_mxf(const char *path, int w, int h, int nframes) {
    AVFormatContext *oc = nullptr;
    if (avformat_alloc_output_context2(&oc, nullptr, "mxf", path) < 0)
        return -1;
    const AVCodec *vc = avcodec_find_encoder_by_name("mpeg2video");
    if (!vc) return -2;
    AVStream *vs = avformat_new_stream(oc, nullptr);
    AVCodecContext *vctx = avcodec_alloc_context3(vc);
    vctx->width = w; vctx->height = h;
    vctx->pix_fmt = AV_PIX_FMT_YUV420P;
    vctx->time_base = {1, 25};
    vctx->bit_rate = 500000;
    vctx->gop_size = 12;
    vctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(vctx, vc, nullptr) < 0) return -3;
    avcodec_parameters_from_context(vs->codecpar, vctx);
    vs->time_base = {1, 25};
    AVStream *as = avformat_new_stream(oc, nullptr);
    as->codecpar->codec_type = AVMEDIA_TYPE_AUDIO;
    as->codecpar->codec_id = AV_CODEC_ID_PCM_S16LE;
    as->codecpar->sample_rate = 48000;
    av_channel_layout_default(&as->codecpar->ch_layout, 1);
    as->codecpar->format = AV_SAMPLE_FMT_S16;
    as->codecpar->bits_per_coded_sample = 16;
    as->time_base = {1, 48000};
    if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) return -5;
    if (avformat_write_header(oc, nullptr) < 0) return -6;
    AVPacket *pkt = av_packet_alloc();
    AVFrame *vf = av_frame_alloc();
    vf->format = AV_PIX_FMT_YUV420P;
    vf->width = w; vf->height = h;
    av_frame_get_buffer(vf, 0);
    long asamples = 0;
    for (int i = 0; i < nframes; i++) {
        av_frame_make_writable(vf);
        for (int y = 0; y < h; y++)
            memset(vf->data[0] + y * vf->linesize[0],
                   (16 * i + y) & 0xFF, w);
        memset(vf->data[1], 128, vf->linesize[1] * h / 2);
        memset(vf->data[2], 128, vf->linesize[2] * h / 2);
        vf->pts = i;
        avcodec_send_frame(vctx, vf);
        while (avcodec_receive_packet(vctx, pkt) == 0) {
            pkt->stream_index = vs->index;
            av_interleaved_write_frame(oc, pkt);
        }
        // 1/25s of sine audio per frame (1920 samples)
        AVPacket *apkt = av_packet_alloc();
        av_new_packet(apkt, 1920 * 2);
        int16_t *s = (int16_t *)apkt->data;
        for (int k = 0; k < 1920; k++)
            s[k] = (int16_t)(8000.0 *
                __builtin_sinf(2 * 3.14159265f * 440.0f *
                               (asamples + k) / 48000.0f));
        apkt->pts = asamples; apkt->dts = asamples;
        apkt->stream_index = as->index;
        asamples += 1920;
        av_interleaved_write_frame(oc, apkt);
        av_packet_free(&apkt);
    }
    avcodec_send_frame(vctx, nullptr);
    while (avcodec_receive_packet(vctx, pkt) == 0) {
        pkt->stream_index = vs->index;
        av_interleaved_write_frame(oc, pkt);
    }
    av_write_trailer(oc);
    avio_closep(&oc->pb);
    av_packet_free(&pkt);
    av_frame_free(&vf);
    avcodec_free_context(&vctx);
    avformat_free_context(oc);
    return 0;
}

// Demux any container with libavformat and summarize per stream:
// "index codec_name media_type extradata_size npackets nbytes\n".
// Interop oracle: proves files written by the framework's muxers are
// readable by a third-party parser.
long gtpu_av_probe(const char *path, char *out, long cap) {
    AVFormatContext *ic = nullptr;
    if (avformat_open_input(&ic, path, nullptr, nullptr) < 0)
        return -1;
    if (avformat_find_stream_info(ic, nullptr) < 0) {
        avformat_close_input(&ic);
        return -2;
    }
    long npkt[64] = {0};
    long nbytes[64] = {0};
    AVPacket *pkt = av_packet_alloc();
    while (av_read_frame(ic, pkt) == 0) {
        if (pkt->stream_index < 64) {
            npkt[pkt->stream_index]++;
            nbytes[pkt->stream_index] += pkt->size;
        }
        av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    long pos = 0;
    for (unsigned i = 0; i < ic->nb_streams && i < 64; i++) {
        AVCodecParameters *p = ic->streams[i]->codecpar;
        const char *name = avcodec_get_name(p->codec_id);
        const char *type =
            p->codec_type == AVMEDIA_TYPE_VIDEO ? "video"
            : p->codec_type == AVMEDIA_TYPE_AUDIO ? "audio" : "other";
        int n = snprintf(out + pos, cap - pos,
                         "%u %s %s %d %ld %ld\n", i, name, type,
                         p->extradata_size, npkt[i], nbytes[i]);
        if (n < 0 || pos + n >= cap) break;
        pos += n;
    }
    avformat_close_input(&ic);
    return pos;
}

}  // extern "C"
