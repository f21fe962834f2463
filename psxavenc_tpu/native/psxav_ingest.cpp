// Native media ingest: libavformat/libavcodec demux+decode, libswresample
// to interleaved s16, libswscale to NV21 on a CFR grid.
//
// This is the host ingest layer of the TPU encoder. It drives the same L0
// libraries the reference encoder drives (psxavenc/decoding.c) with the
// same observable semantics — stream validation and messages
// (decoding.c:168-200), swr/sws configuration incl. the forced ITU-601
// full-range scaler colorspace (decoding.c:237-311), the -R/-S option
// strings via av_opt_set_from_string (decoding.c:250-252,312-314), the
// one-receive-per-packet decode quirk (decoding.c:113-129), the CFR
// drop/duplicate retiming (decoding.c:408-478), and the absence of any
// decoder/resampler flush at EOF — but restructured as a single
// full-file decode returning whole buffers for batch device encoding
// instead of a sliding window.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/dict.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

namespace {

constexpr int kUseAudio = 1 << 0;
constexpr int kUseVideo = 1 << 1;
constexpr int kAudioRequired = 1 << 2;
constexpr int kVideoRequired = 1 << 3;

struct Req {
    const char *path;
    int flags;
    int audio_frequency;
    int audio_channels;
    int video_width;   // requested (pre-aspect-adjust)
    int video_height;
    int ignore_aspect;
    int fps_num;
    int fps_den;
    int quiet;
    const char *swr_options;  // may be null
    const char *sws_options;  // may be null
};

struct Res {
    int16_t *audio;           // interleaved, malloc'd
    long long audio_count;    // total int16 values
    uint8_t *video;           // NV21 frames, malloc'd
    long long video_frames;
    int video_width;          // post-aspect-adjust
    int video_height;
    int has_audio;
    int has_video;
    int is_wav;
    int has_loop_meta;        // "loop_start" metadata tag present
    long long loop_meta_ms;
    int n_chapters;
    long long chapter0_ms;
};

// decoding.c:113-129 — at most one receive per packet; EAGAIN leaves an
// empty (unref'd) frame but still reports success.
bool decode_frame(AVCodecContext *codec, AVFrame *frame, AVPacket *packet) {
    if (packet != nullptr) {
        if (avcodec_send_packet(codec, packet) != 0)
            return false;
    }
    int ret = avcodec_receive_frame(codec, frame);
    if (ret >= 0)
        return true;
    if (ret == AVERROR(EAGAIN))
        return true;
    return false;
}

struct State {
    AVFormatContext *format = nullptr;
    AVCodecContext *audio_ctx = nullptr;
    AVCodecContext *video_ctx = nullptr;
    SwrContext *resampler = nullptr;
    SwsContext *scaler = nullptr;
    AVFrame *frame = nullptr;

    ~State() {
        if (frame) av_frame_free(&frame);
        if (scaler) sws_freeContext(scaler);
        if (resampler) swr_free(&resampler);
        if (audio_ctx) avcodec_free_context(&audio_ctx);
        if (video_ctx) avcodec_free_context(&video_ctx);
        if (format) avformat_close_input(&format);
    }
};

}  // namespace

extern "C" void psxn_ingest_free(Res *res) {
    free(res->audio);
    free(res->video);
    res->audio = nullptr;
    res->video = nullptr;
}

// Returns 0 on success; nonzero on failure (any detail message has
// already been printed to stderr, like the reference's open_av_data).
extern "C" int psxn_ingest_open(const Req *req, Res *res) {
    // -q silences libav* warnings, like the reference (decoding.c:158-159).
    if (req->quiet)
        av_log_set_level(AV_LOG_QUIET);
    memset(res, 0, sizeof(*res));
    res->loop_meta_ms = -1;
    res->chapter0_ms = -1;
    res->video_width = req->video_width;
    res->video_height = req->video_height;

    State st;
    st.format = avformat_alloc_context();
    if (avformat_open_input(&st.format, req->path, nullptr, nullptr))
        return 2;
    if (avformat_find_stream_info(st.format, nullptr) < 0)
        return 2;

    int audio_index = -1, video_index = -1;
    if (req->flags & kUseAudio) {
        for (unsigned i = 0; i < st.format->nb_streams; i++) {
            if (st.format->streams[i]->codecpar->codec_type ==
                    AVMEDIA_TYPE_AUDIO) {
                if (audio_index >= 0) {
                    fprintf(stderr,
                            "Input file must have a single audio track\n");
                    return 1;
                }
                audio_index = (int)i;
            }
        }
        if ((req->flags & kAudioRequired) && audio_index == -1) {
            fprintf(stderr, "Input file has no audio data\n");
            return 1;
        }
    }
    if (req->flags & kUseVideo) {
        for (unsigned i = 0; i < st.format->nb_streams; i++) {
            if (st.format->streams[i]->codecpar->codec_type ==
                    AVMEDIA_TYPE_VIDEO) {
                if (video_index >= 0) {
                    fprintf(stderr,
                            "Input file must have a single video track\n");
                    return 1;
                }
                video_index = (int)i;
            }
        }
        if ((req->flags & kVideoRequired) && video_index == -1) {
            fprintf(stderr, "Input file has no video data\n");
            return 1;
        }
    }

    AVStream *audio_stream =
        audio_index >= 0 ? st.format->streams[audio_index] : nullptr;
    AVStream *video_stream =
        video_index >= 0 ? st.format->streams[video_index] : nullptr;

    if (audio_stream) {
        const AVCodec *codec =
            avcodec_find_decoder(audio_stream->codecpar->codec_id);
        st.audio_ctx = avcodec_alloc_context3(codec);
        if (!st.audio_ctx)
            return 2;
        if (avcodec_parameters_to_context(st.audio_ctx,
                                          audio_stream->codecpar) < 0)
            return 2;
        if (avcodec_open2(st.audio_ctx, codec, nullptr) < 0)
            return 2;

        AVChannelLayout layout;
        layout.nb_channels = req->audio_channels;
        if (req->audio_channels == 1) {
            layout.order = AV_CHANNEL_ORDER_NATIVE;
            layout.u.mask = AV_CH_LAYOUT_MONO;
        } else if (req->audio_channels == 2) {
            layout.order = AV_CHANNEL_ORDER_NATIVE;
            layout.u.mask = AV_CH_LAYOUT_STEREO;
        } else {
            layout.order = AV_CHANNEL_ORDER_UNSPEC;
        }
        if (req->audio_channels > st.audio_ctx->ch_layout.nb_channels &&
            !req->quiet)
            fprintf(stderr, "Warning: input file has less than %d channels\n",
                    req->audio_channels);

        if (swr_alloc_set_opts2(&st.resampler, &layout, AV_SAMPLE_FMT_S16,
                                req->audio_frequency,
                                &st.audio_ctx->ch_layout,
                                st.audio_ctx->sample_fmt,
                                st.audio_ctx->sample_rate, 0, nullptr) < 0)
            return 2;
        if (req->swr_options && req->swr_options[0]) {
            if (av_opt_set_from_string(st.resampler, req->swr_options,
                                       nullptr, "=", ":,") < 0)
                return 2;
        }
        if (swr_init(st.resampler) < 0)
            return 2;
    }

    if (video_stream) {
        const AVCodec *codec =
            avcodec_find_decoder(video_stream->codecpar->codec_id);
        st.video_ctx = avcodec_alloc_context3(codec);
        if (!st.video_ctx)
            return 2;
        if (avcodec_parameters_to_context(st.video_ctx,
                                          video_stream->codecpar) < 0)
            return 2;
        if (avcodec_open2(st.video_ctx, codec, nullptr) < 0)
            return 2;

        if ((res->video_width > st.video_ctx->width ||
             res->video_height > st.video_ctx->height) && !req->quiet)
            fprintf(stderr,
                    "Warning: input file has resolution lower than %dx%d\n",
                    res->video_width, res->video_height);

        if (!req->ignore_aspect) {
            // decoding.c:275-285 — shrink the request to the input's
            // aspect, rounding up to a multiple of 16.
            double src_ratio =
                (double)st.video_ctx->width / (double)st.video_ctx->height;
            double dst_ratio =
                (double)res->video_width / (double)res->video_height;
            if (src_ratio < dst_ratio)
                res->video_width =
                    ((int)round((double)res->video_height * src_ratio) + 15)
                    & ~15;
            else
                res->video_height =
                    ((int)round((double)res->video_width / src_ratio) + 15)
                    & ~15;
        }

        st.scaler = sws_getContext(
            st.video_ctx->width, st.video_ctx->height, st.video_ctx->pix_fmt,
            res->video_width, res->video_height, AV_PIX_FMT_NV21,
            SWS_BICUBIC, nullptr, nullptr, nullptr);
        if (!st.scaler)
            return 2;
        if (sws_setColorspaceDetails(
                st.scaler, sws_getCoefficients(st.video_ctx->colorspace),
                st.video_ctx->color_range == AVCOL_RANGE_JPEG,
                sws_getCoefficients(SWS_CS_ITU601), 1, 0, 1 << 16,
                1 << 16) < 0)
            return 2;
        if (req->sws_options && req->sws_options[0]) {
            if (av_opt_set_from_string(st.scaler, req->sws_options, nullptr,
                                       "=", ":,") < 0)
                return 2;
        }
    }

    st.frame = av_frame_alloc();
    if (!st.frame)
        return 2;

    // ---- full-file decode loop (poll_av_data / poll_av_packet_*,
    // decoding.c:370-508, without the sliding-window retirement).
    std::vector<int16_t> audio;
    std::vector<uint8_t> video;
    const int sample_count_mul = req->audio_channels;
    const double pts_step = (double)req->fps_den / (double)req->fps_num;
    const long long frame_dst_size =
        3LL * res->video_width * res->video_height / 2;
    const int plane_size = res->video_width * res->video_height;
    long long video_frame_count = 0;
    double video_next_pts = 0.0;

    AVPacket packet;
    while (av_read_frame(st.format, &packet) >= 0) {
        if (packet.stream_index == audio_index && st.audio_ctx) {
            if (decode_frame(st.audio_ctx, st.frame, &packet)) {
                int out_count =
                    swr_get_out_samples(st.resampler, st.frame->nb_samples);
                if (out_count > 0) {
                    size_t base = audio.size();
                    audio.resize(base +
                                 (size_t)out_count * sample_count_mul);
                    uint8_t *buf = (uint8_t *)(audio.data() + base);
                    int got = swr_convert(
                        st.resampler, &buf, out_count,
                        (const uint8_t **)st.frame->data,
                        st.frame->nb_samples);
                    if (got < 0)
                        got = 0;
                    audio.resize(base + (size_t)got * sample_count_mul);
                }
            }
        } else if (packet.stream_index == video_index && st.video_ctx) {
            if (decode_frame(st.video_ctx, st.frame, &packet) &&
                st.frame->width && st.frame->height && st.frame->data[0]) {
                double pts = (double)st.frame->pts *
                             (double)video_stream->time_base.num /
                             (double)video_stream->time_base.den;
                bool drop = false;
                if (video_frame_count >= 1 && pts < video_next_pts)
                    drop = true;
                if (!drop) {
                    if (video_frame_count < 1)
                        video_next_pts = pts;
                    else
                        video_next_pts += pts_step;
                    int dupes =
                        (int)ceil((pts - video_next_pts) / pts_step);
                    if (dupes < 0)
                        dupes = 0;
                    video.resize((video_frame_count + dupes + 1) *
                                 frame_dst_size);
                    for (; dupes; dupes--) {
                        memcpy(video.data() +
                                   frame_dst_size * video_frame_count,
                               video.data() +
                                   frame_dst_size * (video_frame_count - 1),
                               frame_dst_size);
                        video_frame_count++;
                        video_next_pts += pts_step;
                    }
                    uint8_t *dst =
                        video.data() + frame_dst_size * video_frame_count;
                    uint8_t *dst_ptrs[2] = {dst, dst + plane_size};
                    int dst_strides[2] = {res->video_width,
                                          res->video_width};
                    sws_scale(st.scaler,
                              (const uint8_t *const *)st.frame->data,
                              st.frame->linesize, 0, st.frame->height,
                              dst_ptrs, dst_strides);
                    video_frame_count++;
                }
            }
        }
        av_packet_unref(&packet);
    }
    // Like the reference: no decoder drain and no swr flush at EOF —
    // delayed frames/samples are dropped (decoding.c:480-508).

    // ---- loop-point candidates (get_av_loop_point, decoding.c:328-368).
    res->is_wav = strcmp(st.format->iformat->name, "wav") == 0;
    AVDictionaryEntry *tag =
        av_dict_get(st.format->metadata, "loop_start", nullptr, 0);
    if (tag) {
        res->has_loop_meta = 1;
        res->loop_meta_ms =
            (long long)((strtoll(tag->value, nullptr, 10) * 1000) /
                        AV_TIME_BASE);
    }
    res->n_chapters = (int)st.format->nb_chapters;
    if (st.format->nb_chapters > 0) {
        AVChapter *ch = st.format->chapters[0];
        double pts = (double)ch->start * (double)ch->time_base.num /
                     (double)ch->time_base.den;
        res->chapter0_ms = (long long)llround(pts * 1000.0);
    }

    if (st.audio_ctx) {
        res->has_audio = 1;
        res->audio_count = (long long)audio.size();
        if (!audio.empty()) {
            res->audio = (int16_t *)malloc(audio.size() * sizeof(int16_t));
            memcpy(res->audio, audio.data(),
                   audio.size() * sizeof(int16_t));
        }
    }
    if (st.video_ctx) {
        res->has_video = 1;
        res->video_frames = video_frame_count;
        if (!video.empty()) {
            res->video = (uint8_t *)malloc(video.size());
            memcpy(res->video, video.data(), video.size());
        }
    }
    return 0;
}
