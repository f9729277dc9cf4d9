/*
 * decode_oracle — reference-decoder conformance oracle.
 *
 * Decodes an Annex-B H.264/HEVC elementary stream (or MPEG-TS) with
 * libavcodec and writes raw planar YUV to stdout or a file. Used by the
 * test suite to prove that ceracoder_tpu's encoder output is
 * spec-conformant and that the encoder's reconstruction loop is bit-exact
 * with a real decoder (SURVEY.md §7.1: "correctness oracle from day one").
 *
 * Usage: decode_oracle <in.264|in.265|in.ts> <out.yuv> [codec]
 *   codec: h264 (default) | hevc
 * Prints "frames=N width=W height=H" on stderr at the end.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <libavcodec/avcodec.h>
#include <libavutil/log.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>

static int write_frame(const AVFrame *f, FILE *out) {
    for (int p = 0; p < 3; p++) {
        int w = p == 0 ? f->width : (f->width + 1) / 2;
        int h = p == 0 ? f->height : (f->height + 1) / 2;
        for (int y = 0; y < h; y++) {
            if (fwrite(f->data[p] + (size_t)y * f->linesize[p], 1, w, out)
                != (size_t)w)
                return -1;
        }
    }
    return 0;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s <in> <out.yuv> [h264|hevc]\n", argv[0]);
        return 2;
    }
    const char *in_path = argv[1];
    const char *out_path = argv[2];

    AVFormatContext *fmt = NULL;
    if (avformat_open_input(&fmt, in_path, NULL, NULL) < 0) {
        fprintf(stderr, "cannot open %s\n", in_path);
        return 1;
    }
    if (avformat_find_stream_info(fmt, NULL) < 0) {
        fprintf(stderr, "no stream info\n");
        return 1;
    }
    int vid = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, NULL, 0);
    if (vid < 0) {
        fprintf(stderr, "no video stream\n");
        return 1;
    }
    AVStream *st = fmt->streams[vid];
    const AVCodec *dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) {
        fprintf(stderr, "no decoder for codec id %d\n",
                st->codecpar->codec_id);
        return 1;
    }
    AVCodecContext *ctx = avcodec_alloc_context3(dec);
    if (getenv("ORACLE_DEBUG")) {
        ctx->debug = 8 | 16;   /* FF_DEBUG_MB_TYPE | FF_DEBUG_QP */
        av_log_set_level(AV_LOG_DEBUG);
    }
    avcodec_parameters_to_context(ctx, st->codecpar);
    /* strict conformance: report every spec violation loudly */
    ctx->err_recognition = AV_EF_EXPLODE | AV_EF_BITSTREAM;
    if (avcodec_open2(ctx, dec, NULL) < 0) {
        fprintf(stderr, "cannot open decoder\n");
        return 1;
    }

    FILE *out = strcmp(out_path, "-") ? fopen(out_path, "wb") : stdout;
    if (!out) {
        fprintf(stderr, "cannot open %s\n", out_path);
        return 1;
    }

    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    long nframes = 0;
    int w = 0, h = 0, rc = 0;

    while (av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index == vid) {
            if (avcodec_send_packet(ctx, pkt) < 0) {
                fprintf(stderr, "decode error (send) at frame %ld\n", nframes);
                rc = 1;
                break;
            }
            while (avcodec_receive_frame(ctx, frame) == 0) {
                w = frame->width;
                h = frame->height;
                if (write_frame(frame, out)) { rc = 1; break; }
                nframes++;
            }
        }
        av_packet_unref(pkt);
        if (rc) break;
    }
    if (!rc) {
        avcodec_send_packet(ctx, NULL); /* flush */
        while (avcodec_receive_frame(ctx, frame) == 0) {
            w = frame->width;
            h = frame->height;
            if (write_frame(frame, out)) { rc = 1; break; }
            nframes++;
        }
    }

    fprintf(stderr, "frames=%ld width=%d height=%d\n", nframes, w, h);
    if (out != stdout) fclose(out);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return rc;
}
