/*
 * x264_ref — baseline encoder for quality comparisons.
 *
 * Encodes raw yuv420p frames with libx264 (via libavcodec) at a target
 * bitrate or constant QP, writing an Annex-B .264 stream. Used by the
 * benchmark suite to measure "PSNR vs x264 at matched bitrate"
 * (BASELINE.md north star).
 *
 * Usage:
 *   x264_ref <in.yuv> <W> <H> <fps> <out.264> [preset] [bitrate_bps|qp:N]
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>

int main(int argc, char **argv) {
    if (argc < 6) {
        fprintf(stderr,
                "usage: %s <in.yuv> <W> <H> <fps> <out.264> [preset] "
                "[bitrate_bps|qp:N]\n", argv[0]);
        return 2;
    }
    const char *in_path = argv[1];
    int w = atoi(argv[2]);
    int h = atoi(argv[3]);
    int fps = atoi(argv[4]);
    const char *out_path = argv[5];
    const char *preset = argc > 6 ? argv[6] : "medium";
    const char *rate = argc > 7 ? argv[7] : "qp:26";
    const char *params = argc > 8 ? argv[8] : NULL;

    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) {
        fprintf(stderr, "libx264 encoder not available\n");
        return 3;
    }
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    ctx->width = w;
    ctx->height = h;
    ctx->time_base = (AVRational){1, fps};
    ctx->framerate = (AVRational){fps, 1};
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->gop_size = 2 * fps;        /* reference GOP policy: 2 s */
    ctx->max_b_frames = 0;          /* low-latency live profile */
    av_opt_set(ctx->priv_data, "preset", preset, 0);
    av_opt_set(ctx->priv_data, "tune", "zerolatency", 0);
    if (params)
        av_opt_set(ctx->priv_data, "x264-params", params, 0);
    if (!strncmp(rate, "qp:", 3)) {
        av_opt_set(ctx->priv_data, "qp", rate + 3, 0);
    } else {
        ctx->bit_rate = atoll(rate);
        ctx->rc_max_rate = ctx->bit_rate;
        ctx->rc_buffer_size = ctx->bit_rate; /* ~1 s vbv, live-ish */
    }
    if (avcodec_open2(ctx, codec, NULL) < 0) {
        fprintf(stderr, "cannot open libx264\n");
        return 3;
    }

    FILE *in = fopen(in_path, "rb");
    FILE *out = fopen(out_path, "wb");
    if (!in || !out) {
        fprintf(stderr, "cannot open files\n");
        return 1;
    }

    AVFrame *frame = av_frame_alloc();
    frame->format = ctx->pix_fmt;
    frame->width = w;
    frame->height = h;
    av_frame_get_buffer(frame, 0);
    AVPacket *pkt = av_packet_alloc();
    size_t fsz = (size_t)w * h * 3 / 2;
    uint8_t *buf = malloc(fsz);
    long n = 0;

    while (fread(buf, 1, fsz, in) == fsz) {
        av_frame_make_writable(frame);
        for (int y = 0; y < h; y++)
            memcpy(frame->data[0] + (size_t)y * frame->linesize[0],
                   buf + (size_t)y * w, w);
        for (int y = 0; y < h / 2; y++) {
            memcpy(frame->data[1] + (size_t)y * frame->linesize[1],
                   buf + (size_t)w * h + (size_t)y * w / 2, w / 2);
            memcpy(frame->data[2] + (size_t)y * frame->linesize[2],
                   buf + (size_t)w * h * 5 / 4 + (size_t)y * w / 2, w / 2);
        }
        frame->pts = n++;
        avcodec_send_frame(ctx, frame);
        while (avcodec_receive_packet(ctx, pkt) == 0) {
            fwrite(pkt->data, 1, pkt->size, out);
            av_packet_unref(pkt);
        }
    }
    avcodec_send_frame(ctx, NULL);
    while (avcodec_receive_packet(ctx, pkt) == 0) {
        fwrite(pkt->data, 1, pkt->size, out);
        av_packet_unref(pkt);
    }
    fprintf(stderr, "frames=%ld\n", n);
    fclose(in);
    fclose(out);
    return 0;
}
