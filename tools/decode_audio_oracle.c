/* Audio conformance oracle: decode an ADTS AAC file to interleaved
 * 16-bit PCM using libavcodec (the independent decoder the encoder's
 * output must satisfy — same role as decode_oracle.c for video).
 *
 * usage: decode_audio_oracle in.aac out.pcm   (prints "rate ch" to stdout)
 */
#include <stdio.h>
#include <stdlib.h>

#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s in.aac out.pcm\n", argv[0]);
        return 2;
    }
    AVFormatContext *fmt = NULL;
    if (avformat_open_input(&fmt, argv[1], NULL, NULL) < 0) {
        fprintf(stderr, "open failed\n");
        return 1;
    }
    if (avformat_find_stream_info(fmt, NULL) < 0) return 1;
    int si = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, NULL, 0);
    if (si < 0) return 1;
    AVStream *st = fmt->streams[si];
    const AVCodec *dec = avcodec_find_decoder(st->codecpar->codec_id);
    AVCodecContext *ctx = avcodec_alloc_context3(dec);
    avcodec_parameters_to_context(ctx, st->codecpar);
    if (avcodec_open2(ctx, dec, NULL) < 0) return 1;

    FILE *out = fopen(argv[2], "wb");
    if (!out) return 1;
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    int rate = 0, ch = 0;

    while (av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index != si) { av_packet_unref(pkt); continue; }
        if (avcodec_send_packet(ctx, pkt) < 0) break;
        av_packet_unref(pkt);
        while (avcodec_receive_frame(ctx, frame) == 0) {
            rate = frame->sample_rate;
            ch = frame->ch_layout.nb_channels;
            /* convert planar float (AAC default) to interleaved s16 */
            for (int i = 0; i < frame->nb_samples; i++) {
                for (int c = 0; c < ch; c++) {
                    float v;
                    if (frame->format == AV_SAMPLE_FMT_FLTP) {
                        v = ((float *)frame->data[c])[i];
                    } else if (frame->format == AV_SAMPLE_FMT_FLT) {
                        v = ((float *)frame->data[0])[i * ch + c];
                    } else if (frame->format == AV_SAMPLE_FMT_S16P) {
                        v = ((int16_t *)frame->data[c])[i] / 32768.0f;
                    } else {
                        v = ((int16_t *)frame->data[0])[i * ch + c]
                            / 32768.0f;
                    }
                    if (v > 1.0f) v = 1.0f;
                    if (v < -1.0f) v = -1.0f;
                    int16_t s = (int16_t)(v * 32767.0f);
                    fwrite(&s, 2, 1, out);
                }
            }
        }
    }
    /* drain */
    avcodec_send_packet(ctx, NULL);
    while (avcodec_receive_frame(ctx, frame) == 0) {
        rate = frame->sample_rate;
        ch = frame->ch_layout.nb_channels;
        for (int i = 0; i < frame->nb_samples; i++)
            for (int c = 0; c < ch; c++) {
                float v = frame->format == AV_SAMPLE_FMT_FLTP
                    ? ((float *)frame->data[c])[i]
                    : ((int16_t *)frame->data[0])[i * ch + c] / 32768.0f;
                if (v > 1.0f) v = 1.0f;
                if (v < -1.0f) v = -1.0f;
                int16_t s = (int16_t)(v * 32767.0f);
                fwrite(&s, 2, 1, out);
            }
    }
    printf("%d %d\n", rate, ch);
    fclose(out);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return 0;
}
