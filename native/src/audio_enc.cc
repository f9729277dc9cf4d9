// Native audio encoder: PCM -> AAC-LC (ADTS framed) or Opus
// (MPEG-TS control-header framed).
//
// The reference audio chain supports AAC or Opus (reference:
// bindings/typescript/src/pipeline/common.ts:71-87, pipeline files'
// audio branches; SURVEY.md §2.6 — 128 kbps). avenc_aac IS
// libavcodec's AAC encoder, so this shim binds the same codec
// directly: libavcodec produces raw access units and we add the
// self-framing the TS muxer expects — 7-byte ADTS headers for AAC
// (stream_type 0x0F) or the Opus-in-TS control header
// (0x7F 0xE0 + base-255 size varint; stream_type 0x06 with the
// 'Opus' registration + 0x7F/0x80 extension descriptors,
// transport/mpegts.py).
//
// Built into libceracoder_native.so when libavcodec dev headers are
// present (they are on this image — tools/Makefile links the same).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
}

namespace {

struct AacEncoder {
  const AVCodec* codec = nullptr;
  AVCodecContext* ctx = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int sample_rate = 48000;
  int channels = 2;
  int frame_size = 1024;
  bool opus = false;          // Opus framing + sample-format handling
  std::vector<float> fifo;   // interleaved pending samples
  int64_t next_pts = 0;
};


int sr_index(int sample_rate) {
  // ADTS sampling_frequency_index (ISO 14496-3 Table 1.18)
  static const int rates[] = {96000, 88200, 64000, 48000, 44100, 32000,
                              24000, 22050, 16000, 12000, 11025, 8000,
                              7350};
  for (int i = 0; i < 13; ++i)
    if (rates[i] == sample_rate) return i;
  return -1;
}

void adts_header(uint8_t* h, int aac_len, int sr_idx, int channels) {
  // 7-byte ADTS header, AAC-LC (profile 1), no CRC
  const int frame_len = aac_len + 7;
  h[0] = 0xFF;
  h[1] = 0xF1;                       // MPEG-4, layer 0, no CRC
  h[2] = (1 << 6)                    // profile: AAC-LC (object type - 1)
         | (sr_idx << 2)
         | ((channels >> 2) & 1);
  h[3] = ((channels & 3) << 6) | ((frame_len >> 11) & 3);
  h[4] = (frame_len >> 3) & 0xFF;
  h[5] = ((frame_len & 7) << 5) | 0x1F;
  h[6] = 0xFC;                       // buffer fullness all-1s (VBR)
}

// Opus-in-TS access-unit prefix (control_header of the MPEG-TS
// encapsulation draft, as written by every TS muxer in the wild):
// 11-bit sync 0x3FF, no trimming/extension, then au size base-255.
void opus_au_prefix(std::vector<uint8_t>& ob, int size) {
  ob.push_back(0x7F);
  ob.push_back(0xE0);
  while (size >= 255) {
    ob.push_back(0xFF);
    size -= 255;
  }
  ob.push_back(static_cast<uint8_t>(size));
}

void append_framed(AacEncoder* e, std::vector<uint8_t>& ob, int sri) {
  if (e->opus) {
    opus_au_prefix(ob, e->pkt->size);
  } else {
    uint8_t hdr[7];
    adts_header(hdr, e->pkt->size, sri, e->channels);
    ob.insert(ob.end(), hdr, hdr + 7);
  }
  ob.insert(ob.end(), e->pkt->data, e->pkt->data + e->pkt->size);
}

}  // namespace

extern "C" {

// create an audio encoder; kind 0 = AAC-LC (ADTS framing), 1 = Opus
// (TS control-header framing). Returns NULL when the codec is absent.
void* cc_audioenc_create(int kind, int sample_rate, int channels,
                         int64_t bit_rate) {
  if (channels < 1 || channels > 2) return nullptr;
  const AVCodec* codec = nullptr;
  if (kind == 0) {
    if (sr_index(sample_rate) < 0) return nullptr;
    codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  } else {
    if (sample_rate != 48000) return nullptr;  // TS Opus is 48 kHz
    codec = avcodec_find_encoder_by_name("libopus");
    if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_OPUS);
  }
  if (!codec) return nullptr;

  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return nullptr;
  ctx->sample_rate = sample_rate;
  ctx->bit_rate = bit_rate;
  // pick a float sample format the codec supports (planar preferred
  // to match the deinterleave below; libopus offers interleaved FLT)
  ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  if (codec->sample_fmts) {
    ctx->sample_fmt = codec->sample_fmts[0];
    for (const enum AVSampleFormat* f = codec->sample_fmts;
         *f != AV_SAMPLE_FMT_NONE; ++f)
      if (*f == AV_SAMPLE_FMT_FLTP) { ctx->sample_fmt = *f; break; }
    if (ctx->sample_fmt != AV_SAMPLE_FMT_FLTP)
      for (const enum AVSampleFormat* f = codec->sample_fmts;
           *f != AV_SAMPLE_FMT_NONE; ++f)
        if (*f == AV_SAMPLE_FMT_FLT) { ctx->sample_fmt = *f; break; }
  }
  if (ctx->sample_fmt != AV_SAMPLE_FMT_FLTP &&
      ctx->sample_fmt != AV_SAMPLE_FMT_FLT) {
    avcodec_free_context(&ctx);
    return nullptr;
  }
  if (kind == 1 && codec->id == AV_CODEC_ID_OPUS &&
      std::strcmp(codec->name, "opus") == 0)
    ctx->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
  av_channel_layout_default(&ctx->ch_layout, channels);
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    return nullptr;
  }

  AacEncoder* e = new AacEncoder;
  e->codec = codec;
  e->ctx = ctx;
  e->sample_rate = sample_rate;
  e->channels = channels;
  e->opus = kind == 1;
  e->frame_size = ctx->frame_size > 0 ? ctx->frame_size
                                      : (kind == 1 ? 960 : 1024);
  e->frame = av_frame_alloc();
  e->pkt = av_packet_alloc();
  return e;
}

void* cc_aacenc_create(int sample_rate, int channels, int64_t bit_rate) {
  return cc_audioenc_create(0, sample_rate, channels, bit_rate);
}

int cc_aacenc_frame_size(void* h) {
  return h ? static_cast<AacEncoder*>(h)->frame_size : -1;
}

// Feed interleaved float PCM in [-1, 1]; append ADTS-framed AAC to the
// OutBuf (cc_outbuf_*). Returns the number of AAC frames emitted, or
// <0 on error. Samples are buffered internally until a full frame of
// frame_size per channel is available.
struct OutBufRef {                    // layout mirror of mpegts.cc OutBuf
  std::vector<uint8_t> data;
};

int cc_aacenc_encode(void* h, const float* pcm, int64_t n_samples,
                     void* out) {
  if (!h) return -1;
  AacEncoder* e = static_cast<AacEncoder*>(h);
  std::vector<uint8_t>& ob = static_cast<OutBufRef*>(out)->data;

  e->fifo.insert(e->fifo.end(), pcm,
                 pcm + static_cast<size_t>(n_samples) * e->channels);

  const int sri = sr_index(e->sample_rate);
  int emitted = 0;
  size_t need = static_cast<size_t>(e->frame_size) * e->channels;
  size_t pos = 0;
  while (e->fifo.size() - pos >= need) {
    AVFrame* f = e->frame;
    f->nb_samples = e->frame_size;
    f->format = e->ctx->sample_fmt;
    av_channel_layout_copy(&f->ch_layout, &e->ctx->ch_layout);
    if (av_frame_get_buffer(f, 0) < 0) return -2;
    if (e->ctx->sample_fmt == AV_SAMPLE_FMT_FLT) {
      std::memcpy(f->data[0], e->fifo.data() + pos,
                  need * sizeof(float));
    } else {
      // deinterleave into planar floats
      for (int c = 0; c < e->channels; ++c) {
        float* dst = reinterpret_cast<float*>(f->data[c]);
        for (int i = 0; i < e->frame_size; ++i)
          dst[i] =
              e->fifo[pos + static_cast<size_t>(i) * e->channels + c];
      }
    }
    f->pts = e->next_pts;
    e->next_pts += e->frame_size;
    pos += need;

    if (avcodec_send_frame(e->ctx, f) < 0) {
      av_frame_unref(f);
      return -3;
    }
    av_frame_unref(f);
    while (avcodec_receive_packet(e->ctx, e->pkt) == 0) {
      append_framed(e, ob, sri);
      av_packet_unref(e->pkt);
      ++emitted;
    }
  }
  e->fifo.erase(e->fifo.begin(), e->fifo.begin() + pos);
  return emitted;
}

// drain the encoder (end of stream); appends remaining ADTS frames
int cc_aacenc_flush(void* h, void* out) {
  if (!h) return -1;
  AacEncoder* e = static_cast<AacEncoder*>(h);
  std::vector<uint8_t>& ob = static_cast<OutBufRef*>(out)->data;
  const int sri = sr_index(e->sample_rate);
  avcodec_send_frame(e->ctx, nullptr);
  int emitted = 0;
  while (avcodec_receive_packet(e->ctx, e->pkt) == 0) {
    append_framed(e, ob, sri);
    av_packet_unref(e->pkt);
    ++emitted;
  }
  return emitted;
}

void cc_aacenc_destroy(void* h) {
  if (!h) return;
  AacEncoder* e = static_cast<AacEncoder*>(h);
  av_packet_free(&e->pkt);
  av_frame_free(&e->frame);
  avcodec_free_context(&e->ctx);
  delete e;
}

}  // extern "C"
