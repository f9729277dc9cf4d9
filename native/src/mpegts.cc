// Native MPEG-TS muxer + SRT payload packer.
//
// C++ implementation of the host egress path: 188-byte TS packetization
// (ISO 13818-1) of H.264/HEVC/AAC PES streams, and the fixed-size SRT
// payload packing buffer (reference: new_buf_cb, src/ceracoder.c:297-339,
// which accumulates appsink TS bursts into 1316-byte srt_send payloads
// with residue carry). Byte-exact against the Python muxer
// (ceracoder_tpu/transport/mpegts.py) — tests/test_native.py compares
// both outputs on the same access units.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kTsPacket = 188;
constexpr uint8_t kTsSync = 0x47;

constexpr int kPatPid = 0x0000;
constexpr int kPmtPid = 0x1000;
constexpr int kVideoPid = 0x0100;
constexpr int kAudioPid = 0x0101;

constexpr uint8_t kStreamTypeAacAdts = 0x0F;
constexpr uint8_t kStreamTypePrivate = 0x06;   // Opus-in-TS
constexpr uint8_t kPesPrivateSid = 0xBD;       // private_stream_1
constexpr uint8_t kPesVideoSid = 0xE0;
constexpr uint8_t kPesAudioSid = 0xC0;

uint32_t crc32_mpeg(const uint8_t* data, size_t len) {
  // CRC-32/MPEG-2 (poly 0x04C11DB7, init 0xFFFFFFFF, no reflection)
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i << 24;
      for (int b = 0; b < 8; ++b)
        c = (c & 0x80000000u) ? (c << 1) ^ 0x04C11DB7u : (c << 1);
      table[i] = c;
    }
    init = true;
  }
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < len; ++i)
    crc = (crc << 8) ^ table[(crc >> 24) ^ data[i]];
  return crc;
}

void psi_packet(std::vector<uint8_t>* out, int pid,
                const std::vector<uint8_t>& table, int cc) {
  size_t base = out->size();
  out->resize(base + kTsPacket, 0xFF);
  uint8_t* p = out->data() + base;
  p[0] = kTsSync;
  p[1] = 0x40 | (pid >> 8);
  p[2] = pid & 0xFF;
  p[3] = 0x10 | cc;
  p[4] = 0x00;  // pointer_field
  std::memcpy(p + 5, table.data(), table.size());
}

std::vector<uint8_t> pat_section() {
  std::vector<uint8_t> data = {0x00, 0x01, 0xC1, 0x00, 0x00, 0x00, 0x01,
                               static_cast<uint8_t>(0xE0 | (kPmtPid >> 8)),
                               kPmtPid & 0xFF};
  int length = static_cast<int>(data.size()) + 4;
  std::vector<uint8_t> sec = {0x00, static_cast<uint8_t>(0xB0 | (length >> 8)),
                              static_cast<uint8_t>(length & 0xFF)};
  sec.insert(sec.end(), data.begin(), data.end());
  uint32_t crc = crc32_mpeg(sec.data(), sec.size());
  for (int i = 3; i >= 0; --i) sec.push_back((crc >> (8 * i)) & 0xFF);
  return sec;
}

std::vector<uint8_t> pmt_section(uint8_t video_stream_type, bool with_audio,
                                 bool opus_audio, int audio_channels = 2) {
  std::vector<uint8_t> streams = {video_stream_type,
                                  static_cast<uint8_t>(0xE0 | (kVideoPid >> 8)),
                                  kVideoPid & 0xFF, 0xF0, 0x00};
  if (with_audio && opus_audio) {
    // 'Opus' registration + DVB extension descriptor (0x7F/0x80,
    // channel_config_code: 1 = mono, 2 = stereo)
    uint8_t a[] = {kStreamTypePrivate,
                   static_cast<uint8_t>(0xE0 | (kAudioPid >> 8)),
                   kAudioPid & 0xFF, 0xF0, 10,
                   0x05, 4, 'O', 'p', 'u', 's', 0x7F, 2, 0x80,
                   static_cast<uint8_t>(audio_channels)};
    streams.insert(streams.end(), a, a + sizeof(a));
  } else if (with_audio) {
    uint8_t a[] = {kStreamTypeAacAdts,
                   static_cast<uint8_t>(0xE0 | (kAudioPid >> 8)),
                   kAudioPid & 0xFF, 0xF0, 0x00};
    streams.insert(streams.end(), a, a + 5);
  }
  std::vector<uint8_t> data = {0x00, 0x01, 0xC1, 0x00, 0x00,
                               static_cast<uint8_t>(0xE0 | (kVideoPid >> 8)),
                               kVideoPid & 0xFF, 0xF0, 0x00};
  data.insert(data.end(), streams.begin(), streams.end());
  int length = static_cast<int>(data.size()) + 4;
  std::vector<uint8_t> sec = {0x02, static_cast<uint8_t>(0xB0 | (length >> 8)),
                              static_cast<uint8_t>(length & 0xFF)};
  sec.insert(sec.end(), data.begin(), data.end());
  uint32_t crc = crc32_mpeg(sec.data(), sec.size());
  for (int i = 3; i >= 0; --i) sec.push_back((crc >> (8 * i)) & 0xFF);
  return sec;
}

void ts33(std::vector<uint8_t>* out, uint64_t v, int tag) {
  v &= (1ull << 33) - 1;
  out->push_back((tag << 4) | (((v >> 30) & 7) << 1) | 1);
  out->push_back((v >> 22) & 0xFF);
  out->push_back((((v >> 15) & 0x7F) << 1) | 1);
  out->push_back((v >> 7) & 0xFF);
  out->push_back(((v & 0x7F) << 1) | 1);
}

std::vector<uint8_t> pes_header(uint8_t stream_id, uint64_t pts90,
                                const uint64_t* dts90, size_t payload_len) {
  bool has_dts = dts90 != nullptr && *dts90 != pts90;
  uint8_t flags = has_dts ? 0xC0 : 0x80;
  std::vector<uint8_t> hdata;
  ts33(&hdata, pts90, has_dts ? 3 : 2);
  if (has_dts) ts33(&hdata, *dts90, 1);
  size_t plen =
      stream_id == kPesVideoSid ? 0 : 3 + hdata.size() + payload_len;
  if (plen > 0xFFFF) plen = 0;
  std::vector<uint8_t> out = {0x00, 0x00, 0x01, stream_id,
                              static_cast<uint8_t>(plen >> 8),
                              static_cast<uint8_t>(plen & 0xFF),
                              0x80, flags,
                              static_cast<uint8_t>(hdata.size())};
  out.insert(out.end(), hdata.begin(), hdata.end());
  return out;
}

void write_pcr(uint8_t* p, uint64_t pcr90) {
  uint64_t base = pcr90 & ((1ull << 33) - 1);
  p[0] = (base >> 25) & 0xFF;
  p[1] = (base >> 17) & 0xFF;
  p[2] = (base >> 9) & 0xFF;
  p[3] = (base >> 1) & 0xFF;
  p[4] = ((base & 1) << 7) | 0x7E;
  p[5] = 0;
}

class TsMuxer {
 public:
  TsMuxer(uint8_t video_stream_type, bool with_audio,
          bool opus_audio = false, int audio_channels = 2)
      : video_stream_type_(video_stream_type), with_audio_(with_audio),
        opus_audio_(opus_audio), audio_channels_(audio_channels) {}

  void psi(std::vector<uint8_t>* out) {
    psi_packet(out, kPatPid, pat_section(), bump_cc(kPatPid, 1));
    psi_packet(out, kPmtPid,
               pmt_section(video_stream_type_, with_audio_, opus_audio_,
                           audio_channels_),
               bump_cc(kPmtPid, 1));
  }

  void mux_video(const uint8_t* annexb, size_t len, uint64_t pts90,
                 const uint64_t* dts90, bool keyframe,
                 std::vector<uint8_t>* out) {
    if (keyframe) psi(out);
    std::vector<uint8_t> pes = pes_header(kPesVideoSid, pts90, dts90, len);
    pes.insert(pes.end(), annexb, annexb + len);
    uint64_t pcr = dts90 ? *dts90 : pts90;
    packetize(kVideoPid, pes, &pcr, out);
  }

  void mux_audio(const uint8_t* adts, size_t len, uint64_t pts90,
                 std::vector<uint8_t>* out) {
    std::vector<uint8_t> pes = pes_header(
        opus_audio_ ? kPesPrivateSid : kPesAudioSid, pts90, nullptr, len);
    pes.insert(pes.end(), adts, adts + len);
    packetize(kAudioPid, pes, nullptr, out);
  }

 private:
  int bump_cc(int pid, int n) {
    int start = cc_[pid_index(pid)];
    cc_[pid_index(pid)] = (start + n) % 16;
    return start;
  }

  static int pid_index(int pid) {
    switch (pid) {
      case kPatPid: return 0;
      case kPmtPid: return 1;
      case kVideoPid: return 2;
      default: return 3;
    }
  }

  // split one PES packet into TS packets (mirrors TsMuxer._packetize)
  void packetize(int pid, const std::vector<uint8_t>& pes,
                 const uint64_t* pcr90, std::vector<uint8_t>* out) {
    size_t size = pes.size();
    int first_cap = kTsPacket - 4 - (pcr90 ? 8 : 0);
    size_t rest = size > static_cast<size_t>(first_cap)
                      ? size - first_cap : 0;
    int n_rest = static_cast<int>((rest + 183) / 184);
    int n = 1 + n_rest;
    int cc0 = bump_cc(pid, n);

    size_t base = out->size();
    out->resize(base + static_cast<size_t>(n) * kTsPacket, 0xFF);
    uint8_t* pk = out->data() + base;

    // first packet
    int head;
    size_t take0;
    {
      uint8_t* p = pk;
      p[0] = kTsSync;
      p[1] = 0x40 | (pid >> 8);
      p[2] = pid & 0xFF;
      p[3] = 0x10 | (cc0 % 16);
      if (pcr90) {
        p[3] = 0x30 | (cc0 % 16);
        p[4] = 7;
        p[5] = 0x10;
        write_pcr(p + 6, *pcr90);
        head = 12;
      } else {
        head = 4;
      }
      take0 = std::min(size, static_cast<size_t>(kTsPacket - head));
      std::memcpy(p + head, pes.data(), take0);
      if (take0 < static_cast<size_t>(kTsPacket - head)) {
        // short PES: single packet with stuffing adaptation field
        std::fill(p, p + kTsPacket, 0xFF);
        p[0] = kTsSync;
        p[1] = 0x40 | (pid >> 8);
        p[2] = pid & 0xFF;
        p[3] = 0x30 | (cc0 % 16);
        int af_len = kTsPacket - 4 - 1 - static_cast<int>(size);
        p[4] = af_len;
        if (af_len > 0) {
          p[5] = pcr90 ? 0x10 : 0x00;
          std::fill(p + 6, p + 5 + af_len, 0xFF);
        }
        if (pcr90) {
          write_pcr(p + 6, *pcr90);
          std::fill(p + 12, p + 5 + af_len, 0xFF);
        }
        std::memcpy(p + kTsPacket - size, pes.data(), size);
      }
    }

    size_t pos = take0;
    for (int i = 1; i < n; ++i) {
      uint8_t* p = pk + static_cast<size_t>(i) * kTsPacket;
      int cc = (cc0 + i) % 16;
      p[0] = kTsSync;
      p[1] = pid >> 8;
      p[2] = pid & 0xFF;
      p[3] = 0x10 | cc;
      size_t chunk = std::min(size - pos, static_cast<size_t>(184));
      if (chunk == 184) {
        std::memcpy(p + 4, pes.data() + pos, 184);
      } else {
        int af_len = 184 - static_cast<int>(chunk) - 1;
        p[3] = 0x30 | cc;
        p[4] = af_len;
        if (af_len > 0) {
          p[5] = 0x00;
          std::fill(p + 6, p + 5 + af_len, 0xFF);
        }
        std::memcpy(p + kTsPacket - chunk, pes.data() + pos, chunk);
      }
      pos += chunk;
    }
  }

  uint8_t video_stream_type_;
  bool with_audio_;
  bool opus_audio_;
  int audio_channels_;
  int cc_[4] = {0, 0, 0, 0};
};

// SRT payload packer (reference: new_buf_cb, src/ceracoder.c:297-339)
class TsPacker {
 public:
  explicit TsPacker(int pkt_size) : pkt_size_(pkt_size) {}

  // returns number of full payloads written to out (each pkt_size_)
  int feed(const uint8_t* data, size_t len, std::vector<uint8_t>* out) {
    buf_.insert(buf_.end(), data, data + len);
    int count = 0;
    size_t pos = 0;
    while (buf_.size() - pos >= static_cast<size_t>(pkt_size_)) {
      out->insert(out->end(), buf_.begin() + pos,
                  buf_.begin() + pos + pkt_size_);
      pos += pkt_size_;
      ++count;
    }
    buf_.erase(buf_.begin(), buf_.begin() + pos);
    return count;
  }

  int residue() const { return static_cast<int>(buf_.size()); }

  void flush(std::vector<uint8_t>* out) {
    if (buf_.empty()) return;
    out->insert(out->end(), buf_.begin(), buf_.end());
    int n_null = (pkt_size_ - static_cast<int>(buf_.size())) / kTsPacket;
    for (int i = 0; i < n_null; ++i) {
      uint8_t null_pkt[kTsPacket];
      std::memset(null_pkt, 0xFF, sizeof(null_pkt));
      null_pkt[0] = kTsSync;
      null_pkt[1] = 0x1F;
      null_pkt[2] = 0xFF;
      null_pkt[3] = 0x10;
      out->insert(out->end(), null_pkt, null_pkt + kTsPacket);
    }
    buf_.clear();
  }

 private:
  int pkt_size_;
  std::vector<uint8_t> buf_;
};

// growable output buffer handed across the C ABI
struct OutBuf {
  std::vector<uint8_t> data;
};

}  // namespace

extern "C" {

// ---- muxer ----
void* cc_tsmux_create(int video_stream_type, int with_audio) {
  return new TsMuxer(static_cast<uint8_t>(video_stream_type),
                     with_audio != 0);
}
// audio_kind: 0 = AAC/ADTS (0x0F), 1 = Opus (0x06 + descriptors)
void* cc_tsmux_create2(int video_stream_type, int with_audio,
                       int audio_kind) {
  return new TsMuxer(static_cast<uint8_t>(video_stream_type),
                     with_audio != 0, audio_kind == 1);
}
// + audio channel count (declared in the Opus PMT extension descriptor)
void* cc_tsmux_create3(int video_stream_type, int with_audio,
                       int audio_kind, int audio_channels) {
  return new TsMuxer(static_cast<uint8_t>(video_stream_type),
                     with_audio != 0, audio_kind == 1, audio_channels);
}
void cc_tsmux_destroy(void* h) { delete static_cast<TsMuxer*>(h); }

void* cc_outbuf_create() { return new OutBuf; }
void cc_outbuf_destroy(void* h) { delete static_cast<OutBuf*>(h); }
const uint8_t* cc_outbuf_data(void* h) {
  return static_cast<OutBuf*>(h)->data.data();
}
int64_t cc_outbuf_size(void* h) {
  return static_cast<int64_t>(static_cast<OutBuf*>(h)->data.size());
}
void cc_outbuf_clear(void* h) { static_cast<OutBuf*>(h)->data.clear(); }

void cc_tsmux_psi(void* h, void* out) {
  static_cast<TsMuxer*>(h)->psi(&static_cast<OutBuf*>(out)->data);
}

void cc_tsmux_video(void* h, const uint8_t* annexb, int64_t len,
                    uint64_t pts90, int has_dts, uint64_t dts90,
                    int keyframe, void* out) {
  static_cast<TsMuxer*>(h)->mux_video(
      annexb, static_cast<size_t>(len), pts90, has_dts ? &dts90 : nullptr,
      keyframe != 0, &static_cast<OutBuf*>(out)->data);
}

void cc_tsmux_audio(void* h, const uint8_t* adts, int64_t len,
                    uint64_t pts90, void* out) {
  static_cast<TsMuxer*>(h)->mux_audio(adts, static_cast<size_t>(len), pts90,
                                      &static_cast<OutBuf*>(out)->data);
}

// ---- packer ----
void* cc_packer_create(int pkt_size) { return new TsPacker(pkt_size); }
void cc_packer_destroy(void* h) { delete static_cast<TsPacker*>(h); }
int cc_packer_feed(void* h, const uint8_t* data, int64_t len, void* out) {
  return static_cast<TsPacker*>(h)->feed(
      data, static_cast<size_t>(len), &static_cast<OutBuf*>(out)->data);
}
int cc_packer_residue(void* h) {
  return static_cast<TsPacker*>(h)->residue();
}
void cc_packer_flush(void* h, void* out) {
  static_cast<TsPacker*>(h)->flush(&static_cast<OutBuf*>(out)->data);
}

}  // extern "C"
