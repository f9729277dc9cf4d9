// Native SRT client for the egress daemon.
//
// Mirrors the reference's 6-call client surface (reference:
// src/net/srt_client.h:45-84 — init/connect/send/get_stats/get_sockopt/
// close/cleanup) and its socket tuning (reference:
// src/net/srt_client.c:49-103: SRTO_MAXBW=0, SRTO_OHEADBW=20,
// SRTO_LATENCY, SRTO_STREAMID, SRTO_RETRANSMITALGO=1, negotiated-latency
// readback via SRTO_PEERLATENCY, getaddrinfo multi-address connect).
//
// The system libsrt ships without dev headers or a plain .so symlink, so
// the needed ABI surface (v1.5) is declared here and the library is
// dlopen'd at runtime — same approach as the Python ctypes wrapper
// (ceracoder_tpu/transport/srt.py), which empirically validates the
// declared layout over a loopback link in tests/test_srt.py.

#include <dlfcn.h>
#include <netdb.h>
#include <sys/socket.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

constexpr int kSrtError = -1;
constexpr int kSrtInvalidSock = -1;

// SRT_SOCKOPT ids (srt.h, v1.5 ABI)
enum {
  SRTO_SNDSYN = 1,
  SRTO_MAXBW = 16,
  SRTO_SNDDATA = 19,
  SRTO_LATENCY = 23,
  SRTO_OHEADBW = 25,
  SRTO_PEERLATENCY = 44,
  SRTO_STREAMID = 46,
  SRTO_RETRANSMITALGO = 61,
};

// SRT overhead bandwidth %, as in the reference (src/net/srt_client.h:34)
constexpr int kSrtMaxOhead = 20;

// the stats fields the control loop consumes (reference:
// src/ceracoder.c:241-252). SRT_TRACEBSTATS is much larger; we read it
// into a raw buffer and pick fields by offset from the declared layout.
struct LinkStats {
  double msRTT;
  double mbpsSendRate;
  int32_t pktSndLossTotal;
  int32_t pktRetransTotal;
  int32_t pktRecvACKTotal;
  int64_t msTimeStamp;
};

using srt_startup_t = int (*)();
using srt_cleanup_t = int (*)();
using srt_create_socket_t = int (*)();
using srt_connect_t = int (*)(int, const sockaddr*, int);
using srt_send_t = int (*)(int, const char*, int);
using srt_close_t = int (*)(int);
using srt_setsockflag_t = int (*)(int, int, const void*, int);
using srt_getsockflag_t = int (*)(int, int, void*, int*);
using srt_bstats_t = int (*)(int, void*, int);
using srt_getversion_t = uint32_t (*)();
using srt_getlasterror_str_t = const char* (*)();
using srt_getrejectreason_t = int (*)(int);
using srt_rejectreason_str_t = const char* (*)(int);

struct SrtApi {
  void* dl = nullptr;
  srt_startup_t startup = nullptr;
  srt_cleanup_t cleanup = nullptr;
  srt_create_socket_t create_socket = nullptr;
  srt_connect_t connect = nullptr;
  srt_send_t send = nullptr;
  srt_close_t close = nullptr;
  srt_setsockflag_t setsockflag = nullptr;
  srt_getsockflag_t getsockflag = nullptr;
  srt_bstats_t bstats = nullptr;
  srt_getversion_t getversion = nullptr;
  srt_getlasterror_str_t lasterror_str = nullptr;
  srt_getrejectreason_t getrejectreason = nullptr;
  srt_rejectreason_str_t rejectreason_str = nullptr;
};

SrtApi g_api;

bool load_api() {
  if (g_api.dl) return true;
  const char* names[] = {"libsrt.so", "libsrt-gnutls.so.1.5",
                         "libsrt-openssl.so.1.5", "libsrt.so.1.5"};
  for (const char* n : names) {
    g_api.dl = dlopen(n, RTLD_NOW | RTLD_GLOBAL);
    if (g_api.dl) break;
  }
  if (!g_api.dl) return false;
  auto sym = [&](const char* s) { return dlsym(g_api.dl, s); };
  g_api.startup = reinterpret_cast<srt_startup_t>(sym("srt_startup"));
  g_api.cleanup = reinterpret_cast<srt_cleanup_t>(sym("srt_cleanup"));
  g_api.create_socket =
      reinterpret_cast<srt_create_socket_t>(sym("srt_create_socket"));
  g_api.connect = reinterpret_cast<srt_connect_t>(sym("srt_connect"));
  g_api.send = reinterpret_cast<srt_send_t>(sym("srt_send"));
  g_api.close = reinterpret_cast<srt_close_t>(sym("srt_close"));
  g_api.setsockflag =
      reinterpret_cast<srt_setsockflag_t>(sym("srt_setsockflag"));
  g_api.getsockflag =
      reinterpret_cast<srt_getsockflag_t>(sym("srt_getsockflag"));
  g_api.bstats = reinterpret_cast<srt_bstats_t>(sym("srt_bstats"));
  g_api.lasterror_str =
      reinterpret_cast<srt_getlasterror_str_t>(sym("srt_getlasterror_str"));
  g_api.getrejectreason =
      reinterpret_cast<srt_getrejectreason_t>(sym("srt_getrejectreason"));
  g_api.rejectreason_str =
      reinterpret_cast<srt_rejectreason_str_t>(sym("srt_rejectreason_str"));
  g_api.getversion =
      reinterpret_cast<srt_getversion_t>(sym("srt_getversion"));
  return g_api.startup && g_api.create_socket && g_api.connect &&
         g_api.send && g_api.close && g_api.setsockflag &&
         g_api.getsockflag && g_api.bstats;
}

// SRT_TRACEBSTATS field offsets. Defaults cover the v1.5 layout; the
// Python wrapper overrides them from its ctypes TraceBStats declaration
// (ceracoder_tpu/transport/srt.py) via cc_srt_set_stat_offsets so both
// language bindings always read the same bytes.
struct StatOffsets {
  size_t msTimeStamp = 0;
  size_t pktSndLossTotal = 24;
  size_t pktRetransTotal = 32;
  size_t pktRecvACKTotal = 40;
  size_t mbpsSendRate = 160;
  size_t msRTT = 288;
};

StatOffsets g_off;

struct Client {
  int sock = kSrtInvalidSock;
  int negotiated_latency = 0;
};

}  // namespace

extern "C" {

int cc_srt_available() { return load_api() ? 1 : 0; }

void cc_srt_set_stat_offsets(int64_t ts, int64_t loss, int64_t retrans,
                             int64_t ack, int64_t sendrate, int64_t rtt) {
  g_off.msTimeStamp = static_cast<size_t>(ts);
  g_off.pktSndLossTotal = static_cast<size_t>(loss);
  g_off.pktRetransTotal = static_cast<size_t>(retrans);
  g_off.pktRecvACKTotal = static_cast<size_t>(ack);
  g_off.mbpsSendRate = static_cast<size_t>(sendrate);
  g_off.msRTT = static_cast<size_t>(rtt);
}

int cc_srt_init() {
  if (!load_api()) return -1;
  return g_api.startup();
}

void cc_srt_cleanup() {
  if (g_api.cleanup) g_api.cleanup();
}

// Connect with the reference's socket tuning; returns a handle via *out.
// latency_ms < 0 skips the option (use SRT defaults).
void* cc_srt_connect(const char* host, int port, int latency_ms,
                     const char* streamid, char* err, int errcap) {
  auto fail = [&](const char* msg) -> void* {
    if (err && errcap > 0) {
      std::snprintf(err, errcap, "%s", msg);
    }
    return nullptr;
  };
  if (!load_api()) return fail("libsrt not available");
  // ABI guard: the sockopt ids + SRT_TRACEBSTATS layout below are
  // hand-declared (no dev headers); refuse untested libsrt series
  // instead of reading silently skewed stats
  if (g_api.getversion) {
    uint32_t v = g_api.getversion();
    int major = (v >> 16) & 0xFF, minor = (v >> 8) & 0xFF;
    if (!(major == 1 && minor >= 3 && minor <= 5)) {
      return fail("libsrt ABI series untested (revalidate sockopts + "
                  "SRT_TRACEBSTATS layout in srt_client.cc)");
    }
  }

  int sock = g_api.create_socket();
  if (sock == kSrtInvalidSock) return fail("srt_create_socket failed");

  // socket tuning (reference: src/net/srt_client.c:49-86)
  int64_t maxbw = 0;
  g_api.setsockflag(sock, SRTO_MAXBW, &maxbw, sizeof(maxbw));
  int ohead = kSrtMaxOhead;
  g_api.setsockflag(sock, SRTO_OHEADBW, &ohead, sizeof(ohead));
  if (latency_ms >= 0) {
    g_api.setsockflag(sock, SRTO_LATENCY, &latency_ms, sizeof(latency_ms));
  }
  if (streamid && streamid[0]) {
    g_api.setsockflag(sock, SRTO_STREAMID, streamid,
                      static_cast<int>(std::strlen(streamid)));
  }
  int retrans = 1;
  g_api.setsockflag(sock, SRTO_RETRANSMITALGO, &retrans, sizeof(retrans));

  // getaddrinfo multi-address connect (reference: srt_client.c:88-103)
  char portstr[16];
  std::snprintf(portstr, sizeof(portstr), "%d", port);
  addrinfo hints{};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_DGRAM;
  addrinfo* res = nullptr;
  if (getaddrinfo(host, portstr, &hints, &res) != 0 || !res) {
    g_api.close(sock);
    return fail("getaddrinfo failed");
  }
  int rc = kSrtError;
  for (addrinfo* ai = res; ai; ai = ai->ai_next) {
    rc = g_api.connect(sock, ai->ai_addr,
                       static_cast<int>(ai->ai_addrlen));
    if (rc != kSrtError) break;
  }
  freeaddrinfo(res);
  if (rc == kSrtError) {
    std::string msg = "srt_connect failed";
    if (g_api.getrejectreason && g_api.rejectreason_str) {
      int reason = g_api.getrejectreason(sock);
      const char* rs = g_api.rejectreason_str(reason);
      if (rs) msg = std::string("srt_connect rejected: ") + rs;
    } else if (g_api.lasterror_str) {
      msg = std::string("srt_connect failed: ") + g_api.lasterror_str();
    }
    g_api.close(sock);
    return fail(msg.c_str());
  }

  Client* c = new Client;
  c->sock = sock;
  // negotiated-latency readback (reference: srt_client.c:99-100)
  int lat = 0, latlen = sizeof(lat);
  if (g_api.getsockflag(sock, SRTO_PEERLATENCY, &lat, &latlen) != kSrtError)
    c->negotiated_latency = lat;
  return c;
}

int cc_srt_negotiated_latency(void* h) {
  return h ? static_cast<Client*>(h)->negotiated_latency : -1;
}

// returns bytes sent, or -1 (reference: srt_client.c:115-117)
int cc_srt_send(void* h, const uint8_t* data, int len) {
  if (!h) return -1;
  return g_api.send(static_cast<Client*>(h)->sock,
                    reinterpret_cast<const char*>(data), len);
}

// stats poll feeding the balancer (reference: src/ceracoder.c:241-252)
int cc_srt_get_stats(void* h, LinkStats* out) {
  if (!h) return -1;
  unsigned char raw[1024] = {0};
  if (g_api.bstats(static_cast<Client*>(h)->sock, raw, 1) == kSrtError)
    return -1;
  std::memcpy(&out->msTimeStamp, raw + g_off.msTimeStamp, 8);
  std::memcpy(&out->pktSndLossTotal, raw + g_off.pktSndLossTotal, 4);
  std::memcpy(&out->pktRetransTotal, raw + g_off.pktRetransTotal, 4);
  std::memcpy(&out->pktRecvACKTotal, raw + g_off.pktRecvACKTotal, 4);
  std::memcpy(&out->mbpsSendRate, raw + g_off.mbpsSendRate, 8);
  std::memcpy(&out->msRTT, raw + g_off.msRTT, 8);
  return 0;
}

// send-buffer occupancy in packets (reference: src/ceracoder.c:241,
// SRTO_SNDDATA sockopt read via srt_client_get_sockopt)
int cc_srt_get_snddata(void* h) {
  if (!h) return -1;
  int v = 0, len = sizeof(v);
  if (g_api.getsockflag(static_cast<Client*>(h)->sock, SRTO_SNDDATA, &v,
                        &len) == kSrtError)
    return -1;
  return v;
}

void cc_srt_close(void* h) {
  if (!h) return;
  Client* c = static_cast<Client*>(h);
  if (c->sock != kSrtInvalidSock) g_api.close(c->sock);
  delete c;
}

}  // extern "C"
