"""ctypes bindings to the native host runtime (native/src/*.cc).

The C++ library implements the host-side production path: the balancer
core (exact clone of the rate-control contract, reference:
src/core/bitrate_control.c:81-222), the MPEG-TS muxer, the SRT payload
packer (reference: new_buf_cb, src/ceracoder.c:297-339), and an SRT
client with the reference's socket tuning (src/net/srt_client.c:49-103).
The Python implementations in ceracoder_tpu.control / .transport are the
executable spec; tests/test_native.py requires exact agreement.

`load()` builds the library on first use (g++ via native/Makefile) and
returns None when a native toolchain is unavailable, so every consumer
can fall back to the Python path.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libceracoder_native.so"

_lib = None
_load_failed = False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        srcs = list((_NATIVE_DIR / "src").glob("*.cc")) + \
            list((_NATIVE_DIR / "src").glob("*.inc")) + \
            [_NATIVE_DIR / "Makefile"]
        stale = (not _LIB_PATH.exists()
                 or any(s.stat().st_mtime > _LIB_PATH.stat().st_mtime
                        for s in srcs))
        if stale:
            # serialize concurrent builders (xdist test workers)
            import fcntl
            with open(_NATIVE_DIR / ".build.lock", "w") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                subprocess.run(["make", "-C", str(_NATIVE_DIR)],
                               check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
    except (OSError, subprocess.CalledProcessError):
        _load_failed = True
        return None
    _declare(lib)
    _lib = lib
    return lib


class CConfig(ctypes.Structure):
    _fields_ = [
        ("min_bitrate", ctypes.c_int64),
        ("max_bitrate", ctypes.c_int64),
        ("srt_latency", ctypes.c_int32),
        ("srt_pkt_size", ctypes.c_int32),
        ("adaptive_incr_step", ctypes.c_int64),
        ("adaptive_decr_step", ctypes.c_int64),
        ("adaptive_incr_interval", ctypes.c_int32),
        ("adaptive_decr_interval", ctypes.c_int32),
        ("aimd_incr_step", ctypes.c_int64),
        ("aimd_decr_mult", ctypes.c_double),
        ("aimd_incr_interval", ctypes.c_int32),
        ("aimd_decr_interval", ctypes.c_int32),
    ]


class CInput(ctypes.Structure):
    _fields_ = [
        ("buffer_size", ctypes.c_int32),
        ("rtt", ctypes.c_double),
        ("send_rate_mbps", ctypes.c_double),
        ("timestamp", ctypes.c_int64),
        ("pkt_loss_total", ctypes.c_int64),
        ("pkt_retrans_total", ctypes.c_int64),
    ]


class COutput(ctypes.Structure):
    _fields_ = [
        ("new_bitrate", ctypes.c_int64),
        ("throughput", ctypes.c_double),
        ("rtt", ctypes.c_int32),
        ("rtt_th_min", ctypes.c_int32),
        ("rtt_th_max", ctypes.c_int32),
        ("bs", ctypes.c_int32),
        ("bs_th1", ctypes.c_int32),
        ("bs_th2", ctypes.c_int32),
        ("bs_th3", ctypes.c_int32),
    ]


class CLinkStats(ctypes.Structure):
    _fields_ = [
        ("msRTT", ctypes.c_double),
        ("mbpsSendRate", ctypes.c_double),
        ("pktSndLossTotal", ctypes.c_int32),
        ("pktRetransTotal", ctypes.c_int32),
        ("pktRecvACKTotal", ctypes.c_int32),
        ("msTimeStamp", ctypes.c_int64),
    ]


def _declare(lib: ctypes.CDLL) -> None:
    lib.cc_balancer_create.restype = ctypes.c_void_p
    lib.cc_balancer_create.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(CConfig)]
    lib.cc_balancer_step.restype = ctypes.c_int
    lib.cc_balancer_step.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(CInput),
                                     ctypes.POINTER(COutput)]
    lib.cc_balancer_update_bounds.argtypes = [ctypes.c_void_p,
                                              ctypes.c_int64,
                                              ctypes.c_int64]
    lib.cc_balancer_destroy.argtypes = [ctypes.c_void_p]
    lib.cc_balancer_list.restype = ctypes.c_char_p

    lib.cc_tsmux_create.restype = ctypes.c_void_p
    lib.cc_tsmux_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.cc_tsmux_create2.restype = ctypes.c_void_p
    lib.cc_tsmux_create2.argtypes = [ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int]
    if hasattr(lib, "cc_tsmux_create3"):
        lib.cc_tsmux_create3.restype = ctypes.c_void_p
        lib.cc_tsmux_create3.argtypes = [ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int]
    lib.cc_tsmux_destroy.argtypes = [ctypes.c_void_p]
    lib.cc_outbuf_create.restype = ctypes.c_void_p
    lib.cc_outbuf_destroy.argtypes = [ctypes.c_void_p]
    lib.cc_outbuf_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.cc_outbuf_data.argtypes = [ctypes.c_void_p]
    lib.cc_outbuf_size.restype = ctypes.c_int64
    lib.cc_outbuf_size.argtypes = [ctypes.c_void_p]
    lib.cc_outbuf_clear.argtypes = [ctypes.c_void_p]
    lib.cc_tsmux_psi.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.cc_tsmux_video.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_void_p]
    lib.cc_tsmux_audio.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int64, ctypes.c_uint64,
                                   ctypes.c_void_p]

    lib.cc_packer_create.restype = ctypes.c_void_p
    lib.cc_packer_create.argtypes = [ctypes.c_int]
    lib.cc_packer_destroy.argtypes = [ctypes.c_void_p]
    lib.cc_packer_feed.restype = ctypes.c_int
    lib.cc_packer_feed.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int64, ctypes.c_void_p]
    lib.cc_packer_residue.restype = ctypes.c_int
    lib.cc_packer_residue.argtypes = [ctypes.c_void_p]
    lib.cc_packer_flush.argtypes = [ctypes.c_void_p, ctypes.c_void_p]

    lib.cc_srt_available.restype = ctypes.c_int
    lib.cc_srt_init.restype = ctypes.c_int
    lib.cc_srt_set_stat_offsets.argtypes = [ctypes.c_int64] * 6
    lib.cc_srt_connect.restype = ctypes.c_void_p
    lib.cc_srt_connect.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_int]
    lib.cc_srt_negotiated_latency.restype = ctypes.c_int
    lib.cc_srt_negotiated_latency.argtypes = [ctypes.c_void_p]
    lib.cc_srt_send.restype = ctypes.c_int
    lib.cc_srt_send.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int]
    lib.cc_srt_get_stats.restype = ctypes.c_int
    lib.cc_srt_get_stats.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(CLinkStats)]
    lib.cc_srt_get_snddata.restype = ctypes.c_int
    lib.cc_srt_get_snddata.argtypes = [ctypes.c_void_p]
    lib.cc_srt_close.argtypes = [ctypes.c_void_p]

    lib.hevc_entropy_rows.restype = ctypes.c_int64
    lib.hevc_entropy_rows.argtypes = [
        ctypes.c_int, ctypes.c_int,                    # nch, ncw
        ctypes.c_int, ctypes.c_int, ctypes.c_int,      # idr, is_b, tiles
        ctypes.c_int, ctypes.c_void_p,                 # tu split en/flags
        ctypes.c_void_p,                               # sao params
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,  # hdr b/bits/stride
        ctypes.c_void_p, ctypes.c_int,                 # ctx_init, n_ctx
        ctypes.c_void_p,                               # offsets
        ctypes.c_void_p, ctypes.c_void_p,              # intra/mode
        ctypes.c_void_p, ctypes.c_void_p,              # mv, mv1
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # levels y/cb/cr
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,   # out/cap/sizes
        ctypes.c_int,                                  # n_threads
    ]

    lib.h264_cabac_rows.restype = ctypes.c_int64
    lib.h264_cabac_rows.argtypes = [
        ctypes.c_int, ctypes.c_int,                    # mbh, mbw
        ctypes.c_int, ctypes.c_int, ctypes.c_int,      # intra, idc, qp
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,  # hdr b/sz/stride
        ctypes.c_void_p, ctypes.c_void_p,              # mode_l, mode_c
        ctypes.c_void_p, ctypes.c_void_p,              # dc_luma, ac_luma
        ctypes.c_void_p, ctypes.c_void_p,              # skip, mvd
        ctypes.c_void_p,                               # luma_lv
        ctypes.c_void_p, ctypes.c_void_p,              # dc/ac chroma
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,   # out/cap/sizes
        ctypes.c_int,                                  # n_threads
    ]


def _to_cconfig(config) -> CConfig:
    c = CConfig()
    c.min_bitrate = config.min_bitrate
    c.max_bitrate = config.max_bitrate
    c.srt_latency = config.srt_latency
    c.srt_pkt_size = config.srt_pkt_size
    c.adaptive_incr_step = config.adaptive_incr_step
    c.adaptive_decr_step = config.adaptive_decr_step
    c.adaptive_incr_interval = config.adaptive_incr_interval
    c.adaptive_decr_interval = config.adaptive_decr_interval
    c.aimd_incr_step = config.aimd_incr_step
    c.aimd_decr_mult = config.aimd_decr_mult
    c.aimd_incr_interval = config.aimd_incr_interval
    c.aimd_decr_interval = config.aimd_decr_interval
    return c


class NativeBalancer:
    """Balancer-protocol adapter over the C++ core."""

    def __init__(self, name: str, config) -> None:
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.name = name
        self.description = f"native {name}"
        self._h = lib.cc_balancer_create(name.encode(),
                                         ctypes.byref(_to_cconfig(config)))
        if not self._h:
            raise ValueError(f"unknown balancer {name!r}")

    def step(self, inp):
        from ceracoder_tpu.control.types import BalancerOutput
        ci = CInput(buffer_size=inp.buffer_size, rtt=inp.rtt,
                    send_rate_mbps=inp.send_rate_mbps,
                    timestamp=inp.timestamp,
                    pkt_loss_total=inp.pkt_loss_total,
                    pkt_retrans_total=inp.pkt_retrans_total)
        co = COutput()
        self._lib.cc_balancer_step(self._h, ctypes.byref(ci),
                                   ctypes.byref(co))
        return BalancerOutput(
            new_bitrate=co.new_bitrate, throughput=co.throughput,
            rtt=co.rtt, rtt_th_min=co.rtt_th_min, rtt_th_max=co.rtt_th_max,
            bs=co.bs, bs_th1=co.bs_th1, bs_th2=co.bs_th2, bs_th3=co.bs_th3)

    def update_bounds(self, min_bitrate: int, max_bitrate: int) -> None:
        self._lib.cc_balancer_update_bounds(self._h, min_bitrate,
                                            max_bitrate)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cc_balancer_destroy(self._h)
            self._h = None


class _OutBuf:
    def __init__(self, lib):
        self._lib = lib
        self._h = lib.cc_outbuf_create()

    def take(self) -> bytes:
        n = self._lib.cc_outbuf_size(self._h)
        data = ctypes.string_at(self._lib.cc_outbuf_data(self._h), n)
        self._lib.cc_outbuf_clear(self._h)
        return data

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cc_outbuf_destroy(self._h)
            self._h = None


class NativeTsMuxer:
    """Same surface as transport.mpegts.TsMuxer, C++ implementation."""

    def __init__(self, video_stream_type: int = 0x1B,
                 with_audio: bool = False, audio_kind: str = "aac",
                 audio_channels: int = 2):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        kind = 1 if audio_kind == "opus" else 0
        if hasattr(lib, "cc_tsmux_create3"):
            self._h = lib.cc_tsmux_create3(
                video_stream_type, int(with_audio), kind,
                audio_channels)
        else:
            self._h = lib.cc_tsmux_create2(
                video_stream_type, int(with_audio), kind)
        self._out = _OutBuf(lib)

    def psi(self) -> bytes:
        self._lib.cc_tsmux_psi(self._h, self._out._h)
        return self._out.take()

    def mux_video(self, annexb: bytes, pts90: int,
                  dts90: int | None = None, keyframe: bool = False) -> bytes:
        self._lib.cc_tsmux_video(self._h, annexb, len(annexb), pts90,
                                 int(dts90 is not None), dts90 or 0,
                                 int(keyframe), self._out._h)
        return self._out.take()

    def mux_audio(self, adts: bytes, pts90: int) -> bytes:
        self._lib.cc_tsmux_audio(self._h, adts, len(adts), pts90,
                                 self._out._h)
        return self._out.take()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cc_tsmux_destroy(self._h)
            self._h = None


class NativeTsPacker:
    """Same surface as transport.mpegts.TsPacker, C++ implementation."""

    def __init__(self, pkt_size: int = 1316):
        if pkt_size % 188:
            raise ValueError("pkt_size must be a multiple of 188")
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.pkt_size = pkt_size
        self._h = lib.cc_packer_create(pkt_size)
        self._out = _OutBuf(lib)

    def feed(self, data: bytes) -> list[bytes]:
        n = self._lib.cc_packer_feed(self._h, data, len(data), self._out._h)
        blob = self._out.take()
        return [blob[i * self.pkt_size:(i + 1) * self.pkt_size]
                for i in range(n)]

    @property
    def residue(self) -> int:
        return self._lib.cc_packer_residue(self._h)

    def flush(self) -> bytes:
        self._lib.cc_packer_flush(self._h, self._out._h)
        return self._out.take()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cc_packer_destroy(self._h)
            self._h = None


class NativeSrtClient:
    """C++ SRT client mirroring transport.srt.SrtClient's surface."""

    def __init__(self) -> None:
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        if not lib.cc_srt_available():
            raise RuntimeError("libsrt unavailable")
        self._lib = lib
        lib.cc_srt_init()
        # align the stats layout with the Python ctypes declaration
        from ceracoder_tpu.transport.srt import TraceBStats
        off = TraceBStats
        lib.cc_srt_set_stat_offsets(
            getattr(off, "msTimeStamp").offset,
            getattr(off, "pktSndLossTotal").offset,
            getattr(off, "pktRetransTotal").offset,
            getattr(off, "pktRecvACKTotal").offset,
            getattr(off, "mbpsSendRate").offset,
            getattr(off, "msRTT").offset)
        self._h = None
        self.negotiated_latency = -1

    def connect(self, host: str, port: int, latency_ms: int = 2000,
                streamid: str = "") -> None:
        err = ctypes.create_string_buffer(256)
        h = self._lib.cc_srt_connect(host.encode(), port, latency_ms,
                                     streamid.encode(), err, 256)
        if not h:
            raise ConnectionError(err.value.decode() or "srt connect failed")
        self._h = h
        self.negotiated_latency = self._lib.cc_srt_negotiated_latency(h)

    def send(self, payload: bytes) -> int:
        return self._lib.cc_srt_send(self._h, payload, len(payload))

    def get_stats(self):
        s = CLinkStats()
        if self._lib.cc_srt_get_stats(self._h, ctypes.byref(s)) != 0:
            raise RuntimeError("srt_bstats failed")
        return s

    def get_snddata(self) -> int:
        return self._lib.cc_srt_get_snddata(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.cc_srt_close(self._h)
            self._h = None
