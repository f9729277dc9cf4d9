"""App orchestration — the reference's main loop rebuilt around the TPU
encoder (reference: src/ceracoder.c:446-614).

Structure per frame period:
  encode (TPU) -> TS mux -> 1316 B packing -> transport send
with a >=20 ms housekeeping tick interleaved (SRT stats -> balancer ->
bitrate -> QP), plus the reference's failure detectors: ACK timeout
(6000 ms), SIGHUP config reload, SIGALRM forced teardown.
"""

from __future__ import annotations

import signal
import socket as pysocket
import sys
import time
from dataclasses import dataclass, field
from typing import Optional

from ceracoder_tpu.app.cli import CliOptions
from ceracoder_tpu.app.jobspec import open_source, parse_jobspec
from ceracoder_tpu.app.overlay import TickLog, overlay_text
from ceracoder_tpu.app.source import pad_to_mb
from ceracoder_tpu.codec.h264.encoder import H264Encoder
from ceracoder_tpu.control import (
    BalancerInput,
    BalancerRunner,
    CeracoderConfig,
)
from ceracoder_tpu.control.config import config_load
from ceracoder_tpu.control.qp_rate import QpRateController
from ceracoder_tpu.control.types import MIN_BITRATE, ABS_MAX_BITRATE
from ceracoder_tpu.transport.mpegts import TsMuxer, TsPacker
from ceracoder_tpu.transport.srt import SrtClient, SrtError, srt_available

SRT_ACK_TIMEOUT_MS = 6000      # reference: src/ceracoder.c:47
HOUSEKEEPING_MS = 20           # reference: BITRATE_UPDATE_INT
CONNECT_RETRY_S = 0.5          # reference: src/ceracoder.c:583


def getms() -> int:
    return int(time.monotonic() * 1000)


class Transport:
    """ADDR dispatch: SRT host, `udp`, or a .ts file path."""

    def __init__(self, opts: CliOptions, latency: int):
        self.kind = "file" if (opts.addr.endswith(".ts") or opts.addr == "-") \
            else ("udp" if opts.addr == "udp" else "srt")
        self.opts = opts
        self.latency = latency
        self.srt: Optional[SrtClient] = None
        self.udp = None
        self.file = None

    def connect(self, stop_flag) -> bool:
        if self.kind == "file":
            self.file = (sys.stdout.buffer if self.opts.addr == "-"
                         else open(self.opts.addr, "wb"))
            return True
        if self.kind == "udp":
            self.udp = pysocket.socket(pysocket.AF_INET, pysocket.SOCK_DGRAM)
            self.udp.connect(("127.0.0.1", self.opts.port))
            return True
        if not srt_available():
            print("libsrt not available", file=sys.stderr)
            return False
        pkt = 1128 if self.opts.reduced_pkt_size else 1316
        # retry-forever with backoff (reference: src/ceracoder.c:554-588)
        while not stop_flag():
            client = SrtClient(latency_ms=self.latency,
                               stream_id=self.opts.stream_id,
                               payload_size=pkt)
            try:
                client.connect(self.opts.addr, self.opts.port)
                print(f"SRT connected, negotiated latency "
                      f"{client.negotiated_latency} ms", file=sys.stderr)
                self.srt = client
                return True
            except SrtError as e:
                print(f"SRT connect failed: {e}; retrying", file=sys.stderr)
                client.close()
                time.sleep(CONNECT_RETRY_S)
        return False

    def send(self, payload: bytes) -> bool:
        """False signals a fatal transport error (reference: short
        srt_send => stop, src/ceracoder.c:320-327)."""
        if self.kind == "file":
            self.file.write(payload)
            return True
        if self.kind == "udp":
            return self.udp.send(payload) == len(payload)
        try:
            return self.srt.send(payload) == len(payload)
        except SrtError:
            return False

    def stats(self):
        if self.kind == "srt" and self.srt is not None:
            return self.srt.get_stats(), self.srt.get_snd_buffer()
        return None, 0

    def close(self):
        if self.file is not None and self.file is not sys.stdout.buffer:
            self.file.close()
        if self.udp is not None:
            self.udp.close()
        if self.srt is not None:
            self.srt.close()


@dataclass
class AppState:
    quit: bool = False
    sighup: bool = False
    ticks: list = field(default_factory=list)


class CeracoderApp:
    """End-to-end live encoder app (reference: main, src/ceracoder.c)."""

    def __init__(self, opts: CliOptions, keep_ticks: bool = False,
                 max_frames: Optional[int] = None, realtime: bool = True):
        self.opts = opts
        self.keep_ticks = keep_ticks
        self.max_frames = max_frames
        self.realtime = realtime
        self.state = AppState()

        self.spec = parse_jobspec(opts.job_file)
        self.source = open_source(self.spec)

        self.cfg = CeracoderConfig()
        if opts.config_file:
            config_load(opts.config_file, self.cfg)
        # latency: CLI > config > default (reference: src/ceracoder.c:503)
        self.latency = opts.latency if opts.latency else self.cfg.srt_latency

        pkt = 1128 if opts.reduced_pkt_size else 1316
        self.runner = BalancerRunner(self.cfg, opts.balancer,
                                     srt_latency=self.latency,
                                     srt_pkt_size=pkt)
        fps = self.source.fps_num / max(1, self.source.fps_den)
        self.rate = QpRateController(fps=fps)
        self.cur_bitrate = self.runner.config.max_bitrate

        w = (self.source.width + 15) // 16 * 16
        h = (self.source.height + 15) // 16 * 16
        if self.spec.codec == "hevc":
            # device compute + native entropy (the production HEVC
            # path); the numpy H265RowEncoder is its executable spec
            from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
            self.encoder = H265DeviceEncoder(
                self.source.width, self.source.height,
                qp=self.rate.current_qp, gop=self.spec.gop_frames)
            self.video_stream_type = 0x24   # STREAM_TYPE_HEVC
        else:
            self.encoder = H264Encoder(w, h, qp=self.rate.current_qp,
                                       fps_num=self.source.fps_num,
                                       fps_den=self.source.fps_den,
                                       gop=self.spec.gop_frames)
            self.encoder.sps.width = self.source.width
            self.encoder.sps.height = self.source.height
            self.video_stream_type = 0x1B   # STREAM_TYPE_H264
        # audio branch (reference: alsasrc -> a_delay -> AAC -> mux;
        # pipeline audio chains, common.ts:55-90)
        self.audio = None
        self.audio_src = None
        if self.spec.audio_kind not in ("", "none"):
            from ceracoder_tpu.audio import (
                AudioPipeline, ToneSource, WavSource, aac_available)
            if aac_available():
                if self.spec.audio_kind == "wav":
                    self.audio_src = WavSource(self.spec.audio_path)
                else:
                    self.audio_src = ToneSource()
                # -d > 0 delays audio (a_delay), -d < 0 delays video
                # (v_delay) — reference: cb_delay wiring,
                # src/ceracoder.c:341-344,525-533
                a_extra = max(0, opts.av_delay)
                self.audio = AudioPipeline(
                    sample_rate=self.audio_src.sample_rate,
                    channels=self.audio_src.channels,
                    bitrate=self.spec.audio_bitrate * 1000,
                    delay_ms=self.spec.audio_delay_ms + a_extra)
            else:
                print("audio requested but AAC encoder unavailable; "
                      "continuing video-only", file=sys.stderr)
        self.mux = TsMuxer(video_stream_type=self.video_stream_type,
                           with_audio=self.audio is not None)
        self.packer = TsPacker(pkt_size=pkt)
        self.transport = Transport(opts, self.latency)
        self.frames_sent = 0
        self.overlay_line = ""
        # structured telemetry sink (SURVEY.md §5: structured version
        # of the overlay's per-tick controller state)
        self._stats_fh = (open(opts.stats_file, "w")
                          if getattr(opts, "stats_file", None) else None)

    # -- signal handling (reference: src/ceracoder.c:126-145,441-443)
    def _install_signals(self):
        signal.signal(signal.SIGHUP, lambda *_: self._flag_sighup())
        signal.signal(signal.SIGTERM, lambda *_: self.stop())
        signal.signal(signal.SIGINT, lambda *_: self.stop())

    def _flag_sighup(self):
        self.state.sighup = True

    def _scene_cut(self, y, threshold: int = 48) -> bool:
        """Mean absolute difference of 8x-downsampled luma between
        consecutive source frames; a jump past the threshold is a cut."""
        import numpy as np
        small = np.asarray(y)[::8, ::8].astype(np.int32)
        prev = getattr(self, "_prev_small", None)
        self._prev_small = small
        if prev is None or prev.shape != small.shape:
            return False
        return bool(np.abs(small - prev).mean() > threshold)

    def stop(self):
        if not self.state.quit:
            self.state.quit = True
            # force exit if teardown hangs (reference :129,441-443)
            signal.signal(signal.SIGALRM, lambda *_: sys.exit(0))
            signal.alarm(3)

    def _reload_config(self):
        """SIGHUP: re-read config, re-apply bounds (reference :161-186)."""
        self.state.sighup = False
        if self.opts.config_file:
            cfg = CeracoderConfig()
            try:
                config_load(self.opts.config_file, cfg)
            except OSError:
                return
            self.runner.update_bounds(cfg.min_bitrate * 1000,
                                      cfg.max_bitrate * 1000)
            print(f"Config reloaded: {cfg.min_bitrate} - "
                  f"{cfg.max_bitrate} Kbps", file=sys.stderr)
        elif self.opts.bitrate_file:
            self._read_bitrate_file()

    def _read_bitrate_file(self):
        """Legacy 2-line bitrate file (reference: src/ceracoder.c:210-235)."""
        try:
            lines = open(self.opts.bitrate_file).read().splitlines()
            br = [int(float(lines[i])) for i in range(2)]
        except (OSError, ValueError, IndexError):
            return
        if all(MIN_BITRATE <= b <= ABS_MAX_BITRATE for b in br):
            self.runner.update_bounds(br[0], br[1])

    def _housekeeping(self, now_ms: int):
        """The 20 ms control tick (reference: connection_housekeeping,
        src/ceracoder.c:266-295)."""
        stats, bs = self.transport.stats()
        if stats is None:
            return
        # ACK watchdog
        if stats.pkt_recv_ack_total != self._prev_ack_count:
            self._prev_ack_count = stats.pkt_recv_ack_total
            self._prev_ack_ts = now_ms
        if (self._prev_ack_count != 0
                and now_ms - self._prev_ack_ts > SRT_ACK_TIMEOUT_MS):
            print("The SRT connection timed out, exiting", file=sys.stderr)
            self.stop()
            return

        inp = BalancerInput(
            buffer_size=bs,
            rtt=stats.ms_rtt,
            send_rate_mbps=stats.mbps_send_rate,
            timestamp=now_ms,
            pkt_loss_total=stats.pkt_snd_loss_total,
            pkt_retrans_total=stats.pkt_retrans_total,
        )
        out = self.runner.step(inp)
        self.cur_bitrate = out.new_bitrate
        self.overlay_line = overlay_text(out)
        if self.keep_ticks or self._stats_fh:
            tick = TickLog(
                t_ms=now_ms, bitrate=out.new_bitrate,
                qp=self.rate.current_qp, throughput=out.throughput,
                rtt=out.rtt, rtt_th_min=out.rtt_th_min,
                rtt_th_max=out.rtt_th_max, bs=out.bs, bs_th1=out.bs_th1,
                bs_th2=out.bs_th2, bs_th3=out.bs_th3).as_dict()
            if self.keep_ticks:
                self.state.ticks.append(tick)
            if self._stats_fh:
                import json
                self._stats_fh.write(json.dumps(tick) + "\n")

    def run(self) -> int:
        self._install_signals()
        self._prev_ack_count = 0
        self._prev_ack_ts = getms()
        if not self.transport.connect(lambda: self.state.quit):
            return 1

        fps = self.rate.fps
        frame_period = 1.0 / fps
        next_frame = time.monotonic()
        next_hk = getms()
        next_log = 0.0
        pts = 0

        try:
            for y, u, v in self.source.frames():
                if self.state.quit:
                    break
                if self.max_frames and self.frames_sent >= self.max_frames:
                    break
                if self.state.sighup:
                    self._reload_config()

                y, u, v = pad_to_mb(y, u, v)
                qp = self.rate.current_qp
                # scene-cut detection: a cut coded as P is mostly
                # intra-fallback CUs anyway; forcing a fresh IDR costs
                # little and restarts the prediction chain (the
                # adaptive analog of x264's scenecut; the reference's
                # fixed-GOP encoders lack this)
                cut = self._scene_cut(y)
                frame = self.encoder.encode_frame(y, u, v, qp=qp,
                                                  force_idr=cut)
                au = frame.data
                if frame.keyframe:
                    au = self.encoder.headers() + au
                self.rate.update(self.cur_bitrate, len(frame.data) * 8)

                v_delay90 = max(0, -self.opts.av_delay) * 90
                ts = self.mux.mux_video(au, pts90=pts + v_delay90,
                                        keyframe=frame.keyframe)
                if self.audio is not None:
                    # one video period's worth of samples keeps A/V in
                    # lockstep; the AAC frame boundary crossing is
                    # handled by the encoder's internal FIFO
                    n = round(self.audio_src.sample_rate
                              * self.source.fps_den / self.source.fps_num)
                    for af in self.audio.feed(self.audio_src.read(n)):
                        ts += self.mux.mux_audio(af.adts, af.pts90)
                pts += int(90000 * self.source.fps_den / self.source.fps_num)
                for payload in self.packer.feed(ts):
                    if not self.transport.send(payload):
                        print("Transport send failed, exiting",
                              file=sys.stderr)
                        self.stop()
                        break
                self.frames_sent += 1

                # pace + housekeeping until the next frame deadline
                next_frame += frame_period
                while True:
                    now = getms()
                    if now >= next_hk:
                        self._housekeeping(now)
                        next_hk = now + HOUSEKEEPING_MS
                    if time.monotonic() >= next_frame or not self.realtime:
                        break
                    if self.state.quit:
                        break
                    time.sleep(min(0.005,
                                   max(0.0, next_frame - time.monotonic())))
                if time.monotonic() > next_frame + 5 * frame_period:
                    next_frame = time.monotonic()  # fell behind: resync
                if self.overlay_line and time.monotonic() >= next_log:
                    print(self.overlay_line, file=sys.stderr)
                    next_log = time.monotonic() + 1.0
        finally:
            if self.transport.kind == "file":
                tail = self.packer.flush()
                if tail:
                    self.transport.send(tail)
            self.transport.close()
        return 0


def main(argv=None) -> int:
    from ceracoder_tpu.app.cli import parse_args
    opts = parse_args(sys.argv[1:] if argv is None else argv)
    app = CeracoderApp(opts)
    return app.run()


if __name__ == "__main__":
    sys.exit(main())
