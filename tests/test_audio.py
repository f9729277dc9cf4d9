"""Audio pipeline tests: AAC encoding (native shim over libavcodec, the
same codec the reference's avenc_aac element uses), ADTS framing, PTS
accounting, and TS muxing — decoded back with the independent
libavcodec oracle (tools/decode_audio_oracle.c)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.audio import (
    AudioPipeline,
    ToneSource,
    WavSource,
    aac_available,
    _split_adts,
)
from ceracoder_tpu.transport.mpegts import STREAM_TYPE_H264, TsMuxer

pytestmark = pytest.mark.skipif(not aac_available(),
                                reason="native AAC encoder unavailable")

TOOLS = Path(__file__).resolve().parents[1] / "tools"


def _oracle():
    exe = TOOLS / "decode_audio_oracle"
    if not exe.exists():
        subprocess.run(["make", "-C", str(TOOLS), "decode_audio_oracle"],
                       check=True, capture_output=True)
    return exe


def _encode_tone(seconds=1.0, freq=440.0, rate=48000):
    src = ToneSource(sample_rate=rate, freq=freq)
    pipe = AudioPipeline(sample_rate=rate)
    frames = pipe.feed(src.read(int(rate * seconds)))
    frames += pipe.flush()
    return frames


def test_adts_structure():
    frames = _encode_tone(0.5)
    assert len(frames) >= 20            # ~23 frames of 1024 @ 48 kHz
    for f in frames:
        assert f.adts[0] == 0xFF and (f.adts[1] & 0xF0) == 0xF0
        flen = ((f.adts[3] & 3) << 11) | (f.adts[4] << 3) | (f.adts[5] >> 5)
        assert flen == len(f.adts)
    # PTS advances by frame_size in 90 kHz units (1024 * 90000 / 48000)
    assert frames[1].pts90 - frames[0].pts90 == 1024 * 90000 // 48000


def test_tone_roundtrip_through_oracle(tmp_path):
    rate, freq = 48000, 440.0
    frames = _encode_tone(1.0, freq, rate)
    aac = tmp_path / "tone.aac"
    aac.write_bytes(b"".join(f.adts for f in frames))
    pcm = tmp_path / "tone.pcm"
    r = subprocess.run([str(_oracle()), str(aac), str(pcm)],
                       capture_output=True, text=True, check=True)
    out_rate, out_ch = map(int, r.stdout.split())
    assert out_rate == rate and out_ch == 2
    data = np.fromfile(pcm, np.int16).reshape(-1, 2).astype(np.float64)
    assert data.shape[0] > rate // 2
    # dominant frequency of the decoded signal must be the tone
    x = data[rate // 4:rate // 4 + 32768, 0]
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
    peak = np.argmax(spec) * rate / x.size
    assert abs(peak - freq) < 5.0, f"peak at {peak:.1f} Hz"


def test_bitrate_in_range():
    frames = _encode_tone(2.0)
    nbytes = sum(len(f.adts) for f in frames)
    bps = nbytes * 8 / 2.0
    # 128 kbps target (reference: common.ts audio 128 kbps); generous
    # band since a pure tone is highly compressible
    assert 20_000 < bps < 200_000


def test_av_mux_with_audio(tmp_path):
    """Video + audio muxed into one TS; continuity counters valid and
    both PIDs present."""
    mux = TsMuxer(STREAM_TYPE_H264, with_audio=True)
    frames = _encode_tone(0.2)
    ts = mux.mux_video(b"\x00\x00\x00\x01\x65" + bytes(500), 0,
                       keyframe=True)
    for f in frames:
        ts += mux.mux_audio(f.adts, f.pts90)
    pk = np.frombuffer(ts, np.uint8).reshape(-1, 188)
    assert (pk[:, 0] == 0x47).all()
    pids = set(((int(a) & 0x1F) << 8) | int(b) for a, b in pk[:, 1:3])
    assert {0x0000, 0x1000, 0x0100, 0x0101} <= pids


def test_delay_offsets_pts():
    pipe = AudioPipeline(delay_ms=120)
    src = ToneSource()
    frames = pipe.feed(src.read(48000 // 4))
    assert frames[0].pts90 == 120 * 90


def test_wav_source_roundtrip(tmp_path):
    import wave
    path = tmp_path / "t.wav"
    rate = 48000
    t = np.arange(rate) / rate
    pcm = (0.25 * np.sin(2 * np.pi * 1000 * t) * 32767).astype(np.int16)
    stereo = np.repeat(pcm[:, None], 2, axis=1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(stereo.tobytes())
    src = WavSource(path)
    a = src.read(1000)
    assert a.shape == (1000, 2)
    assert abs(a[:, 0].max() - 0.25) < 0.01
    src.close()


def test_split_adts_rejects_garbage():
    with pytest.raises(ValueError):
        _split_adts(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_app_av_end_to_end(tmp_path):
    """Full app run with audio branch: TS output carries decodable
    video AND audio (both checked by independent libavcodec oracles)."""
    from ceracoder_tpu.app.cli import parse_args
    from ceracoder_tpu.app.main import CeracoderApp

    job = tmp_path / "job.ini"
    job.write_text("[source]\nkind = test\nwidth = 320\nheight = 192\n"
                   "fps = 30\n[encode]\ngop = 30\n"
                   "[audio]\nkind = tone\nbitrate = 128\n")
    out = tmp_path / "av.ts"
    opts = parse_args([str(job), str(out), "0"])
    app = CeracoderApp(opts, max_frames=20, realtime=False)
    assert app.run() == 0
    assert app.audio is not None

    video_oracle = TOOLS / "decode_oracle"
    r = subprocess.run([str(video_oracle), str(out),
                        str(tmp_path / "v.yuv")],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "frames=20" in r.stderr
    r = subprocess.run([str(_oracle()), str(out), str(tmp_path / "a.pcm")],
                       capture_output=True, text=True)
    assert r.returncode == 0
    rate, ch = map(int, r.stdout.split())
    assert rate == 48000 and ch == 2
    pcm = np.fromfile(tmp_path / "a.pcm", np.int16)
    assert pcm.size > 10000


def _opus_or_skip():
    from ceracoder_tpu.audio import AacEncoder
    try:
        return AacEncoder(codec="opus")
    except RuntimeError:
        pytest.skip("opus encoder unavailable in libavcodec")


def test_opus_tone_roundtrip_through_ts_oracle(tmp_path):
    """Opus option (reference: common.ts:71-87): tone -> Opus ->
    MPEG-TS (stream_type 0x06 + 'Opus' registration) -> libavformat
    demux + decode -> dominant frequency check."""
    from ceracoder_tpu.audio import AudioPipeline, ToneSource
    from ceracoder_tpu.transport.mpegts import TsMuxer

    _opus_or_skip()
    rate, freq = 48000, 440.0
    src = ToneSource(sample_rate=rate, freq=freq)
    pipe = AudioPipeline(sample_rate=rate, codec="opus")
    mux = TsMuxer(with_audio=True, audio_kind="opus")
    ts = mux.psi()
    frames = []
    for _ in range(50):
        frames += pipe.feed(src.read(960))
    frames += pipe.flush()
    assert len(frames) > 30
    for f in frames:
        assert f.adts[:2] == b"\x7f\xe0"       # control header
        ts += mux.mux_audio(f.adts, f.pts90)
    p = tmp_path / "tone.ts"
    p.write_bytes(ts)
    pcm = tmp_path / "tone.pcm"
    r = subprocess.run([str(_oracle()), str(p), str(pcm)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-400:]
    out_rate, out_ch = map(int, r.stdout.split())
    assert out_rate == rate and out_ch == 2
    data = np.fromfile(pcm, np.int16).reshape(-1, 2).astype(np.float64)
    x = data[rate // 4:rate // 4 + 16384, 0]
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
    peak = np.argmax(spec) * rate / x.size
    assert abs(peak - freq) < 5.0, f"peak at {peak:.1f} Hz"


def test_opus_native_mux_parity():
    """Python and C++ TS muxers must emit identical bytes for the
    Opus PMT + PES path (twin-implementation contract)."""
    from ceracoder_tpu import native
    from ceracoder_tpu.audio import AudioPipeline, ToneSource
    from ceracoder_tpu.transport.mpegts import TsMuxer

    _opus_or_skip()
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable")
    src = ToneSource()
    pipe = AudioPipeline(codec="opus")
    frames = []
    for _ in range(10):
        frames += pipe.feed(src.read(960))
    py = TsMuxer(with_audio=True, audio_kind="opus")
    cc = native.NativeTsMuxer(with_audio=True, audio_kind="opus")
    assert py.psi() == cc.psi()
    for f in frames:
        assert py.mux_audio(f.adts, f.pts90) == \
            cc.mux_audio(f.adts, f.pts90)


def test_jobspec_audio_codec_key(tmp_path):
    from ceracoder_tpu.app.jobspec import parse_jobspec

    p = tmp_path / "job"
    p.write_text("[source]\nkind = test\nwidth = 64\nheight = 48\n"
                 "fps = 30\n\n[encode]\ncodec = h264\n\n"
                 "[audio]\nkind = tone\ncodec = opus\nbitrate = 96\n")
    spec = parse_jobspec(str(p))
    assert spec.audio_codec == "opus"
    assert spec.audio_bitrate == 96


def test_app_av_end_to_end_opus(tmp_path):
    """Full app run with the Opus audio branch (reference
    common.ts:71-87): the TS carries decodable video AND Opus audio."""
    from ceracoder_tpu.app.cli import parse_args
    from ceracoder_tpu.app.main import CeracoderApp

    _opus_or_skip()
    job = tmp_path / "job.ini"
    job.write_text("[source]\nkind = test\nwidth = 320\nheight = 192\n"
                   "fps = 30\n[encode]\ngop = 30\n"
                   "[audio]\nkind = tone\ncodec = opus\nbitrate = 96\n")
    out = tmp_path / "av.ts"
    opts = parse_args([str(job), str(out), "0"])
    app = CeracoderApp(opts, max_frames=20, realtime=False)
    assert app.run() == 0
    assert app.audio is not None and app.audio.enc.codec == "opus"

    video_oracle = TOOLS / "decode_oracle"
    r = subprocess.run([str(video_oracle), str(out),
                        str(tmp_path / "v.yuv")],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "frames=20" in r.stderr
    r = subprocess.run([str(_oracle()), str(out), str(tmp_path / "a.pcm")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-300:]
    rate, ch = map(int, r.stdout.split())
    assert rate == 48000 and ch == 2
    assert np.fromfile(tmp_path / "a.pcm", np.int16).size > 10000
