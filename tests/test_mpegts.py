"""MPEG-TS muxer + SRT payload packer tests."""

import numpy as np
import pytest

from ceracoder_tpu.transport.mpegts import (
    TS_PACKET,
    TsMuxer,
    TsPacker,
    _crc32_mpeg,
)


def ts_packets(data: bytes):
    assert len(data) % TS_PACKET == 0
    return [data[i:i + TS_PACKET] for i in range(0, len(data), TS_PACKET)]


def test_crc32_mpeg_known_value():
    # CRC-32/MPEG-2 of "123456789" is 0x0376E6E7 (standard check value)
    assert _crc32_mpeg(b"123456789") == 0x0376E6E7


def test_psi_structure():
    mux = TsMuxer()
    psi = mux.psi()
    pkts = ts_packets(psi)
    assert len(pkts) == 2
    pat, pmt = pkts
    assert pat[0] == 0x47 and pat[1] & 0x40  # sync + PUSI
    assert ((pat[1] & 0x1F) << 8) | pat[2] == 0  # PAT pid
    assert ((pmt[1] & 0x1F) << 8) | pmt[2] == 0x1000
    # PAT: pointer 0, table_id 0
    assert pat[4] == 0 and pat[5] == 0x00
    assert pmt[5] == 0x02  # PMT table id


def test_video_packetization_sync_and_cc():
    mux = TsMuxer()
    au = bytes(range(256)) * 8
    out = mux.mux_video(au, pts90=90000, keyframe=True)
    pkts = ts_packets(out)
    assert all(p[0] == 0x47 for p in pkts)
    vid = [p for p in pkts if ((p[1] & 0x1F) << 8) | p[2] == 0x100]
    ccs = [p[3] & 0x0F for p in vid]
    assert ccs == [(ccs[0] + i) % 16 for i in range(len(ccs))]
    assert vid[0][1] & 0x40      # PUSI on first
    assert not vid[1][1] & 0x40


def test_payload_roundtrip():
    """Extract PES payload back out of the TS packets."""
    mux = TsMuxer()
    au = np.random.default_rng(0).integers(0, 256, 5000).astype(np.uint8).tobytes()
    out = mux.mux_video(au, pts90=1234, keyframe=False)
    payload = b""
    for p in ts_packets(out):
        afc = (p[3] >> 4) & 3
        off = 4
        if afc & 2:
            off = 5 + p[4]
        if afc & 1:
            payload += p[off:]
    # strip PES header: 9 bytes fixed + header data length
    hdr_len = payload[8]
    pes_payload = payload[9 + hdr_len:]
    assert pes_payload == au
    # PTS present
    assert payload[7] & 0x80


def test_pts_encoding():
    mux = TsMuxer()
    pts = 123456789
    out = mux.mux_video(b"x" * 100, pts90=pts, keyframe=False)
    p = ts_packets(out)[0]
    off = 5 + p[4]  # adaptation (PCR) + payload
    pes = p[off:]
    hdr = pes[9:14]
    decoded = (((hdr[0] >> 1) & 7) << 30) | (hdr[1] << 22) \
        | ((hdr[2] >> 1) << 15) | (hdr[3] << 7) | (hdr[4] >> 1)
    assert decoded == pts


def test_short_au_single_packet():
    mux = TsMuxer()
    out = mux.mux_video(b"tiny", pts90=0, keyframe=False)
    assert len(out) == TS_PACKET


@pytest.mark.parametrize("sizes", [[100], [1316], [188, 188 * 6],
                                   [500, 900, 2000, 50]])
def test_packer_accumulates_1316(sizes):
    packer = TsPacker(1316)
    total = 0
    payloads = []
    for s in sizes:
        payloads += packer.feed(bytes(s))
        total += s
    assert all(len(p) == 1316 for p in payloads)
    assert len(payloads) == total // 1316
    assert packer.residue == total % 1316


def test_packer_reduced_size():
    packer = TsPacker(1128)
    out = packer.feed(bytes(1128 * 3 + 10))
    assert len(out) == 3
    assert packer.residue == 10


def test_packer_flush_pads_with_nulls():
    packer = TsPacker(1316)
    packer.feed(b"\x47" + bytes(187))
    tail = packer.flush()
    assert len(tail) == 1316
    assert tail[188] == 0x47
    assert ((tail[189] & 0x1F) << 8) | tail[190] == 0x1FFF  # null pid
    assert packer.residue == 0


def test_packer_rejects_bad_size():
    with pytest.raises(ValueError):
        TsPacker(1000)
