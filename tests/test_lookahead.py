"""Lookahead: scene-cut IDRs + adaptive B placement ahead of the
encoder (BASELINE config[2] "B-frames + lookahead"; VERDICT round-1
item 5). Decisions drive the real encoder and the result must
oracle-decode bit-exactly."""

import subprocess
from pathlib import Path

import numpy as np

from ceracoder_tpu.control.lookahead import Lookahead

ROOT = Path(__file__).resolve().parents[1]


def _clip(n, h=48, w=64, seed=0):
    """Smooth low-frequency pan for the first half, per-frame
    decorrelated noise for the second, hard cut at the midpoint."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64]
    base = (96 + 80 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
            ).astype(np.uint8)
    frames = []
    for i in range(n):
        if i < n // 2:
            y = base[i:i + h, 2 * i:2 * i + w]
        else:
            y = rng.integers(0, 255, (h, w)).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        frames.append((y, u, v))
    return frames


def _plans(frames, **kw):
    la = Lookahead(**kw)
    plans = []
    for f in frames:
        plans.extend(la.push(f))
    plans.extend(la.flush())
    return plans


def test_cut_detection_and_b_gating():
    n = 12
    frames = _clip(n)
    plans = _plans(frames, depth=3, bframes=1)
    assert len(plans) == n
    # the cut frame carries force_idr
    assert plans[n // 2].force_idr
    # smooth half: interior frames may be B; noisy half: none may
    smooth_b = [p.allow_b for p in plans[1:n // 2 - 1]]
    noisy_b = [p.allow_b for p in plans[n // 2:]]
    assert any(smooth_b)
    assert not any(noisy_b)


def test_no_b_when_disabled():
    plans = _plans(_clip(8), depth=3, bframes=0)
    assert not any(p.allow_b for p in plans)


def test_lookahead_driven_encode_decodes(tmp_path):
    from ceracoder_tpu.codec.h265.device import H265DeviceEncoder

    n = 12
    frames = _clip(n)
    enc = H265DeviceEncoder(64, 48, qp=30, gop=32, bframes=1)
    la = Lookahead(depth=3, bframes=1)
    coded = []            # (data, poc, kind) in coding order

    def feed(plan):
        outs = enc.push_frame(*plan.frame, force_idr=plan.force_idr,
                              allow_b=plan.allow_b)
        coded.extend((d, poc, kind) for d, poc, kind, _ in outs)

    for f in frames:
        for plan in la.push(f):
            feed(plan)
    for plan in la.flush():
        feed(plan)
    for outs in [enc.flush()]:
        coded.extend((d, poc, kind) for d, poc, kind, _ in outs)

    kinds = [k for _, _, k in coded]
    assert kinds.count("I") >= 2            # opening IDR + the cut
    assert "B" in kinds                     # smooth half used Bs
    assert "P" in kinds
    # noisy half must not code Bs: the second I starts the noise GOP
    second_i = max(i for i, k in enumerate(kinds) if k == "I")
    assert "B" not in kinds[second_i:]

    data = enc.headers() + b"".join(d for d, _, _ in coded)
    p = tmp_path / "la.265"
    p.write_bytes(data)
    out = str(p) + ".yuv"
    r = subprocess.run([str(ROOT / "tools" / "decode_oracle"), str(p),
                        out, "hevc"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert f"frames={n}" in r.stderr
