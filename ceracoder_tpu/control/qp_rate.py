"""Bitrate -> QP actuation.

The reference pushes the balancer's bitrate into the encoder element as a
GObject property and the encoder's internal CBR logic does the rest
(reference: src/gst/encoder_control.c:45-57). Our encoder's knob is
per-frame QP, so this module supplies the missing piece: a rate model
mapping target bits/frame to QP (SURVEY.md §7.3 hard part #6).

Model: R(qp) ~ R0 * 2^(-(qp - qp0) / 6) (quantizer step doubles every 6
QP). After each frame we nudge QP by the damped log2 error between
produced and target bits, with a per-frame slew limit — deliberately
simple, stateful, and clock-free so it can be trace-tested.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MIN_QP = 10
MAX_QP = 51


@dataclass
class QpRateController:
    fps: float = 30.0
    qp: float = 32.0
    min_qp: int = MIN_QP
    max_qp: int = MAX_QP
    gain: float = 2.5        # damping of the 6*log2 correction
    max_step: float = 3.0    # max QP slew per frame

    def target_bits(self, bitrate_bps: int) -> float:
        return max(1.0, bitrate_bps / self.fps)

    def update(self, bitrate_bps: int, produced_bits: int) -> int:
        """Account one encoded frame; returns the QP for the next frame."""
        target = self.target_bits(bitrate_bps)
        err = 6.0 * math.log2(max(produced_bits, 1) / target)
        step = max(-self.max_step, min(self.max_step, err / self.gain))
        self.qp = min(float(self.max_qp), max(float(self.min_qp),
                                              self.qp + step))
        return self.current_qp

    @property
    def current_qp(self) -> int:
        return int(round(self.qp))
