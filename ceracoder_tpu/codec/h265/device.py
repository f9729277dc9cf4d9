"""HEVC device encoder: JAX compute on chip + native C++ entropy.

Per frame: the device op (ops/h265.py) produces per-CTB decision and
level arrays plus the reconstruction (which stays on device as the
next reference); the arrays transfer to host where the native CABAC
stage (native/src/hevc_entropy.cc, fallback rowslice.entropy_rows)
emits one slice per CTB row. The pipeline is async like the H.264
encoder: dispatch returns immediately, `.result()` materializes the
bitstream, so several frames stay in flight over the transfer.

Replaces the reference's external HEVC encoder elements end to end
(reference: pipeline/ *h265*, e.g. pipeline/jetson/h265_test_pattern;
SURVEY.md §2.2, §7.1-§7.2).
"""

from __future__ import annotations

import numpy as np

from ceracoder_tpu.codec.h264.encoder import EncodedFrame, PendingFrame
from ceracoder_tpu.codec.h265.rowslice import (
    entropy_rows,
    entropy_rows_native,
)
from ceracoder_tpu.codec.h265.syntax import (
    NAL_IDR_W_RADL,
    NAL_TRAIL_R,
    HevcParams,
    nal_unit,
    write_pps,
    write_sps,
    write_vps,
)

CTB = 16


class H265DeviceEncoder:
    """IDR + low-delay-P HEVC encoder, device compute + host entropy.

    The bitstream is identical to H265RowEncoder's (same arrays, same
    entropy stage); the oracle conformance carries over and is
    re-checked end to end in tests/test_h265_device.py.
    """

    def __init__(self, width: int, height: int, qp: int = 32,
                 gop: int = 60, native_entropy: bool = True,
                 deblock: bool = True):
        from ceracoder_tpu.codec.h265.intra import chroma_qp

        self.width, self.height = width, height
        self.qp = qp
        self.gop = max(1, gop)
        self.native_entropy = native_entropy
        self.deblock = deblock
        self._chroma_qp = chroma_qp
        self.params = HevcParams(width=width, height=height, qp=qp,
                                 pcm_enabled=False, deblock=deblock)
        self.pw = -(-width // CTB) * CTB
        self.ph = -(-height // CTB) * CTB
        self._ref = None              # device recon planes
        self._poc = 0

    def headers(self) -> bytes:
        p = self.params
        return write_vps(p) + write_sps(p) + write_pps(p)

    def _pad_dev(self, plane, h, w):
        import jax.numpy as jnp
        plane = jnp.asarray(plane)
        ph, pw = plane.shape
        if ph == h and pw == w:
            return plane
        return jnp.pad(plane, ((0, h - ph), (0, w - pw)), mode="edge")

    def encode_frame(self, y, u, v, qp: int | None = None,
                     force_idr: bool = False) -> EncodedFrame:
        return self.encode_frame_async(y, u, v, qp, force_idr).result()

    def encode_frame_async(self, y, u, v, qp: int | None = None,
                           force_idr: bool = False) -> PendingFrame:
        import jax.numpy as jnp

        from ceracoder_tpu.ops.h265 import (
            encode_frame_i_rows,
            encode_frame_p_rows,
        )

        qp = self.qp if qp is None else qp
        qp_c = self._chroma_qp(qp)
        idr = force_idr or self._ref is None or self._poc >= self.gop
        poc = 0 if idr else self._poc

        yj = self._pad_dev(y, self.ph, self.pw)
        uj = self._pad_dev(u, self.ph // 2, self.pw // 2)
        vj = self._pad_dev(v, self.ph // 2, self.pw // 2)

        if idr:
            outs = encode_frame_i_rows(yj, uj, vj, qp, qp_c)
            self._poc = 1
        else:
            outs = encode_frame_p_rows(yj, uj, vj, *self._ref, qp, qp_c)
            self._poc += 1
        if self.deblock:
            import jax

            from ceracoder_tpu.ops.h265 import deblock_frame_dev
            cbf_l = outs["luma_lv"].reshape(
                *outs["luma_lv"].shape[:2], -1).any(-1)
            self._ref = jax.jit(deblock_frame_dev)(
                *outs["recon"], outs["is_intra"], cbf_l, outs["mv"], qp)
        else:
            self._ref = outs["recon"]

        # compact for transfer: levels fit int16 (quantizer output of
        # 8-bit residuals is < 2^14 at any QP)
        send = {
            "is_intra": outs["is_intra"],
            "mode": outs["mode"],
            "mv": outs["mv"],
            "luma_lv": outs["luma_lv"].astype(jnp.int16),
            "cb_lv": outs["cb_lv"].astype(jnp.int16),
            "cr_lv": outs["cr_lv"].astype(jnp.int16),
        }
        for a in send.values():
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        recon_dev = self._ref          # decoder output (post-deblock)

        def finish() -> EncodedFrame:
            arrays = {k: np.asarray(a) for k, a in send.items()}
            rbsps = self._entropy(arrays, idr=idr, poc=poc, qp=qp)
            ntype = NAL_IDR_W_RADL if idr else NAL_TRAIL_R
            data = b"".join(
                nal_unit(ntype, r, long_start_code=(i == 0))
                for i, r in enumerate(rbsps))
            return EncodedFrame(data=data, keyframe=idr, qp=qp,
                                _recon_dev=recon_dev)

        return PendingFrame(finish, idr, qp)

    @property
    def recon(self):
        """Cropped reconstruction of the last encoded frame (host)."""
        if self._ref is None:
            return None
        ry, ru, rv = (np.asarray(p) for p in self._ref)
        return (ry[:self.height, :self.width],
                ru[:self.height // 2, :self.width // 2],
                rv[:self.height // 2, :self.width // 2])

    def _entropy(self, arrays, idr: bool, poc: int, qp: int):
        if self.native_entropy:
            rbsps = entropy_rows_native(self.params, arrays, qp,
                                        idr=idr, poc=poc)
            if rbsps is not None:
                return rbsps
        return entropy_rows(self.params, arrays, qp, idr=idr, poc=poc)
