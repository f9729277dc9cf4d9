"""Fused-run H.264 CABAC: device compute in one lax.scan per run,
sparse-compacted syntax transfer, threaded native entropy on host.

Why this exists: the CABAC row coder must run on the host (bit-serial,
context-adaptive — native/src/h264_cabac.cc), but shipping the dense
quantized-level arrays it consumes costs ~6 MB per 1080p frame, which
caps the pipeline at a few fps over the device link no matter how fast
the entropy stage is. This module keeps the per-GOP lax.scan dispatch
of the CAVLC path (device_entropy.encode_run_packed) and replaces the
device bit-packer tail with a sparse compaction of the syntax elements
(ops/h265.compact_slots — the same three-level compaction the HEVC
encoder uses): per frame the transfer is one packed row of
  nnz | [modes] | per-MB counts | [mv] | (pos, val) level chunk
so device->host traffic scales with coded content, not frame area —
the exact architecture of the HEVC run path (codec/h265/device.py),
which sustains 60+ fps over the same link.

Per-MB 384-slot level layout (slot = pos within the MB's stream):
  I: [dc_luma 16 | ac_luma snake 16x15 | dc_chroma 2x4 | ac_chroma 2x4x15]
  P: [luma snake 16x16          | dc_chroma 2x4 | ac_chroma 2x4x15]
Luma blocks are stored in coding (snake) order so the host hands the
dense views straight to the entropy stage without reordering.

Replaces the entropy dispatch of the reference's `x264enc` CABAC
default (reference: bindings/typescript/src/pipeline/
generic-builder.ts:49-55) at streaming rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ceracoder_tpu.codec.h264.device_entropy import (
    LUMA_SNAKE,
    snake_select,
)
from ceracoder_tpu.ops.h265 import compact_slots

CHUNK = 6144              # sparse (pos, val) entries per transfer chunk


def pack_layout(n_mb: int, intra: bool, chunk: int = CHUNK) -> dict:
    """Byte offsets of each section in one frame's packed row.

    Sections are padded to 4-byte boundaries so host numpy views land
    aligned (mirrors ops/h265.run_pack_layout)."""
    def pad4(x):
        return -(-x // 4) * 4

    off = {"nnz": 0}
    o = 4
    # uint8 per MB. IDR frame: mode_l | mode_c << 2. P frame: bit0
    # is_intra (Intra_16x16 fallback MB), then mode_l << 1 | mode_c
    # << 3 for intra MBs.
    off["meta"] = o
    o += pad4(n_mb)
    off["counts"] = o             # uint16 per-MB nonzero level count
    o += pad4(2 * n_mb)
    if not intra:
        off["mv"] = o             # int16 (dy, dx) quarter-pel per MB
        o += pad4(4 * n_mb)
    off["lv0"] = o                # (pos, val) int16 interleaved
    o += 4 * chunk
    off["total"] = o
    return off


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------

def _flat384_i(outs, mbh: int, mbw: int):
    n = mbh * mbw
    ac = outs["ac_luma"].astype(jnp.int16)          # (mbh,mbw,4,4,15)
    ac_snake = snake_select(ac, LUMA_SNAKE)         # (mbh,mbw,16,15)
    return jnp.concatenate([
        outs["dc_luma"].reshape(n, 16).astype(jnp.int16),
        ac_snake.reshape(n, 240),
        outs["dc_chroma"].reshape(n, 8).astype(jnp.int16),
        outs["ac_chroma"].reshape(n, 120).astype(jnp.int16)], axis=1)


def _flat384_p(outs, mbh: int, mbw: int):
    n = mbh * mbw
    ll = outs["luma_levels"].astype(jnp.int16)      # (mbh,mbw,4,4,16)
    ll_snake = snake_select(ll, LUMA_SNAKE)         # (mbh,mbw,16,16)
    luma256 = ll_snake.reshape(n, 256)
    if "is_intra" in outs:
        # intra-in-P MBs store [dc 16 | ac snake 240] in the same 256
        # luma slots (their inter levels are zeroed by the op)
        ac = outs["ac_luma"].astype(jnp.int16)      # (mbh,mbw,4,4,15)
        ac_snake = snake_select(ac, LUMA_SNAKE)     # (mbh,mbw,16,15)
        intra256 = jnp.concatenate([
            outs["dc_luma"].reshape(n, 16).astype(jnp.int16),
            ac_snake.reshape(n, 240)], axis=1)
        m = outs["is_intra"].reshape(n, 1)
        luma256 = jnp.where(m, intra256, luma256)
    return jnp.concatenate([
        luma256,
        outs["dc_chroma"].reshape(n, 8).astype(jnp.int16),
        outs["ac_chroma"].reshape(n, 120).astype(jnp.int16)], axis=1)


def _pack_rows(meta, counts, mv, pos, val, nnz, chunk: int):
    """Fuse per-run transfer arrays into ONE uint8 buffer per frame
    (the device link charges fixed latency per transfer). All inputs
    carry a leading frame axis n; meta/mv may be None per kind."""
    n = counts.shape[0]

    def u8(a):
        return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(n, -1)

    def pad4(a):
        return jnp.pad(a, ((0, 0), (0, (-a.shape[1]) % 4)))

    parts = [u8(nnz.astype(jnp.int32).reshape(n, 1))]
    if meta is not None:
        parts.append(pad4(meta.reshape(n, -1)))
    parts.append(pad4(u8(counts.astype(jnp.uint16))))
    if mv is not None:
        parts.append(pad4(u8(mv.astype(jnp.int16).reshape(n, -1))))
    pos = pos.reshape(n, -1)
    val = val.reshape(n, -1)
    parts.append(u8(jnp.stack([pos[:, :chunk], val[:, :chunk]],
                              axis=-1)))
    packed = jnp.concatenate(parts, axis=1)
    lv_chunks = tuple(
        jnp.stack([pos[:, s:s + chunk], val[:, s:s + chunk]], axis=-1)
        for s in range(chunk, pos.shape[1], chunk))
    return packed, lv_chunks


@functools.partial(jax.jit,
                   static_argnames=("cap", "chunk", "deblock"))
def encode_idr_syntax(y, u, v, qp, qp_c, cap: int, chunk: int,
                      deblock: bool):
    """One IDR frame: intra encode + deblock + syntax compaction.

    Returns (packed (1, L) uint8, lv_chunks tuple of (1, chunk, 2)
    int16, recon plane tuple)."""
    from ceracoder_tpu.ops.deblock import deblock_frame_rows
    from ceracoder_tpu.ops.intra import encode_frame_i16_rows

    outs = encode_frame_i16_rows(y, u, v, qp, qp_c)
    recon = outs["recon"]
    mbh, mbw = outs["mode_luma"].shape
    if deblock:
        zero_nnz = jnp.zeros((mbh, mbw, 4, 4), jnp.int32)
        zero_mv = jnp.zeros((mbh, mbw, 2), jnp.int32)
        recon = deblock_frame_rows(*recon, zero_nnz, zero_mv, qp, qp_c,
                                   intra_frame=True)
    flat = _flat384_i(outs, mbh, mbw)
    pos, val, nnz = compact_slots(flat, cap)
    counts = (flat != 0).sum(1).astype(jnp.uint16)
    meta = (outs["mode_luma"].astype(jnp.uint8)
            | (outs["mode_chroma"].astype(jnp.uint8) << 2))
    packed, chunks = _pack_rows(meta[None], counts[None], None,
                                pos[None], val[None], nnz[None], chunk)
    return packed, chunks, recon


@functools.partial(jax.jit, static_argnames=("cap", "chunk", "deblock",
                                             "source_fn",
                                             "intra_in_p"))
def encode_run_syntax_p(ys, us, vs, qps, qp_cs, ref_y, ref_u, ref_v,
                        frame_idx, cap: int, chunk: int, deblock: bool,
                        source_fn=None, intra_in_p: bool = False):
    """Encode F consecutive P frames in ONE device dispatch.

    A lax.scan carries the deblocked reference; per frame the syntax
    elements are sparse-compacted for transfer. Returns (packed (F, L)
    uint8, lv_chunks tuple of (F, chunk, 2) int16, recons tuple of
    (F, ...) stacked reconstructions)."""
    from ceracoder_tpu.ops.deblock import deblock_frame_rows
    from ceracoder_tpu.ops.inter import encode_frame_p

    def step(ref, xs):
        y, u, v, qp, qp_c, fi = xs
        if source_fn is not None:
            y, u, v = source_fn(fi)
        outs = encode_frame_p(y, u, v, *ref, qp, qp_c,
                              intra_in_p=intra_in_p)
        recon = outs["recon"]
        mbh, mbw = outs["mv"].shape[:2]
        if deblock:
            nnz44 = (outs["luma_levels"] != 0).any(-1).astype(jnp.int32)
            recon = deblock_frame_rows(
                *recon, nnz44, outs["mv"], qp, qp_c,
                intra_frame=False,
                intra_mb=outs.get("is_intra"))
        flat = _flat384_p(outs, mbh, mbw)
        pos, val, nnz = compact_slots(flat, cap)
        counts = (flat != 0).sum(1).astype(jnp.uint16)
        if intra_in_p:
            meta = (outs["is_intra"].astype(jnp.uint8)
                    | (outs["mode_luma"].astype(jnp.uint8) << 1)
                    | (outs["mode_chroma"].astype(jnp.uint8) << 3))
        else:
            meta = jnp.zeros((mbh, mbw), jnp.uint8)
        out = dict(mv=outs["mv"].astype(jnp.int16), pos=pos, val=val,
                   counts=counts, nnz=nnz, recon=recon,
                   meta=meta.reshape(-1))
        return recon, out

    _, outs = jax.lax.scan(
        step, (ref_y, ref_u, ref_v),
        (ys, us, vs, qps, qp_cs, frame_idx))
    packed, chunks = _pack_rows(outs["meta"], outs["counts"],
                                outs["mv"], outs["pos"], outs["val"],
                                outs["nnz"], chunk)
    return packed, chunks, outs["recon"]


# ---------------------------------------------------------------------------
# Host side
# ---------------------------------------------------------------------------

def densify384(counts: np.ndarray, pos: np.ndarray, val: np.ndarray,
               nnz: int) -> np.ndarray:
    """Rebuild the dense (n_mb, 384) slot matrix from the sparse
    stream (MB-major, pos = slot within the MB's layout)."""
    cnt = counts.astype(np.int64)
    mb_of = np.repeat(np.arange(cnt.size), cnt)
    flat = mb_of * 384 + pos[:nnz].astype(np.int64)
    dense = np.zeros(cnt.size * 384, np.int16)
    dense[flat] = val[:nnz]
    return dense.reshape(cnt.size, 384)


def unpack_syntax(row: np.ndarray, get_chunk, f: int, mbh: int,
                  mbw: int, intra: bool, cap: int,
                  chunk: int = CHUNK):
    """Decode one frame's packed row into entropy-stage arrays.

    get_chunk(c) must return the c-th extra level chunk array
    ((F, chunk, 2) int16). Returns (nnz, arrays) — arrays is None when
    nnz overflowed cap and the frame must be redone on the host path."""
    n_mb = mbh * mbw
    lay = pack_layout(n_mb, intra, chunk)
    nnz = int(row[lay["nnz"]:lay["nnz"] + 4].view(np.int32)[0])
    if nnz > cap:
        return nnz, None
    counts = row[lay["counts"]:lay["counts"] + 2 * n_mb].view(np.uint16)
    pv0 = row[lay["lv0"]:lay["lv0"] + 4 * chunk] \
        .view(np.int16).reshape(chunk, 2)
    pos, val = pv0[:, 0], pv0[:, 1]
    nextra = max(0, -(-nnz // chunk) - 1)
    if nextra:
        ext = [np.asarray(get_chunk(c)[f]) for c in range(nextra)]
        pos = np.concatenate([pos] + [e[:, 0] for e in ext])
        val = np.concatenate([val] + [e[:, 1] for e in ext])
    dense = densify384(counts, pos, val, nnz)
    # slot layout differs per kind (see module docstring)
    if intra:
        meta = row[lay["meta"]:lay["meta"] + n_mb]
        arrays = {
            "mode_l": (meta & 3).astype(np.int32).reshape(mbh, mbw),
            "mode_c": ((meta >> 2) & 3).astype(np.int32)
            .reshape(mbh, mbw),
            "dc_luma": dense[:, :16].reshape(mbh, mbw, 16),
            "ac_luma": dense[:, 16:256].reshape(mbh, mbw, 16, 15),
            "dc_chroma": dense[:, 256:264].reshape(mbh, mbw, 2, 4),
            "ac_chroma": dense[:, 264:].reshape(mbh, mbw, 2, 4, 15),
        }
    else:
        mv = row[lay["mv"]:lay["mv"] + 4 * n_mb].view(np.int16)
        meta = row[lay["meta"]:lay["meta"] + n_mb]
        arrays = {
            "mv": mv.reshape(mbh, mbw, 2).astype(np.int64),
            "nnz_mb": counts.reshape(mbh, mbw),
            "is_intra": (meta & 1).astype(bool).reshape(mbh, mbw),
            "mode_l": ((meta >> 1) & 3).astype(np.int32)
            .reshape(mbh, mbw),
            "mode_c": ((meta >> 3) & 3).astype(np.int32)
            .reshape(mbh, mbw),
            "luma_lv": dense[:, :256].reshape(mbh, mbw, 16, 16),
            "dc_chroma": dense[:, 256:264].reshape(mbh, mbw, 2, 4),
            "ac_chroma": dense[:, 264:].reshape(mbh, mbw, 2, 4, 15),
        }
    return nnz, arrays
