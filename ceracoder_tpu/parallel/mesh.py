"""Device mesh + sharded encode schedules.

The framework's parallelism axes (SURVEY.md §2.7):

- ``streams`` (DP analog): independent concurrent streams, embarrassingly
  parallel.
- ``rows`` (SP/TP analog): intra-frame spatial parallelism — MB-row bands
  of one frame across chips. In the slice-per-MB-row schedule the bands
  are fully independent (slice boundaries cut the prediction deps), so
  the only cross-chip communication is the ``psum`` of coded-size
  statistics feeding rate control; the single-slice wavefront schedule
  adds boundary-halo exchange (future work, reuses the same mesh).
- GOP pipelining (PP analog) is a host-level scheduler concern
  (frames are dispatched per device band), not a mesh axis here.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ceracoder_tpu.ops.intra import encode_frame_i16_rows


def make_mesh(n_streams: int = 1, n_rows: int | None = None,
              devices=None) -> Mesh:
    """Build a (streams, rows) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_rows is None:
        n_rows = devices.size // n_streams
    need = n_streams * n_rows
    if need > devices.size:
        raise ValueError(f"{n_streams}x{n_rows} mesh needs {need} devices, "
                         f"have {devices.size}")
    return Mesh(devices[:need].reshape(n_streams, n_rows),
                ("streams", "rows"))


def encode_sharded(mesh: Mesh, qp: int, qp_c: int):
    """Build a jitted multi-stream, row-sharded encode step.

    Input: y (S, H, W), u, v (S, H/2, W/2) uint8 — S streams sharded over
    the ``streams`` axis, frame rows sharded over the ``rows`` axis (H
    must split into 16-multiple bands). Returns the per-MB level arrays
    (sharded like the input) plus a globally psum'd estimate of coded
    bits per stream for rate control.
    """
    n_rows = mesh.shape["rows"]

    def shard_fn(y, u, v):
        # one (stream, row-band) shard: plain frame-core encode
        def per_stream(ys, us, vs):
            return encode_frame_i16_rows(ys, us, vs, qp, qp_c)
        outs = jax.vmap(per_stream)(y, u, v)
        recon = outs.pop("recon")
        # rate-control feed: rough coded-size proxy (nonzero levels) is
        # summed over the row axis so every chip sees the stream total
        def count_nz(a):
            return (a != 0).reshape(a.shape[0], -1).sum(axis=1)
        nz = (count_nz(outs["ac_luma"]) + count_nz(outs["dc_luma"])
              + count_nz(outs["ac_chroma"]) + count_nz(outs["dc_chroma"]))
        nz_total = jax.lax.psum(nz, "rows")
        outs["recon"] = recon
        return outs, nz_total

    spec_frame = P("streams", "rows", None)
    spec_half = P("streams", "rows", None)

    out_specs = (
        dict(
            dc_luma=P("streams", "rows"),
            ac_luma=P("streams", "rows"),
            mode_luma=P("streams", "rows"),
            dc_chroma=P("streams", "rows"),
            ac_chroma=P("streams", "rows"),
            mode_chroma=P("streams", "rows"),
            recon=(P("streams", "rows"), P("streams", "rows"),
                   P("streams", "rows")),
        ),
        P("streams"),
    )

    # check_vma=False: the scan carry inside the frame core is zero-
    # initialized (unvarying), which trips the varying-manual-axes check
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(spec_frame, spec_half, spec_half),
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)
