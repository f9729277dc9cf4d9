"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the TPU analog of testing multi-node without a cluster)."""

import jax
import numpy as np
import pytest

from ceracoder_tpu.ops.intra import encode_frame_i16_rows
from ceracoder_tpu.parallel.mesh import encode_sharded, make_mesh


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    s, h, w = 2, 128, 64
    return (rng.integers(0, 256, (s, h, w)).astype(np.uint8),
            rng.integers(0, 256, (s, h // 2, w // 2)).astype(np.uint8),
            rng.integers(0, 256, (s, h // 2, w // 2)).astype(np.uint8))


def test_requires_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_streams,n_rows", [(2, 4), (1, 8), (2, 2), (1, 1)])
def test_sharded_matches_single_device(frames, n_streams, n_rows):
    y, u, v = frames
    mesh = make_mesh(n_streams=n_streams, n_rows=n_rows)
    fn = encode_sharded(mesh, 28, 28)
    outs, nz = fn(y, u, v)
    assert np.asarray(nz).shape == (2,)

    for s in range(2):
        ref = encode_frame_i16_rows(y[s], u[s], v[s], 28, 28)
        for k in ("dc_luma", "ac_luma", "dc_chroma", "ac_chroma"):
            assert np.array_equal(np.asarray(outs[k])[s], np.asarray(ref[k])), \
                (n_streams, n_rows, s, k)
        assert np.array_equal(np.asarray(outs["recon"][0])[s],
                              np.asarray(ref["recon"][0]))


def test_psum_counts_global_nonzeros(frames):
    y, u, v = frames
    mesh = make_mesh(n_streams=1, n_rows=4)
    _, nz = encode_sharded(mesh, 28, 28)(y, u, v)
    ref = encode_frame_i16_rows(y[0], u[0], v[0], 28, 28)
    expect = sum(int((np.asarray(ref[k]) != 0).sum())
                 for k in ("dc_luma", "ac_luma", "dc_chroma", "ac_chroma"))
    assert int(np.asarray(nz)[0]) == expect


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    jax.jit(fn).lower(*args)  # traceable
    g.dryrun_multichip(8)
