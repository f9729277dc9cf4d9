"""Two-process distributed encode (DCN analog, SURVEY.md §2.7 comm
backend row): spawns TWO real OS processes that form a jax.distributed
cluster (CPU backend, gloo collectives — the test stand-in for
multi-host DCN), verify a cross-process psum over the global 2x4 mesh,
split a clip's closed GOPs between the processes (GOP parallelism
across hosts, BASELINE.md configs[4]), and run per-process adaptive
rate control over independent bonded-link traces. The distributed
encode must be byte-identical to a single-process encode.

Reference analog: the reference is single-process; its "multi-node"
testing spawns an in-process SRT peer (tests/test_srt_integration.c).
The TPU framework's multi-host story is jax.distributed over DCN, so
the test spawns genuine separate processes.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
PORT = 45711
N_FRAMES = 16
GOP = 4
W, H = 96, 64

WORKER = r'''
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{{port}}", num_processes=2,
                           process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

# 1. cross-process collective over the global (host, dev) mesh: the
# DCN psum every multi-host schedule rides on
mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("host", "dev"))
f = jax.jit(jax.shard_map(
    lambda x: jax.lax.psum(x, ("host", "dev")),
    mesh=mesh, in_specs=P("host", "dev"), out_specs=P()))
x = jax.device_put(jnp.arange(8.0).reshape(2, 4),
                   NamedSharding(mesh, P("host", "dev")))
psum = float(np.asarray(jax.device_get(f(x))).reshape(-1)[0])

# 2. GOP-parallel encode: this process codes GOPs g with g mod 2 == pid
sys.path.insert(0, {repo!r})
from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
from tests.test_distributed import clip_frames

frames = clip_frames()
enc = H265DeviceEncoder({w}, {h}, qp=30, gop={gop})
blobs = {{}}
for g0 in range(0, {nf}, {gop}):
    g = g0 // {gop}
    if g % 2 != pid:
        continue
    enc.resume()                    # closed GOP: fresh chain
    pend = enc.encode_run_async(frames=frames[g0:g0 + {gop}],
                                force_idr=True)
    blobs[g] = b"".join(p.result().data for p in pend)

# 3. per-process rate control over an independent bonded-link trace
from ceracoder_tpu.control import BalancerRunner, CeracoderConfig
from ceracoder_tpu.transport.linksim import BondedLink, Modem

cfg = CeracoderConfig()
runner = BalancerRunner(cfg, "adaptive", srt_latency=2000,
                        srt_pkt_size=1316)
# process 0 keeps both modems up; process 1 drops one at t=2s
sched = [] if pid == 0 else [(2000, False)]
link = BondedLink(modems=[Modem(4e6), Modem(4e6, schedule=sched)],
                  latency_ms=2000)
bps = runner.config.max_bitrate
for t in range(0, 8000, 20):
    inp = link.tick(bps)
    out = runner.step(inp)
    bps = out.new_bitrate

for g, blob in blobs.items():
    (open(os.path.join(outdir, f"gop{{g}}.bin"), "wb")
     .write(blob))
json.dump({{"pid": pid, "psum": psum, "final_bps": bps}},
          open(os.path.join(outdir, f"meta{{pid}}.json"), "w"))
'''


def clip_frames():
    """Deterministic clip shared by workers and the single-process
    reference encode."""
    rng = np.random.default_rng(31)
    base = rng.integers(0, 200, (H, W)).astype(np.float32)
    frames = []
    for i in range(N_FRAMES):
        y = np.clip(base * 0.5 + 30 + 6 * i
                    + rng.normal(0, 5, (H, W)), 0, 255).astype(np.uint8)
        u = rng.integers(90, 160, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(90, 160, (H // 2, W // 2)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def test_two_process_gop_parallel(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=str(REPO), w=W, h=H,
                                    gop=GOP, nf=N_FRAMES))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS",
                        "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(PORT),
         str(tmp_path)],
        env=env, cwd=str(REPO), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE) for i in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    metas = [json.load(open(tmp_path / f"meta{i}.json"))
             for i in range(2)]
    # the global psum saw all 8 devices across both processes
    assert metas[0]["psum"] == 28.0 and metas[1]["psum"] == 28.0

    # per-stream control: the degraded link settled materially lower
    assert metas[1]["final_bps"] < metas[0]["final_bps"]
    assert metas[0]["final_bps"] > 4_000_000      # healthy 8 Mbps link
    assert metas[1]["final_bps"] < 4_500_000      # one 4 Mbps modem

    # distributed GOPs concatenate byte-identical to single-process
    from ceracoder_tpu.codec.h265.device import H265DeviceEncoder

    frames = clip_frames()
    ref = H265DeviceEncoder(W, H, qp=30, gop=GOP)
    want = b""
    for g0 in range(0, N_FRAMES, GOP):
        ref.resume()
        pend = ref.encode_run_async(frames=frames[g0:g0 + GOP],
                                    force_idr=True)
        want += b"".join(p.result().data for p in pend)
    got = b"".join(
        (tmp_path / f"gop{g}.bin").read_bytes()
        for g in range(N_FRAMES // GOP))
    assert got == want
