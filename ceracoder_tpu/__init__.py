"""ceracoder_tpu — a TPU-native live video encoding framework.

A from-scratch reimplementation of the capability set of CERALIVE/ceracoder
(reference: /root/reference), designed TPU-first:

- ``codec/``     H.264/HEVC bitstream syntax + entropy coding (vectorized).
- ``ops/``       JAX/Pallas compute kernels: transforms, quant, intra
                 prediction, motion search.
- ``control/``   The 20 ms adaptive bitrate control core (pluggable
                 balancers: adaptive / fixed / aimd) with reference-exact
                 semantics (reference: src/core/bitrate_control.c).
- ``transport/`` MPEG-TS mux + SRT egress (reference: src/net/srt_client.c).
- ``app/``       CLI / config / orchestration (reference: src/ceracoder.c).
- ``parallel/``  Mesh / sharding: tile-row spatial parallelism, GOP
                 pipelining, multi-stream data parallelism.
"""

__version__ = "0.1.0"
