"""HTTP serving front-end for the vocoder (stdlib-only, no web framework).

Package layout (split from a single serving.py in round 4; the public
import surface is unchanged — everything below re-exports here):

  common.py   — SAMPLE_RATE, error types, the _armed generator wrapper
  batcher.py  — _Batcher: leader-follower dynamic batching for /synthesize
  mux.py      — StreamMultiplexer: lane-batched /stream engine
  service.py  — VocoderService: model + compiled callables + request logic
  httpd.py    — _Handler + make_server: the threaded stdlib HTTP layer
  aio.py      — AsyncVocoderServer: the selector-based (asyncio) HTTP
                front-end — one event-loop thread serves every /stream
                connection straight from the mux pump (round 5; the
                many-stream default, docs/DESIGN.md "Serving host
                ceiling")
  cli.py      — `msnv-serve` / `python -m msnv_tpu.serving` entry point

See service.py's module docstring for the endpoint contract and the
TPU-serving design notes (bucketed compiles, streaming pushes, the lane
multiplexer).
"""

from msnv_tpu.serving.aio import AsyncVocoderServer, make_async_server
from msnv_tpu.serving.batcher import _Batcher
from msnv_tpu.serving.cli import main
from msnv_tpu.serving.common import SAMPLE_RATE, Overloaded, _TooLarge
from msnv_tpu.serving.httpd import make_server
from msnv_tpu.serving.mux import StreamMultiplexer
from msnv_tpu.serving.service import VocoderService

__all__ = [
    "SAMPLE_RATE",
    "AsyncVocoderServer",
    "Overloaded",
    "StreamMultiplexer",
    "VocoderService",
    "main",
    "make_async_server",
    "make_server",
]
