"""Fused det+cls+rec actor stage.

One actor holds all model state (exactly the reference's process shape:
``PPOCR`` owns det/cls/rec predictors, cpp/src/paddleocr.cpp:23-51) and runs
a media span end-to-end inside one batch call.  Compared to split det/rec
pools this removes the crop-tensor serialization between stages and halves
the actor-pool CPU demand — on a CPU-bound workload the split pools only add
pipelining latency, not throughput.  The split stages remain available
(cfg.fuse_ocr_stages=False) for workloads where det and rec need different
resources (e.g. rec on GPU).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from .det import DetStage
from .rec import RecStage


class OcrStage:
    def __init__(self, cfg: PipelineConfig, dict_path: str):
        from ..state.memwatch import MemoryWatchdog

        self.det = DetStage(cfg)
        self.rec = RecStage(cfg, dict_path)
        # A8 parity: RSS check after every batch, gc past cpu_mem MB
        self.watchdog = MemoryWatchdog(cfg.cpu_mem)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.rec(self.det(batch))
        self.watchdog.maybe_trim()
        return out
