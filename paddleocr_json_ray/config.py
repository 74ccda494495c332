"""Pipeline configuration.

Mirrors the reference's gflags surface (``cpp/src/args.cpp:22-83``) with the
same names and defaults, plus the Ray-side execution knobs the reference has
no equivalent for (actor-pool sizing, batch sizes, shuffle partitioning).
Config-file semantics (`key=value`, CLI wins — ``cpp/src/args.cpp:109-163``)
are reproduced by :meth:`PipelineConfig.merge_defaults`.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields, replace
from typing import Any


@dataclass(frozen=True)
class PipelineConfig:
    # ---- OCR flags, names/defaults per cpp/src/args.cpp:22-83 ----
    det: bool = True
    cls: bool = False
    rec: bool = True
    use_angle_cls: bool = False
    limit_side_len: int = 960           # det resize cap (args.cpp:45)
    det_db_thresh: float = 0.3
    det_db_box_thresh: float = 0.6
    det_db_unclip_ratio: float = 1.5
    det_db_score_mode: str = "slow"
    use_dilation: bool = False
    cls_thresh: float = 0.9
    cls_batch_num: int = 1
    rec_batch_num: int = 6
    rec_img_h: int = 48
    rec_img_w: int = 320
    cpu_threads: int = 10
    cpu_mem: int = 2000                 # MB watchdog (unused: Ray spills instead)
    ensure_ascii: bool = True           # \uXXXX escape in JSON output mode
    models_path: str = ""               # real-model backend dir (optional)
    rec_char_dict_path: str = ""        # overrides corpus dict when set
    # structure mode ships DISABLED, matching the reference CLI's rejection
    # of -type=structure (cpp/src/main.cpp:126-130); flip to run the
    # pixel-backed layout/table flow (stages/structure.py)
    structure_enabled: bool = False

    # ---- extraction layer ----
    parser: str = "multi_para"          # tbpu parser key (api/python/tbpu/__init__.py:14-29)

    # ---- Ray execution knobs (no reference equivalent) ----
    backend: str = "pixel"              # 'pixel' (raster-driven stand-in) | 'paddle' (stub, no model libs here)
    fuse_ocr_stages: bool = True        # one actor holds det+cls+rec (reference process shape)
    # 'auto': zero-shuffle block-local assembly (valid for the interleaved
    # one-row-per-doc input, whose spans stay block-contiguous end to end);
    # 'shuffle': general groupby(doc_id) + sort-within-group re-assembly for
    # inputs with scattered spans.  Both paths are equality-tested.
    assemble_mode: str = "auto"
    det_concurrency: int = 0            # actor-pool size for det (0 = auto: cluster CPUs)
    rec_concurrency: int = 0            # actor-pool size for cls+rec (0 = auto)
    det_batch_size: int = 16            # media spans per det batch (images are heavy)
    rec_batch_size: int = 32            # spans per rec batch (crops flattened inside)
    # doc rows per explode/normalizer batch.  NOTE: this also sets the fused
    # upstream operator's task granularity (Ray bundles input rows per task
    # to the largest fused batch_size) — keep it small enough that
    # concurrency x batch covers the pool, or the actor pool starves.
    text_batch_size: int = 64
    num_cpus_per_actor: float = 1.0
    explode_override_num_blocks: int | None = None  # repartition after read, if set

    def merge_defaults(self, file_values: dict[str, Any]) -> "PipelineConfig":
        """Config-file semantics: a file value only applies where this config
        still holds the dataclass default (CLI/constructor wins), matching
        SET_FLAG_IF_DEFAULT (cpp/src/args.cpp:109-163)."""
        def coerce(default, raw):
            if isinstance(default, bool):  # bool("false") is True — parse properly
                return str(raw).strip().lower() in ("1", "true", "yes", "on")
            if default is None:
                return raw
            return type(default)(raw)

        updates = {}
        for f in fields(self):
            if f.name in file_values and getattr(self, f.name) == f.default:
                updates[f.name] = coerce(f.default, file_values[f.name])
        return replace(self, **updates) if updates else self

    def validated(self) -> "PipelineConfig":
        """Fail-fast validation before launching a job (check_flags parity,
        cpp/src/args.cpp:166-235)."""
        from .functions.layout import PARSERS

        if self.parser not in PARSERS:
            raise ValueError(f"unknown parser {self.parser!r}; choose from {sorted(PARSERS)}")
        if self.det_db_score_mode not in ("slow", "fast"):
            raise ValueError("det_db_score_mode must be 'slow' or 'fast'")
        if self.backend not in ("pixel", "onnx", "paddle"):
            raise ValueError("backend must be 'pixel', 'onnx' or 'paddle'")
        if self.assemble_mode not in ("auto", "shuffle"):
            raise ValueError("assemble_mode must be 'auto' or 'shuffle'")
        if not self.det and not self.rec:
            raise ValueError("at least one of det/rec must be enabled")
        return self


def read_config_file(path: str) -> dict[str, str]:
    """Parse a `key=value` config file (``cpp/src/args.cpp:109-163``):
    '#' comments, blank lines skipped, whitespace trimmed."""
    values: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            values[k.strip()] = v.strip()
    return values
