"""CLI entry — the reference's gflags surface re-expressed
(``cpp/src/args.cpp:22-83``, modes traced in SURVEY.md §3).

Modes:
  * single image (E1):   python -m paddleocr_json_ray --image_path x.simg
                         -> prints ONE JSON envelope line and exits
  * corpus extraction:   python -m paddleocr_json_ray --input <sf_dir>
                         --output /tmp/out [--shards 16]
                         -> resumable sharded run over the interleaved corpus
  * config file:         --config_path file.txt (key=value; CLI wins —
                         SET_FLAG_IF_DEFAULT semantics, args.cpp:109-163)

The pipe/TCP server loops (E2/E3) are deliberately replaced by dataset
execution — the queueing the reference pushes to callers is the streaming
executor's job here.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from .config import PipelineConfig, read_config_file


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="paddleocr_json_ray")
    p.add_argument("--image_path", default="", help="single-image mode: path to a media payload")
    p.add_argument("--image_base64", default="", help="single-image mode: base64 payload")
    p.add_argument("--input", default="", help="sf dir (corpus derived deterministically)")
    p.add_argument("--output", default="", help="output directory for sharded parquet")
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--config_path", default="", help="key=value config file")
    p.add_argument("--num_cpus", type=int, default=0, help="ray num_cpus (0 = ray default)")
    def strict_bool(v: str) -> bool:
        low = v.strip().lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")

    # expose every PipelineConfig field as a flag with the reference's names
    for f in dataclasses.fields(PipelineConfig):
        if f.type in ("bool", bool):
            p.add_argument(f"--{f.name}", type=strict_bool, default=None)
        elif f.type in ("int", int):
            p.add_argument(f"--{f.name}", type=int, default=None)
        elif f.type in ("float", float):
            p.add_argument(f"--{f.name}", type=float, default=None)
        elif f.name != "explode_override_num_blocks":
            p.add_argument(f"--{f.name}", type=str, default=None)
    return p


def config_from_args(args: argparse.Namespace) -> PipelineConfig:
    """CLI wins over the config file by PRESENCE (gflags tracks whether a
    flag was set, not whether its value equals the default): file values
    apply only for fields the command line did not provide, even when the
    CLI value equals the field default."""
    overrides = {f.name: getattr(args, f.name)
                 for f in dataclasses.fields(PipelineConfig)
                 if getattr(args, f.name, None) is not None}
    if args.config_path:
        file_cfg = PipelineConfig().merge_defaults(read_config_file(args.config_path))
        base = {f.name: getattr(file_cfg, f.name) for f in dataclasses.fields(PipelineConfig)}
        base.update(overrides)
        return PipelineConfig(**base).validated()
    return PipelineConfig(**overrides).validated()


def single_image(ref: str, cfg: PipelineConfig) -> str:
    """E1 equivalence: one envelope line, no Ray session needed."""
    from .stages.envelope import result_to_json_line
    from .stages.span_ocr import ocr_media_ref
    from .synth.backend import make_backends

    if cfg.rec_char_dict_path:
        from .synth.oracle import load_dict_chars

        chars = list(load_dict_chars(cfg.rec_char_dict_path))
    else:
        chars = [chr(c) for c in range(32, 127)]
    det_b, rec_b, cls_b = make_backends(cfg, chars)  # honors cfg.backend
    code, msg, blocks, _text = ocr_media_ref(ref, cfg, det_b, rec_b, cls_b)
    return result_to_json_line(code, msg, blocks, cfg.ensure_ascii)


def main(argv: list[str] | None = None) -> int:
    args = build_argparser().parse_args(argv)
    try:
        cfg = config_from_args(args)
    except (ValueError, OSError) as exc:
        # check_flags parity: fail fast with a clean message, nonzero exit
        print(f"config error: {exc}", file=sys.stderr)
        return 2

    if args.image_path or args.image_base64:
        ref = f"file:{args.image_path}" if args.image_path else f"b64:{args.image_base64}"
        print(single_image(ref, cfg))
        return 0

    if not args.input or not args.output:
        print("need --image_path/--image_base64 or --input + --output", file=sys.stderr)
        return 2

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    try:
        from .state.checkpoint import run_resumable

        summary = run_resumable(args.input, args.output, cfg, n_shards=args.shards)
        print(summary)
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
