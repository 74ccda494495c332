"""Library-API demo: build the corpus for a testdata scale, run the full
extraction pipeline, and print a few assembled documents + job counters."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    try:
        from paddleocr_json_ray.config import PipelineConfig
        from paddleocr_json_ray.pipelines.ocr import run_extraction

        docs = run_extraction("/root/testdata/sf0.001",
                              PipelineConfig(parser="multi_para"))
        head = docs.limit(3).to_pandas()
        for row in head.itertuples():
            print(f"{row.doc_id}: {row.n_spans} spans ({row.n_media} media, "
                  f"{row.n_errors} errors)")
            for s in row.spans[:2]:
                print(f"   [{s['order']}] {s['kind']:5s} {s['text'][:60]!r}")
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main()
