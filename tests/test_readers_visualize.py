"""Readers (S5/S6), visualize sink (W5/W6), structure gating parity."""

import base64
import os

import numpy as np
import pytest

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.sources.readers import expand_paths, read_interleaved, tasks_from_json_lines
from paddleocr_json_ray.stages.structure import StructureStage, rebuild_table
from paddleocr_json_ray.stages.visualize import draw_boxes, write_ppm
from paddleocr_json_ray.synth.corpus import build_corpus
from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, encode


def test_expand_paths(tmp_path):
    (tmp_path / "a.parquet").write_bytes(b"x")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.parquet").write_bytes(b"x")
    got = expand_paths(str(tmp_path))
    assert [os.path.basename(p) for p in got] == ["a.parquet", "b.parquet"]
    assert expand_paths(str(tmp_path / "a.parquet")) == [str(tmp_path / "a.parquet")]


def test_read_interleaved_roundtrip(ray_session, sf0001_dir):
    paths = build_corpus(sf0001_dir)
    ds = read_interleaved(paths.interleaved_dir)
    assert ds.count() == 500


def test_tasks_from_json_lines(ray_session):
    img = SimgImage(width=40, height=30, blocks=[])
    b64 = base64.b64encode(encode(img)).decode()
    ds = tasks_from_json_lines([
        '{"image_path": "/x.simg"}',
        f'{{"image_base64": "{b64}"}}',
        "not json at all",
        '{"other": 1}',
    ])
    rows = ds.take_all()
    refs = [r["spans"][0]["media_ref"] for r in rows]
    assert refs[0] == "file:/x.simg"
    assert refs[1].startswith("b64:")
    assert refs[2].startswith("invalid:") and refs[3].startswith("invalid:")


def test_ppm_writer(tmp_path):
    raster = np.full((20, 30, 3), 200, dtype=np.uint8)
    out = draw_boxes(raster, [[[2, 2], [25, 2], [25, 15], [2, 15]]])
    assert tuple(out[2, 10]) == (255, 0, 0)
    p = tmp_path / "x.ppm"
    write_ppm(str(p), out)
    data = p.read_bytes()
    assert data.startswith(b"P6\n30 20\n255\n") and len(data) == 13 + 20 * 30 * 3


def test_png_writer_roundtrip(tmp_path):
    from paddleocr_json_ray.functions.imagecodecs import decode_png
    from paddleocr_json_ray.stages.visualize import write_png

    raster = np.full((20, 30, 3), 200, dtype=np.uint8)
    out = draw_boxes(raster, [[[2, 2], [25, 2], [25, 15], [2, 15]]])
    p = tmp_path / "x.png"
    write_png(str(p), out)
    assert np.array_equal(decode_png(p.read_bytes()), out)


def test_structure_stage_gated():
    with pytest.raises(NotImplementedError):
        StructureStage(PipelineConfig())


def test_rebuild_table_pure():
    blocks = [{"box": [[0, 0], [10, 0], [10, 10], [0, 10]], "text": "cell", "score": 0.9}]
    html = rebuild_table(blocks, [[0, 0, 12, 12]], ["<table>", "<td></td>", "</table>"])
    assert html == "<table><td>cell</td></table>"


def test_read_documents_any_formats(ray_session, tmp_path):
    """The same corpus written as parquet, JSONL and CSV reads back
    identically (column pruning included) through the one ingest seam."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from paddleocr_json_ray.sources.readers import read_documents_any

    rows = [{"doc_id": i, "text": f"doc {i} body text", "lang": "en",
             "source": f"src{i % 3}", "n_chars": 15 + i}
            for i in range(200)]
    dirs = {}
    for fmt in ("parquet", "jsonl", "csv"):
        d = os.path.join(str(tmp_path), fmt)
        os.makedirs(d)
        dirs[fmt] = d
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(dirs["parquet"], "documents.parquet"))
    with open(os.path.join(dirs["jsonl"], "documents.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(dirs["csv"], "documents.csv"), "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        for r in rows:
            f.write(f"{r['doc_id']},{r['text']},{r['lang']},"
                    f"{r['source']},{r['n_chars']}\n")
    frames = {}
    for fmt, d in dirs.items():
        df = (read_documents_any(d, columns=("doc_id", "text", "source"))
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(df.columns) == ["doc_id", "text", "source"], fmt
        frames[fmt] = df
    assert frames["parquet"].equals(frames["jsonl"])
    assert frames["parquet"].equals(frames["csv"])


def test_lance_seam_errors_clearly_without_reader(ray_session, tmp_path):
    """A .lance dataset path must raise an actionable NotImplementedError in
    this lance-less environment (never a silent parquet fallback), for both
    the interleaved reader and the table reader."""
    import os

    import pytest

    from paddleocr_json_ray.sources import readers

    d = os.path.join(str(tmp_path), "documents.lance")
    os.makedirs(d)
    with pytest.raises(NotImplementedError, match="lance"):
        readers.read_table(str(tmp_path), "documents")
    with pytest.raises(NotImplementedError, match="lance"):
        readers.read_interleaved(d)
