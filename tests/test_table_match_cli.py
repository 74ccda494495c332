"""Table cell matching (O4), math helpers (P10), CLI single-image mode (E1),
config-file semantics (S7)."""

import base64
import json
import subprocess
import sys

import numpy as np

from paddleocr_json_ray.config import PipelineConfig, read_config_file
from paddleocr_json_ray.functions.mathutil import nms, softmax
from paddleocr_json_ray.functions.table_match import (
    cell_distance,
    iou_xyxy,
    match_cells,
    rebuild_table_html,
)
from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, encode


def _blk(x0, y0, x1, y1, text):
    return {"box": [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], "text": text, "score": 0.9}


def test_match_cells_nearest():
    cells = [[0, 0, 50, 20], [60, 0, 110, 20]]
    blocks = [_blk(5, 5, 45, 18, "left"), _blk(65, 5, 105, 18, "right"),
              _blk(62, 2, 100, 19, "right2")]
    m = match_cells(blocks, cells)
    assert m == [["left"], ["right", "right2"]]


def test_rebuild_table_html():
    tags = ["<table>", "<tr>", "<td></td>", "<td></td>", "</tr>", "</table>"]
    html = rebuild_table_html(tags, [["a"], ["b1 ", "b2"]])
    assert html == "<table><tr><td>a</td><td>b1 b2</td></tr></table>"


def test_cell_distance_and_iou():
    assert cell_distance([0, 0, 10, 10], [0, 0, 10, 10]) == 0
    assert iou_xyxy([0, 0, 10, 10], [5, 0, 15, 10]) == 0.5 / 1.5


def test_softmax_and_nms():
    s = softmax(np.array([[1.0, 2.0, 3.0]]))
    assert abs(s.sum() - 1.0) < 1e-6 and s[0, 2] > s[0, 1] > s[0, 0]
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=float)
    keep = nms(boxes, np.array([0.9, 0.8, 0.7]), iou_threshold=0.5)
    assert keep == [0, 2]


def test_cli_single_image(tmp_path):
    img = SimgImage(width=300, height=40, blocks=[
        SimgBlock(quad=[[10, 8], [200, 8], [200, 30], [10, 30]], text="hello world", det_prob=0.95)])
    b64 = base64.b64encode(encode(img)).decode()
    out = subprocess.run([sys.executable, "-m", "paddleocr_json_ray",
                          "--image_base64", b64, "--parser", "single_line"],
                         capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert out.returncode == 0, out.stderr
    obj = json.loads(out.stdout.strip())
    assert obj["code"] == 100
    assert obj["data"][0]["text"] == "hello world"
    # error path: missing file -> 200 envelope, still exit 0 (errors are data)
    out2 = subprocess.run([sys.executable, "-m", "paddleocr_json_ray",
                           "--image_path", "/nope/missing.simg"],
                          capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert json.loads(out2.stdout.strip())["code"] == 200


def test_config_file_merge(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text("parser=single_code\nlimit_side_len=640  # comment\ncls=true\n")
    vals = read_config_file(str(p))
    assert vals == {"parser": "single_code", "limit_side_len": "640", "cls": "true"}
    # file applies only where constructor left defaults (CLI wins)
    cfg = PipelineConfig(parser="multi_line").merge_defaults(
        {"parser": "single_code", "limit_side_len": "640"})
    assert cfg.parser == "multi_line"        # explicitly set -> file ignored
    assert cfg.limit_side_len == 640         # default -> file applies


def test_config_file_bool_false_parses():
    cfg = PipelineConfig().merge_defaults({"cls": "false", "det": "true", "use_dilation": "1"})
    assert cfg.cls is False and cfg.det is True and cfg.use_dilation is True


def test_cli_wins_by_presence(tmp_path):
    """Explicit CLI flag equal to the default must still beat the file."""
    from paddleocr_json_ray.__main__ import build_argparser, config_from_args

    p = tmp_path / "c.txt"
    p.write_text("rec=false\nparser=single_code\n")
    args = build_argparser().parse_args(
        ["--rec", "true", "--config_path", str(p)])
    cfg = config_from_args(args)
    assert cfg.rec is True                # CLI present -> wins despite == default
    assert cfg.parser == "single_code"    # file fills unset field


def test_cli_strict_bool_rejects_garbage():
    import pytest as _pytest

    from paddleocr_json_ray.__main__ import build_argparser

    with _pytest.raises(SystemExit):
        build_argparser().parse_args(["--use_dilation", "maybe"])
