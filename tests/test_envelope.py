"""Error-envelope contract (FIXTURES.md F5): every failure mode yields the
reference's code, never an exception; JSON writer format parity."""

import base64
import json
import os

import pytest

from paddleocr_json_ray import errors
from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.stages.envelope import result_to_json_line
from paddleocr_json_ray.stages.span_ocr import decode_payload, ocr_media_ref, resolve_media_ref
from paddleocr_json_ray.synth.backend import PixelClsBackend, PixelDetBackend, PixelRecBackend
from paddleocr_json_ray.synth.imaging import SimgImage, encode


@pytest.fixture(scope="module")
def backends():
    return (PixelDetBackend(PipelineConfig()),
            PixelRecBackend(list("abcdefghijklmnopqrstuvwxyz ")),
            PixelClsBackend())


def test_bad_base64_is_300():
    r = resolve_media_ref("b64:@@@@not-b64")
    assert r.code == errors.CODE_ERR_BASE64_DECODE
    assert r.msg == "Base64 decode failed."


def test_bad_bytes_b64_is_301():
    payload = base64.b64encode(b"JUNKJUNKJUNKJUNK").decode()
    r = resolve_media_ref("b64:" + payload)
    assert r.code == 0
    code, msg, simg = decode_payload(r.payload, "")
    assert code == errors.CODE_ERR_BASE64_IM_DECODE and simg is None


def test_missing_path_is_200():
    r = resolve_media_ref("file:/nonexistent/zzz.simg")
    assert r.code == errors.CODE_ERR_PATH_EXIST
    assert "dose not exist" in r.msg  # reference's typo preserved


def test_dir_path_is_202(tmp_path):
    r = resolve_media_ref(f"file:{tmp_path}")
    assert r.code == errors.CODE_ERR_PATH_READ


def test_truncated_file_is_203(tmp_path):
    img = SimgImage(width=50, height=40, blocks=[])
    p = tmp_path / "t.simg"
    p.write_bytes(encode(img)[:-1] if len(encode(img)) > 8 else b"SIMG1\n")
    # empty image encodes small; force truncation of a block-bearing image
    from paddleocr_json_ray.synth.imaging import SimgBlock

    img2 = SimgImage(width=50, height=40, blocks=[
        SimgBlock(quad=[[1, 1], [30, 1], [30, 12], [1, 12]], text="abc")])
    p.write_bytes(encode(img2)[:-2])
    r = resolve_media_ref(f"file:{p}")
    assert r.code == 0
    code, msg, _ = decode_payload(r.payload, str(p))
    assert code == errors.CODE_ERR_PATH_DECODE
    assert str(p) in msg


def test_unknown_ref_is_403(backends):
    code, msg, blocks, text = ocr_media_ref("gopher:whatever", PipelineConfig(),
                                            *backends[:2], backends[2])
    assert code == errors.CODE_ERR_NO_TASK and msg == "No valid tasks."


def test_empty_image_is_101(backends):
    ref = "b64:" + base64.b64encode(encode(SimgImage(width=64, height=64, blocks=[]))).decode()
    code, msg, blocks, text = ocr_media_ref(ref, PipelineConfig(), *backends[:2], backends[2])
    assert code == errors.CODE_OK_NONE
    assert msg == 'No text found in image. Path: ""'
    assert blocks == [] and text == ""


def test_json_line_format():
    line = result_to_json_line(100, "", [
        {"box": [[13, 5], [161, 5], [161, 27], [13, 27]], "score": 0.99,
         "text": "文abc", "cls_label": -1}])
    obj = json.loads(line)
    assert obj["code"] == 100
    assert obj["data"][0]["box"][0] == [13, 5]
    assert "\\u6587" in line  # ensure_ascii escape, cpp/src/task.cpp:26
    # error envelope
    err = json.loads(result_to_json_line(203, 'Image decode failed. Path: "x"', []))
    assert err == {"code": 203, "data": 'Image decode failed. Path: "x"'}
    # cls fields included only when cls ran (cpp/src/task.cpp:91-97)
    line2 = result_to_json_line(100, "", [
        {"box": [[0, 0], [1, 0], [1, 1], [0, 1]], "score": 0.5, "text": "a",
         "cls_label": 1, "cls_score": 0.97}])
    assert json.loads(line2)["data"][0]["cls_label"] == 1
