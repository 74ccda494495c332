"""demo1 equivalent (api/python/demo1.py): OCR one media payload three ways —
file path, raw bytes via base64, and an in-memory payload — printing the
reference-shaped JSON envelope for each."""

import base64
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paddleocr_json_ray.__main__ import single_image
from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, encode


def main():
    img = SimgImage(width=420, height=110, blocks=[
        SimgBlock(quad=[[12, 8], [260, 8], [260, 30], [12, 30]],
                  text="hello from the demo", det_prob=0.97),
        SimgBlock(quad=[[12, 48], [200, 48], [200, 70], [12, 70]],
                  text="second line here", det_prob=0.93),
    ])
    payload = encode(img)
    cfg = PipelineConfig(parser="single_para")

    # 1. by path (image_path mode)
    with tempfile.NamedTemporaryFile(suffix=".simg", delete=False) as fh:
        fh.write(payload)
        path = fh.name
    print("path:   ", single_image(f"file:{path}", cfg))
    os.unlink(path)

    # 2. by base64 (image_base64 mode)
    print("base64: ", single_image("b64:" + base64.b64encode(payload).decode(), cfg))

    # 3. error envelope: corrupt bytes
    print("corrupt:", single_image("b64:" + base64.b64encode(b"JUNK").decode(), cfg))


if __name__ == "__main__":
    main()
