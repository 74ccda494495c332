"""Real-image round trip, no Ray session needed:

render a pixel-coded raster -> encode it as an ACTUAL PNG (dependency-free
codec) -> feed the PNG through the envelope path -> OCR reads the text from
the PNG's pixels -> write an annotated PNG visualization.

    python examples/demo_real_png.py [out_dir=/tmp/pjr_png_demo]
"""

import base64
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.functions.imagecodecs import encode_png
from paddleocr_json_ray.stages.span_ocr import ocr_media_ref
from paddleocr_json_ray.stages.visualize import draw_boxes, write_png
from paddleocr_json_ray.synth.backend import make_backends
from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, decode, encode, raster_seed, render_raster


def main(out_dir: str = "/tmp/pjr_png_demo") -> None:
    os.makedirs(out_dir, exist_ok=True)
    img = SimgImage(width=420, height=100, blocks=[
        SimgBlock(quad=[[10, 10], [250, 10], [250, 32], [10, 32]],
                  text="real png payload", det_prob=0.95),
        SimgBlock(quad=[[10, 44], [330, 44], [330, 66], [10, 66]],
                  text="decoded from pixels only", det_prob=0.9),
    ])
    payload = encode(img)
    raster = render_raster(decode(payload), raster_seed(payload))
    png = encode_png(raster)
    png_path = os.path.join(out_dir, "input.png")
    with open(png_path, "wb") as fh:
        fh.write(png)

    cfg = PipelineConfig()
    backends = make_backends(cfg, [chr(c) for c in range(32, 127)])
    code, msg, blocks, text = ocr_media_ref(f"file:{png_path}", cfg, *backends)
    print(f"code={code}")
    print(text)
    write_png(os.path.join(out_dir, "annotated.png"),
              draw_boxes(raster, [b["box"] for b in blocks]))
    print(f"wrote {png_path} and annotated.png ({len(blocks)} boxes)")

    # the same bytes through the base64 path give identical results
    ref64 = "b64:" + base64.b64encode(png).decode()
    code2, _, _, text2 = ocr_media_ref(ref64, cfg, *backends)
    assert (code2, text2) == (code, text)


if __name__ == "__main__":
    main(*sys.argv[1:2])
