"""Structure mode (A5/A6, P8/P9, O4) — gated, matching the reference.

The reference SHIPS its layout/table models but hard-disables the mode at
the CLI (``-type=structure`` rejected, cpp/src/main.cpp:126-130), so
structure is not on the equality-critical path.  The math that IS
implemented and tested here:

  * nearest-cell text matching + HTML rebuild — functions/table_match.py
    (O4, cpp/src/paddlestructure.cpp:144-276);
  * softmax / IoU / greedy NMS — functions/mathutil.py (P9/P10 math,
    cpp/src/postprocess_op.cpp:442-573).

The model stages themselves (picodet layout A5, table-structure A6 and
their decoders P8/P9) need real weights with no synthetic ground truth in
the SIMG payload, so the stage below raises the same "unsupported" contract
the reference's CLI enforces.
"""

from __future__ import annotations

from ..config import PipelineConfig


class StructureStage:
    """Placeholder actor stage for `-type=structure` parity."""

    def __init__(self, cfg: PipelineConfig):
        raise NotImplementedError(
            "structure mode is disabled, matching the reference "
            "(cpp/src/main.cpp:126-130: only -type=ocr is accepted); the "
            "cell-matching and NMS math it would use lives in "
            "functions/table_match.py and functions/mathutil.py")


def rebuild_table(ocr_blocks: list[dict], cell_boxes: list[list[int]],
                  html_tags: list[str]) -> str:
    """Pure-function structure-mode core (usable today given cell boxes +
    tag sequence from any table model)."""
    from ..functions.table_match import match_cells, rebuild_table_html

    return rebuild_table_html(html_tags, match_cells(ocr_blocks, cell_boxes))
