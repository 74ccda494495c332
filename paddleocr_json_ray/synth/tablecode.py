"""Structure-mode table payloads: rasters with REAL grid geometry.

The structure stage (A5/A6 stand-ins) must work from pixels alone, like
every other model stage since round 2.  Tables are therefore rendered the
way real documents carry them — ruled grid lines — and recognized by
actual image analysis (line-mask connected components + projection
profiles), not a lookup code.  Cell text reuses the standard pixel-code
block painter, so the ordinary det/cls/rec path reads it unchanged.

Grid-line pixels are (R=246, G=0, B=200): R > 200 keeps them out of the
det kernel mask AND out of the halo window (200 < R < 240 is halo), and
G < 16 is unreachable by any other painted signal outside kernel rows
(halo G >= 204, filler 230, background >= 250), so the line mask
``(G < 16) & (R > 200)`` is exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .imaging import SimgBlock, SimgImage
from .pixelcode import render_raster

LINE_RGB = (246, 0, 200)
LINE_THICKNESS = 2
CELL_MARGIN = 4  # inset of the text block inside its cell


@dataclass
class TableSpec:
    """A ruled table: grid edges in image coordinates + per-cell text."""

    row_edges: list[int]               # >= 2 ascending y positions
    col_edges: list[int]               # >= 2 ascending x positions
    cells: dict[tuple[int, int], str] = field(default_factory=dict)

    @property
    def n_rows(self) -> int:
        return len(self.row_edges) - 1

    @property
    def n_cols(self) -> int:
        return len(self.col_edges) - 1

    def cell_box(self, r: int, c: int) -> list[int]:
        """Interior xyxy of cell (r, c), exclusive of the grid lines."""
        t = LINE_THICKNESS
        return [self.col_edges[c] + t, self.row_edges[r] + t,
                self.col_edges[c + 1], self.row_edges[r + 1]]

    def expected_tags(self) -> list[str]:
        tags = ["<table>", "<tbody>"]
        for _ in range(self.n_rows):
            tags.append("<tr>")
            tags.extend(["<td></td>"] * self.n_cols)
            tags.append("</tr>")
        tags += ["</tbody>", "</table>"]
        return tags


def render_structure_raster(width: int, height: int, tables: list[TableSpec],
                            text_blocks: list[SimgBlock] = (),
                            seed: int = 7) -> np.ndarray:
    """Raster with grid lines + pixel-code text: table cells and free text
    blocks all paint through the standard block painter, then the grid is
    ruled on top (cells are inset, so the two never overlap)."""
    blocks = list(text_blocks)
    for t in tables:
        for (r, c), text in t.cells.items():
            x0, y0, x1, y1 = t.cell_box(r, c)
            x0, y0 = x0 + CELL_MARGIN, y0 + CELL_MARGIN
            x1, y1 = x1 - CELL_MARGIN, y1 - CELL_MARGIN
            if x1 - x0 >= 8 and y1 - y0 >= 7:
                blocks.append(SimgBlock(
                    quad=[[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                    text=text, det_prob=0.95))
    raster = render_raster(SimgImage(width=width, height=height, blocks=blocks),
                           seed)
    t = LINE_THICKNESS
    for spec in tables:
        x0, x1 = spec.col_edges[0], spec.col_edges[-1] + t
        y0, y1 = spec.row_edges[0], spec.row_edges[-1] + t
        for y in spec.row_edges:
            raster[y:y + t, x0:x1] = LINE_RGB
        for x in spec.col_edges:
            raster[y0:y1, x:x + t] = LINE_RGB
    return raster
