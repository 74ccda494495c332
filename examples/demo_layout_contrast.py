"""demo3 equivalent (api/python/demo3.py): show the layout-parser contrast —
the same two-column page rendered with parser 'none' (raw det order) versus
'multi_para' (gap-tree reading order + paragraph separators)."""

import copy
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paddleocr_json_ray.functions.layout import PARSERS, render_text


def two_column_page():
    """Left column: a paragraph.  Right column: another.  Raw det order
    interleaves the columns line by line."""
    blocks = []
    left = ["Left col line one", "continues on line two", "and ends here."]
    right = ["Right col starts", "with its own text", "in a second column."]
    for i, (l, r) in enumerate(zip(left, right)):
        y = 10 + i * 30
        blocks.append({"box": [[10, y], [150, y], [150, y + 22], [10, y + 22]],
                       "score": 0.95, "text": l})
        blocks.append({"box": [[220, y], [370, y], [370, y + 22], [220, y + 22]],
                       "score": 0.95, "text": r})
    return blocks


def main():
    page = two_column_page()
    for key in ("none", "multi_para"):
        out = PARSERS[key](copy.deepcopy(page))
        print(f"--- parser={key} ---")
        print(render_text(out))


if __name__ == "__main__":
    main()
