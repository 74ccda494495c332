"""Inter-block separator prediction (T9).

Semantics of ``word_separator`` in the reference
(``api/python/tbpu/parser_tools/paragraph_parse.py:9-36``): given the last
character of the previous block and the first character of the next block,

  * CJK x CJK (incl. fullwidth forms/punct ranges) -> ''   (no space)
  * previous char is an ASCII hyphen '-'           -> ''   (word wrap)
  * next char is any Unicode punctuation (P*)      -> ''
  * otherwise                                      -> ' '
"""

from __future__ import annotations

import unicodedata

# Unicode ranges the reference treats as "CJK-joinable" — Chinese, Japanese
# kana, Korean jamo/syllables, and fullwidth symbol blocks.
_CJK_RANGES = (
    (0x4E00, 0x9FFF),
    (0x3040, 0x30FF),
    (0x1100, 0x11FF),
    (0x3130, 0x318F),
    (0xAC00, 0xD7AF),
    (0x3000, 0x303F),
    (0xFE30, 0xFE4F),
    (0xFF00, 0xFFEF),
)


def is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def word_separator(prev_last: str, next_first: str) -> str:
    if is_cjk(prev_last) and is_cjk(next_first):
        return ""
    if prev_last == "-":
        return ""
    if unicodedata.category(next_first).startswith("P"):
        return ""
    return " "
