"""HTML boilerplate stripping + main-content heuristics (M12).

The reference's text-side analogue is the tbpu separator/paragraph logic; the
north rule adds main-content extraction for ``kind='text'`` spans.  Semantics
(deterministic, regex-DOM heuristics — no HTML lib in this environment):

1. drop ``<script>``/``<style>``/``<template>`` elements and comments;
2. drop boilerplate containers: ``<nav> <header> <footer> <aside>`` and any
   element whose class/id contains a boilerplate token (sidebar, banner,
   advert, cookie, menu, breadcrumb);
3. block-level closes (``</p> </div> </h1..6> </li> </tr> <br>``) become
   newlines;
4. remaining tags removed; HTML entities decoded; horizontal whitespace runs
   collapsed to one space; lines trimmed; empty lines dropped; lines joined
   with a single newline.

The synthetic corpus generator wraps source text with these exact classes of
boilerplate, so extraction is invertible and golden-checkable.
"""

from __future__ import annotations

import html as _html
import re

_BOILER_TOKENS = r"(?:sidebar|banner|advert|ads|cookie|menu|breadcrumb|promo)"

_RE_DROP_ELEMS = re.compile(
    r"<(script|style|template|nav|header|footer|aside|head|title)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_DROP_CLASSED = re.compile(
    r"<(div|section|ul|span)\b[^>]*(?:class|id)\s*=\s*\"[^\"]*" + _BOILER_TOKENS + r"[^\"]*\"[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_BLOCK_BREAK = re.compile(r"<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/section|/article)\s*>", re.IGNORECASE)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_HSPACE = re.compile(r"[ \t\r\f\v]+")


def strip_boilerplate(raw_html: str) -> str:
    """Extract main content text from an HTML-ish payload."""
    s = _RE_COMMENT.sub(" ", raw_html)
    # iterate: nested boilerplate containers
    prev = None
    while prev != s:
        prev = s
        s = _RE_DROP_ELEMS.sub(" ", s)
        s = _RE_DROP_CLASSED.sub(" ", s)
    s = _RE_BLOCK_BREAK.sub("\n", s)
    s = _RE_TAG.sub(" ", s)
    s = _html.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _RE_HSPACE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def normalize_ws(text: str) -> str:
    """Whitespace-collapse normaliser (used by the text_clean query; matches
    the SQL oracle ``trim(regexp_replace(text, '\\s+', ' ', 'g'))``)."""
    return re.sub(r"\s+", " ", text).strip()
