"""Independent-implementation cross-checks (FIXTURES.md F3 'independent
oracle' spirit): key value-producing kernels are verified against
structurally different re-implementations written here, not shared code."""

import random
import re

import numpy as np

from paddleocr_json_ray.functions.ctc import build_label_list, ctc_greedy_decode
from paddleocr_json_ray.functions.html import strip_boilerplate


# --------------------------- CTC: naive per-timestep loop vs vectorized
def _ctc_naive(logits, labels):
    text = []
    picked = []
    last = 0
    for t in range(logits.shape[0]):
        row = list(logits[t])
        idx = row.index(max(row))
        if idx > 0 and not (t > 0 and idx == last):
            text.append(labels[idx])
            picked.append(max(row))
        last = idx
    if not picked:
        return "", float("nan")
    return "".join(text), sum(picked) / len(picked)


def test_ctc_vs_naive_random():
    rng = np.random.default_rng(9)
    labels = build_label_list(list("abcde"))
    for _ in range(200):
        t = rng.integers(1, 30)
        logits = rng.random((int(t), len(labels))).astype(np.float32)
        got_text, got_score = ctc_greedy_decode(logits, labels)
        exp_text, exp_score = _ctc_naive(logits, labels)
        assert got_text == exp_text
        if exp_text:
            assert abs(got_score - exp_score) < 1e-5
        else:
            assert np.isnan(got_score)


# --------------------------- HTML strip: tag-walker state machine vs regex
_DROP = {"script", "style", "template", "nav", "header", "footer", "aside",
         "head", "title"}
_BOILER = re.compile(r"sidebar|banner|advert|ads|cookie|menu|breadcrumb|promo")
_BREAK = {"br", "/p", "/div", "/h1", "/h2", "/h3", "/h4", "/h5", "/h6",
          "/li", "/tr", "/section", "/article"}


def _strip_statemachine(html_src: str) -> str:
    """Character-walking implementation of the same extraction semantics."""
    import html as html_mod

    # remove comments
    s = re.sub(r"<!--.*?-->", " ", html_src, flags=re.DOTALL)
    out = []
    i = 0
    skip_until = None  # closing tag name we are skipping to
    while i < len(s):
        if s[i] == "<":
            j = s.find(">", i)
            if j == -1:
                break
            tag_body = s[i + 1:j]
            name = tag_body.split()[0].lower().rstrip("/") if tag_body.split() else ""
            if skip_until:
                if name == "/" + skip_until:
                    skip_until = None
                    out.append(" ")
                i = j + 1
                continue
            bare = name.lstrip("/")
            attrs = tag_body.lower()
            is_boiler_container = (bare in ("div", "section", "ul", "span")
                                   and not name.startswith("/")
                                   and ("class=" in attrs or "id=" in attrs)
                                   and _BOILER.search(attrs))
            if bare in _DROP and not name.startswith("/"):
                skip_until = bare
            elif is_boiler_container:
                skip_until = bare
            elif name in _BREAK or (bare == "br"):
                out.append("\n")
            else:
                out.append(" ")
            i = j + 1
        elif skip_until:
            i += 1
        else:
            out.append(s[i])
            i += 1
    text = html_mod.unescape("".join(out))
    lines = []
    for line in text.split("\n"):
        line = re.sub(r"[ \t\r\f\v]+", " ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def test_html_strip_vs_statemachine_on_corpus_templates():
    from paddleocr_json_ray.synth.corpus import _HTML_TEMPLATES

    rng = random.Random(17)
    words = ("alpha beta gamma delta epsilon zeta eta theta "
             "iota kappa lambda mu nu xi omicron pi").split()
    for n in range(40):
        body = " ".join(rng.choice(words) for _ in range(rng.randint(3, 30)))
        html_src = rng.choice(_HTML_TEMPLATES).format(n=n, body=body)
        assert strip_boilerplate(html_src) == _strip_statemachine(html_src), html_src
