"""Deterministic interleaved text+media corpus (FIXTURES.md F1/F2/F3).

Derives the corpus from the driver-provided ``documents.parquet`` (seeded by
doc_id, seed base 42 — fully deterministic, no external data):

  * ``interleaved/part-*.parquet`` — the input table from BASELINE.json's
    input_hint: ``doc_id: string, spans: list<struct<kind, text, media_ref,
    offset>>``; spans stored shuffled within the list (re-ordering is part of
    the contract).
  * ``blobs/*.simg`` — file-referenced media payloads.
  * ``media_blobs.parquet`` — every payload with truth metadata (F2).
  * ``dict.txt`` — rec character dictionary (A4) covering the corpus charset.
  * ``golden/expected_spans.parquet`` — per-document expected span sequence
    (kind, text, media_ref, order) + span codes, computed by the sequential
    oracle (synth.oracle) at generation time (F3).

Skew is deliberate: ~1% of docs are media-heavy (>=24 media spans) to
exercise repartitioning; ~2% of media refs are corrupted in the five error
modes (codes 200/202/203/300/301); ~2% are valid but empty (code 101).
"""

from __future__ import annotations

import base64
import os
import random
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import PipelineConfig
from ..functions.html import strip_boilerplate
from .imaging import SimgBlock, SimgImage, encode

CORPUS_ROOT = os.environ.get("PJR_CORPUS_ROOT", "/tmp/pjr_corpus")
CORPUS_VERSION = "v11"  # v10 median halo probe; v11 one-sided halo decode

# interleaved docs per source document row, by scale name (bench scale sized
# so per-run compute amortizes fixed pool-spawn/read overhead at 32 CPUs).
# A basename suffix "xN" (e.g. sf0.1x2 — a dir of links to the sf tables)
# multiplies the repeat: the strong-scaling measurement regime.
_REPEAT = {"sf0.001": 1, "sf0.01": 4, "sf0.1": 8}


def _repeat_for(name: str) -> int:
    base, mult = name, 1
    if "x" in name:
        head, tail = name.rsplit("x", 1)
        if tail.isdigit():
            base, mult = head, int(tail)
    return _REPEAT.get(base, 1) * mult

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])
INTERLEAVED_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])
GOLDEN_SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("order", pa.int32()),
])
GOLDEN_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(GOLDEN_SPAN_STRUCT)),
    ("codes", pa.list_(pa.int32())),
])
BLOBS_SCHEMA = pa.schema([
    ("blob_id", pa.string()),
    ("ref_kind", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_blocks", pa.int32()),
])


@dataclass(frozen=True)
class CorpusPaths:
    root: str

    @property
    def interleaved_dir(self) -> str:
        return os.path.join(self.root, "interleaved")

    @property
    def blobs_dir(self) -> str:
        return os.path.join(self.root, "blobs")

    @property
    def media_blobs_parquet(self) -> str:
        return os.path.join(self.root, "media_blobs.parquet")

    @property
    def dict_path(self) -> str:
        return os.path.join(self.root, "dict.txt")

    @property
    def golden_parquet(self) -> str:
        return os.path.join(self.root, "golden", "expected_spans.parquet")

    @property
    def marker(self) -> str:
        return os.path.join(self.root, "_COMPLETE")


_HTML_TEMPLATES = [
    ("<html><head><title>t{n}</title><style>body {{color: red}}</style></head><body>"
     "<nav><ul><li>Home</li><li>About</li></ul></nav>"
     "<div class=\"sidebar\">promo text that must vanish</div>"
     "<article><p>{body}</p></article>"
     "<footer>copyright {n} — legal</footer></body></html>"),
    ("<body><header>Site {n}</header><!-- comment {n} -->"
     "<div id=\"cookie-banner\">accept cookies</div>"
     "<main><div>{body}</div></main>"
     "<script>var x = {n};</script></body>"),
    ("<div><aside>related links</aside><section><p>{body}</p></section>"
     "<ul class=\"menu-bar\"><li>m1</li></ul></div>"),
]


def _make_text_span(rng: random.Random, words: list[str], n: int) -> tuple[str, str]:
    """Returns (html payload, expected extracted text)."""
    start = rng.randrange(max(len(words), 1))
    count = rng.randint(5, 40)
    body_words = [words[(start + k) % len(words)] for k in range(count)] if words else ["empty"]
    body = " ".join(body_words)
    html = rng.choice(_HTML_TEMPLATES).format(n=n, body=body)
    return html, strip_boilerplate(html)


def _make_media_image(rng: random.Random, words: list[str], heavy: bool) -> SimgImage:
    n_lines = rng.randint(1, 3) if heavy else rng.randint(1, 6)
    scale = 2 if rng.random() < 0.03 else 1
    char_w, line_h, y_step = 8 * scale, 22 * scale, 30 * scale
    two_col = (not heavy) and rng.random() < 0.15
    shear = (not heavy) and rng.random() < 0.05
    blocks = []
    max_x = 0
    for li in range(n_lines):
        if rng.random() < 0.03:
            text = ""
        else:
            k = rng.randint(2, 6)
            start = rng.randrange(max(len(words), 1))
            text = " ".join(words[(start + j) % len(words)] for j in range(k)) if words else "blank"
        w = max(char_w * max(len(text), 1), 12)
        col2 = two_col and li % 2 == 1
        x0 = 10 + (max_x + 40 if col2 else 0)
        y0 = 10 + (li // 2 if two_col else li) * y_step
        dy = rng.randint(2, 5) if shear else 0
        quad = [[x0, y0 + dy], [x0 + w, y0], [x0 + w, y0 + line_h], [x0, y0 + line_h + dy]]
        prob = 0.30 + rng.random() * 0.25 if rng.random() < 0.10 else 0.65 + rng.random() * 0.34
        blocks.append(SimgBlock(quad=quad, text=text, det_prob=round(prob, 4),
                                flip180=rng.random() < 0.05))
        max_x = max(max_x, x0 + w)
    width = min(max_x + 10, 3000)
    height = 10 + (((n_lines + 1) // 2) if two_col else n_lines) * y_step
    return SimgImage(width=width, height=height, blocks=blocks)


_CORRUPT_KINDS = ("bad_magic_b64", "bad_b64", "missing_file", "dir_path", "truncated")


def _generate_doc(doc_key: str, seed_key: str, words: list[str], paths: CorpusPaths):
    """Returns (spans_shuffled, truths) where truths[i] describes span i in
    TRUE offset order: ('text', html, expected) or ('media', ref, payload|None,
    simg|None, corrupt_kind|None, blob_id)."""
    rng = random.Random(f"42:{seed_key}")
    heavy = rng.random() < 0.01
    n_spans = rng.randint(24, 32) if heavy else min(32, max(1, int(rng.paretovariate(1.0))))
    truths = []
    for i in range(n_spans):
        is_media = (rng.random() < 0.8) if heavy else (rng.random() < 0.25)
        if not is_media:
            html, expected = _make_text_span(rng, words, i)
            truths.append(("text", html, expected))
            continue
        blob_id = f"{doc_key}#s{i}"
        r = rng.random()
        if r < 0.02:
            kind = _CORRUPT_KINDS[rng.randrange(len(_CORRUPT_KINDS))]
            if kind == "bad_magic_b64":
                ref = "b64:" + base64.b64encode(b"NOTANIMAGE" + blob_id.encode()).decode()
            elif kind == "bad_b64":
                ref = "b64:@@@not-base64@@@"
            elif kind == "missing_file":
                ref = f"file:{paths.blobs_dir}/missing-{blob_id}.simg"
            elif kind == "dir_path":
                ref = f"file:{paths.blobs_dir}"
            else:  # truncated
                img = _make_media_image(rng, words, heavy)
                payload = encode(img)[: max(len(encode(img)) - 7, 10)]
                ref = "b64:" + base64.b64encode(payload).decode()
                truths.append(("media", ref, payload, None, kind, blob_id))
                continue
            truths.append(("media", ref, None, None, kind, blob_id))
            continue
        img = _make_media_image(rng, words, heavy)
        if rng.random() < 0.02:
            img = SimgImage(width=img.width, height=img.height, blocks=[])  # code-101 empty image
        payload = encode(img)
        if rng.random() < 0.20:
            fname = os.path.join(paths.blobs_dir, f"{doc_key.replace('/', '_')}-s{i}.simg")
            with open(fname, "wb") as fh:
                fh.write(payload)
            ref = f"file:{fname}"
        else:
            ref = "b64:" + base64.b64encode(payload).decode()
        truths.append(("media", ref, payload, img, None, blob_id))

    spans = []
    for i, t in enumerate(truths):
        if t[0] == "text":
            spans.append({"kind": "text", "text": t[1], "media_ref": "", "offset": i})
        else:
            spans.append({"kind": "media", "text": "", "media_ref": t[1], "offset": i})
    rng.shuffle(spans)
    return spans, truths


# config fields the golden oracle output depends on — the cache key must
# cover ALL of them (execution knobs like concurrency/batch sizes are
# deliberately excluded: they must never change results, and keying on them
# would regenerate the corpus between bench parallelism levels)
_SEMANTIC_FIELDS = (
    "det", "cls", "rec", "use_angle_cls", "limit_side_len", "det_db_thresh",
    "det_db_box_thresh", "det_db_unclip_ratio", "det_db_score_mode",
    "use_dilation", "cls_thresh", "cls_batch_num", "rec_batch_num",
    "rec_img_h", "rec_img_w", "parser", "backend", "rec_char_dict_path",
)


def semantic_digest(cfg: PipelineConfig) -> str:
    import hashlib

    blob = "|".join(f"{f}={getattr(cfg, f)}" for f in _SEMANTIC_FIELDS)
    return hashlib.sha256(blob.encode()).hexdigest()[:10]


def corpus_dir_for(sf_dir: str, parser: str = "multi_para", cls: bool = False,
                   backend: str = "pixel",
                   cfg: PipelineConfig | None = None) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    cfg = cfg or PipelineConfig(parser=parser, cls=cls, backend=backend)
    return os.path.join(
        CORPUS_ROOT,
        f"{name}-{cfg.parser}-cls{int(cfg.cls)}-{cfg.backend}-"
        f"{semantic_digest(cfg)}-{CORPUS_VERSION}")


def build_corpus(sf_dir: str, cfg: PipelineConfig | None = None, force: bool = False,
                 n_files: int = 8) -> CorpusPaths:
    """Generate (or reuse cached) corpus for an sf dir.  Deterministic."""
    cfg = cfg or PipelineConfig()
    paths = CorpusPaths(corpus_dir_for(sf_dir, cfg=cfg))
    if os.path.exists(paths.marker) and not force:
        return paths
    from .oracle import golden_for_truths  # late import: oracle needs backends

    os.makedirs(paths.interleaved_dir, exist_ok=True)
    os.makedirs(paths.blobs_dir, exist_ok=True)
    os.makedirs(os.path.dirname(paths.golden_parquet), exist_ok=True)

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    repeat = _repeat_for(os.path.basename(os.path.normpath(sf_dir)))

    # dict charset: all characters the generator can emit (document texts +
    # template words); reversed text uses the same charset
    charset = set(" ")
    for t in texts:
        charset.update(t)
    charset.update("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,-!?()[]{}:;'\"")
    dict_chars = sorted(charset - {"\n"})
    with open(paths.dict_path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(dict_chars))

    inter_rows: list[dict] = []
    golden_rows: list[dict] = []
    blob_rows: list[dict] = []
    part = 0
    written = 0
    n_total = len(doc_ids) * repeat
    per_file = max(n_total // n_files, 1)

    def flush(buf_i, buf_g):
        nonlocal part
        tab = pa.Table.from_pylist(buf_i, schema=INTERLEAVED_SCHEMA)
        pq.write_table(tab, os.path.join(paths.interleaved_dir, f"part-{part:04d}.parquet"))
        part += 1
        return tab.num_rows

    for src_id, text in zip(doc_ids, texts):
        words = text.split()
        for r in range(repeat):
            doc_key = f"doc-{src_id:06d}-{r}"
            spans, truths = _generate_doc(doc_key, f"{src_id}:{r}", words, paths)
            inter_rows.append({"doc_id": doc_key, "spans": spans})
            g_spans, g_codes = golden_for_truths(truths, cfg, paths.dict_path)
            golden_rows.append({"doc_id": doc_key, "spans": g_spans, "codes": g_codes})
            for t in truths:
                if t[0] == "media" and t[2] is not None:
                    img = t[3]
                    blob_rows.append({
                        "blob_id": t[5],
                        "ref_kind": "corrupt" if t[4] else ("file" if t[1].startswith("file:") else "b64"),
                        "payload": t[2],
                        "width": img.width if img else -1,
                        "height": img.height if img else -1,
                        "n_blocks": len(img.blocks) if img else -1,
                    })
            written += 1
            if len(inter_rows) >= per_file:
                flush(inter_rows, golden_rows)
                inter_rows = []
    if inter_rows:
        flush(inter_rows, golden_rows)

    pq.write_table(pa.Table.from_pylist(golden_rows, schema=GOLDEN_SCHEMA), paths.golden_parquet)
    pq.write_table(pa.Table.from_pylist(blob_rows, schema=BLOBS_SCHEMA), paths.media_blobs_parquet)
    with open(paths.marker, "w") as fh:
        fh.write(f"docs={written}\n")
    return paths
