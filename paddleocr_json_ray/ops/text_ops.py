"""Text-analysis ops over the ``documents`` table — language ID, quality
scoring, token counting, fingerprinting (large-scale training-data pipeline
components; kernels in functions/textstats.py).

All ops are single-pass ``map_batches`` transforms: no shuffle, columns
pruned at the read.  The SQL-oracle-matched ops (clean/token/quality) use
only semantics DuckDB can replicate exactly (integer outputs, RE2-compatible
regexes).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.textstats import (
    count_bpeish_tokens,
    count_tokens,
    doc_fingerprint,
    lang_id,
    quality_stats,
    simhash64,
)

_RE_WS = re.compile(r"\s+")


def _read_documents(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    from ..sources.readers import read_table

    return read_table(sf_dir, "documents", columns)


def text_clean(sf_dir: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        cleaned = [_RE_WS.sub(" ", t).strip() for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "clean_text": pa.array(cleaned, type=pa.string())})
    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def token_counts(sf_dir: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            "n_tokens": pa.array([count_tokens(t) for t in texts], type=pa.int64()),
            "n_bpeish": pa.array([count_bpeish_tokens(t) for t in texts], type=pa.int64()),
        })
    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        stats = [quality_stats(t) for t in texts]
        cols = {"doc_id": batch.column("doc_id")}
        for key in ("n_chars", "n_tokens", "n_punct", "n_digit", "n_space",
                    "max_token_len", "quality_milli"):
            cols[key] = pa.array([s[key] for s in stats], type=pa.int64())
        return pa.table(cols)
    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def lang_id_ds(sf_dir: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array([lang_id(t) for t in batch.column("text").to_pylist()],
                                  type=pa.string()),
        })
    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def compression_ratio(sf_dir: str) -> ray.data.Dataset:
    """zlib compression ratio per document (x1000, integer) — the classic
    repetitive/boilerplate-text signal in web-scale curation (highly
    repetitive text compresses far below natural prose)."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        ratios = []
        for t in batch.column("text").to_pylist():
            raw = t.encode("utf-8")
            ratios.append(len(zlib.compress(raw, 6)) * 1000 // len(raw) if raw else 1000)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "compress_milli": pa.array(ratios, type=pa.int64())})

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array([doc_fingerprint(t) for t in texts], type=pa.int64()),
            "simhash": pa.array([simhash64(t) for t in texts], type=pa.int64()),
        })
    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


_RE_TOKEN_ASCII = re.compile(r"[^ \t\n\r\f\v]+")  # RE2-compatible \S


def word_topk(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Global word frequency top-k (the canonical wordcount): per-batch
    partial counts (combiner — one row per distinct word per batch), native
    Sum groupby over the vocabulary (language-bounded, not corpus-bounded),
    then sort + limit.  Ties broken (count desc, word asc) so the output is
    deterministic and SQL-oracle-matched."""
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir, columns=("text",))

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_RE_TOKEN_ASCII.findall(t))
        return pa.table({"word": pa.array(list(c.keys()), type=pa.string()),
                         "n": pa.array(list(c.values()), type=pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("word").aggregate(Sum("n"))

    def finish(batch: pa.Table) -> pa.Table:
        # negated count -> a single ascending sort gives (count desc, word asc)
        return pa.table({"word": batch.column("word"),
                         "neg_n": pc.multiply(batch.column("sum(n)"), pa.scalar(-1))})

    def to_out(batch: pa.Table) -> pa.Table:
        return pa.table({"word": batch.column("word"),
                         "n": pc.multiply(batch.column("neg_n"), pa.scalar(-1))})

    return (agg.map_batches(finish, batch_format="pyarrow")
               .sort(["neg_n", "word"])
               .limit(k)
               .map_batches(to_out, batch_format="pyarrow"))


# ------------------------------------------------- curation-filter additions
# PII masking patterns: ASCII-only classes so Python re and DuckDB RE2
# produce byte-identical replacements (the repo's SQL-oracle rule)
_RE_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+")
_RE_IPV4 = re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")
_RE_PHONE = re.compile(r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}|[0-9]{7,}")

PII_SQL_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}|[0-9]{7,}", "<PHONE>"),
)


def scrub_pii_text(text: str) -> str:
    """Mask emails, IPv4 addresses and phone-like digit runs — the standard
    pre-training scrub pass.  Order matters (emails contain digit runs)."""
    text = _RE_EMAIL.sub("<EMAIL>", text)
    text = _RE_IPV4.sub("<IP>", text)
    return _RE_PHONE.sub("<PHONE>", text)


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, scrubbed) — single-pass stateless map; compiled patterns
    live at module scope (loaded once per worker process)."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "scrubbed": pa.array([scrub_pii_text(t)
                                  for t in batch.column("text").to_pylist()],
                                 type=pa.string()),
        })

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def word_repetition(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_distinct, top_count, rep_ratio_milli) — the
    Gopher/RefinedWeb-style repetition signal: how much of a document is
    its single most-frequent token.  Integer outputs for hash-exact oracle
    comparison."""
    from collections import Counter

    def fn(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": batch.column("doc_id"), "n_tokens": [],
                "n_distinct": [], "top_count": [], "rep_ratio_milli": []}
        for t in batch.column("text").to_pylist():
            toks = _RE_TOKEN_ASCII.findall(t)
            c = Counter(toks)
            n = len(toks)
            top = max(c.values()) if c else 0
            rows["n_tokens"].append(n)
            rows["n_distinct"].append(len(c))
            rows["top_count"].append(top)
            rows["rep_ratio_milli"].append(top * 1000 // n if n else 0)
        return pa.table({
            "doc_id": rows["doc_id"],
            "n_tokens": pa.array(rows["n_tokens"], type=pa.int64()),
            "n_distinct": pa.array(rows["n_distinct"], type=pa.int64()),
            "top_count": pa.array(rows["top_count"], type=pa.int64()),
            "rep_ratio_milli": pa.array(rows["rep_ratio_milli"], type=pa.int64()),
        })

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def split_assign(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, split) — deterministic 8/1/1 train/val/test assignment by
    id residue: reproducible across runs and engines, no shuffle, no state
    (the standard deterministic-split idiom for training corpora)."""

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        r = batch.column("doc_id").to_numpy() % 10
        split = np.where(r <= 7, "train", np.where(r == 8, "val", "test"))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "split": pa.array(split, type=pa.string())})

    return _read_documents(sf_dir, columns=("doc_id",)).map_batches(
        fn, batch_format="pyarrow")


def length_histogram(sf_dir: str, bucket: int = 100) -> ray.data.Dataset:
    """(bucket_lo, n_docs) — document-length histogram over the table's own
    n_chars column: pruned single-column read, in-batch bucket key, native
    partial-aggregate groupby."""
    from ray.data.aggregate import Count

    def fn(batch: pa.Table) -> pa.Table:
        b = (batch.column("n_chars").to_numpy() // bucket) * bucket
        return pa.table({"bucket_lo": pa.array(b, type=pa.int64())})

    ds = _read_documents(sf_dir, columns=("n_chars",)).map_batches(
        fn, batch_format="pyarrow")
    agg = ds.groupby("bucket_lo").aggregate(Count())
    return agg.map_batches(
        lambda b: pa.table({"bucket_lo": b.column("bucket_lo"),
                            "n_docs": b.column("count()").cast(pa.int64())}),
        batch_format="pyarrow")
