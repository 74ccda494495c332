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


def gopher_repetition(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, top2gram_milli, dup3gram_milli) — the Gopher n-gram
    repetition filters (Rae et al. 2021 §A1.1): the fraction of token
    characters covered by the most frequent word 2-gram, and the fraction
    covered by word 3-grams occurring more than once.  Completes the
    repetition family next to ``word_repetition``'s unigram signal
    (line-level duplicates are untestable here: documents.text carries no
    newlines).

    Integer milli outputs with (count desc, gram asc) tie-break so the
    result is hash-exact against the SQL oracle.  Per-document local
    computation — an embarrassingly parallel map_batches, no exchange."""
    from collections import Counter

    def fn(batch: pa.Table) -> pa.Table:
        out = {"doc_id": batch.column("doc_id"),
               "top2gram_milli": [], "dup3gram_milli": []}
        for t in batch.column("text").to_pylist():
            toks = _RE_TOKEN_ASCII.findall(t)
            total = sum(len(w) for w in toks)
            if total == 0 or len(toks) < 2:
                out["top2gram_milli"].append(0)
                out["dup3gram_milli"].append(0)
                continue
            big = Counter(" ".join(p) for p in zip(toks, toks[1:]))
            # most frequent 2-gram, lexicographic tie-break
            top_g, top_n = min(big.items(), key=lambda kv: (-kv[1], kv[0]))
            top_chars = (len(top_g) - 1) * top_n  # gram chars exclude the space
            out["top2gram_milli"].append(top_chars * 1000 // total)
            if len(toks) < 3:
                out["dup3gram_milli"].append(0)
                continue
            tri = Counter(" ".join(p) for p in zip(toks, toks[1:], toks[2:]))
            dup_chars = sum((len(g) - 2) * n for g, n in tri.items() if n >= 2)
            out["dup3gram_milli"].append(dup_chars * 1000 // total)
        return pa.table({
            "doc_id": out["doc_id"],
            "top2gram_milli": pa.array(out["top2gram_milli"], type=pa.int64()),
            "dup3gram_milli": pa.array(out["dup3gram_milli"], type=pa.int64()),
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


def sample_docs(sf_dir: str, k: int = 200) -> ray.data.Dataset:
    """(doc_id) — deterministic uniform corpus sample: the k documents with
    the smallest md5(doc_id) — the bottom-k-by-hash sketch (equivalently a
    KMV sample).  Engine-independent (md5 of the decimal id string) and
    mergeable: each block keeps only its local bottom-k (the combiner — the
    global bottom-k is contained in the union of block-local bottom-ks), so
    the exchange carries at most k rows per block regardless of data size."""
    import hashlib

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keyed = sorted((hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids)[:k]
        return pa.table({
            "h": pa.array([h for h, _ in keyed], type=pa.string()),
            "doc_id": pa.array([i for _, i in keyed], type=pa.int64()),
        })

    return (_read_documents(sf_dir, columns=("doc_id",))
            .map_batches(bottomk, batch_format="pyarrow")
            .sort(["h", "doc_id"])
            .limit(k)
            .select_columns(["doc_id"]))


def source_mix_repeats(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, source, n_copies) — temperature-based source rebalancing
    for a training mixture (the mT5 / XLM-R alpha-sampling shape with
    alpha = 0.5): source s is resampled in proportion to sqrt(count_s), so
    under-represented sources are upsampled and dominant ones downsampled
    while the total document budget stays ~N.  Each doc's copy count is
    the integer part of its source's repeat rate plus one deterministic
    hash-Bernoulli extra for the fractional part — reruns and resumed
    shards produce identical mixtures.

    INTEGER-EXACT cross-engine: the only float steps are IEEE sqrt and
    one multiply (correctly rounded on every conforming platform); weights
    are floored to milli units and all rate math is integer, so the hash
    compare against the SQL oracle is bit-stable.

    Shape: one native Count groupby (rows = |sources|) -> driver computes
    the tiny rate table -> broadcast once -> one streaming map pass."""
    import hashlib

    import numpy as np
    import ray
    from ray.data.aggregate import Count

    ds = _read_documents(sf_dir, columns=("doc_id", "source"))
    counts = ds.groupby("source").aggregate(Count()).to_pandas()
    if counts.empty:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "source": pa.array([], type=pa.string()),
            "n_copies": pa.array([], type=pa.int64())}))
    c = counts["count()"].to_numpy().astype(np.int64)
    wm = np.floor(np.sqrt(c.astype(np.float64)) * 1000.0).astype(np.int64)
    n_total = int(c.sum())
    sw = int(wm.sum())
    # repeat rate in milli-copies: N * w_s / (sum_w * c_s), all integer
    rm = (n_total * wm * 1000) // (sw * c)
    lut_ref = ray.put({s: int(r) for s, r in zip(counts["source"], rm)})

    def assign(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        rates = np.fromiter((m[s] for s in srcs), dtype=np.int64,
                            count=len(srcs))
        frac = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
             for i in ids), dtype=np.int64, count=len(ids))
        n_copies = rates // 1000 + (frac < rates % 1000)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "source": pa.array(srcs, type=pa.string()),
            "n_copies": pa.array(n_copies.astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow", fn_args=(lut_ref,))


def weighted_sample(sf_dir: str, k: int = 200) -> ray.data.Dataset:
    """(doc_id, weight) — deterministic weight-proportional sample without
    replacement (Efraimidis & Spirakis, IPL 2006, A-Res): each doc draws a
    reproducible uniform u from md5(doc_id) and scores key = -ln(u)/w with
    w = n_chars; the k SMALLEST keys are the sample, and inclusion
    probability is proportional to weight — the length-weighted corpus
    sample (token-budget-proportional) next to ``sample_docs``' uniform
    one.  Deterministic: reruns and resumed shards pick identical docs.

    Same mergeable bottom-k shape as ``sample_docs``: the global bottom-k
    is contained in the union of block-local bottom-ks, so each block
    ships at most k rows."""
    import hashlib

    import numpy as np

    def es_key(i: int, w: int) -> float:
        d = hashlib.md5(str(i).encode()).digest()
        u = (int.from_bytes(d[:8], "big") + 1) / float((1 << 64) + 1)
        return -np.log(u) / max(w, 1)

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        ws = batch.column("n_chars").to_pylist()
        keyed = sorted(((es_key(i, w), i, w) for i, w in zip(ids, ws)))[:k]
        return pa.table({
            "key": pa.array([x for x, _, _ in keyed], type=pa.float64()),
            "doc_id": pa.array([i for _, i, _ in keyed], type=pa.int64()),
            "weight": pa.array([w for _, _, w in keyed], type=pa.int64()),
        })

    return (_read_documents(sf_dir, columns=("doc_id", "n_chars"))
            .map_batches(bottomk, batch_format="pyarrow")
            .sort(["key", "doc_id"])
            .limit(k)
            .select_columns(["doc_id", "weight"]))


def shuffle_positions(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, pos) — DETERMINISTIC global shuffle for training export:
    pos is the 1-based rank under the md5-keyed total order (doc_id
    tiebreak).  The resumable, engine-independent alternative to
    ``random_shuffle()``: a re-run (or a resumed partial run) reproduces
    the identical order, so shard N of the export is always the same rows.

    Shape: one keyed sort; each block emits its rows with their LOCAL
    index plus one count-stat row; block offsets derive from the O(blocks)
    stat table (control-plane sized) broadcast back once.  No tie healing
    needed — the (hash, doc_id) order is strict."""
    import hashlib

    import numpy as np
    import ray

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "h": pa.array([hashlib.md5(str(i).encode()).hexdigest() for i in ids],
                          type=pa.string()),
            "doc_id": pa.array(ids, type=pa.int64()),
        })

    srt = (_read_documents(sf_dir, columns=("doc_id",))
           .map_batches(add_key, batch_format="pyarrow")
           .sort(["h", "doc_id"]))

    def block_pos(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"kind": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "local": pa.array([], type=pa.int64()),
                             "key_h": pa.array([], type=pa.string()),
                             "key_d": pa.array([], type=pa.int64())})
        first_h = batch.column("h")[0].as_py()
        first_d = int(batch.column("doc_id")[0].as_py())
        rows = pa.table({
            "kind": pa.array(np.zeros(n, dtype=np.int64)),
            "doc_id": batch.column("doc_id"),
            "local": pa.array(np.arange(n, dtype=np.int64)),
            "key_h": pa.array([first_h] * n, type=pa.string()),
            "key_d": pa.array(np.full(n, first_d, dtype=np.int64)),
        })
        stat = pa.table({
            "kind": pa.array([1], type=pa.int64()),
            "doc_id": pa.array([n], type=pa.int64()),  # carries the count
            "local": pa.array([0], type=pa.int64()),
            "key_h": pa.array([first_h], type=pa.string()),
            "key_d": pa.array([first_d], type=pa.int64()),
        })
        return pa.concat_tables([rows, stat])

    out = srt.map_batches(block_pos, batch_format="pyarrow",
                          batch_size=None).materialize()
    stats = (out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)),
        batch_format="pyarrow").to_pandas())  # O(blocks)
    if stats.empty:  # empty documents table
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64())}))
    stats = stats.sort_values(["key_h", "key_d"], kind="stable")
    offs = {}
    running = 0
    for r in stats.itertuples():
        offs[(r.key_h, r.key_d)] = running
        running += int(r.doc_id)
    offs_ref = ray.put(offs)

    def finish(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        kh = batch.column("key_h").to_pylist()
        kd = batch.column("key_d").to_numpy()
        local = batch.column("local").to_numpy()
        off = np.empty(len(kh), dtype=np.int64)
        for key in {(h, int(d)) for h, d in zip(kh, kd)}:  # one per block
            sel = np.fromiter((a == key[0] and int(b) == key[1]
                               for a, b in zip(kh, kd)),
                              dtype=bool, count=len(kh))
            off[sel] = m[key]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pos": pa.array(local + off + 1, type=pa.int64()),
        })

    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)),
        batch_format="pyarrow")
    return rows.map_batches(finish, batch_format="pyarrow", fn_args=(offs_ref,))


def pack_sequences(sf_dir: str, seq_len: int = 2048) -> ray.data.Dataset:
    """(doc_id, n_tokens, seq_first, seq_last, seq_offset) — GPT-style
    concat-and-chunk sequence packing for pretraining: documents are
    concatenated in doc_id order and cut into fixed ``seq_len``-token
    training sequences; each document maps to the half-open token interval
    [tok_start, tok_start + n_tokens) and therefore to sequences
    seq_first..seq_last with in-sequence start offset seq_offset.
    Deterministic and resumable: a re-run (or any subset of export shards)
    reproduces identical placements, unlike an RNG-driven packer.

    Shape (same O(blocks) plan as ``shuffle_positions``): one doc_id sort;
    each block emits its rows with a LOCAL exclusive token prefix sum plus
    ONE token-total stat row; global block offsets derive from the
    control-plane-sized stat table broadcast back once.  Rows never leave
    their block, so at 100 TB this costs one sort plus O(blocks) driver
    bytes — no per-doc exchange."""
    import numpy as np
    import ray

    srt = _read_documents(sf_dir).sort("doc_id")

    def block_pack(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"kind": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "local_start": pa.array([], type=pa.int64()),
                             "key_d": pa.array([], type=pa.int64())})
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        nt = np.fromiter((count_tokens(t)
                          for t in batch.column("text").to_pylist()),
                         dtype=np.int64, count=n)
        start = np.zeros(n, dtype=np.int64)
        np.cumsum(nt[:-1], out=start[1:])          # exclusive prefix sum
        first_d = int(ids[0])
        rows = pa.table({
            "kind": pa.array(np.zeros(n, dtype=np.int64)),
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(nt),
            "local_start": pa.array(start),
            "key_d": pa.array(np.full(n, first_d, dtype=np.int64)),
        })
        stat = pa.table({
            "kind": pa.array([1], type=pa.int64()),
            "doc_id": pa.array([first_d], type=pa.int64()),
            "n_tokens": pa.array([int(nt.sum())], type=pa.int64()),
            "local_start": pa.array([0], type=pa.int64()),
            "key_d": pa.array([first_d], type=pa.int64()),
        })
        return pa.concat_tables([rows, stat])

    out = srt.map_batches(block_pack, batch_format="pyarrow",
                          batch_size=None).materialize()
    stats = (out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)),
        batch_format="pyarrow").to_pandas())  # O(blocks)
    if stats.empty:  # empty documents table
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "seq_first": pa.array([], type=pa.int64()),
            "seq_last": pa.array([], type=pa.int64()),
            "seq_offset": pa.array([], type=pa.int64())}))
    stats = stats.sort_values("key_d", kind="stable")
    offs = {}
    running = 0
    for r in stats.itertuples():
        offs[int(r.key_d)] = running
        running += int(r.n_tokens)
    offs_ref = ray.put(offs)

    def finish(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        kd = batch.column("key_d").to_numpy().astype(np.int64)
        nt = batch.column("n_tokens").to_numpy().astype(np.int64)
        local = batch.column("local_start").to_numpy().astype(np.int64)
        off = np.empty(len(kd), dtype=np.int64)
        for key in np.unique(kd):                  # one per block
            off[kd == key] = m[int(key)]
        tok_start = off + local
        # empty docs occupy no tokens: pin them to their start sequence
        seq_last = np.maximum(tok_start, tok_start + nt - 1) // seq_len
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(nt),
            "seq_first": pa.array(tok_start // seq_len, type=pa.int64()),
            "seq_last": pa.array(seq_last, type=pa.int64()),
            "seq_offset": pa.array(tok_start % seq_len, type=pa.int64()),
        })

    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)),
        batch_format="pyarrow")
    return rows.map_batches(finish, batch_format="pyarrow", fn_args=(offs_ref,))


def tfidf_top_terms(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """(doc_id, term, rank, score_milli) — each document's top-k terms by an
    integer-exact tf-idf variant: score = tf * (N * 1000 // df), ties broken
    (score desc, term asc).  The linear inverse-df keeps every intermediate
    an integer, so the result is hash-exact against the SQL oracle (ln-based
    idf would be at the mercy of libm ulp differences).

    Two passes, both vocabulary-bounded after the combiner:
      1. document frequency: per-batch distinct (word, ndocs) partials ->
         native Sum groupby (vocab-sized result), broadcast once via
         ``ray.put`` as sorted arrays;
      2. per-doc scoring: tf from the doc alone + a vectorized
         ``searchsorted`` df lookup, block-local top-k per document (no
         exchange at all — doc rows never straddle batches)."""
    import numpy as np
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir)

    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(set(_RE_TOKEN_ASCII.findall(t)))
        return pa.table({"word": pa.array(list(c.keys()), type=pa.string()),
                         "ndocs": pa.array(list(c.values()), type=pa.int64())})

    df_tab = (ds.map_batches(df_partial, batch_format="pyarrow")
                .groupby("word").aggregate(Sum("ndocs"))
                .materialize())
    n_docs = int(ds.count())
    parts = [t for t in ray.get(df_tab.to_arrow_refs()) if t.num_rows]
    words = np.concatenate([np.asarray(t.column("word").to_pylist(), dtype=object)
                            for t in parts]) if parts else np.empty(0, dtype=object)
    dfs = np.concatenate([t.column("sum(ndocs)").to_numpy() for t in parts]) \
        if parts else np.empty(0, dtype=np.int64)
    order = np.argsort(words)
    vocab_ref = ray.put((words[order], dfs[order].astype(np.int64), n_docs))

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        vwords, vdf, n = ray.get(vocab_ref)
        out = {"doc_id": [], "term": [], "rank": [], "score_milli": []}
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            c = Counter(_RE_TOKEN_ASCII.findall(text))
            if not c:
                continue
            terms = np.asarray(list(c.keys()), dtype=object)
            tf = np.asarray(list(c.values()), dtype=np.int64)
            pos = np.searchsorted(vwords, terms)
            df = vdf[np.minimum(pos, len(vdf) - 1)]
            s = tf * (n * 1000 // df)
            # top-k by (score desc, term asc): argsort on term then stable
            # sort on -score keeps term order inside equal scores
            t_order = np.argsort(terms, kind="stable")
            s_order = t_order[np.argsort(-s[t_order], kind="stable")][:k]
            out["doc_id"].extend([doc_id] * len(s_order))
            out["term"].extend(terms[s_order].tolist())
            out["rank"].extend(range(1, len(s_order) + 1))
            out["score_milli"].extend(int(x) for x in s[s_order])
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "term": pa.array(out["term"], type=pa.string()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "score_milli": pa.array(out["score_milli"], type=pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_top_docs(sf_dir: str, n_terms: int = 4,
                  k: int = 10) -> ray.data.Dataset:
    """(doc_id, score_milli, rank) — BM25 retrieval over the corpus for a
    deterministic query (the ``n_terms`` highest-document-frequency words,
    ties to the lexicographically smaller): the ranking primitive behind
    quality-targeted sampling and retrieval-based decontamination.

    INTEGER-EXACT BM25 so the result byte-matches the SQL oracle: with
    k1 = 6/5 and b = 3/4 (the standard 1.2 / 0.75 as exact rationals), the
    per-term score

        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    multiplied through by ``10*S`` (S = total corpus tokens, avgdl = S/N)
    becomes

        score_milli = idf_milli * 22*S*tf // (10*S*tf + 3*S + 9*dl*N)

    — every operand an int64 (idf_milli = N*1000 // df, the same linear
    integer idf as tfidf_top_terms: ln-idf would be at the mercy of libm
    ulps).  Safe while idf_milli*22*S*tf < 2^63, which holds through sf1
    with wide margin (~5e17).

    Plan: one vocabulary-bounded df exchange (combiner partials -> native
    Sum groupby) also yields N, S and the query terms; scoring is then a
    single embarrassing pass with block-local top-k, and the driver merges
    O(k x blocks) candidate rows — never documents."""
    import numpy as np
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir)

    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        toks = 0
        for t in batch.column("text").to_pylist():
            words = _RE_TOKEN_ASCII.findall(t)
            toks += len(words)
            c.update(set(words))
        return pa.table({
            "word": pa.array(list(c.keys()) + [""], type=pa.string()),
            "ndocs": pa.array(list(c.values()) + [0], type=pa.int64()),
            "toks": pa.array([0] * len(c) + [toks], type=pa.int64()),
        })

    df_tab = (ds.map_batches(df_partial, batch_format="pyarrow")
                .groupby("word").aggregate(Sum("ndocs"), Sum("toks"))
                .materialize())
    n_docs = int(ds.count())
    parts = [t for t in ray.get(df_tab.to_arrow_refs()) if t.num_rows]
    words = np.concatenate([np.asarray(t.column("word").to_pylist(),
                                       dtype=object) for t in parts])
    dfs = np.concatenate([t.column("sum(ndocs)").to_numpy() for t in parts])
    total_toks = int(sum(int(t.column("sum(toks)").to_numpy().sum())
                         for t in parts))
    real = words != ""
    words, dfs = words[real], dfs[real].astype(np.int64)
    # query = top-n_terms by (df desc, word asc)
    w_order = np.argsort(words, kind="stable")
    pick = w_order[np.argsort(-dfs[w_order], kind="stable")][:n_terms]
    q_terms = sorted(words[pick].tolist())
    q_idf = {w: int(n_docs * 1000 // dfs[np.flatnonzero(words == w)[0]])
             for w in q_terms}
    q_ref = ray.put((q_terms, q_idf, n_docs, total_toks))

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        terms, idf, n, s = ray.get(q_ref)
        out = {"doc_id": [], "score_milli": []}
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = _RE_TOKEN_ASCII.findall(text)
            dl = len(toks)
            c = Counter(toks)
            total = 0
            for w in terms:
                tf = c.get(w, 0)
                if tf:
                    total += (idf[w] * 22 * s * tf
                              // (10 * s * tf + 3 * s + 9 * dl * n))
            if total > 0:
                out["doc_id"].append(doc_id)
                out["score_milli"].append(total)
        t = pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "score_milli": pa.array(out["score_milli"], type=pa.int64()),
        })
        if t.num_rows > k:  # block-local top-k candidates
            o = np.lexsort((t.column("doc_id").to_numpy(),
                            -t.column("score_milli").to_numpy()))[:k]
            t = t.take(pa.array(np.sort(o)))
        return t

    cand = [t for t in ray.get(
        ds.map_batches(score, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    allc = pa.concat_tables(cand) if cand else pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "score_milli": pa.array([], type=pa.int64())})
    ids = allc.column("doc_id").to_numpy()
    sc = allc.column("score_milli").to_numpy()
    o = np.lexsort((ids, -sc))[:k]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids[o], type=pa.int64()),
        "score_milli": pa.array(sc[o], type=pa.int64()),
        "rank": pa.array(np.arange(1, len(o) + 1, dtype=np.int64)),
    }))


def sample_per_source(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """(source, doc_id, rank) — STRATIFIED deterministic sample: the k
    documents with the smallest md5(doc_id) per source (every stratum gets
    equal representation however skewed the corpus).  Per-batch bottom-k
    per source is the combiner, so each block contributes at most
    k x |sources in block| rows to the exchange; the grouped pick is then
    bounded by k x blocks per stratum.  ``source`` here is a low-cardinality
    stratum key (per-group dispatch is fine); for high-cardinality strata
    use the sorted-run ranking of ``joins.top_orders_per_cust``."""
    import hashlib

    def bottomk(batch: pa.Table) -> pa.Table:
        rows = sorted(zip(batch.column("source").to_pylist(),
                          (hashlib.md5(str(i).encode()).hexdigest()
                           for i in batch.column("doc_id").to_pylist()),
                          batch.column("doc_id").to_pylist()))
        keep, seen = [], {}
        for src, h, i in rows:
            c = seen.get(src, 0)
            if c < k:
                keep.append((src, h, i))
                seen[src] = c + 1
        return pa.table({
            "source": pa.array([r[0] for r in keep], type=pa.string()),
            "h": pa.array([r[1] for r in keep], type=pa.string()),
            "doc_id": pa.array([r[2] for r in keep], type=pa.int64()),
        })

    parts = (_read_documents(sf_dir, columns=("doc_id", "source"))
             .map_batches(bottomk, batch_format="pyarrow"))

    def pick(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group.column("h").to_pylist(),
                          group.column("doc_id").to_pylist()))[:k]
        return pa.table({
            "source": group.column("source").slice(0, len(rows)),
            "doc_id": pa.array([i for _, i in rows], type=pa.int64()),
            "rank": pa.array(range(1, len(rows) + 1), type=pa.int64()),
        })

    return parts.groupby("source").map_groups(pick, batch_format="pyarrow")


def unigram_logprob(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens, avg_logprob_milli) — corpus-unigram language-model
    score per document (the CCNet/KenLM-style quality signal: natural text
    scores near the corpus average, gibberish and boilerplate score far
    below/above).  avg_logprob_milli = round(mean over tokens of
    ln P(token)) x 1000, integer.

    Pass 1 builds the unigram model with the word-count combiner + native
    Sum groupby (vocabulary-bounded), broadcast once via ``ray.put`` as
    sorted arrays; pass 2 scores each document vectorized (searchsorted
    lookup, one mean per doc).  Not SQL-oracled: ln() is libm-dependent;
    pinned instead by a brute-force pytest."""
    import numpy as np
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_RE_TOKEN_ASCII.findall(t))
        return pa.table({"word": pa.array(list(c.keys()), type=pa.string()),
                         "n": pa.array(list(c.values()), type=pa.int64())})

    vocab = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("word").aggregate(Sum("n")).materialize())
    parts = [t for t in ray.get(vocab.to_arrow_refs()) if t.num_rows]
    words = np.concatenate([np.asarray(t.column("word").to_pylist(), dtype=object)
                            for t in parts]) if parts else np.empty(0, dtype=object)
    counts = np.concatenate([t.column("sum(n)").to_numpy() for t in parts]) \
        if parts else np.empty(0, dtype=np.int64)
    order = np.argsort(words)
    words, counts = words[order], counts[order].astype(np.float64)
    total = counts.sum()
    logp = np.log(counts / total) if total else counts
    model_ref = ray.put((words, logp))

    def score(batch: pa.Table) -> pa.Table:
        vwords, vlogp = ray.get(model_ref)
        ids, n_toks, milli = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = _RE_TOKEN_ASCII.findall(text)
            ids.append(doc_id)
            n_toks.append(len(toks))
            if not toks:
                milli.append(0)
                continue
            pos = np.searchsorted(vwords, np.asarray(toks, dtype=object))
            avg = float(vlogp[np.minimum(pos, len(vlogp) - 1)].mean())
            milli.append(-int(np.floor(-avg * 1000 + 0.5)))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "n_tokens": pa.array(n_toks, type=pa.int64()),
                         "avg_logprob_milli": pa.array(milli, type=pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


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


def bigram_topk(sf_dir: str, k: int = 30) -> ray.data.Dataset:
    """Global top-k adjacent word pairs — the n-gram extension of
    ``word_topk`` (language-model count tables, collocation mining).
    Same shape: per-batch bigram Counter combiner (one row per distinct
    pair per batch; pairs never cross document boundaries), native Sum
    groupby over the pair vocabulary (vocab^2-bounded, not corpus-
    bounded), sort + limit with (count desc, w1 asc, w2 asc) ties."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir, columns=("text",))

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            ws = _RE_TOKEN_ASCII.findall(t)
            c.update(zip(ws, ws[1:]))
        w1 = [p[0] for p in c]
        w2 = [p[1] for p in c]
        return pa.table({"w1": pa.array(w1, type=pa.string()),
                         "w2": pa.array(w2, type=pa.string()),
                         "n": pa.array(list(c.values()), type=pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["w1", "w2"]).aggregate(Sum("n")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"w1": batch.column("w1"),
                         "w2": batch.column("w2"),
                         "neg_n": pc.multiply(batch.column("sum(n)"),
                                              pa.scalar(-1))})

    def to_out(batch: pa.Table) -> pa.Table:
        return pa.table({"w1": batch.column("w1"),
                         "w2": batch.column("w2"),
                         "n": pc.multiply(batch.column("neg_n"),
                                          pa.scalar(-1))})

    return (agg.map_batches(finish, batch_format="pyarrow")
               .sort(["neg_n", "w1", "w2"])
               .limit(k)
               .map_batches(to_out, batch_format="pyarrow"))


def lang_source_chi2(sf_dir: str) -> ray.data.Dataset:
    """(chi2, dof) — Pearson chi-square independence statistic over the
    (lang, source) contingency table: the corpus-audit signal for "is
    language distribution independent of source?".

    One native partial-agg Count groupby over the two key columns (cell
    count is key-domain bounded, control-plane sized); the full
    observed-langs x observed-sources matrix — INCLUDING zero-observed
    cells, which still contribute their expectation — pivots on the
    driver and the statistic is one vectorized fold.  No logs involved,
    so (unlike entropy/logprob scores) the value is SQL-oracle-safe."""
    import numpy as np
    from ray.data.aggregate import Count

    ds = _read_documents(sf_dir, ("lang", "source"))
    cells = (ds.groupby(["lang", "source"]).aggregate(Count())
             .to_pandas())
    piv = cells.pivot_table(index="lang", columns="source",
                            values="count()", fill_value=0,
                            aggfunc="sum").to_numpy().astype(np.float64)
    n = piv.sum()
    exp = piv.sum(axis=1, keepdims=True) * piv.sum(axis=0, keepdims=True) / n
    chi2 = float(((piv - exp) ** 2 / exp).sum())
    dof = (piv.shape[0] - 1) * (piv.shape[1] - 1)
    from .relational import _round_nd

    return ray.data.from_arrow(pa.table({
        "chi2": pa.array([_round_nd(chi2, 2)], type=pa.float64()),
        "dof": pa.array([dof], type=pa.int64()),
    }))


def adaptive_quality_filter(sf_dir: str, pct: float = 0.25) -> ray.data.Dataset:
    """(doc_id) — documents at or above their OWN SOURCE's ``pct``
    quality percentile: the per-domain adaptive threshold cut (a fixed
    global threshold over-prunes clean sources and under-prunes noisy
    ones — the CCNet-bucket idea as a filter).

    Pass 1 scores quality per doc and shrinks to per-(source, quality)
    histogram partials (quality_milli has a <= 1001-value domain, so the
    exchange is source x domain bounded); the exact per-source
    PERCENTILE_CONT threshold falls out of the merged histogram and
    broadcasts as a dict in the task closure (source-bounded).  Pass 2
    re-scores and filters — stateless, so the two passes stream."""
    import numpy as np
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir, ("doc_id", "text", "source"))

    def hist(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("source"))
        q = np.asarray([quality_stats(t)["quality_milli"]
                        for t in batch.column("text").to_pylist()],
                       dtype=np.int64)
        key = np.asarray([f"{s}\x00{v}" for s, v in zip(src, q)], dtype=object)
        u, cnt = np.unique(key, return_counts=True)
        srcs = [k.split("\x00")[0] for k in u]
        vals = [int(k.split("\x00")[1]) for k in u]
        return pa.table({"source": pa.array(srcs, type=pa.string()),
                         "q": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    part = (ds.map_batches(hist, batch_format="pyarrow")
            .groupby(["source", "q"]).aggregate(Sum("n")).to_pandas())
    thr: dict = {}
    from ..ops.sketches import _hist_percentile_cont  # noqa: circular-safe

    for src, grp in part.groupby("source"):
        order = np.argsort(grp["q"].to_numpy())
        u = grp["q"].to_numpy().astype(np.float64)[order]
        tot = grp["sum(n)"].to_numpy().astype(np.int64)[order]
        thr[str(src)] = _hist_percentile_cont(u, tot, pct)

    def keep(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("source"))
        q = np.asarray([quality_stats(t)["quality_milli"]
                        for t in batch.column("text").to_pylist()],
                       dtype=np.float64)
        t = np.asarray([thr[s] for s in src])
        return pa.table({"doc_id": batch.column("doc_id").filter(
            pa.array(q >= t))})

    return ds.map_batches(keep, batch_format="pyarrow")


def source_cap(sf_dir: str, cap: int = 64) -> ray.data.Dataset:
    """(source, n_kept, kept_chars, max_kept_doc) — cap each source at its
    ``cap`` lowest-doc_id documents (the FineWeb/Gopher-style per-domain
    cap: bound any one domain's contribution to the training mix with a
    deterministic keep rule), summarized per source.

    Plan: grouped smallest-k via block-local sufficient statistics — each
    block emits at most ``cap`` candidate rows per source it touches (the
    global smallest-k is contained in the union of block-local smallest-ks),
    then ONE distributed grouped heal re-ranks candidates and aggregates.
    Candidate volume is blocks x sources x cap — control-plane sized here,
    and still dup-bounded at a million domains because the heal is a
    grouped exchange, never a driver materialization.  A hot source
    spanning B blocks ships cap*B rows to one heal task, never its corpus.
    """
    import numpy as np

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def block_candidates(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        s = np.asarray(batch.column("source").to_pylist(), dtype=object)
        c = batch.column("n_chars").to_numpy().astype(np.int64)
        order = np.lexsort((d, s))
        ds_, ss, cs = d[order], s[order], c[order]
        first = np.r_[True, ss[1:] != ss[:-1]]
        grp = np.cumsum(first) - 1
        rank = np.arange(len(ds_)) - np.flatnonzero(first)[grp]
        keep = rank < cap
        return pa.table({"source": pa.array(ss[keep].tolist(), type=pa.string()),
                         "doc_id": pa.array(ds_[keep], type=pa.int64()),
                         "n_chars": pa.array(cs[keep], type=pa.int64())})

    def heal(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy().astype(np.int64)
        c = group.column("n_chars").to_numpy().astype(np.int64)
        top = np.sort(np.unique(d))[:cap]
        sel = np.isin(d, top)
        # doc_ids are unique per source, so sel picks exactly the kept docs
        return pa.table({
            "source": group.column("source").slice(0, 1),
            "n_kept": pa.array([int(sel.sum())], type=pa.int64()),
            "kept_chars": pa.array([int(c[sel].sum())], type=pa.int64()),
            "max_kept_doc": pa.array([int(d[sel].max())], type=pa.int64()),
        })

    return (ds.map_batches(block_candidates, batch_format="pyarrow")
              .groupby("source").map_groups(heal, batch_format="pyarrow")
              .sort("source"))


def _bpe_train(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Word-level BPE training (Sennrich et al. 2016): repeatedly merge the
    most frequent adjacent symbol pair (ties: lexicographic pair, so the
    result is deterministic across platforms).  Words carry an end-of-word
    marker so merges cannot cross word boundaries."""
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word under the trained merge ranks."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_token_stats(sf_dir: str, n_merges: int = 48,
                    sample_k: int = 512) -> ray.data.Dataset:
    """(source, n_docs, total_tokens) — train a BPE tokenizer on a
    deterministic corpus sample, then tokenize the WHOLE corpus with it
    (the standard train-tokenizer-then-count pipeline stage).

    Plan: the training sample is the ``sample_docs`` bottom-k-by-md5 sketch
    (k texts land on the driver — k-bounded, never corpus-bounded); training
    is driver-side over word FREQUENCIES (vocabulary-sized, not
    corpus-sized).  The merge table broadcasts once via ``ray.put``; encode
    batches tokenize only each block's UNIQUE words (the word-cache trick
    real BPE implementations use — per-block cost is vocabulary-, not
    token-, bounded) and the per-source rollup is one native Sum exchange.
    Not SQL-expressible (iterative merge training) -> rows-only entry."""
    import hashlib

    import numpy as np

    from ray.data.aggregate import Count, Sum

    docs = _read_documents(sf_dir, columns=("doc_id", "text", "source"))

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keyed = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i, t)
            for i, t in zip(ids, texts))[:sample_k]
        return pa.table({
            "h": pa.array([h for h, _, _ in keyed], type=pa.string()),
            "text": pa.array([t for _, _, t in keyed], type=pa.string()),
        })

    sample = pa.concat_tables(
        [t for t in (ray.get(r) for r in docs.map_batches(
            bottomk, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows])
    order = sorted(range(sample.num_rows),
                   key=lambda i: sample.column("h")[i].as_py())[:sample_k]
    word_freqs: dict[str, int] = {}
    for i in order:
        for w in sample.column("text")[i].as_py().split():
            word_freqs[w] = word_freqs.get(w, 0) + 1
    merges = _bpe_train(word_freqs, n_merges)
    ranks_ref = ray.put({p: r for r, p in enumerate(merges)})

    def encode_counts(batch: pa.Table, ref) -> pa.Table:
        ranks = ray.get(ref)
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        cache: dict[str, int] = {}
        per_src: dict[str, list[int]] = {}
        for t, s in zip(texts, srcs):
            tok = 0
            for w in t.split():
                c = cache.get(w)
                if c is None:
                    c = cache[w] = _bpe_encode_word(w, ranks)
                tok += c
            agg = per_src.setdefault(s, [0, 0])
            agg[0] += 1
            agg[1] += tok
        keys = sorted(per_src)
        return pa.table({
            "source": pa.array(keys, type=pa.string()),
            "d": pa.array([per_src[k][0] for k in keys], type=pa.int64()),
            "t": pa.array([per_src[k][1] for k in keys], type=pa.int64()),
        })

    agg = (docs.map_batches(encode_counts, batch_format="pyarrow",
                            fn_args=(ranks_ref,))
               .groupby("source").aggregate(Sum("d"), Sum("t")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b.column("source"),
            "n_docs": b.column("sum(d)").cast(pa.int64()),
            "total_tokens": b.column("sum(t)").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort("source")


def source_cap_filter(sf_dir: str, cap: int = 64) -> ray.data.Dataset:
    """(doc_id, source) — the actual capped corpus: every document that
    survives the per-source ``cap`` (lowest-doc_id keep rule), sorted by
    doc_id.  The materializing companion to ``source_cap``: this is the
    stage a curation pipeline composes downstream of.

    Plan: the per-source keep rule "doc_id among the cap smallest" is
    equivalent to "doc_id <= the source's cap-th smallest doc_id", so the
    op reduces to a THRESHOLD BROADCAST — block-local smallest-cap
    candidates (sufficient statistics, cap*B rows per source) heal to one
    threshold row per source, and the corpus then streams once through a
    searchsorted filter.  Driver state is |sources| thresholds, never rows;
    a hot source costs candidate rows, not its corpus."""
    import numpy as np

    ds = _read_documents(sf_dir, columns=("doc_id", "source"))

    def block_candidates(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        s = np.asarray(batch.column("source").to_pylist(), dtype=object)
        order = np.lexsort((d, s))
        ds_, ss = d[order], s[order]
        first = np.r_[True, ss[1:] != ss[:-1]]
        grp = np.cumsum(first) - 1
        rank = np.arange(len(ds_)) - np.flatnonzero(first)[grp]
        keep = rank < cap
        return pa.table({"source": pa.array(ss[keep].tolist(), type=pa.string()),
                         "doc_id": pa.array(ds_[keep], type=pa.int64())})

    def heal(group: pa.Table) -> pa.Table:
        d = np.unique(group.column("doc_id").to_numpy().astype(np.int64))
        thr = int(d[:cap][-1])  # cap-th smallest (or max when size < cap)
        return pa.table({"source": group.column("source").slice(0, 1),
                         "thr": pa.array([thr], type=pa.int64())})

    thr_tab = pa.concat_tables(
        [t for t in
         (ray.get(r) for r in
          ds.map_batches(block_candidates, batch_format="pyarrow")
            .groupby("source").map_groups(heal, batch_format="pyarrow")
            .to_arrow_refs())
         if t.num_rows])
    srcs = np.asarray(thr_tab.column("source").to_pylist(), dtype=object)
    thrs = thr_tab.column("thr").to_numpy().astype(np.int64)
    order = np.argsort(srcs)
    thr_ref = ray.put((srcs[order], thrs[order]))

    def keep_rows(batch: pa.Table, ref) -> pa.Table:
        ks, ts = ray.get(ref)
        s = np.asarray(batch.column("source").to_pylist(), dtype=object)
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        pos = np.searchsorted(ks, s)
        m = d <= ts[np.minimum(pos, len(ts) - 1)]
        t = batch.filter(pa.array(m))
        return pa.table({"doc_id": t.column("doc_id"),
                         "source": t.column("source")})

    return (ds.map_batches(keep_rows, batch_format="pyarrow",
                           fn_args=(thr_ref,))
              .sort("doc_id"))


def k_anonymity_audit(sf_dir: str, k: int = 50) -> ray.data.Dataset:
    """One-row privacy audit over the (lang, source) quasi-identifier pair:
    how many documents sit in cells smaller than ``k`` (re-identification
    exposure under k-anonymity), plus cell-count statistics.

    Plan: per-batch (lang, source, count) combiner rows -> one native Sum
    groupby over the CELL table (|langs| x |sources| — dimension-bounded,
    never corpus-bounded) -> single-row driver finish."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir, columns=("lang", "source"))

    def partial(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        key = np.char.add(np.char.add(lang.astype(str), "\x1f"),
                          src.astype(str))
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"cell": pa.array(uk.tolist(), type=pa.string()),
                         "n": pa.array(cnt, type=pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("cell").aggregate(Sum("n")))
    parts = pa.concat_tables(
        [t for t in (ray.get(r) for r in agg.to_arrow_refs()) if t.num_rows])
    n = parts.column("sum(n)").to_numpy()
    below = n < k
    return ray.data.from_arrow(pa.table({
        "n_cells": pa.array([len(n)], type=pa.int64()),
        "min_cell": pa.array([int(n.min())], type=pa.int64()),
        "cells_below_k": pa.array([int(below.sum())], type=pa.int64()),
        "rows_below_k": pa.array([int(n[below].sum())], type=pa.int64()),
    }))


def doc_length_outliers(sf_dir: str,
                        p_lo: float = 0.05,
                        p_hi: float = 0.95) -> ray.data.Dataset:
    """(source, p05, p95, n_kept, n_trimmed) sorted by source — the
    per-source quantile length trim (the classic curation step "drop each
    domain's own length outliers", which a single global threshold cannot
    express because domains have wildly different length profiles).

    Plan: thresholds come from the shared adaptive-refinement percentile
    core (``_exact_percentile_values``: one histogram pass per round over
    ALL (source, pct) targets simultaneously — exact PERCENTILE_CONT with
    DuckDB's verbatim lo + frac*(hi-lo) interpolation, so int-vs-double
    boundary compares are seam-free); a second streaming pass counts
    kept/trimmed per source with block-local bincounts, and the driver
    merges O(blocks x sources) scalar rows.  Sources are the low-
    cardinality key the percentile core requires."""
    import numpy as np

    from ..sources.readers import read_table

    from .sketches import _exact_percentile_values

    ds = read_table(sf_dir, "documents", ["source", "n_chars"])
    vals = _exact_percentile_values(ds, "n_chars", "source", (p_lo, p_hi))
    if not vals:
        return ray.data.from_arrow(pa.table({
            "source": pa.array([], type=pa.string()),
            "p05": pa.array([], type=pa.float64()),
            "p95": pa.array([], type=pa.float64()),
            "n_kept": pa.array([], type=pa.int64()),
            "n_trimmed": pa.array([], type=pa.int64())}))
    sources = sorted({k for k, _ in vals})
    lo = np.array([vals[(s, p_lo)] for s in sources])
    hi = np.array([vals[(s, p_hi)] for s in sources])
    src_arr = np.array(sources)
    lo_ref = ray.put(lo)
    hi_ref = ray.put(hi)
    src_ref = ray.put(src_arr)

    def counts(b: pa.Table, s_ref, l_ref, h_ref) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"si": pa.array([], type=pa.int64()),
                             "kept": pa.array([], type=pa.int64()),
                             "trimmed": pa.array([], type=pa.int64())})
        s_all, l_all, h_all = ray.get(s_ref), ray.get(l_ref), ray.get(h_ref)
        src = b.column("source").to_numpy(zero_copy_only=False)
        n = b.column("n_chars").to_numpy().astype(np.float64)
        si = np.searchsorted(s_all, src)
        keep = (n >= l_all[si]) & (n <= h_all[si])
        k = np.bincount(si[keep], minlength=len(s_all)).astype(np.int64)
        t = np.bincount(si[~keep], minlength=len(s_all)).astype(np.int64)
        nz = np.flatnonzero(k + t)
        return pa.table({"si": pa.array(nz.astype(np.int64)),
                         "kept": pa.array(k[nz]), "trimmed": pa.array(t[nz])})

    parts = pa.concat_tables(
        [t for t in (ray.get(r) for r in
                     ds.map_batches(counts, batch_format="pyarrow",
                                    fn_args=(src_ref, lo_ref, hi_ref))
                     .to_arrow_refs()) if t.num_rows])
    kept = np.zeros(len(sources), dtype=np.int64)
    trimmed = np.zeros(len(sources), dtype=np.int64)
    np.add.at(kept, parts.column("si").to_numpy(), parts.column("kept").to_numpy())
    np.add.at(trimmed, parts.column("si").to_numpy(),
              parts.column("trimmed").to_numpy())
    return ray.data.from_arrow(pa.table({
        "source": pa.array(sources, type=pa.string()),
        "p05": pa.array(lo, type=pa.float64()),
        "p95": pa.array(hi, type=pa.float64()),
        "n_kept": pa.array(kept), "n_trimmed": pa.array(trimmed)}))


def dsir_target_affinity(sf_dir: str, target_source: str = "src0",
                         n_buckets: int = 1024) -> ray.data.Dataset:
    """(doc_id, target_affinity_milli) — DSIR-SHAPED data selection score
    (Xie et al., "Data Selection for Language Models via Importance
    Resampling"): hashed-bigram bucket features, per-document affinity to
    a TARGET distribution (here: the ``target_source`` docs) relative to
    the raw corpus.  Deviation from the paper, documented: the per-bucket
    weight is the LINEAR normalized-frequency ratio in milli units
    (t_b * N_raw * 1000 // (r_b * N_target)) rather than a log-ratio —
    the integer form is hash-exact against the SQL oracle where libm's
    ln() is not, and is order-equivalent per bucket.

    Buckets are md5(bigram) % n_buckets (the engine-independent md5 idiom
    shared with the sampling ops).  Plan: one bucket-count exchange
    (per-batch bincount partials over raw + target, merged on the driver
    into two n_buckets-long arrays — control-plane sized), broadcast
    once; scoring is a single embarrassing pass.  Documents with no
    bigram (fewer than two tokens) are absent, matching the SQL."""
    import hashlib

    import numpy as np

    ds = _read_documents(sf_dir, columns=("doc_id", "text", "source"))

    def _buckets(text: str) -> np.ndarray:
        w = _RE_TOKEN_ASCII.findall(text)
        if len(w) < 2:
            return np.empty(0, dtype=np.int64)
        return np.fromiter(
            (int(hashlib.md5((a + " " + b).encode()).hexdigest()[:8], 16)
             % n_buckets for a, b in zip(w, w[1:])),
            dtype=np.int64, count=len(w) - 1)

    def count_partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        raw = np.zeros(n_buckets, dtype=np.int64)
        tgt = np.zeros(n_buckets, dtype=np.int64)
        for text, src in zip(batch.column("text").to_pylist(),
                             batch.column("source").to_pylist()):
            b = _buckets(text)
            if len(b):
                raw += np.bincount(b, minlength=n_buckets)
                if src == target_source:
                    tgt += np.bincount(b, minlength=n_buckets)
        return pa.table({"raw": pa.array([raw.tobytes()], type=pa.binary()),
                         "tgt": pa.array([tgt.tobytes()], type=pa.binary())})

    import ray

    parts = [t for t in ray.get(
        ds.map_batches(count_partial, batch_format="pyarrow")
          .to_arrow_refs()) if t.num_rows]
    import numpy as np

    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    for t in parts:
        for rb, tb in zip(t.column("raw").to_pylist(),
                          t.column("tgt").to_pylist()):
            raw += np.frombuffer(rb, dtype=np.int64)
            tgt += np.frombuffer(tb, dtype=np.int64)
    nr, nt = int(raw.sum()), int(tgt.sum())
    if nt == 0:
        raise ValueError(f"no documents with source={target_source!r}")
    # per-bucket milli weight; buckets with r_b == 0 are never queried
    # (a document's own bigrams are part of the raw counts)
    w_milli = np.zeros(n_buckets, dtype=np.int64)
    nz = raw > 0
    w_milli[nz] = tgt[nz] * nr * 1000 // (raw[nz] * nt)
    w_ref = ray.put(w_milli)

    def score(batch: pa.Table, ref) -> pa.Table:
        import numpy as np

        w = ray.get(ref)
        ids, scores = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            b = _buckets(text)
            if len(b) == 0:
                continue
            ids.append(doc_id)
            scores.append(int(w[b].sum()))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "target_affinity_milli": pa.array(scores, type=pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", fn_args=(w_ref,))
