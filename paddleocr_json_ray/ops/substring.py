"""Exact-substring deduplication (Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL 2022): remove every duplicated run of
``min_len`` tokens EXCEPT its canonical first occurrence, keeping the rest
of each document — the surgical counterpart to the document-level dedup
family in ``ops/dedup.py``.

Semantics (L-gram marking approximation of the suffix-array method): a
token position p of document d is REMOVED iff the L-token gram starting at
p occurs elsewhere in the corpus (any other document or position) and
(d, p) is not the gram's canonical owner — the lexicographically smallest
(doc_id, pos) occurrence.  Overlapping marked windows merge, so any shared
run of length >= L is excised in one piece from every non-owner copy.
Grams are 64-bit polynomial hashes of FNV-hashed tokens (collision odds
~n^2 / 2^64 — negligible at any realistic gram count).

Scale shape, two passes over the corpus (both streaming):
  * Pass A emits one (gram, packed owner, count) row per DISTINCT gram per
    batch (an in-batch sort + reduceat combiner — never one row per
    token), merged by a native Min/Sum groupby.  Duplicated grams
    (count >= 2) are DUP-BOUNDED — the same bound every candidate-pair
    stage in ops/dedup.py relies on — and are broadcast once as sorted
    object-store blocks.
  * Pass B re-streams documents, recomputes gram hashes per batch, marks
    non-owner occurrences with one ``searchsorted`` membership probe, and
    cuts merged windows vectorized.  No shuffle: the only exchange is the
    gram groupby in pass A.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.textstats import _RE_TOKEN, fnv1a64_tokens

_POS_BITS = 20  # packed owner = doc_id << 20 | pos  (docs hold < 1M tokens)
_MULT = np.uint64(1099511628211)


def _batch_grams(texts: list[str], doc_ids: np.ndarray, min_len: int):
    """All L-grams of a batch in one vectorized pass: token hashes of every
    doc concatenate into one stream; gram hashes roll over the stream and
    grams spanning document boundaries are masked out.  Returns (gram
    uint64, doc int64, pos int64, tokens-per-doc, token lists)."""
    tok_lists = [_RE_TOKEN.findall(t) for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    flat = [w for toks in tok_lists for w in toks]
    h = fnv1a64_tokens(flat)
    n = len(h)
    if n < min_len:
        e = np.empty(0, dtype=np.int64)
        return e.view(np.uint64), e, e, lens, tok_lists
    with np.errstate(over="ignore"):
        acc = np.zeros(n - min_len + 1, dtype=np.uint64)
        for j in range(min_len):
            acc = acc * _MULT + h[j:j + len(acc)]
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    doc_of = np.repeat(np.arange(len(lens)), lens)[:len(acc)]
    pos = np.arange(len(acc)) - starts[doc_of]
    keep = pos + min_len <= lens[doc_of]  # gram fully inside its document
    return (acc[keep], doc_ids[doc_of[keep]], pos[keep], lens, tok_lists)


def duplicated_gram_owners(sf_dir: str, min_len: int) -> ray.data.Dataset:
    """(gram, owner) for every gram occurring >= 2 times corpus-wide;
    owner is the packed (doc_id, pos) of the canonical first occurrence.

    The reduce is the repo's sorted-run exchange, NOT a native multi-agg
    groupby: gram cardinality is corpus-sized (measured 6.9M partial rows
    / 6.0M groups on the x40 scaling corpus, where Min+Sum groupby took
    54 s vs ~6 s for sort + reduceat runs + grouped boundary heal — the
    round-2 many-small-groups finding again).  Interior runs are complete
    (their count is global), so the dup filter applies inside the block;
    only first/last-run (gram, min owner, partial count) stat rows reach
    the heal."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        g, d, p, _, _ = _batch_grams(batch.column("text").to_pylist(),
                                     ids, min_len)
        packed = (d << _POS_BITS) | p
        order = np.argsort(g, kind="stable")
        g, packed = g[order], packed[order]
        st = np.r_[0, np.flatnonzero(np.diff(g.view(np.int64))) + 1] \
            if len(g) else np.empty(0, dtype=np.int64)
        return pa.table({
            "gram": pa.array(g.view(np.int64)[st], type=pa.int64()),
            "owner": pa.array(np.minimum.reduceat(packed, st)
                              if len(g) else packed, type=pa.int64()),
            "cnt": pa.array(np.diff(np.r_[st, len(g)]), type=pa.int64()),
        })

    empty = pa.table({"kind": pa.array([], type=pa.int8()),
                      "gram": pa.array([], type=pa.int64()),
                      "owner": pa.array([], type=pa.int64()),
                      "cnt": pa.array([], type=pa.int64())})

    def runs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        g = b.column("gram").to_numpy()
        o = b.column("owner").to_numpy().astype(np.int64)
        c = b.column("cnt").to_numpy().astype(np.int64)
        bnd = np.flatnonzero(np.diff(g) != 0) + 1
        starts = np.r_[0, bnd]
        n_runs = len(starts)
        own = np.minimum.reduceat(o, starts)
        tot = np.add.reduceat(c, starts)
        interior = np.arange(1, n_runs - 1) if n_runs > 1 else np.empty(
            0, dtype=np.int64)
        interior = interior[tot[interior] >= 2]  # complete runs: filter now
        edge = np.unique(np.r_[0, n_runs - 1])
        sel = np.r_[interior, edge]
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(interior), dtype=np.int8),
                                   np.ones(len(edge), dtype=np.int8)]),
            "gram": pa.array(g[starts[sel]].astype(np.int64)),
            "owner": pa.array(own[sel]),
            "cnt": pa.array(tot[sel]),
        })

    from .dedup import _split_kinds

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .sort("gram")
           .map_batches(runs, batch_format="pyarrow", batch_size=None))
    interior, edges = _split_kinds(out, ["gram", "owner"],
                                   ["gram", "owner", "cnt"])

    def heal(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if int(pc.sum(group.column("cnt")).as_py()) < 2:
            return pa.table({"gram": pa.array([], type=pa.int64()),
                             "owner": pa.array([], type=pa.int64())})
        return pa.table({
            "gram": group.column("gram").slice(0, 1),
            "owner": pa.array([int(pc.min(group.column("owner")).as_py())],
                              type=pa.int64())})

    healed = edges.groupby("gram").map_groups(heal, batch_format="pyarrow")
    return interior.union(healed)


def _cut_rows(ids, lens, tok_lists, drop_by_doc, min_len):
    """Excise merged [pos, pos+L) windows per doc; returns the output
    columns shared by both tiers."""
    removed = np.zeros(len(ids), dtype=np.int64)
    out_text = []
    for k, (i, toks) in enumerate(zip(ids, tok_lists)):
        ps = drop_by_doc.get(int(i))
        if not ps:
            out_text.append(" ".join(toks))
            continue
        dead = np.zeros(len(toks), dtype=bool)
        for pp in ps:
            dead[pp:pp + min_len] = True
        removed[k] = int(dead.sum())
        out_text.append(" ".join(t for t, dd_ in zip(toks, dead) if not dd_))
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "n_tokens": pa.array(lens, type=pa.int64()),
        "n_removed": pa.array(removed, type=pa.int64()),
        "clean_text": pa.array(out_text, type=pa.string()),
    })


def dedup_substrings(sf_dir: str, min_len: int = 20,
                     broadcast_max_grams: int | None = None) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_removed, clean_text) — documents with every
    non-canonical duplicated >= ``min_len``-token run excised.

    TWO TIERS on the duplicated-gram count (counted on the distributed
    aggregate; default cap $PJR_SUBSTR_BROADCAST_MAX or 20M grams = 320 MB
    of sorted int64 pairs):

      * broadcast tier: the dup (gram, owner) table ships once as sorted
        arrays; pass B marks non-owner occurrences with one searchsorted
        probe per batch — no second exchange.
      * bloom-join tier (beyond the cap — extreme dup rates where even the
        dup-bounded table outgrows the object store): a FIXED-memory Bloom
        bitmap over dup grams (512 KiB, per-block partials OR-merged)
        prunes each batch's grams to candidates, candidates join the dup
        table ON GRAM (candidate-bounded partitioned hash join — the
        ``big_order_lineitems_bloom`` pattern), surviving non-owner marks
        group per doc, and one doc-keyed left join carries the mark lists
        back to the documents for the cut.  Nothing dup-sized ever lands
        on the driver or in a single task.

    Both tiers are equality-tested on the planted-duplication corpus
    (tests/test_substring.py pins ``broadcast_max_grams=0``)."""
    import os

    from ..sources.readers import read_table

    cap = (broadcast_max_grams if broadcast_max_grams is not None
           else int(os.environ.get("PJR_SUBSTR_BROADCAST_MAX", 20_000_000)))
    dup_ds = duplicated_gram_owners(sf_dir, min_len).materialize()
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    if dup_ds.count() <= cap:
        # sort ONCE on the driver and broadcast the sorted arrays — a
        # per-task argsort of an up-to-cap table repeats identical
        # O(n log n) work in every batch (the _sorted_user_ts pattern)
        tabs = [t for t in ray.get(dup_ds.to_arrow_refs()) if t.num_rows]
        if tabs:
            dup = pa.concat_tables(tabs)
            grams_s = dup.column("gram").to_numpy().astype(np.int64)
            owners_s = dup.column("owner").to_numpy().astype(np.int64)
            order = np.argsort(grams_s)
            grams_s, owners_s = grams_s[order], owners_s[order]
        else:
            grams_s = np.empty(0, dtype=np.int64)
            owners_s = np.empty(0, dtype=np.int64)
        sorted_ref = ray.put((grams_s, owners_s))

        def cut(batch: pa.Table, ref) -> pa.Table:
            grams, owners = ray.get(ref)
            ids = batch.column("doc_id").to_numpy().astype(np.int64)
            g, d, p, lens, tok_lists = _batch_grams(
                batch.column("text").to_pylist(), ids, min_len)
            gi = g.view(np.int64)
            idx = np.searchsorted(grams, gi) if len(grams) else np.empty(0, np.int64)
            idx = np.minimum(idx, max(len(grams) - 1, 0))
            is_dup = (grams[idx] == gi) if len(grams) else np.zeros(len(gi), bool)
            packed = (d << _POS_BITS) | p
            marked = is_dup & (owners[idx] != packed) if len(grams) \
                else np.zeros(len(gi), bool)
            drop_by_doc: dict[int, list[int]] = {}
            for dd, pp in zip(d[marked], p[marked]):
                drop_by_doc.setdefault(int(dd), []).append(int(pp))
            return _cut_rows(ids, lens, tok_lists, drop_by_doc, min_len)

        return ds.map_batches(cut, batch_format="pyarrow",
                              fn_args=(sorted_ref,))

    # ---- bloom-join tier
    from .decontam import _BLOOM_BITS, _bloom_positions
    from .relational import _join_partitions

    def bloom_partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        g = batch.column("gram").to_numpy().astype(np.int64).view(np.uint64)
        pos = _bloom_positions(g).ravel()
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table({"bitmap": pa.array([bits.tobytes()], type=pa.binary())})

    bitmap = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for t in ray.get(dup_ds.map_batches(bloom_partial, batch_format="pyarrow")
                     .to_arrow_refs()):
        if t.num_rows == 0:  # union() upstream can emit schema-less blocks
            continue
        for buf in t.column("bitmap").to_pylist():
            bitmap |= np.frombuffer(buf, dtype=np.uint8)
    bloom_ref = ray.put(bitmap)

    def candidates(batch: pa.Table, bref) -> pa.Table:
        bits = ray.get(bref)
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        g, d, p, _, _ = _batch_grams(batch.column("text").to_pylist(),
                                     ids, min_len)
        if len(g) == 0:
            return pa.table({"gram": pa.array([], type=pa.int64()),
                             "packed": pa.array([], type=pa.int64())})
        pos = _bloom_positions(g)
        hit = np.ones(len(g), dtype=bool)
        for j in range(pos.shape[1]):
            hit &= (bits[pos[:, j] >> 3] & (1 << (pos[:, j] & 7))) != 0
        packed = (d << _POS_BITS) | p
        return pa.table({"gram": pa.array(g.view(np.int64)[hit], type=pa.int64()),
                         "packed": pa.array(packed[hit], type=pa.int64())})

    cand = ds.map_batches(candidates, batch_format="pyarrow",
                          fn_args=(bloom_ref,))
    dup_r = dup_ds.map_batches(
        lambda b: pa.table({"gj": b.column("gram"), "owner": b.column("owner")}),
        batch_format="pyarrow")
    joined = cand.join(dup_r, "inner",
                       num_partitions=_join_partitions(cand, dup_r),
                       on=("gram",), right_on=("gj",))

    def to_marks(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = b.filter(pc.not_equal(b.column("packed"), b.column("owner")))
        packed = t.column("packed").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(packed >> _POS_BITS, type=pa.int64()),
            "pos": pa.array(packed & ((1 << _POS_BITS) - 1), type=pa.int64()),
        })

    def collect_doc(group: pa.Table) -> pa.Table:
        # marks packed as an int64 byte blob: Arrow's hash join rejects
        # list-typed non-key payload columns
        did = group.column("doc_id")[0].as_py()
        ps = np.sort(group.column("pos").to_numpy().astype(np.int64))
        return pa.table({"md": pa.array([did], type=pa.int64()),
                         "marks": pa.array([ps.tobytes()], type=pa.binary())})

    marks = (joined.map_batches(to_marks, batch_format="pyarrow")
                   .groupby("doc_id").map_groups(collect_doc,
                                                 batch_format="pyarrow"))
    docs_marked = ds.join(marks, "left_outer",
                          num_partitions=_join_partitions(ds, marks),
                          on=("doc_id",), right_on=("md",))

    def cut_joined(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        tok_lists = [_RE_TOKEN.findall(t)
                     for t in batch.column("text").to_pylist()]
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        drop_by_doc = {int(i): np.frombuffer(ps, dtype=np.int64).tolist()
                       for i, ps in zip(ids, batch.column("marks").to_pylist())
                       if ps}
        return _cut_rows(ids, lens, tok_lists, drop_by_doc, min_len)

    return docs_marked.map_batches(cut_joined, batch_format="pyarrow")
