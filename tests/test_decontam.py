"""Round-3 curation additions vs brute-force oracles: benchmark
decontamination (exact + Bloom), LAG window, ROLLUP levels, bottom-k-by-hash
sampling, integer-exact tf-idf top terms."""

import hashlib
import os
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.ops import decontam, relational, text_ops, windows

_TOK = re.compile(r"[^ \t\n\r\f\v]+")

_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
          "kilo lima mike november oscar papa quebec romeo sierra tango").split()


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    """120 docs; ids divisible by 13 form the pseudo-benchmark.  Several
    non-benchmark docs deliberately embed verbatim 8-gram runs from
    benchmark docs (contaminated), most share nothing."""
    rng = np.random.default_rng(42)
    texts = []
    for i in range(120):
        toks = [_WORDS[int(j)] for j in rng.integers(0, len(_WORDS), size=30)]
        texts.append(" ".join(toks))
    # plant contamination: copy a 10-token run from benchmark doc 13 into
    # docs 5 and 7, and make doc 9 an exact copy of benchmark doc 26
    bench_toks = texts[13].split()
    t5 = texts[5].split()
    texts[5] = " ".join(t5[:5] + bench_toks[3:13] + t5[15:])
    t7 = texts[7].split()
    texts[7] = " ".join(bench_toks[10:20] + t7[10:])
    texts[9] = texts[26]
    d = tmp_path_factory.mktemp("docs")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(120), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }), os.path.join(str(d), "documents.parquet"))
    return str(d), texts


def _brute_contam(texts, n=8, mod=13):
    grams = [[" ".join(_TOK.findall(t)[i:i + n])
              for i in range(max(len(_TOK.findall(t)) - n + 1, 0))]
             for t in texts]
    bench = set()
    for i, g in enumerate(grams):
        if i % mod == 0:
            bench.update(g)
    out = {}
    for i, g in enumerate(grams):
        hit = sum(1 for x in g if x in bench)
        out[i] = (len(g), hit, hit * 1000 // len(g) if g else 0)
    return out


def test_decontaminate_exact(ray_session, docs_dir):
    d, texts = docs_dir
    got = decontam.decontaminate(d).to_pandas().set_index("doc_id")
    expect = _brute_contam(texts)
    assert len(got) == len(texts)
    for i, (ng, nh, milli) in expect.items():
        row = got.loc[i]
        assert (row["n_grams"], row["n_hit"], row["contam_milli"]) == (ng, nh, milli)
    # the planted contamination is detected; untouched docs are clean
    assert got.loc[5, "n_hit"] >= 3 and got.loc[7, "n_hit"] >= 3
    assert got.loc[9, "contam_milli"] == 1000  # verbatim benchmark copy


def test_bloom_never_undercounts(ray_session, docs_dir):
    """Bloom membership has no false negatives: per-doc approximate hit
    count >= the exact count, and equals it in aggregate within a small
    false-positive budget."""
    d, texts = docs_dir
    # sort_index: Ray block order is nondeterministic between the two runs,
    # and comparing differently-ordered Series raises ValueError.
    exact = decontam.decontaminate(d).to_pandas().set_index("doc_id").sort_index()
    approx = decontam.bloom_decontaminate(d).to_pandas().set_index("doc_id").sort_index()
    assert (approx["n_hit"] >= exact["n_hit"]).all()
    extra = int((approx["n_hit"] - exact["n_hit"]).sum())
    total = int(exact["n_grams"].sum())
    assert extra <= max(2, total // 100)  # << 1% FP at this fill factor


def test_lag_diff_bruteforce_hot_user(ray_session, tmp_path):
    """LAG under 50% hot-key skew: only 2 rows per block cross the heal
    exchange, result must equal the per-user sorted diff exactly."""
    rng = np.random.default_rng(99)
    n = 30_000
    hot = rng.random(n) < 0.5
    users = np.where(hot, 3, rng.integers(100, 200, size=n)).astype(np.int64)
    base = 1_600_000_000_000_000
    ts = base + rng.integers(0, 10**10, size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = windows.events_lag_diff(str(tmp_path)).to_pandas() \
        .set_index("event_id")["lag_us"]
    assert len(got) == n and not got.index.duplicated().any()
    for uid in (3, 150, 199):
        rows = np.flatnonzero(users == uid)
        order = rows[np.lexsort((rows, ts[rows]))]
        t = ts[order]
        vals = got.loc[[int(i) for i in order]].to_numpy(dtype=np.float64)
        assert np.isnan(vals[0])
        np.testing.assert_array_equal(vals[1:].astype(np.int64), t[1:] - t[:-1])


def test_lead_diff_bruteforce_hot_user(ray_session, tmp_path):
    """LEAD under the same 50% hot-key skew: the forward mirror of LAG —
    last element NaN, interior values equal the per-user forward diff."""
    rng = np.random.default_rng(41)
    n = 30_000
    hot = rng.random(n) < 0.5
    users = np.where(hot, 3, rng.integers(100, 200, size=n)).astype(np.int64)
    base = 1_600_000_000_000_000
    ts = base + rng.integers(0, 10**10, size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = windows.events_lead_diff(str(tmp_path)).to_pandas() \
        .set_index("event_id")["lead_us"]
    assert len(got) == n and not got.index.duplicated().any()
    for uid in (3, 150, 199):
        rows = np.flatnonzero(users == uid)
        order = rows[np.lexsort((rows, ts[rows]))]
        t = ts[order]
        vals = got.loc[[int(i) for i in order]].to_numpy(dtype=np.float64)
        assert np.isnan(vals[-1])
        np.testing.assert_array_equal(vals[:-1].astype(np.int64), t[1:] - t[:-1])


def test_rollup_levels(ray_session, tmp_path):
    flags = ["A", "A", "A", "B", "B", "N"]
    stats = ["F", "O", "O", "F", "F", "O"]
    qty = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flags), "l_linestatus": pa.array(stats),
        "l_quantity": pa.array(qty),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    got = relational.revenue_rollup(str(tmp_path)).to_pandas()
    rows = {(r.l_returnflag, r.l_linestatus): (r.n_items, r.sum_qty)
            for r in got.itertuples()}
    assert rows[("A", "F")] == (1, 1.0) and rows[("A", "O")] == (2, 5.0)
    assert rows[("A", "ALL")] == (3, 6.0)
    assert rows[("B", "ALL")] == (2, 9.0)
    assert rows[("N", "ALL")] == (1, 6.0)
    assert rows[("ALL", "ALL")] == (6, 21.0)
    assert len(rows) == 4 + 3 + 1  # leaves + per-flag + grand total


def test_cube_levels(ray_session, tmp_path):
    flags = ["A", "A", "A", "B", "B", "N"]
    stats = ["F", "O", "O", "F", "F", "O"]
    qty = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flags), "l_linestatus": pa.array(stats),
        "l_quantity": pa.array(qty),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    got = relational.revenue_cube(str(tmp_path)).to_pandas()
    rows = {(r.l_returnflag, r.l_linestatus): (r.n_items, r.sum_qty)
            for r in got.itertuples()}
    # rollup levels...
    assert rows[("A", "F")] == (1, 1.0) and rows[("A", "ALL")] == (3, 6.0)
    assert rows[("ALL", "ALL")] == (6, 21.0)
    # ...plus the per-status subtotals CUBE adds over ROLLUP
    assert rows[("ALL", "F")] == (3, 10.0)
    assert rows[("ALL", "O")] == (3, 11.0)
    assert len(rows) == 4 + 3 + 2 + 1  # leaves + per-flag + per-status + grand


def test_sample_docs_bottom_k(ray_session, docs_dir):
    d, texts = docs_dir
    got = text_ops.sample_docs(d, k=10).to_pandas()["doc_id"].tolist()
    expect = sorted(range(len(texts)),
                    key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:10]
    assert got == expect


def test_source_mix_rebalances(ray_session, tmp_path):
    """alpha=0.5 temperature mixing: an 80%-dominant source is downsampled
    and an 8x-smaller one upsampled, the total stays within rounding of N,
    and the assignment is deterministic across runs."""
    rng = np.random.default_rng(3)
    n = 4000
    srcs = np.where(rng.random(n) < 0.8, "web",
                    rng.choice(["wiki", "code"], size=n))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "source": pa.array(srcs),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    got = text_ops.source_mix_repeats(str(tmp_path)).to_pandas()
    assert len(got) == n
    by_src = got.groupby("source")["n_copies"].sum()
    c_web = int((srcs == "web").sum())
    # sqrt rebalance: web's copy share shrinks below its 80% doc share,
    # minority shares grow above theirs
    assert by_src["web"] / by_src.sum() < c_web / n
    for s in ("wiki", "code"):
        cs = int((srcs == s).sum())
        assert by_src[s] / by_src.sum() > cs / n
        assert by_src[s] > cs  # upsampled in absolute copies too
    assert abs(int(by_src.sum()) - n) <= len(by_src) * 2 + n // 100
    again = text_ops.source_mix_repeats(str(tmp_path)).to_pandas()
    assert got.sort_values("doc_id")["n_copies"].tolist() == \
        again.sort_values("doc_id")["n_copies"].tolist()


def test_weighted_sample_es_exact(ray_session, tmp_path):
    """Efraimidis-Spirakis A-Res: the distributed bottom-k equals the
    brute-force single-machine selection exactly, and under 100x weight
    skew the heavy docs dominate the sample (weight-proportional
    inclusion)."""
    rng = np.random.default_rng(77)
    n = 2000
    n_chars = np.where(rng.random(n) < 0.1, 5000, 50).astype(np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "n_chars": pa.array(n_chars),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    k = 100
    got = text_ops.weighted_sample(str(tmp_path), k=k).to_pandas()

    def es_key(i, w):
        d = hashlib.md5(str(i).encode()).digest()
        u = (int.from_bytes(d[:8], "big") + 1) / float((1 << 64) + 1)
        return -np.log(u) / max(w, 1)

    brute = sorted(range(n), key=lambda i: (es_key(i, n_chars[i]), i))[:k]
    assert got["doc_id"].tolist() == brute
    assert (got["weight"].to_numpy() == n_chars[np.asarray(brute)]).all()
    # ~10% of docs carry 100x weight -> they should own ~90% of the sample
    assert (got["weight"] == 5000).mean() > 0.75


def test_sample_per_source_stratified(ray_session, tmp_path):
    """Every stratum yields exactly min(k, stratum size) rows in md5 order,
    independent of stratum skew (one source owns 80% of docs)."""
    rng = np.random.default_rng(7)
    n = 500
    srcs = np.where(rng.random(n) < 0.8, "web",
                    rng.choice(["news", "wiki", "code"], size=n))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "source": pa.array(srcs.tolist(), type=pa.string()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    got = text_ops.sample_per_source(str(tmp_path), k=5).to_pandas()
    for src in np.unique(srcs):
        ids = np.flatnonzero(srcs == src)
        expect = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:5]
        rows = got[got["source"] == src].sort_values("rank")
        assert list(rows["doc_id"]) == [int(i) for i in expect]
        assert list(rows["rank"]) == list(range(1, len(expect) + 1))


def test_unigram_logprob_bruteforce(ray_session, docs_dir):
    d, texts = docs_dir
    got = text_ops.unigram_logprob(d).to_pandas().set_index("doc_id")
    counts = Counter()
    for t in texts:
        counts.update(_TOK.findall(t))
    total = sum(counts.values())
    for i in (0, 13, 57, 119):
        toks = _TOK.findall(texts[i])
        avg = float(np.mean([np.log(counts[w] / total) for w in toks]))
        expect = -int(np.floor(-avg * 1000 + 0.5))
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "avg_logprob_milli"] == expect
    # a doc made of the rarest tokens scores below the corpus mean
    assert got["avg_logprob_milli"].min() < int(got["avg_logprob_milli"].mean())


def test_tfidf_top_terms_bruteforce(ray_session, docs_dir):
    d, texts = docs_dir
    got = text_ops.tfidf_top_terms(d, k=3).to_pandas()
    n = len(texts)
    df = Counter()
    for t in texts:
        df.update(set(_TOK.findall(t)))
    for i in (0, 5, 9, 13, 57):
        tf = Counter(_TOK.findall(texts[i]))
        scored = sorted(((-tf[w] * (n * 1000 // df[w]), w) for w in tf))
        expect = [(w, r + 1, -s) for r, (s, w) in enumerate(scored[:3])]
        rows = got[got["doc_id"] == i].sort_values("rank")
        assert list(zip(rows["term"], rows["rank"], rows["score_milli"])) == expect


def test_fuzzy_decontaminate_planted(ray_session, tmp_path):
    """Near-identical paraphrases of benchmark docs (doc_id % 13 == 0) are
    flagged; unrelated docs and bench-bench/train-train pairs are not."""
    import os

    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops.decontam import fuzzy_decontaminate

    rng = np.random.default_rng(31)
    words = np.array([f"tok{i}" for i in range(500)])
    bench_text = " ".join(rng.choice(words, size=120))
    near = bench_text.replace("tok", "tok", 1) + " extra tail"  # ~identical
    texts, ids = [], []
    for i in range(60):
        ids.append(i)
        if i == 0:
            texts.append(bench_text)           # benchmark (0 % 13 == 0)
        elif i == 1:
            texts.append(near)                 # train paraphrase -> flag
        elif i == 14:
            texts.append(bench_text + " x")    # train, also near -> flag
        elif i == 26:
            texts.append(" ".join(rng.choice(words, size=120)))  # bench, unrelated
        else:
            texts.append(" ".join(rng.choice(words, size=100)))
    pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                             "text": pa.array(texts)}),
                   os.path.join(str(tmp_path), "documents.parquet"))
    got = fuzzy_decontaminate(str(tmp_path), threshold=0.6).to_pandas()
    flagged = set(got["doc_id"])
    assert {1, 14} <= flagged
    assert 26 not in flagged  # benchmark docs are never "contaminated"
    assert (got["bench_id"] % 13 == 0).all()
    assert (got["doc_id"] % 13 != 0).all()
    assert len(flagged - {1, 14}) == 0  # no random-doc false flags


def test_source_cap_hot_source_and_small_strata(ray_session, tmp_path):
    """Per-source cap: one source owns 90% of docs (hot key spanning many
    blocks -> the grouped heal must re-rank cap*B block-local candidates),
    and one source has fewer docs than the cap (kept whole)."""
    rng = np.random.default_rng(11)
    n = 3000
    srcs = np.where(rng.random(n) < 0.9, "web",
                    np.where(rng.random(n) < 0.5, "wiki", "tiny"))
    # keep 'tiny' genuinely below the cap
    tiny_ids = np.flatnonzero(srcs == "tiny")[:40]
    srcs[srcs == "tiny"] = "wiki"
    srcs[tiny_ids] = "tiny"
    doc_ids = rng.permutation(n)  # unsorted ids: rank order != row order
    n_chars = rng.integers(10, 9999, size=n)
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "source": pa.array(srcs.tolist(), type=pa.string()),
        "n_chars": pa.array(n_chars, type=pa.int64()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    cap = 64
    got = text_ops.source_cap(str(tmp_path), cap=cap).to_pandas()
    import pandas as pd

    df = pd.DataFrame({"source": srcs, "doc_id": doc_ids, "n_chars": n_chars})
    kept = (df.sort_values(["source", "doc_id"]).groupby("source").head(cap))
    expect = (kept.groupby("source")
                  .agg(n_kept=("doc_id", "count"), kept_chars=("n_chars", "sum"),
                       max_kept_doc=("doc_id", "max"))
                  .reset_index().sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), expect,
                                  check_dtype=True)
    assert int(got[got["source"] == "tiny"]["n_kept"].iloc[0]) == len(tiny_ids)


def test_source_cap_filter_threshold_equivalence(ray_session, tmp_path):
    """The threshold-broadcast filter keeps EXACTLY the per-source smallest-
    cap doc_ids (rule equivalence: member-of-smallest-k == id <= k-th
    smallest), incl. a source smaller than the cap (threshold = its max)."""
    rng = np.random.default_rng(23)
    n = 1200
    srcs = np.where(rng.random(n) < 0.85, "web", "rare")
    rare_ids = np.flatnonzero(srcs == "rare")
    srcs[rare_ids[30:]] = "web"  # keep 'rare' at 30 docs (< cap)
    doc_ids = rng.permutation(10_000)[:n]
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "source": pa.array(srcs.tolist(), type=pa.string()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    cap = 64
    got = text_ops.source_cap_filter(str(tmp_path), cap=cap).to_pandas()
    import pandas as pd

    df = pd.DataFrame({"source": srcs, "doc_id": doc_ids})
    kept = (df.sort_values(["source", "doc_id"]).groupby("source").head(cap)
              .sort_values("doc_id").reset_index(drop=True)[["doc_id", "source"]])
    pd.testing.assert_frame_equal(got.reset_index(drop=True), kept,
                                  check_dtype=True)
    assert (got["source"] == "rare").sum() == 30  # below-cap stratum whole
