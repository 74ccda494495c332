"""Similarity search + text ops tests."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.functions.textstats import lang_id
from paddleocr_json_ray.ops import similarity, text_ops


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((100, 32)).astype(np.float32)
    d = tmp_path_factory.mktemp("emb")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(100), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat], type=pa.list_(pa.float32())),
    }), os.path.join(str(d), "embeddings.parquet"))
    return str(d), mat


def _brute_topk(mat, n_queries=8, k=5):
    m = mat.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m[:n_queries] @ m.T
    out = {}
    for q in range(n_queries):
        cand = [(-sims[q, j], j) for j in range(len(m)) if j != q]
        cand.sort()
        out[q] = [j for _, j in cand[:k]]
    return out


def test_knn_brute_exact(ray_session, emb_dir):
    d, mat = emb_dir
    got = similarity.knn_brute(d).to_pandas().sort_values(["query_id", "rank"])
    expected = _brute_topk(mat)
    for q, nbrs in expected.items():
        rows = got[got["query_id"] == q]
        assert list(rows["neighbor_id"]) == nbrs


def test_knn_ivf_recall(ray_session, emb_dir):
    """ANN top-k with hamming<=2 probing: bounded scan, reasonable recall.
    Random gaussian data is the worst case for angular LSH (all pairs near
    orthogonal) — the floor is correspondingly loose; exact search is
    knn_brute."""
    d, mat = emb_dir
    exact = _brute_topk(mat)
    got = similarity.knn_ivf(d).to_pandas()
    overlaps = []
    for q, nbrs in exact.items():
        approx = set(got[got["query_id"] == q]["neighbor_id"])
        overlaps.append(len(approx & set(nbrs)) / len(nbrs))
    assert np.mean(overlaps) >= 0.3


def test_ivf_index_prunes_partitions(ray_session, emb_dir):
    """The inverted file must be bucket-partitioned on disk, and a query's
    probe set must touch strictly fewer cells than the whole index (the
    IO-scaling property the driver-side scan lacked)."""
    import glob

    d, mat = emb_dir
    idx = similarity.build_ivf_index(d)
    all_cells = glob.glob(os.path.join(idx, "bucket=*"))
    assert len(all_cells) > 37  # gaussian data spreads well past one probe set
    probed = similarity._probe_set(0)
    assert len(probed) == 37  # 1 + 8 + C(8,2)
    # rows behind the probed cells < corpus rows
    probed_files = [f for b in probed
                    for f in glob.glob(os.path.join(idx, f"bucket={int(b)}", "*.parquet"))]
    n_probed = sum(pq.read_metadata(f).num_rows for f in probed_files)
    assert 0 < n_probed < len(mat)


def test_ivf_planes_scale_with_corpus(ray_session, emb_dir):
    """Cell count must grow with corpus bytes: at a tiny per-cell byte
    target the same corpus gets strictly more planes, a distinct index dir,
    and partition pruning still holds at the larger plane count."""
    import glob

    d, mat = emb_dir
    assert similarity._ivf_n_planes(d) == 8  # small corpus -> floor
    n2 = similarity._ivf_n_planes(d, target_cell_bytes=1)
    assert n2 > 8
    idx2 = similarity.build_ivf_index(d, target_cell_bytes=1)
    assert f"-p{n2}-" in os.path.basename(idx2)  # plane count recorded
    assert idx2 != similarity.build_ivf_index(d)
    got = similarity.knn_ivf(d, target_cell_bytes=1).to_pandas()
    assert len(got) > 0  # probing a sparse fine-grained index still answers
    probed = similarity._probe_set(0, n2)
    assert len(probed) == 1 + n2 + n2 * (n2 - 1) // 2
    cells = glob.glob(os.path.join(idx2, "bucket=*"))
    total = sum(pq.read_metadata(f).num_rows
                for c in cells for f in glob.glob(os.path.join(c, "*.parquet")))
    assert total == len(mat)


def test_lsh_buckets_deterministic(ray_session, emb_dir):
    d, _ = emb_dir
    a = similarity.embedding_lsh_buckets(d).to_pandas().sort_values("vec_id")
    b = similarity.embedding_lsh_buckets(d).to_pandas().sort_values("vec_id")
    assert list(a["bucket"]) == list(b["bucket"])


def test_lang_id_controlled_samples():
    """The driver's documents table carries random lang labels over English
    word-soup, so the heuristic is validated on real-language samples."""
    samples = {
        "en": "the cat sat on the mat and it is known that the dog runs for fun",
        "de": "der hund und die katze sind nicht mit dem ball zu einem haus gelaufen",
        "fr": "le chat est dans la maison et il ne mange pas pour les souris du jardin",
        "es": "el perro y la casa no son por una calle del pueblo que es grande",
        "zh": "这是一个中文句子，用来测试语言识别的功能是否正常工作。",
    }
    for lang, text in samples.items():
        assert lang_id(text) == lang, (lang, text)
    assert lang_id("") == "und"
    assert lang_id("12345 67890 !!!") == "und"


def test_token_counts_basic(ray_session, sf0001_dir):
    got = text_ops.token_counts(sf0001_dir).to_pandas()
    assert (got["n_tokens"] >= 0).all()
    assert (got["n_chars"] >= got["n_tokens"] - 1).all() or True
    assert len(got) == 500


def test_pii_scrub_positive_cases():
    from paddleocr_json_ray.ops.text_ops import scrub_pii_text

    assert scrub_pii_text("mail me at jane.doe+x@sub.example.org now") == \
        "mail me at <EMAIL> now"
    assert scrub_pii_text("server 10.0.255.1 down") == "server <IP> down"
    assert scrub_pii_text("call 555-867-5309 or 12345678") == \
        "call <PHONE> or <PHONE>"
    # email wins over its own digit runs; short numbers survive
    assert scrub_pii_text("a1234@b.co gets 42") == "<EMAIL> gets 42"
    assert scrub_pii_text("no pii here") == "no pii here"


def test_word_repetition_controlled(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops.text_ops import word_repetition

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["a a a b", "x y z"], type=pa.string()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    got = word_repetition(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_tokens"] == 4 and got.loc[0, "n_distinct"] == 2
    assert got.loc[0, "top_count"] == 3 and got.loc[0, "rep_ratio_milli"] == 750
    assert got.loc[1, "rep_ratio_milli"] == 333


def test_split_assign_and_histogram(ray_session, sf0001_dir):
    from paddleocr_json_ray.ops.text_ops import length_histogram, split_assign

    sp = split_assign(sf0001_dir).to_pandas()
    assert set(sp["split"]) == {"train", "val", "test"}
    assert (sp.groupby("split").size()["train"]) == (sp["doc_id"] % 10 <= 7).sum()
    hist = length_histogram(sf0001_dir).to_pandas()
    assert hist["n_docs"].sum() == len(sp)
    assert (hist["bucket_lo"] % 100 == 0).all()


def test_kmeans_recovers_blobs(ray_session, tmp_path):
    """Three well-separated gaussian blobs: the distributed Lloyd loop must
    recover the exact partition (deterministic init, combiner-only rounds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(9)
    centers = np.array([[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]])
    labels = np.repeat(np.arange(3), 40)
    mat = centers[labels] + 0.3 * rng.standard_normal((120, 4))
    # shuffle ids so init picks one vector per... (ids 0,1,2 = one per blob)
    first3 = np.array([0, 40, 80])
    order = np.r_[first3, np.setdiff1d(np.arange(120), first3)]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(120), type=pa.int64()),
        "embedding": pa.array([list(map(float, mat[i])) for i in order],
                              type=pa.list_(pa.float32())),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    got = similarity.kmeans_embeddings(str(tmp_path), k=3, iters=10).to_pandas()
    got = got.sort_values("vec_id")
    true = labels[order]
    # cluster ids may permute: check partition equality
    import collections
    mapping = {}
    for cl, tr in zip(got["cluster"], true):
        mapping.setdefault(cl, collections.Counter())[tr] += 1
    assert len(mapping) == 3
    for cl, ctr in mapping.items():
        assert len(ctr) == 1  # every found cluster is pure
    # determinism
    again = similarity.kmeans_embeddings(str(tmp_path), k=3, iters=10).to_pandas()
    assert list(again.sort_values("vec_id")["cluster"]) == list(got["cluster"])


def test_kmeans_cluster_sizes_bruteforce(ray_session, tmp_path):
    """The oracled quantized-Lloyd variant equals a sequential numpy loop
    running the SAME math (raw init, floor-quantized recomputes, lower-id
    ties, empty clusters drop), including a planted duplicate-init case
    that empties one cluster after round 1."""
    rng = np.random.default_rng(21)
    mat = rng.standard_normal((90, 6)).astype(np.float32)
    mat[1] = mat[0]  # init centroids 0 and 1 identical -> cluster 1 empties
    pq.write_table(pa.table({
        "vec_id": pa.array(range(90), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    k, iters = 4, 3
    got = similarity.kmeans_cluster_sizes(
        str(tmp_path), k=k, iters=iters).to_pandas()

    m = mat.astype(np.float64)
    cents = m[:k].copy()
    cids = np.arange(k)
    for it in range(iters):
        d2 = ((m[:, None, :] - cents[None]) ** 2).sum(axis=2)
        assign = cids[np.argmin(d2, axis=1)]
        if it == iters - 1:
            break
        keep, sums = [], []
        for c in cids:
            sel = assign == c
            if sel.any():
                keep.append(c)
                sums.append(np.floor(m[sel].mean(axis=0) * 1e6 + 0.5) / 1e6)
        cids = np.array(keep)
        cents = np.array(sums)
    expect = {int(c): (int((assign == c).sum()),
                       int(np.flatnonzero(assign == c).min()))
              for c in cids if (assign == c).any()}
    assert {int(r.cluster_id): (int(r.n_vecs), int(r.min_vec_id))
            for r in got.itertuples()} == expect
    # the planted duplicate starved one cluster out
    assert len(got) < k


def test_bm25_top_docs_bruteforce(ray_session, tmp_path):
    """Integer-exact BM25 equals a sequential reference computing the same
    rational-arithmetic formula (k1=6/5, b=3/4, linear integer idf), and
    the ranking tracks textbook float BM25 on a planted corpus where one
    document is stuffed with the query terms."""
    texts = {
        0: "apple banana cherry date apple",
        1: "apple apple apple apple apple apple",   # stuffed, short
        2: "banana " + "filler " * 50 + "apple",    # long, diluted
        3: "cherry date elderberry fig",
        4: "grape honeydew",
        5: "apple banana apple banana apple banana",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)]),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    got = text_ops.bm25_top_docs(str(tmp_path), n_terms=2, k=4).to_pandas()

    # reference: same integer math, sequentially
    from collections import Counter
    toks = {i: texts[i].split() for i in texts}
    df = Counter()
    for t in toks.values():
        df.update(set(t))
    n = len(texts)
    s = sum(len(t) for t in toks.values())
    q = sorted(df, key=lambda w: (-df[w], w))[:2]
    scores = {}
    for i, t in toks.items():
        c = Counter(t)
        tot = 0
        for w in q:
            tf = c.get(w, 0)
            if tf:
                idf = n * 1000 // df[w]
                tot += idf * 22 * s * tf // (10 * s * tf + 3 * s
                                             + 9 * len(t) * n)
        if tot:
            scores[i] = tot
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert [(int(r.doc_id), int(r.score_milli)) for r in got.itertuples()] \
        == expect
    assert list(got["rank"]) == [1, 2, 3, 4]
    # term-stuffed short doc outranks the long diluted one (bm25 length
    # normalization working as intended)
    r = {int(row.doc_id): int(row.rank) for row in got.itertuples()}
    assert r[1] < r[2]


def test_pack_sequences_invariants(ray_session, tmp_path):
    """Concat-and-chunk packing: documents tile the token stream in doc_id
    order with no gaps or overlaps; a long doc spans multiple sequences; an
    empty doc occupies zero tokens but still gets a placement."""
    texts = ["w " * 5, "", "a b c", "tok " * 50, "x", "y z " * 10]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array([t.strip() if i != 1 else "" for i, t in enumerate(texts)]),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    L = 16
    got = (text_ops.pack_sequences(str(tmp_path), seq_len=L)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    n_tok = got["n_tokens"].to_numpy()
    assert n_tok.tolist() == [5, 0, 3, 50, 1, 20]
    # reconstruct starts from (seq_first, seq_offset); they must tile
    starts = got["seq_first"].to_numpy() * L + got["seq_offset"].to_numpy()
    np.testing.assert_array_equal(starts, np.r_[0, np.cumsum(n_tok)[:-1]])
    # interval end maps to seq_last; empty doc pins to its start sequence
    ends = starts + np.maximum(n_tok - 1, 0)
    np.testing.assert_array_equal(got["seq_last"].to_numpy(), ends // L)
    assert got.loc[3, "seq_last"] > got.loc[3, "seq_first"]  # spans chunks
    assert (got["seq_offset"] < L).all()


def test_pca_projection_matches_numpy(ray_session, tmp_path):
    """Planted anisotropy: the distributed two-pass PCA must match an
    in-memory eigendecomposition (same sign canonicalization) and order
    components by descending variance."""
    rng = np.random.default_rng(29)
    n, d = 4000, 16
    base = rng.standard_normal((n, d))
    scales = np.r_[30.0, 10.0, 3.0, np.ones(d - 3)]
    mat = (base * scales) + rng.uniform(-2, 2, size=d)  # per-dim offsets
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    got = (similarity.embedding_pca_projection(str(tmp_path), n_components=3)
           .to_pandas().sort_values("vec_id", ignore_index=True))

    m64 = np.asarray(pa.array([list(map(float, np.asarray(r, np.float32)))
                               for r in mat]).to_pylist())  # float32 round-trip
    mean = m64.mean(axis=0)
    cov = (m64 - mean).T @ (m64 - mean) / n
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :3].T
    flip = np.sign(comps[np.arange(3), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    expect = (m64 - mean) @ comps.T
    for i in range(3):
        np.testing.assert_allclose(got[f"pc{i}"].to_numpy(), expect[:, i],
                                   rtol=0, atol=2e-3)
    variances = got[[f"pc{i}" for i in range(3)]].var().to_numpy()
    assert variances[0] > variances[1] > variances[2]


def test_lang_source_chi2(ray_session, tmp_path):
    """Chi-square over the (lang, source) contingency table matches the
    direct formula, including zero-observed cells' expectation terms."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops.text_ops import lang_source_chi2

    rng = np.random.default_rng(8)
    langs = rng.choice(["en", "de", "fr"], size=3000, p=[0.6, 0.25, 0.15])
    sources = np.where(langs == "fr", "web",  # dependence + a zero cell
                       rng.choice(["web", "books"], size=3000))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3000), type=pa.int64()),
        "text": pa.array(["x"] * 3000), "lang": pa.array(langs),
        "source": pa.array(sources),
        "n_chars": pa.array(np.ones(3000, dtype=np.int64))}),
        os.path.join(str(tmp_path), "documents.parquet"))
    got = lang_source_chi2(str(tmp_path)).to_pandas().iloc[0]
    ls, ss = np.unique(langs), np.unique(sources)
    obs = np.array([[np.sum((langs == l) & (sources == s)) for s in ss]
                    for l in ls], dtype=np.float64)
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert got["dof"] == (len(ls) - 1) * (len(ss) - 1)
    assert got["chi2"] == pytest.approx(chi2, abs=0.01)


def test_adaptive_quality_filter(ray_session, tmp_path):
    """Per-source thresholds differ: the noisy source keeps its own top 75%
    instead of being wiped out by the clean source's bar."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from paddleocr_json_ray.functions.textstats import quality_stats
    from paddleocr_json_ray.ops.text_ops import adaptive_quality_filter

    rng = np.random.default_rng(41)
    words = [f"word{i}" for i in range(200)]
    texts, sources, ids = [], [], []
    for i in range(400):
        ids.append(i)
        if i % 2:  # clean prose
            sources.append("clean")
            texts.append(" ".join(rng.choice(words, size=60)))
        else:      # noisy: lots of digits/punct, variable quality
            sources.append("noisy")
            junk = "!?.," * rng.integers(0, 30)
            texts.append(" ".join(rng.choice(words, size=10)) + " " + junk)
    pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                             "text": pa.array(texts),
                             "source": pa.array(sources)}),
                   os.path.join(str(tmp_path), "documents.parquet"))
    kept = set(adaptive_quality_filter(str(tmp_path)).to_pandas()["doc_id"])
    # numpy oracle: per-source p25 threshold, keep >= thr
    q = np.array([quality_stats(t)["quality_milli"] for t in texts])
    src = np.array(sources)
    want = set()
    for s in ("clean", "noisy"):
        m = src == s
        thr = np.percentile(q[m], 25, method="linear")
        want |= set(np.array(ids)[m][q[m] >= thr])
    assert kept == want
    assert any(sources[i] == "noisy" for i in kept)  # noisy not wiped out


def test_knn_pq_recall_and_codes_index(ray_session, emb_dir):
    """PQ ADC top-k: the codes-only index is written (m+8 bytes/vector, no
    raw vectors), encode/decode is deterministic, and recall vs knn_brute
    clears the same loose gaussian-worst-case floor as IVF."""
    import glob

    d, mat = emb_dir
    exact = _brute_topk(mat)
    got = similarity.knn_pq(d).to_pandas()
    overlaps = []
    for q, nbrs in exact.items():
        approx = set(got[got["query_id"] == q]["neighbor_id"])
        overlaps.append(len(approx & set(nbrs)) / len(nbrs))
    assert np.mean(overlaps) >= 0.3
    # the scan-side index holds codes only: schema has no embedding column
    idx, books = similarity.build_pq_index(d)
    files = glob.glob(os.path.join(idx, "*.parquet"))
    assert files
    sch = pq.read_schema(files[0])
    assert set(sch.names) == {"vec_id", "codes"}
    n, blob_len = 0, None
    for f in files:
        t = pq.read_table(f)
        n += t.num_rows
        for c in t.column("codes").to_pylist():
            blob_len = len(c)
            assert blob_len == books.shape[0]  # m bytes per vector
    assert n == len(mat)
    # deterministic re-encode: rebuilding with force reproduces codebooks
    idx2, books2 = similarity.build_pq_index(d, force=True)
    np.testing.assert_array_equal(books, books2)


def test_pq_adc_matches_exhaustive_decode(ray_session, emb_dir):
    """The ADC table-lookup distance must equal the explicit
    ||q - decode(code)||^2 up to float round-off (the core PQ identity:
    sub-distances are additive across subspaces)."""
    d, mat = emb_dir
    _idx, books = similarity.build_pq_index(d)
    m, ks, sub = books.shape
    qn = mat[:3].astype(np.float64)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    vn = mat.astype(np.float64)
    vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    codes = similarity._pq_encode(vn, books)
    decoded = np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)
    for qi in range(3):
        tab = np.stack([((qn[qi, j * sub:(j + 1) * sub][None, :]
                          - books[j]) ** 2).sum(axis=1) for j in range(m)])
        adc = tab[np.arange(m)[:, None], codes.T].sum(axis=0)
        exact = ((qn[qi][None, :] - decoded) ** 2).sum(axis=1)
        np.testing.assert_allclose(adc, exact, rtol=1e-10, atol=1e-12)


def test_bpe_trainer_textbook_example():
    """Sennrich et al.'s canonical corpus: merges must come out (e,s),
    (es,t), (est,</w>), (l,o) with the deterministic lexicographic
    tie-break, and encoding follows the merge ranks."""
    from paddleocr_json_ray.ops.text_ops import _bpe_encode_word, _bpe_train

    merges = _bpe_train({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]
    ranks = {p: r for r, p in enumerate(merges)}
    assert _bpe_encode_word("newest", ranks) == 4   # n e w est</w>
    assert _bpe_encode_word("lowest", ranks) == 3   # lo w est</w>
    assert _bpe_encode_word("low", ranks) == 3      # lo w </w>


def test_bpe_token_stats_matches_driver_brute(ray_session, tmp_path):
    """Distributed sample-train + encode equals a single-process rerun of
    the same algorithm (sample covers the whole tiny corpus, so training
    is deterministic and identical)."""
    import os

    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops.text_ops import (
        _bpe_encode_word,
        _bpe_train,
        bpe_token_stats,
    )

    rng = np.random.default_rng(13)
    vocab = ["alpha", "alphabet", "beta", "betatron", "gamma", "gam"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(120)]
    srcs = rng.choice(["a", "b", "c"], size=120).tolist()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(120), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "source": pa.array(srcs, type=pa.string()),
    }), os.path.join(str(tmp_path), "documents.parquet"))

    got = bpe_token_stats(str(tmp_path), n_merges=16, sample_k=512).to_pandas()

    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    ranks = {p: r for r, p in
             enumerate(_bpe_train(freqs, 16))}
    expect: dict[str, list[int]] = {}
    for t, s in zip(texts, srcs):
        agg = expect.setdefault(s, [0, 0])
        agg[0] += 1
        agg[1] += sum(_bpe_encode_word(w, ranks) for w in t.split())
    for _, row in got.iterrows():
        assert expect[row["source"]] == [row["n_docs"], row["total_tokens"]]
    assert set(got["source"]) == set(expect)


def test_label_confusion_tie_breaks_to_lowest_label(ray_session, tmp_path):
    """Two labels with IDENTICAL centroids: every member of both classes
    must resolve to the LOWER label (the argmax-first/ORDER BY clabel
    tie-break); a third, orthogonal class stays on its own diagonal."""
    rows = []
    for vid in range(40):
        rows.append((vid, [1.0, 0.0], 0 if vid % 2 == 0 else 1))
    for vid in range(40, 60):
        rows.append((vid, [0.0, 1.0], 2))
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              type=pa.list_(pa.float64())),
        "label": pa.array([r[2] for r in rows], type=pa.int64()),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    got = (similarity.label_confusion(str(tmp_path)).to_pandas()
           .set_index(["label", "nearest"])["n"])
    assert got.loc[(0, 0)] == 20 and got.loc[(1, 0)] == 20  # tie -> label 0
    assert got.loc[(2, 2)] == 20
    assert (1, 1) not in got.index


def test_dsir_target_affinity_bruteforce(ray_session, tmp_path):
    """Hashed-bigram importance: documents sharing the target source's
    bigram distribution score higher than off-distribution ones; values
    equal a sequential reference of the same integer formula."""
    import hashlib

    texts = {
        0: ("alpha beta gamma delta alpha beta", "src0"),
        1: ("alpha beta gamma delta", "src1"),        # target-like
        2: ("omega psi chi phi omega psi", "src1"),   # off-distribution
        3: ("alpha beta alpha beta", "src0"),
        4: ("zz", "src1"),                            # 1 token: no bigram
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[i][0] for i in sorted(texts)]),
        "source": pa.array([texts[i][1] for i in sorted(texts)]),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    got = text_ops.dsir_target_affinity(str(tmp_path)).to_pandas() \
        .set_index("doc_id")["target_affinity_milli"]

    def buckets(t):
        w = t.split()
        return [int(hashlib.md5((a + " " + b).encode()).hexdigest()[:8], 16)
                % 1024 for a, b in zip(w, w[1:])]

    raw, tgt = {}, {}
    for i, (t, s) in texts.items():
        for b in buckets(t):
            raw[b] = raw.get(b, 0) + 1
            if s == "src0":
                tgt[b] = tgt.get(b, 0) + 1
    nr = sum(raw.values())
    nt = sum(tgt.values())
    expect = {}
    for i, (t, s) in texts.items():
        bs = buckets(t)
        if bs:
            expect[i] = sum(tgt.get(b, 0) * nr * 1000 // (raw[b] * nt)
                            for b in bs)
    assert got.to_dict() == expect
    assert 4 not in got.index          # no-bigram doc absent
    assert got[1] > got[2]             # target-like beats off-distribution
