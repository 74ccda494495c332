"""Dedup ops verified against brute-force oracles on controlled corpora."""

import itertools
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.functions.textstats import (
    char_shingles,
    hamming64,
    jaccard,
    simhash64,
    word_ngrams,
)
from paddleocr_json_ray.ops import dedup

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango").split()


@pytest.fixture(scope="module")
def controlled_docs(tmp_path_factory):
    """60 docs: 40 distinct, 10 exact dups, 10 near-dups (1-word edits)."""
    rng = np.random.default_rng(7)
    texts = []
    for i in range(40):
        texts.append(" ".join(rng.choice(WORDS, size=30)))
    for i in range(10):  # exact duplicates of docs 0..9
        texts.append(texts[i])
    for i in range(10):  # near duplicates of docs 10..19 (one word changed)
        toks = texts[10 + i].split()
        toks[5] = "zulu"
        texts.append(" ".join(toks))
    d = tmp_path_factory.mktemp("docs")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }), os.path.join(str(d), "documents.parquet"))
    return str(d), texts


def test_dedup_exact(ray_session, controlled_docs):
    d, texts = controlled_docs
    got = sorted(dedup.dedup_exact(d).to_pandas()["doc_id"])
    first = {}
    for i, t in enumerate(texts):
        first.setdefault(t, i)
    assert got == sorted(first.values())


def test_minhash_pairs_vs_bruteforce(ray_session, controlled_docs):
    d, texts = controlled_docs
    got = dedup.minhash_candidate_pairs(d, threshold=0.7).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    # brute-force true jaccard over char shingles
    sh = [set(char_shingles(t).tolist()) for t in texts]
    true_pairs = {(i, j) for i, j in itertools.combinations(range(len(texts)), 2)
                  if jaccard(sh[i], sh[j]) >= 0.85}
    # every true near/exact dup must be caught (LSH with 16 bands @ sim>0.85
    # has essentially unit recall); no pair below 0.5 may appear
    assert true_pairs <= got_pairs
    for (a, b) in got_pairs:
        assert jaccard(sh[a], sh[b]) >= 0.5


def test_dedup_minhash_survivors(ray_session, controlled_docs):
    d, texts = controlled_docs
    survivors = sorted(dedup.dedup_minhash(d, threshold=0.7).to_pandas()["doc_id"])
    # exact dups (40..49) and near-dups (50..59) must be gone
    assert all(s < 40 for s in survivors)
    assert len(survivors) == 40


def test_dedup_simhash_vs_bruteforce(ray_session, controlled_docs):
    d, texts = controlled_docs
    survivors = set(dedup.dedup_simhash(d, max_hamming=3).to_pandas()["doc_id"])
    sigs = [simhash64(t) for t in texts]
    # brute-force: compute losers via same union-find semantics
    pairs = [(i, j) for i, j in itertools.combinations(range(len(texts)), 2)
             if hamming64(sigs[i], sigs[j]) <= 3]
    roots = dedup._union_find(pairs)
    losers = {m for m, r in roots.items() if r != m}
    assert survivors == set(range(len(texts))) - losers


def test_dedup_ngram_vs_bruteforce(ray_session, controlled_docs):
    d, texts = controlled_docs
    got = dedup.ngram_dup_pairs(d, n=3, threshold=0.6).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    grams = [word_ngrams(t, 3) for t in texts]
    true_pairs = {(i, j) for i, j in itertools.combinations(range(len(texts)), 2)
                  if jaccard(grams[i], grams[j]) >= 0.6}
    assert got_pairs == true_pairs


def test_embedding_pairs(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    base[20] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near-dup of 0
    base[21] = base[5]  # exact dup of 5
    pq.write_table(pa.table({
        "vec_id": pa.array(range(30), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              type=pa.list_(pa.float32())),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    got = dedup.embedding_dup_pairs(str(tmp_path), threshold=0.95).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert (0, 20) in pairs and (5, 21) in pairs
    # brute force check: no spurious pairs
    m = base.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    expected = {(i, j) for i, j in itertools.combinations(range(30), 2) if sims[i, j] > 0.95}
    assert pairs == expected

    # bucketed (scale) path: multi-table LSH must recover the true near-dup
    # pairs (0.95-cosine pairs are nearly parallel -> per-table collision
    # probability is high and 12 tables make a miss vanishingly unlikely),
    # and in-bucket exact verification admits no false positives
    bucketed = dedup.embedding_bucket_pairs(str(tmp_path), threshold=0.95).to_pandas()
    bpairs = {(int(a), int(b)) for a, b in zip(bucketed["id_a"], bucketed["id_b"])}
    assert bpairs <= expected
    assert {(0, 20), (5, 21)} <= bpairs

    survivors = set(dedup.dedup_embedding(str(tmp_path), threshold=0.95).to_pandas()["vec_id"])
    assert 20 not in survivors and 21 not in survivors
    assert 0 in survivors and 5 in survivors


def test_semdedup_blobs(ray_session, tmp_path):
    """SemDeDup: near-identical vectors co-cluster under k-means (their
    centroid distances are near-equal), so every planted in-blob near-dup
    is caught; exact in-cluster cosine admits no false positives."""
    rng = np.random.default_rng(13)
    centers = rng.standard_normal((4, 16)) * 8.0
    base = np.concatenate([c + 0.3 * rng.standard_normal((15, 16))
                           for c in centers]).astype(np.float32)
    # plant one near-dup per blob (ids 60..63 duplicate 0, 15, 30, 45)
    dups = np.stack([base[i] + 1e-3 * rng.standard_normal(16).astype(np.float32)
                     for i in (0, 15, 30, 45)])
    mat = np.concatenate([base, dups])
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(mat)), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))

    m = mat.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    expected = {(i, j) for i, j in itertools.combinations(range(len(mat)), 2)
                if sims[i, j] > 0.999}
    assert {(0, 60), (15, 61), (30, 62), (45, 63)} <= expected

    got = dedup.semdedup_pairs(str(tmp_path), threshold=0.999).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert pairs <= expected                      # no false positives
    assert {(0, 60), (15, 61), (30, 62), (45, 63)} <= pairs

    survivors = set(dedup.semdedup(str(tmp_path), threshold=0.999)
                    .to_pandas()["vec_id"])
    assert {60, 61, 62, 63}.isdisjoint(survivors)
    assert {0, 15, 30, 45} <= survivors


def test_cross_source_dups(ray_session, tmp_path):
    """Planted exact dups across and within sources must produce the exact
    pair-count matrix (diagonal = C(n,2), cross = n_s x n_t), with unique
    texts contributing nothing."""
    import os

    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops.dedup import cross_source_dups

    texts, sources = [], []
    # "dup1": 3 copies in web, 2 in books -> web/web 3, books/books 1, books/web 6
    texts += ["dup one"] * 5
    sources += ["web"] * 3 + ["books"] * 2
    # "dup2": 2 copies, both in web -> web/web +1
    texts += ["dup two"] * 2
    sources += ["web"] * 2
    # unique filler
    texts += [f"unique {i}" for i in range(200)]
    sources += ["web" if i % 2 else "books" for i in range(200)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts), "source": pa.array(sources)}),
        os.path.join(str(tmp_path), "documents.parquet"))
    got = (cross_source_dups(str(tmp_path)).to_pandas()
           .set_index(["source_a", "source_b"])["n_pairs"].sort_index())
    assert got.to_dict() == {("books", "books"): 1, ("books", "web"): 6,
                             ("web", "web"): 3 + 1}


def test_dedup_exact_incremental_two_phase_equals_oneshot(ray_session, tmp_path):
    """Increments A then B against a persisted hash index == one-shot
    dedup_exact over A+B (time-ordered ids), and a re-run of an already-
    indexed increment survives nothing (idempotent ingestion).  Index
    growth is append-only: phase files accumulate, none are rewritten."""
    import glob
    import os

    from paddleocr_json_ray.ops.dedup import dedup_exact, dedup_exact_incremental

    rng = np.random.default_rng(5)
    texts = [f"text-{i}" for i in range(120)]
    ta = [texts[rng.integers(0, 120)] for _ in range(200)]
    tb = [texts[rng.integers(0, 120)] if rng.random() < .5 else f"new-{i}"
          for i in range(150)]
    dirs = {}
    for name, ids, tt in (("A", range(200), ta),
                          ("B", range(200, 350), tb),
                          ("AB", range(350), ta + tb)):
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(tt)}),
                       os.path.join(d, "documents.parquet"))
        dirs[name] = d
    idx = str(tmp_path / "idx")
    sa = dedup_exact_incremental(dirs["A"], idx).to_pandas()["doc_id"].tolist()
    n_files_a = len(glob.glob(os.path.join(idx, "*.parquet")))
    sb = dedup_exact_incremental(dirs["B"], idx).to_pandas()["doc_id"].tolist()
    n_files_b = len(glob.glob(os.path.join(idx, "*.parquet")))
    assert n_files_b > n_files_a  # append-only growth, no rewrite
    oneshot = sorted(dedup_exact(dirs["AB"]).to_pandas()["doc_id"].tolist())
    assert sorted(sa + sb) == oneshot
    rerun = dedup_exact_incremental(dirs["B"], idx).to_pandas()
    assert len(rerun) == 0  # all of B already indexed


def test_dedup_exact_incremental_join_tier_equality(ray_session, tmp_path):
    """broadcast_max_rows=0 forces the partitioned anti-join tier; its
    survivors must equal the broadcast tier's on the same increment."""
    import os

    from paddleocr_json_ray.ops.dedup import dedup_exact_incremental

    rng = np.random.default_rng(7)
    texts = [f"t-{i}" for i in range(60)]
    for name, ids in (("A", range(100)), ("B", range(100, 180))):
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array([texts[rng.integers(0, 60)] for _ in ids]),
        }), os.path.join(d, "documents.parquet"))
    idx1, idx2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    a1 = dedup_exact_incremental(str(tmp_path / "A"), idx1).to_pandas()
    a2 = dedup_exact_incremental(str(tmp_path / "A"), idx2,
                                 broadcast_max_rows=0).to_pandas()
    assert a1["doc_id"].tolist() == a2["doc_id"].tolist()
    b1 = dedup_exact_incremental(str(tmp_path / "B"), idx1).to_pandas()
    b2 = dedup_exact_incremental(str(tmp_path / "B"), idx2,
                                 broadcast_max_rows=0).to_pandas()
    assert b1["doc_id"].tolist() == b2["doc_id"].tolist()
    assert len(b1) < 80  # cross-increment dups actually dropped


# --------------------------------------------------------------- line-level
def _brute_line_dedup(texts, delimiter):
    """Keep-first global line dedup, pure Python."""
    seen = set()
    out = {}
    for doc_id, t in enumerate(texts):
        kept = []
        for line in t.split(delimiter):
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            out[doc_id] = (delimiter.join(kept), len(kept))
    return out


@pytest.mark.parametrize("delimiter", ["\n", " "])
def test_dedup_lines_vs_bruteforce(ray_session, tmp_path, delimiter):
    """RefinedWeb-style exact line dedup on newline-bearing docs: within-doc
    repeats collapse, cross-doc repeats keep only the (doc_id, idx)-first
    copy, fully-duplicated docs vanish, empty lines dedup like any other."""
    rng = np.random.default_rng(13)
    lines_pool = [" ".join(rng.choice(WORDS, size=4)) for _ in range(25)]
    texts = []
    for i in range(30):
        k = int(rng.integers(2, 9))
        texts.append(delimiter.join(rng.choice(lines_pool, size=k)))
    texts.append(texts[0])              # fully-duplicated doc -> vanishes
    texts.append(delimiter.join([lines_pool[0], "", lines_pool[1], ""]))
    texts.append("")                    # single empty line
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = dedup.dedup_lines(d, delimiter=delimiter).to_pandas()
    got = {int(r.doc_id): (r.text, int(r.n_lines)) for r in got.itertuples()}
    assert got == _brute_line_dedup(texts, delimiter)


def test_dedup_lines_hot_key_runs(ray_session, tmp_path):
    """Adversarial skew: a 2-word vocabulary makes every sorted line run
    span many blocks, so nearly every run resolves through the grouped
    boundary heal — survivors must still be exactly the global firsts."""
    texts = ["hot " * 50 + "cold", "cold " + "hot " * 49 + "hot"]
    texts = [t.strip() for t in texts] * 20
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = dedup.dedup_lines(d, delimiter=" ").to_pandas()
    got = {int(r.doc_id): (r.text, int(r.n_lines)) for r in got.itertuples()}
    assert got == _brute_line_dedup(texts, " ")
    # every distinct line appears exactly once across the whole output
    all_lines = [w for t, _ in got.values() for w in t.split(" ")]
    assert sorted(all_lines) == sorted(set(all_lines))


def test_forest_reduce_preserves_components():
    """_forest_reduce on random graphs: (root, member) stars must induce
    exactly the same components as the full pair set, with <= one edge per
    non-root node."""
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(2, 120))
        m = int(rng.integers(1, 300))
        ia = rng.integers(0, n, size=m).astype(np.int64)
        jb = rng.integers(0, n, size=m).astype(np.int64)
        keep = ia != jb
        ia, jb = ia[keep], jb[keep]
        if not len(ia):
            continue
        roots, members = dedup._forest_reduce(ia, jb)
        assert len(roots) == len(members)
        assert len(np.unique(members)) == len(members)  # one edge per member
        want = dedup._union_find(list(zip(ia.tolist(), jb.tolist())))
        got = dedup._union_find(list(zip(roots.tolist(), members.tolist())))
        # same loser set and same root for every loser
        assert {m_ for m_, r in got.items() if r != m_} == \
               {m_ for m_, r in want.items() if r != m_}
        assert all(got[k] == want[k] for k in got)


def test_minhash_forest_equals_allpairs_on_cliques(ray_session, tmp_path):
    """A clique-heavy corpus (3 exact-dup families of 25 + distinct docs):
    survivors under forest reduction == survivors from the all-pairs path,
    and the forest pair volume is linear in docs, not quadratic."""
    rng = np.random.default_rng(5)
    texts = []
    for fam in range(3):
        base = " ".join(rng.choice(WORDS, size=40))
        texts.extend([base] * 25)
    for i in range(30):
        texts.append(" ".join(rng.choice(WORDS, size=40)))
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }), os.path.join(d, "documents.parquet"))
    allpairs = dedup.minhash_candidate_pairs(d, 0.8, distinct=False,
                                             forest=False)
    forest = dedup.minhash_candidate_pairs(d, 0.8, distinct=False,
                                           forest=True)
    s_all = sorted(dedup._survivors(d, allpairs).to_pandas()["doc_id"])
    s_for = sorted(dedup._survivors(d, forest).to_pandas()["doc_id"])
    assert s_all == s_for
    n_forest = dedup.minhash_candidate_pairs(d, 0.8, distinct=False,
                                             forest=True).count()
    # 16 bands x (k-1) stars max vs 16 x C(25,2)=4800 per family all-pairs
    assert n_forest <= 16 * len(texts)


def test_dup_cluster_histogram(ray_session, controlled_docs):
    d, texts = controlled_docs
    got = dedup.dup_cluster_histogram(d).to_pandas()
    from collections import Counter
    sizes = Counter(Counter(texts).values())
    want = sorted(sizes.items())
    assert list(zip(got["cluster_size"], got["n_clusters"])) == want
