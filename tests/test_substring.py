"""Exact-substring dedup vs an independent brute-force reference on planted
shared passages."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.ops import substring


def _brute(texts: dict[int, str], L: int) -> dict[int, str]:
    """Independent O(total^2)-ish reference: gram -> occurrences, mark every
    non-minimal occurrence's window, cut."""
    toks = {i: t.split() for i, t in texts.items()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - L + 1):
            occ.setdefault(tuple(ts[p:p + L]), []).append((i, p))
    dead = {i: np.zeros(len(ts), dtype=bool) for i, ts in toks.items()}
    for places in occ.values():
        if len(places) < 2:
            continue
        owner = min(places)
        for (i, p) in places:
            if (i, p) != owner:
                dead[i][p:p + L] = True
    return {i: " ".join(t for t, dd in zip(ts, dead[i]) if not dd)
            for i, ts in toks.items()}


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    rng = np.random.default_rng(41)
    vocab = [f"tok{i}" for i in range(5000)]
    passage = " ".join(rng.choice(vocab, size=30))     # 30 shared tokens
    self_rep = " ".join(rng.choice(vocab, size=22))    # repeated inside one doc
    texts = {}
    for i in range(40):
        words = " ".join(rng.choice(vocab, size=80))
        texts[i] = words
    # plant the passage into docs 3, 17, 29 at different offsets
    for i, cut_at in ((3, 10), (17, 40), (29, 0)):
        ts = texts[i].split()
        texts[i] = " ".join(ts[:cut_at] + passage.split() + ts[cut_at:])
    # doc 11 repeats its own run twice
    ts = texts[11].split()
    texts[11] = " ".join(self_rep.split() + ts[:30] + self_rep.split() + ts[30:])
    d = tmp_path_factory.mktemp("sub")
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)]),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(texts[i]) for i in sorted(texts)], type=pa.int64()),
    }), os.path.join(str(d), "documents.parquet"))
    return str(d), texts


def test_substring_dedup_matches_bruteforce(ray_session, planted_dir):
    d, texts = planted_dir
    L = 20
    got = (substring.dedup_substrings(d, min_len=L).to_pandas()
           .set_index("doc_id").sort_index())
    expect = _brute(texts, L)
    assert len(got) == len(texts)
    for i in sorted(texts):
        assert got.loc[i, "clean_text"] == expect[i], f"doc {i}"
    # the canonical first copy (doc 3 is the min doc of the planted trio)
    assert got.loc[3, "n_removed"] == 0
    assert got.loc[17, "n_removed"] >= 30
    assert got.loc[29, "n_removed"] >= 30
    # self-repetition: second in-document copy removed, first kept
    assert got.loc[11, "n_removed"] >= 22
    assert "tok" in got.loc[11, "clean_text"]


def test_substring_dedup_no_duplicates_is_identity(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(9000)]
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(30)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(30), type=pa.int64()),
        "text": pa.array(texts),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    got = (substring.dedup_substrings(str(tmp_path), min_len=20).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["n_removed"] == 0).all()
    assert list(got["clean_text"]) == texts


def test_substring_dedup_bloom_join_tier_equality(ray_session, planted_dir):
    """The bloom-join tier (broadcast_max_grams=0 — the beyond-object-store
    path: fixed-memory bloom prune + gram-keyed candidate join + doc-keyed
    mark join) must produce EXACTLY the broadcast tier's output on the
    planted-duplication corpus."""
    d, texts = planted_dir
    a = (substring.dedup_substrings(d).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    b = (substring.dedup_substrings(d, broadcast_max_grams=0).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert (a["n_removed"] > 0).any()  # the corpus really has duplicates
