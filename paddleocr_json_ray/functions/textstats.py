"""Text-analysis primitives for the training-data ops layer: token counting,
quality scoring, language ID, document fingerprinting, shingling.

These are the scalar/vector kernels; the Ray Data wrappers live in
``ops/text_ops.py``.  Everything is deterministic and dependency-free.
"""

from __future__ import annotations

import re

import numpy as np

# ASCII whitespace classes, matching RE2 semantics (\s = [\t\n\f\r\v ]) so
# the DuckDB SQL oracles agree on Unicode input (Python's \s/isdigit() are
# Unicode-aware and would diverge on NBSP / non-ASCII digits)
_ASCII_WS = " \t\n\r\f\v"
_RE_TOKEN = re.compile(r"[^ \t\n\r\f\v]+")
# BPE-ish word/number/punct splitter for subword-style token counting
_RE_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^ \t\n\r\f\vA-Za-z0-9]")
_ASCII_DIGITS = set("0123456789")

_ASCII_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")

# tiny per-language stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "as", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "que", "une", "des", "du", "dans"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "por", "que", "una", "del", "en"},
}
_LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break order


def count_tokens(text: str) -> int:
    """Whitespace tokens."""
    return len(_RE_TOKEN.findall(text))


def count_bpeish_tokens(text: str) -> int:
    """BPE-ish subword proxy: alpha runs + digit runs + single punct marks."""
    return len(_RE_BPEISH.findall(text))


def quality_stats(text: str) -> dict[str, int]:
    """Integer quality components (integers so the DuckDB oracle can match
    them hash-exactly)."""
    n_chars = len(text)
    tokens = _RE_TOKEN.findall(text)
    n_tokens = len(tokens)
    n_punct = sum(1 for c in text if c in _ASCII_PUNCT)
    n_digit = sum(1 for c in text if c in _ASCII_DIGITS)
    n_space = text.count(" ")
    max_tok = max((len(t) for t in tokens), default=0)
    # score in integer millis: balance of word length, punctuation and digits
    avg_tok_len_milli = (n_chars - n_space) * 1000 // n_tokens if n_tokens else 0
    punct_ratio_milli = n_punct * 1000 // n_chars if n_chars else 0
    digit_ratio_milli = n_digit * 1000 // n_chars if n_chars else 0
    score = 1000
    if n_tokens < 5:
        score -= 500
    if avg_tok_len_milli < 2000 or avg_tok_len_milli > 12000:
        score -= 250
    if punct_ratio_milli > 100:
        score -= 150
    if digit_ratio_milli > 300:
        score -= 100
    if max_tok > 40:
        score -= 100
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "n_digit": n_digit,
        "n_space": n_space,
        "max_token_len": max_tok,
        "quality_milli": max(score, 0),
    }


def lang_id(text: str) -> str:
    """Stopword/charset language heuristic over {en, de, fr, es, zh}."""
    if not text:
        return "und"
    cjk = sum(1 for c in text[:2000] if 0x4E00 <= ord(c) <= 0x9FFF)
    if cjk * 10 >= min(len(text), 2000):
        return "zh"
    words = re.findall(r"[a-zA-ZÀ-ſ']+", text.lower()[:4000])
    if not words:
        return "und"
    scores = {lg: 0 for lg in _LANG_ORDER}
    for w in words:
        for lg in _LANG_ORDER:
            if w in _STOPWORDS[lg]:
                scores[lg] += 1
    best = max(_LANG_ORDER, key=lambda lg: scores[lg])
    return best if scores[best] > 0 else "und"


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit, returned as signed int64 (hash-partition friendly)."""
    h = _FNV_OFFSET
    with np.errstate(over="ignore"):
        for b in data:
            h = (h ^ np.uint64(b)) * _FNV_PRIME
    return int(h.astype(np.int64))


def fnv1a64_tokens(tokens: list[str]) -> np.ndarray:
    """Vectorized-ish FNV over a token list -> uint64 array."""
    with np.errstate(over="ignore"):
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            h = _FNV_OFFSET
            for b in t.encode("utf-8"):
                h = (h ^ np.uint64(b)) * _FNV_PRIME
            out[i] = h
    return out


def doc_fingerprint(text: str, window: int = 8) -> int:
    """Rolling-hash document fingerprint: min FNV hash over ``window``-token
    shingles (whole-text hash when shorter)."""
    toks = _RE_TOKEN.findall(text)
    if len(toks) < window:
        return fnv1a64(" ".join(toks).encode("utf-8"))
    th = fnv1a64_tokens(toks)
    # polynomial combine of each window (vectorized via stride trick)
    with np.errstate(over="ignore"):
        acc = np.zeros(len(toks) - window + 1, dtype=np.uint64)
        mult = np.uint64(1099511628211)
        for k in range(window):
            acc = acc * mult + th[k:k + len(acc)]
    return int(acc.min().astype(np.int64))


def token_gram_hashes(text: str, n: int = 8) -> np.ndarray:
    """uint64 hash per ``n``-token-gram POSITION (len = n_tokens - n + 1,
    empty when the text is shorter): polynomial combine of per-token FNV
    hashes, identical for identical space-joined grams — the membership key
    for benchmark decontamination.  Vectorized over positions; the only
    Python loop is the per-token FNV (token-count-bounded)."""
    toks = _RE_TOKEN.findall(text)
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    th = fnv1a64_tokens(toks)
    m = len(toks) - n + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=np.uint64)
        mult = np.uint64(1099511628211)
        for j in range(n):
            acc = acc * mult + th[j:j + m]
    return acc


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """k-byte shingle hash set (uint64, unique) of normalized text,
    vectorized: polynomial rolling hash over UTF-8 byte windows (identical
    gram boundaries to char shingles for ASCII; multi-byte chars simply
    span several windows)."""
    s = re.sub(r"\s+", " ", text.lower()).strip().encode("utf-8")
    if not s:
        return np.empty(0, dtype=np.uint64)
    if len(s) < k:
        return np.array([fnv1a64(s) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    arr = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
    n = len(s) - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(n, dtype=np.uint64)
        mult = np.uint64(1099511628211)
        for j in range(k):
            acc = acc * mult + arr[j:j + n]
    return np.unique(acc)


def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    if len(toks) < n:
        return {" ".join(toks)} if toks != [""] else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (signed int64)."""
    toks = _RE_TOKEN.findall(re.sub(r"\s+", " ", text.lower()))
    if not toks:
        return 0
    th = fnv1a64_tokens(toks)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (bits * 2 - 1).sum(axis=0)
    sig = np.uint64(0)
    with np.errstate(over="ignore"):
        for i in range(64):
            if v[i] > 0:
                sig |= np.uint64(1) << np.uint64(i)
    return int(sig.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
