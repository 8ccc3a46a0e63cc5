"""Text-analysis operators for large-scale training-data pipelines.

All operate on a documents table ``(doc_id, text, lang, ...)`` as vectorized
``map_batches`` stages:

- token counting: whitespace tokens + a BPE-ish regex tokenization
- quality scoring: length / punctuation ratio / stopword ratio / mean word len
- language ID: character-trigram profile heuristic (deterministic, no model)
- document fingerprinting: 64-bit polynomial rolling hash over tokens

Each has a ``queries()`` entry in __ray_entry__.py; the SQL-expressible ones
(token/quality stats) carry DuckDB oracles.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish: words, numbers, or single punctuation marks (GPT-2-style shape)
_BPE_RE = re.compile(r"[A-Za-zÀ-ɏ]+|\d+|[^\sA-Za-zÀ-ɏ\d]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

_STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "is", "it", "on", "for",
    "og", "i", "det", "som", "en", "på", "er", "av", "til", "med",
}

# tiny deterministic trigram profiles per language (top trigrams incl. spaces)
_LANG_PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "],
    "no": [" og", "og ", " de", "det", "et ", " er", "er ", "en ", " på", "på "],
    "de": [" de", "der", "er ", " un", "und", "nd ", "ie ", "ein", "ich", "sch"],
    "fr": [" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", "on "],
    "sv": [" oc", "och", "ch ", " at", "att", "tt ", "en ", " de", "det", "et "],
}
_LANG_WEIGHTS = {
    lang: {tri: len(tris) - i for i, tri in enumerate(tris)}
    for lang, tris in _LANG_PROFILES.items()
}


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> token counts (whitespace + BPE-ish) and n_chars."""
    texts = batch["text"].to_pylist()
    ws = [len(_TOKEN_RE.findall(t or "")) for t in texts]
    bpe = [len(_BPE_RE.findall(t or "")) for t in texts]
    nchars = [len(t or "") for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "ws_tokens": pa.array(ws, pa.int64()),
            "bpe_tokens": pa.array(bpe, pa.int64()),
            "n_chars": pa.array(nchars, pa.int64()),
        }
    )


def _round6(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero rounding to 6 decimals (for non-negative x):
    floor(x*1e6 + 0.5)/1e6 -- the EXACT double arithmetic a SQL oracle can
    replicate (np.round is half-to-even, which SQL engines don't expose)."""
    return np.floor(x * 1e6 + 0.5) / 1e6


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals per doc: ratios a filtering pipeline thresholds on."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    punct_ratio = np.zeros(n)
    stop_ratio = np.zeros(n)
    mean_word_len = np.zeros(n)
    n_tokens = np.zeros(n, np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        toks = _TOKEN_RE.findall(t)
        n_tokens[i] = len(toks)
        if t:
            punct_ratio[i] = len(_PUNCT_RE.findall(t)) / len(t)
        if toks:
            low = [w.strip(".,;:!?\"'()").lower() for w in toks]
            stop_ratio[i] = sum(w in _STOPWORDS for w in low) / len(toks)
            mean_word_len[i] = sum(len(w) for w in toks) / len(toks)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "punct_ratio": pa.array(_round6(punct_ratio)),
            "stop_ratio": pa.array(_round6(stop_ratio)),
            "mean_word_len": pa.array(_round6(mean_word_len)),
        }
    )


def detect_lang(text: str) -> str:
    """Deterministic trigram-profile language guess ('und' when no signal)."""
    t = " " + re.sub(r"\s+", " ", (text or "").lower()) + " "
    scores = {}
    for lang, weights in _LANG_WEIGHTS.items():
        s = 0
        for tri, w in weights.items():
            s += t.count(tri) * w
        scores[lang] = s
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else "und"


def langid_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array([detect_lang(t) for t in texts], pa.string()),
        }
    )


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint(text: str) -> int:
    """FNV-1a-style 64-bit rolling hash over whitespace tokens."""
    h = _FP_OFFSET
    with np.errstate(over="ignore"):
        for tok in _TOKEN_RE.findall(text or ""):
            for b in tok.encode("utf-8"):
                h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
            h = np.uint64((int(h) ^ 0x20) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(
                [fingerprint(t) & 0x7FFFFFFFFFFFFFFF for t in texts], pa.int64()
            ),
        }
    )


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per doc, all integers so the SQL
    oracle replays exactly: token count, distinct-token count, the top
    token's count, and ``rep_ppm = floor(top_cnt * 1e6 / n_tokens)`` (the
    fraction of mass in the single most frequent token -- high values flag
    degenerate/boilerplate docs).  Zero-token docs emit 0s.  Stateless
    per-batch map; the per-doc Counter is bounded by the doc's own
    vocabulary (docs arrive one per row, so no cross-batch state)."""
    from collections import Counter

    ids = batch["doc_id"].to_pylist()
    nt, nd, top, ppm = [], [], [], []
    for t in batch["text"].to_pylist():
        toks = _TOKEN_RE.findall(t or "")
        c = Counter(toks)
        n = len(toks)
        m = max(c.values()) if c else 0
        nt.append(n)
        nd.append(len(c))
        top.append(m)
        ppm.append((m * 1_000_000) // n if n else 0)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "distinct_tokens": pa.array(nd, pa.int64()),
            "top_token_cnt": pa.array(top, pa.int64()),
            "rep_ppm": pa.array(ppm, pa.int64()),
        }
    )


# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", public) -- the
# document-level heuristics section, re-expressed with pure-INTEGER
# cross-multiplied thresholds so a DuckDB oracle replays the keep decision
# bit-for-bit (no float ratios anywhere).
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_STRIP = ".,;:!?\"'()"
_ALPHA_RE = re.compile(r"[A-Za-z]")


def gopher_signals_batch(batch: pa.Table) -> pa.Table:
    """Per-doc integer quality signals feeding :func:`gopher_filter`:
    word/char counts, alpha-word and stopword hits, symbol counts
    ('#' chars + non-overlapping '...' runs), line counts and bullet /
    ellipsis line counts.  One pass per doc, all outputs int64."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    out = {
        k: np.zeros(n, np.int64)
        for k in (
            "n_words", "sum_word_chars", "n_alpha_words", "n_stop_hits",
            "n_symbols", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
        )
    }
    for i, t in enumerate(texts):
        t = t or ""
        toks = _TOKEN_RE.findall(t)
        out["n_words"][i] = len(toks)
        out["sum_word_chars"][i] = sum(len(w) for w in toks)
        out["n_alpha_words"][i] = sum(
            1 for w in toks if _ALPHA_RE.search(w)
        )
        out["n_stop_hits"][i] = sum(
            1 for w in toks
            if w.strip(_GOPHER_STRIP).lower() in _GOPHER_STOPWORDS
        )
        out["n_symbols"][i] = t.count("#") + t.count("...")
        lines = t.split("\n")
        out["n_lines"][i] = len(lines)
        out["n_bullet_lines"][i] = sum(
            1 for ln in lines if ln.startswith(("- ", "* ", "•"))
        )
        out["n_ellipsis_lines"][i] = sum(
            1 for ln in lines if ln.endswith(("...", "…"))
        )
    cols = {"doc_id": pc.cast(batch["doc_id"], pa.int64())}
    cols.update({k: pa.array(v) for k, v in out.items()})
    return pa.table(cols)


def gopher_filter(ds, *, min_words: int = 50, max_words: int = 100_000):
    """Gopher quality-rule document filter: keep a doc iff ALL of
    (integer cross-multiplied, no float thresholds):

    - ``min_words <= n_words <= max_words``
    - mean word length in [3, 10]:
      ``3*n_words <= sum_word_chars <= 10*n_words``
    - symbol-to-word ratio <= 0.1: ``10*n_symbols <= n_words``
    - bullet-line fraction <= 0.9: ``10*n_bullet_lines <= 9*n_lines``
    - ellipsis-line fraction <= 0.3: ``10*n_ellipsis_lines <= 3*n_lines``
    - alpha-word fraction >= 0.8: ``10*n_alpha_words >= 8*n_words``
    - at least 2 stopword hits

    A stateless vectorized map stage -- signals and verdict are computed
    per batch, nothing shuffles; at 100 TB this runs at read speed and
    composes in front of dedup (filter-early ordering).  Returns kept
    docs with their signal columns (the audit trail a curation pipeline
    keeps).
    """

    def apply(b: pa.Table) -> pa.Table:
        s = gopher_signals_batch(b)
        w = s["n_words"]
        keep = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(w, min_words),
                    pc.less_equal(w, max_words),
                ),
                pc.and_(
                    pc.less_equal(pc.multiply(s["n_words"], 3),
                                  s["sum_word_chars"]),
                    pc.less_equal(s["sum_word_chars"],
                                  pc.multiply(s["n_words"], 10)),
                ),
            ),
            pc.and_(
                pc.and_(
                    pc.less_equal(pc.multiply(s["n_symbols"], 10), w),
                    pc.less_equal(pc.multiply(s["n_bullet_lines"], 10),
                                  pc.multiply(s["n_lines"], 9)),
                ),
                pc.and_(
                    pc.and_(
                        pc.less_equal(
                            pc.multiply(s["n_ellipsis_lines"], 10),
                            pc.multiply(s["n_lines"], 3)),
                        pc.greater_equal(
                            pc.multiply(s["n_alpha_words"], 10),
                            pc.multiply(w, 8)),
                    ),
                    pc.greater_equal(s["n_stop_hits"], 2),
                ),
            ),
        )
        return s.filter(keep)

    return ds.map_batches(apply, batch_format="pyarrow")
