"""Text-analysis stages for a training-data pipeline over `documents`.

All stages are vectorized Arrow/pandas batch transforms; the stateful ones
(compiled regexes, stopword tables, language profiles) are callable classes
for ``map_batches(Cls, concurrency=N)`` actor pools — setup once per actor,
never per batch. Regexes are RE2 both in pyarrow and DuckDB, so the oracle
SQL side can use the identical pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pandas.util import hash_array

WORD_RE = r"[A-Za-z0-9]+"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace/word token counting (regex-based, zero-copy Arrow)."""
    n_words = pc.count_substring_regex(batch.column(text_col), pattern=WORD_RE)
    return batch.append_column("n_words", n_words.cast(pa.int64()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint (SipHash of the text) — the exact-dedup
    key. Deterministic across processes (fixed hash key)."""
    texts = batch.column(text_col).to_numpy(zero_copy_only=False).astype(object)
    fp = hash_array(texts, categorize=False)
    return batch.append_column("fingerprint", pa.array(fp.astype(np.int64)))


class QualityScore:
    """Heuristic quality scoring: word count, mean word length, stopword
    ratio, alpha ratio. Stateful stage (compiled patterns + stopword table
    built once per actor)."""

    STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop_patterns = [rf"\b{w}\b" for w in self.STOPWORDS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n_words = pc.count_substring_regex(text, pattern=WORD_RE).cast(pa.float64())
        n_chars = pc.utf8_length(text).cast(pa.float64())
        n_alpha = pc.count_substring_regex(text, pattern=r"[A-Za-z]").cast(pa.float64())
        n_stop = None
        for pat in self.stop_patterns:
            c = pc.count_substring_regex(text, pattern=pat).cast(pa.float64())
            n_stop = c if n_stop is None else pc.add(n_stop, c)
        safe_words = pc.max_element_wise(n_words, 1.0)
        safe_chars = pc.max_element_wise(n_chars, 1.0)
        batch = batch.append_column("q_n_words", n_words.cast(pa.int64()))
        batch = batch.append_column(
            "q_stop_ratio", pc.round(pc.divide(n_stop, safe_words), ndigits=6, round_mode="half_towards_infinity")
        )
        batch = batch.append_column(
            "q_alpha_ratio", pc.round(pc.divide(n_alpha, safe_chars), ndigits=6, round_mode="half_towards_infinity")
        )
        batch = batch.append_column(
            "q_mean_word_len",
            pc.round(pc.divide(n_alpha, safe_words), ndigits=6, round_mode="half_towards_infinity"),
        )
        return batch


class LangId:
    """N-gram/stopword language-ID heuristic (en/de/fr/es + CJK detection).

    A deterministic stand-in for a fasttext-style model: profiles live in the
    actor, scoring is vectorized counts of language-marker patterns."""

    PROFILES = {
        "en": (r"\bthe\b", r"\band\b", r"\bof\b", r"\bis\b"),
        "de": (r"\bder\b", r"\bdie\b", r"\bund\b", r"\bist\b"),
        "fr": (r"\ble\b", r"\bla\b", r"\bet\b", r"\bles\b"),
        "es": (r"\bel\b", r"\bde\b", r"\by\b", r"\bque\b"),
    }
    CJK = r"[一-鿿]"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n = batch.num_rows
        scores = np.zeros((len(self.PROFILES), n), dtype=np.float64)
        for i, pats in enumerate(self.PROFILES.values()):
            for pat in pats:
                scores[i] += (
                    pc.count_substring_regex(text, pattern=pat)
                    .cast(pa.float64())
                    .to_numpy(zero_copy_only=False)
                )
        cjk = (
            pc.count_substring_regex(text, pattern=self.CJK)
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        langs = np.array(list(self.PROFILES.keys()), dtype=object)
        best = langs[np.argmax(scores, axis=0)]
        best[scores.max(axis=0) == 0] = "unknown"
        best[cjk > 0] = "zh"
        return batch.append_column("lang_pred", pa.array(best, pa.string()))
