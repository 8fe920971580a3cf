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

# GPT-2-style pretokenizer, RE2-compatible (no lookahead): contraction
# suffixes | space?-letters | space?-digits | space?-punct-run | whitespace.
BPE_RE = r"'(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token counting, two tokenizations per doc (regex-based, zero-copy
    Arrow, RE2 on both the engine and the SQL-oracle side):

    - ``n_words``: simple word tokens (``WORD_RE``) — the whitespace-ish
      count every length filter uses.
    - ``n_bpe_tokens``: a GPT-2-style pretokenizer count (``BPE_RE``:
      contraction suffixes, space-prefixed letter runs, digit runs,
      punctuation runs, whitespace runs) — the pre-merge token count a BPE
      tokenizer would start from, i.e. the budget estimate a training-data
      pipeline sizes batches with. RE2 has no lookahead, so the trailing
      ``\\s+(?!\\S)`` of the original GPT-2 pattern is folded into ``\\s+``;
      match COUNTS are unchanged (every whitespace run is one match either
      way)."""
    text = batch.column(text_col)
    n_words = pc.count_substring_regex(text, pattern=WORD_RE)
    n_bpe = pc.count_substring_regex(text, pattern=BPE_RE)
    batch = batch.append_column("n_words", n_words.cast(pa.int64()))
    return batch.append_column("n_bpe_tokens", n_bpe.cast(pa.int64()))


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
        # ONE alternation pass instead of ten scans: \b-delimited word
        # matches are mutually non-overlapping, so the alternation count
        # equals the per-word sum (SQL-oracle parity via _STOP_SQL unchanged)
        self.stop_pattern = rf"\b({'|'.join(self.STOPWORDS)})\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n_words = pc.count_substring_regex(text, pattern=WORD_RE).cast(pa.float64())
        n_chars = pc.utf8_length(text).cast(pa.float64())
        n_alpha = pc.count_substring_regex(text, pattern=r"[A-Za-z]").cast(pa.float64())
        n_stop = pc.count_substring_regex(
            text, pattern=self.stop_pattern
        ).cast(pa.float64())
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


class GopherRules:
    """The Gopher quality-rule bundle (Rae et al. 2021, Appendix A) minus
    the repetition signals (those are :class:`RepetitionStats`): per doc,
    compute every rule's signal and a single ``gopher_pass`` verdict.

    Rules (thresholds configurable, defaults = the paper's):
    - word count in [min_words, max_words] (50 … 100,000)
    - mean word length in [3, 10]
    - symbol-to-word ratio (# and ellipsis) ≤ 0.1
    - ≤ 90% of lines start with a bullet, ≤ 30% end with an ellipsis
    - ≥ 80% of words contain at least one alphabetic character
    - at least 2 DISTINCT stopwords present (the "harmful boilerplate" cue)

    One vectorized Arrow pass (RE2 kernels only — the identical patterns run
    in DuckDB for oracle parity); stateful actor stage (patterns compiled
    once per actor)."""

    def __init__(
        self,
        text_col: str = "text",
        min_words: int = 50,
        max_words: int = 100_000,
        min_mean_word_len: float = 3.0,
        max_mean_word_len: float = 10.0,
        max_symbol_ratio: float = 0.1,
        max_bullet_frac: float = 0.9,
        max_ellipsis_frac: float = 0.3,
        min_alpha_word_frac: float = 0.8,
        min_distinct_stopwords: int = 2,
    ):
        self.text_col = text_col
        self.p = dict(
            min_words=min_words, max_words=max_words,
            min_mean_word_len=min_mean_word_len,
            max_mean_word_len=max_mean_word_len,
            max_symbol_ratio=max_symbol_ratio,
            max_bullet_frac=max_bullet_frac,
            max_ellipsis_frac=max_ellipsis_frac,
            min_alpha_word_frac=min_alpha_word_frac,
            min_distinct_stopwords=min_distinct_stopwords,
        )

    STOPWORDS = QualityScore.STOPWORDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        f64 = pa.float64()
        n_words = pc.count_substring_regex(text, pattern=WORD_RE).cast(f64)
        n_alpha = pc.count_substring_regex(text, pattern=r"[A-Za-z]").cast(f64)
        # an alnum run containing at least one letter matches exactly once
        n_alpha_words = pc.count_substring_regex(
            text, pattern=r"[0-9]*[A-Za-z][A-Za-z0-9]*"
        ).cast(f64)
        n_symbols = pc.count_substring_regex(
            text, pattern=r"#|\.\.\.|…"
        ).cast(f64)
        n_lines = pc.add(
            pc.count_substring_regex(text, pattern=r"\n").cast(f64), 1.0
        )
        n_bullet = pc.count_substring_regex(
            text, pattern=r"(?m)^\s*[\-\*•]"
        ).cast(f64)
        n_ellipsis_end = pc.count_substring_regex(
            text, pattern=r"(?m)(\.\.\.|…)$"
        ).cast(f64)
        n_stop_distinct = pa.nulls(batch.num_rows, pa.int64()).fill_null(0)
        for w in self.STOPWORDS:
            hit = pc.match_substring_regex(text, pattern=rf"\b{w}\b")
            n_stop_distinct = pc.add(
                n_stop_distinct, pc.fill_null(hit, False).cast(pa.int64())
            )
        safe_words = pc.max_element_wise(n_words, 1.0)
        mean_wl = pc.divide(n_alpha, safe_words)
        sym_ratio = pc.divide(n_symbols, safe_words)
        alpha_frac = pc.divide(n_alpha_words, safe_words)
        bullet_frac = pc.divide(n_bullet, n_lines)
        ellipsis_frac = pc.divide(n_ellipsis_end, n_lines)
        p = self.p
        ok = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(n_words, float(p["min_words"])),
                    pc.less_equal(n_words, float(p["max_words"])),
                ),
                pc.and_(
                    pc.greater_equal(mean_wl, p["min_mean_word_len"]),
                    pc.less_equal(mean_wl, p["max_mean_word_len"]),
                ),
            ),
            pc.and_(
                pc.and_(
                    pc.less_equal(sym_ratio, p["max_symbol_ratio"]),
                    pc.greater_equal(alpha_frac, p["min_alpha_word_frac"]),
                ),
                pc.and_(
                    pc.and_(
                        pc.less_equal(bullet_frac, p["max_bullet_frac"]),
                        pc.less_equal(ellipsis_frac, p["max_ellipsis_frac"]),
                    ),
                    pc.greater_equal(
                        n_stop_distinct,
                        pa.scalar(p["min_distinct_stopwords"], pa.int64()),
                    ),
                ),
            ),
        )
        rnd = dict(ndigits=6, round_mode="half_towards_infinity")
        batch = batch.append_column("g_n_words", n_words.cast(pa.int64()))
        batch = batch.append_column("g_mean_word_len", pc.round(mean_wl, **rnd))
        batch = batch.append_column("g_symbol_ratio", pc.round(sym_ratio, **rnd))
        batch = batch.append_column("g_alpha_word_frac", pc.round(alpha_frac, **rnd))
        batch = batch.append_column("g_bullet_frac", pc.round(bullet_frac, **rnd))
        batch = batch.append_column(
            "g_ellipsis_frac", pc.round(ellipsis_frac, **rnd)
        )
        batch = batch.append_column("g_distinct_stopwords", n_stop_distinct)
        return batch.append_column("gopher_pass", pc.fill_null(ok, False))


class CorpusFreqScore:
    """Two-phase corpus-statistics scorer — the CCNet / perplexity-filter
    SHAPE (build a model over the whole corpus, broadcast it, score every
    doc against it) with an INTEGER-exact contract so the SQL oracle
    compares byte-for-byte:

    - phase 1 (caller): a `{term: corpus occurrence count}` model, capped to
      the top ``max_vocab`` terms by (count desc, term asc) — a bounded
      broadcast however big the corpus (out-of-vocab terms score 0, exactly
      the OOV convention of a real LM filter).
    - phase 2 (this stage): the model ships ONCE per actor via
      ``fn_constructor_kwargs`` (sorted term array + counts for binary
      search); each doc gets ``q_sum_wfreq`` = Σ model[term] over its token
      occurrences and ``q_mean_wfreq_milli`` = floor(1000·sum/n_tokens) —
      rare-word-heavy (OOV-ish) docs score LOW, the filterable signal.

    Tokenizer is the same single-space split as term_doc_frequency, so the
    SQL twin is `unnest(string_split(...)) LEFT JOIN vocab` + integer
    division. All per-batch work is vectorized: one split/flatten, one
    searchsorted against the sorted vocab, one reduceat per doc."""

    def __init__(self, terms: list, counts: list, text_col: str = "text"):
        self.terms = np.array(terms, dtype=object)
        order = np.argsort(self.terms)
        self.terms = self.terms[order]
        self.counts = np.asarray(counts, dtype=np.int64)[order]
        self.text_col = text_col

    @staticmethod
    def build_model(
        terms: list, counts: list, max_vocab: int = 65536
    ) -> tuple[list, list]:
        """Top-``max_vocab`` by (count desc, term asc) — the deterministic
        cap both engines apply (the SQL twin is ORDER BY c DESC, term LIMIT)."""
        top = sorted(zip(terms, counts), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
        return [t for t, _ in top], [c for _, c in top]

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(
            batch.column(self.text_col), pattern=" "
        ).combine_chunks()
        n = pc.list_value_length(lists).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        words = pc.list_flatten(lists).to_numpy(zero_copy_only=False).astype(object)
        sums = np.zeros(len(n), dtype=np.int64)
        if len(words) and len(self.terms):
            idx = np.searchsorted(self.terms, words)
            idx_c = np.minimum(idx, len(self.terms) - 1)
            freqs = np.where(self.terms[idx_c] == words, self.counts[idx_c], 0)
            starts = np.concatenate(([0], np.cumsum(n)))[:-1]
            nz = n > 0
            if nz.any():
                sums[nz] = np.add.reduceat(freqs, starts[nz])[: int(nz.sum())]
        mean_milli = np.where(n > 0, (1000 * sums) // np.maximum(n, 1), 0)
        batch = batch.append_column("q_sum_wfreq", pa.array(sums, pa.int64()))
        batch = batch.append_column(
            "q_mean_wfreq_milli", pa.array(mean_milli, pa.int64())
        )
        return batch


class Redact:
    """PII / blocklist scrubbing (the safety pass every training-data
    pipeline runs before tokenization): sequentially apply RE2 patterns,
    replacing every match with ``token`` and counting matches per row.

    Patterns are RE2 in both pyarrow and DuckDB, so the SQL oracle applies
    the IDENTICAL patterns via nested regexp_replace/regexp_extract_all.
    Sequential contract: pattern i's matches are counted on the text AFTER
    patterns < i were applied (mirrored by the SQL nesting). Stateful stage:
    the pattern list lives in the actor, applied vectorized per batch."""

    # Classic PII shapes (RE2-safe, no backrefs). The synthetic corpus
    # contains none of these — driver queries add a term blocklist that does
    # match, so the replacement path is exercised end-to-end.
    PII_PATTERNS = {
        "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
        "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "phone": r"\+?[0-9][0-9() -]{6,}[0-9]",
    }

    def __init__(
        self,
        patterns: tuple[str, ...],
        token: str = "[PII]",
        text_col: str = "text",
    ):
        self.patterns = tuple(patterns)
        self.token = token
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        total = pa.nulls(batch.num_rows, pa.int64()).fill_null(0)
        for pat in self.patterns:
            c = pc.count_substring_regex(text, pattern=pat).cast(pa.int64())
            total = pc.add(total, c)
            text = pc.replace_substring_regex(
                text, pattern=pat, replacement=self.token
            )
        batch = batch.append_column("text_redacted", text)
        return batch.append_column("n_redactions", total)


class RepetitionStats:
    """Gopher-style repetition signals per document: duplicate-word fraction,
    top-word fraction, duplicate-bigram fraction (the quality filters used to
    drop boilerplate/spam before pretraining).

    One fully vectorized pass per batch: split → flatten → SipHash each word
    → one lexsort over (row, hash) gives per-row distinct counts, run lengths
    (→ top-word count) and, from adjacent-hash mixing, bigram distincts —
    no Python loop over rows or words. Word identity is the 64-bit SipHash
    (collision odds ~n²/2⁶⁴ — negligible, and deterministic across runs)."""

    def __init__(self, text_col: str = "text", max_dup_word_ratio: float = 0.5):
        self.text_col = text_col
        self.max_dup_word_ratio = max_dup_word_ratio

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            empty = pa.nulls(0, pa.int64())
            for name in ("n_words", "n_dup_words", "n_dup_bigrams"):
                batch = batch.append_column(name, empty)
            for name in ("dup_word_ratio", "top_word_ratio", "dup_bigram_ratio"):
                batch = batch.append_column(name, pa.nulls(0, pa.float64()))
            return batch.append_column("repetitive", pa.nulls(0, pa.bool_()))
        lists = pc.split_pattern(batch.column(self.text_col), pattern=" ")
        flat_counts = pc.list_value_length(lists).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        values = pc.list_flatten(lists).to_numpy(zero_copy_only=False).astype(object)
        h = hash_array(values, categorize=False)
        rows = np.repeat(np.arange(n, dtype=np.int64), flat_counts)

        order = np.lexsort((h, rows))
        rs, hs = rows[order], h[order]
        is_new = np.empty(len(rs), dtype=bool)
        is_new[:1] = True
        is_new[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
        distinct = np.bincount(rs[is_new], minlength=n)
        # run lengths of equal (row, word) -> max per row = top-word count
        starts = np.flatnonzero(is_new)
        run_len = np.diff(np.append(starts, len(rs)))
        top = np.zeros(n, dtype=np.int64)
        np.maximum.at(top, rs[starts], run_len)

        # bigrams: mix adjacent hashes within a row (order-sensitive mix)
        same_row = rows[1:] == rows[:-1]
        bg = (h[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ h[1:]
        bg_rows, bg = rows[:-1][same_row], bg[same_row]
        n_bigrams = np.bincount(bg_rows, minlength=n)
        if len(bg):
            border = np.lexsort((bg, bg_rows))
            brs, bhs = bg_rows[border], bg[border]
            bnew = np.empty(len(brs), dtype=bool)
            bnew[:1] = True
            bnew[1:] = (brs[1:] != brs[:-1]) | (bhs[1:] != bhs[:-1])
            bg_distinct = np.bincount(brs[bnew], minlength=n)
        else:
            bg_distinct = np.zeros(n, dtype=np.int64)

        n_words = flat_counts
        safe_w = np.maximum(n_words, 1).astype(np.float64)
        safe_b = np.maximum(n_bigrams, 1).astype(np.float64)
        dup_ratio = np.floor((n_words - distinct) / safe_w * 1e6 + 0.5) / 1e6
        top_ratio = np.floor(top / safe_w * 1e6 + 0.5) / 1e6
        bg_ratio = np.floor((n_bigrams - bg_distinct) / safe_b * 1e6 + 0.5) / 1e6

        batch = batch.append_column("n_words", pa.array(n_words, pa.int64()))
        batch = batch.append_column(
            "n_dup_words", pa.array(n_words - distinct, pa.int64())
        )
        batch = batch.append_column(
            "n_dup_bigrams", pa.array(n_bigrams - bg_distinct, pa.int64())
        )
        batch = batch.append_column("dup_word_ratio", pa.array(dup_ratio))
        batch = batch.append_column("top_word_ratio", pa.array(top_ratio))
        batch = batch.append_column("dup_bigram_ratio", pa.array(bg_ratio))
        return batch.append_column(
            "repetitive", pa.array(dup_ratio > self.max_dup_word_ratio)
        )


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


class Decontaminate:
    """Test-set decontamination: flag documents that contain any benchmark
    snippet (the n-gram-overlap decontamination step every pretraining
    pipeline runs before training; reference analog: the defensive
    row-filtering discipline of stream_etl/core/processor.py:186-217).

    The snippet list is SMALL relative to the corpus (benchmarks are KBs,
    corpora are TBs) — it ships once per actor via ``fn_constructor_kwargs``
    (Ray serializes the constructor args into the actor, never per batch).
    ``n_hits`` counts how many distinct snippets occur (SQL-parity with a
    `JOIN ON contains(text, snip) GROUP BY doc` count).

    Two regimes, identical results:
    - few snippets (≤ ``prefilter_min``): one vectorized
      ``pc.match_substring`` pass per snippet over the whole batch.
    - many snippets: a PREFILTER of chunked RE2 alternations (one vectorized
      regex pass per ~``alt_chunk`` snippets — RE2 compiles the alternation
      into one automaton, the Aho-Corasick analog available in-container)
      narrows the batch to rows containing ANY snippet; the exact
      per-snippet counting loop then runs only on that survivor slice.
      Contamination is rare by nature, so the cost is
      O(corpus × snippets/alt_chunk + contaminated_rows × snippets) instead
      of O(corpus × snippets). Patterns compile once per ACTOR in
      ``__init__``, never per batch.
    """

    def __init__(
        self,
        snippets: list[str],
        text_col: str = "text",
        key_col: str = "doc_id",
        prefilter_min: int = 16,
        alt_chunk: int = 256,
    ):
        import re as _re

        self.snippets = list(snippets)
        self.text_col, self.key_col = text_col, key_col
        self.alt_patterns: list[str] = []
        if len(self.snippets) > prefilter_min:
            for i in range(0, len(self.snippets), alt_chunk):
                chunk = self.snippets[i : i + alt_chunk]
                self.alt_patterns.append(
                    "|".join(_re.escape(s) for s in chunk)
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if self.alt_patterns:
            any_hit = np.zeros(batch.num_rows, dtype=bool)
            for pat in self.alt_patterns:
                m = pc.fill_null(
                    pc.match_substring_regex(text, pattern=pat), False
                )
                any_hit |= m.to_numpy(zero_copy_only=False)
            if not any_hit.any():
                return pa.table(
                    {
                        self.key_col: batch.column(self.key_col).slice(0, 0),
                        "n_hits": pa.array([], type=pa.int64()),
                    }
                )
            batch = batch.filter(pa.array(any_hit))
            text = batch.column(self.text_col)
        n_hits = np.zeros(batch.num_rows, dtype=np.int64)
        for snip in self.snippets:
            hit = pc.fill_null(pc.match_substring(text, pattern=snip), False)
            n_hits += hit.to_numpy(zero_copy_only=False)
        keep = n_hits > 0
        return pa.table(
            {
                self.key_col: batch.column(self.key_col).filter(
                    pa.array(keep)
                ),
                "n_hits": pa.array(n_hits[keep]),
            }
        )


def snippet_shingle_hashes(snippets: list[str], k: int = 8) -> np.ndarray:
    """Sorted unique word-``k``-gram hashes of the benchmark snippets.

    The driver-side half of n-gram-hash decontamination: hash every
    ``k``-word window of every snippet with the SAME rolling kernel the
    corpus side uses (``dedup._batch_shingle_hashes``), so membership is an
    integer comparison. Snippets shorter than ``k`` words are rejected
    loudly — their k-gram set is empty, so silently accepting them would
    report "decontaminated" while never matching anything; route tiny
    snippets to the exact-substring ``Decontaminate`` stage instead.
    """
    from .dedup import _batch_shingle_hashes

    snippets = [s for s in snippets if s is not None]
    short = [s for s in snippets if len(s.split()) < k]
    if short:
        raise ValueError(
            f"{len(short)} snippet(s) have fewer than k={k} words and can "
            f"never match a {k}-gram (first: {short[0]!r}); lower k or use "
            "the substring Decontaminate stage for tiny snippets"
        )
    if not snippets:
        # an accidentally empty/all-null snippets source would otherwise
        # report every doc "clean" — the silent false negative this
        # function exists to prevent
        raise ValueError(
            "no snippets provided (empty or all-null benchmark set); "
            "refusing to report a trivially-clean corpus"
        )
    flat, _ = _batch_shingle_hashes(snippets, k)
    u = np.unique(flat)
    return u[u != 0]  # 0 is the empty-doc sentinel, never a real shingle


class NgramDecontaminate:
    """N-gram-HASH test-set decontamination — the whole-benchmark-suite
    scale path (GPT-3's 13-gram overlap check, Brown et al. 2020 App. C;
    the PaLM/Llama pretraining-decontamination shape).

    ``Decontaminate`` above matches exact substrings with one RE2
    alternation pass per ~256 snippets — right for a handful of strings,
    but still O(corpus × snippets/256) as the benchmark suite grows, and
    blind to near-verbatim overlap (whitespace drift, a changed word 20
    tokens in). This stage instead hashes every ``k``-word window of every
    document ONCE (the vectorized rolling-polynomial tiling shared with
    ``segment_dedup``) and tests membership against the benchmark's shingle
    hashes by binary search: **one pass over the corpus, cost independent
    of benchmark size**, and any k-consecutive-word overlap is caught no
    matter how the surrounding text differs.

    Scale shape: map-only (NO shuffle); the sorted hash array (8 bytes per
    benchmark shingle — MBs for every public benchmark combined, however
    big the corpus) ships once per actor via ``fn_constructor_kwargs``;
    per batch it is one tiling pass + one ``searchsorted``. Reference
    analog: the defensive row-filtering discipline of
    stream_etl/core/processor.py:186-217, as for ``Decontaminate``.

    Per-doc output counts DISTINCT shingles (a snippet repeated in a doc
    counts once): ``n_shingles`` distinct k-grams in the doc (docs shorter
    than ``k`` words fall back to distinct word hashes — they can never
    match a k-gram hash, so they always report 0 hits), ``n_contaminated``
    of them present in the benchmark set, and their ratio
    ``contam_frac``.
    """

    def __init__(
        self,
        bench_hashes: np.ndarray,
        k: int = 8,
        text_col: str = "text",
        key_col: str = "doc_id",
    ):
        self.bench = np.ascontiguousarray(
            np.asarray(bench_hashes, dtype=np.uint64)
        )
        self.k, self.text_col, self.key_col = int(k), text_col, key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _batch_shingle_hashes, _segment_unique

        n = batch.num_rows
        texts = [
            t if t is not None else ""
            for t in batch.column(self.text_col).to_pylist()
        ]
        flat, offsets = _batch_shingle_hashes(texts, self.k)
        fu, off_u = _segment_unique(flat, offsets)
        n_shingles = np.diff(off_u)
        seg0 = np.repeat(np.arange(n, dtype=np.int64), n_shingles)
        # empty docs carry a single 0-sentinel "shingle" from the tiling
        # kernel — not a real k-gram; drop it from the denominator
        n_shingles = n_shingles - np.bincount(seg0[fu == 0], minlength=n)
        if len(self.bench) and len(fu):
            pos = np.searchsorted(self.bench, fu)
            pos[pos == len(self.bench)] = 0
            hit = (self.bench[pos] == fu) & (fu != 0)
        else:
            hit = np.zeros(len(fu), dtype=bool)
        n_contam = np.bincount(seg0[hit], minlength=n).astype(np.int64)
        return pa.table(
            {
                self.key_col: batch.column(self.key_col),
                "n_shingles": pa.array(n_shingles, pa.int64()),
                "n_contaminated": pa.array(n_contam, pa.int64()),
                "contam_frac": pa.array(
                    n_contam / np.maximum(n_shingles, 1), pa.float64()
                ),
            }
        )


def ngram_decontaminate(
    ds,
    snippets: list[str],
    k: int = 8,
    min_hits: int = 1,
    min_frac: float = 0.0,
    text_col: str = "text",
    key_col: str = "doc_id",
    concurrency: int = 4,
    emit: str = "hits",
):
    """N-gram-hash decontamination over a documents Dataset.

    Hashes the benchmark snippets once on the driver
    (:func:`snippet_shingle_hashes` — KBs of state however big the corpus),
    ships the sorted hash array once per actor, and streams the corpus
    through :class:`NgramDecontaminate` — map-only, no shuffle, cost
    independent of how many snippets the benchmark suite holds.

    ``emit="hits"`` (default) returns only contaminated docs
    (``n_contaminated >= min_hits`` and ``contam_frac >= min_frac``) — the
    rows a cleaning pipeline anti-joins away; ``emit="all"`` returns every
    doc's contamination stats (for threshold tuning).
    """
    if emit not in ("hits", "all"):
        raise ValueError(f"emit must be 'hits' or 'all', got {emit!r}")
    bench = snippet_shingle_hashes(snippets, k)
    out = ds.map_batches(
        NgramDecontaminate,
        fn_constructor_kwargs={
            "bench_hashes": bench,
            "k": k,
            "text_col": text_col,
            "key_col": key_col,
        },
        batch_format="pyarrow",
        # autoscaling pool (min 1): a fixed pool of N actors reserves N
        # CPUs up front and can starve the upstream read on small sessions
        concurrency=(1, concurrency),
    )
    if emit == "all":
        return out
    mh, mf = int(min_hits), float(min_frac)

    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b.column("n_contaminated"), mh),
            pc.greater_equal(b.column("contam_frac"), mf),
        )
        return b.filter(m)

    return out.map_batches(keep, batch_format="pyarrow")
