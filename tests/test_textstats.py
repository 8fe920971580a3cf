"""Unit tests for the text-analysis stages (no Ray needed — pure batch fns):
planted-PII redaction and Gopher-style repetition signals vs hand-computed
expectations."""

import pyarrow as pa

from clickhouse_data_pipeline_ray.functions.textstats import Redact, RepetitionStats


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_redact_planted_pii():
    r = Redact(
        patterns=(Redact.PII_PATTERNS["email"], Redact.PII_PATTERNS["ipv4"]),
        token="[PII]",
    )
    out = r(
        _tbl(
            [
                "contact me at alice@example.com or bob.smith@corp.co.uk now",
                "server at 192.168.0.1 and 10.0.0.255 responded",
                "nothing sensitive here",
                "mixed alice@example.com from 127.0.0.1",
            ]
        )
    )
    red = out.column("text_redacted").to_pylist()
    n = out.column("n_redactions").to_pylist()
    assert red[0] == "contact me at [PII] or [PII] now"
    assert red[1] == "server at [PII] and [PII] responded"
    assert red[2] == "nothing sensitive here"
    assert red[3] == "mixed [PII] from [PII]"
    assert n == [2, 2, 0, 2]
    # original column untouched (redaction is additive)
    assert "alice@example.com" in out.column("text").to_pylist()[0]


def test_redact_sequential_counting():
    """Pattern i counts matches on the text AFTER patterns < i applied — a
    term swallowed by an earlier pattern is not double-counted."""
    r = Redact(patterns=(r"\bfoo bar\b", r"\bbar\b"), token="X")
    out = r(_tbl(["foo bar baz bar"]))
    assert out.column("text_redacted").to_pylist() == ["X baz X"]
    # 'foo bar' matched once; remaining standalone 'bar' matched once
    assert out.column("n_redactions").to_pylist() == [2]


def test_repetition_stats_hand_computed():
    stats = RepetitionStats(max_dup_word_ratio=0.5)
    out = stats(
        _tbl(
            [
                "a b c d",  # no repetition
                "a a a a",  # full repetition
                "x y x y x",  # bigrams: 'x y','y x','x y','y x' -> 2 dups
                "solo",  # single word, no bigrams
            ]
        )
    )
    assert out.column("n_words").to_pylist() == [4, 4, 5, 1]
    assert out.column("n_dup_words").to_pylist() == [0, 3, 3, 0]
    assert out.column("n_dup_bigrams").to_pylist() == [0, 2, 2, 0]
    assert out.column("dup_word_ratio").to_pylist() == [0.0, 0.75, 0.6, 0.0]
    assert out.column("top_word_ratio").to_pylist() == [0.25, 1.0, 0.6, 1.0]
    assert out.column("repetitive").to_pylist() == [False, True, True, False]


def test_repetition_stats_empty_batch():
    out = RepetitionStats()(_tbl([]))
    assert out.num_rows == 0
    assert "dup_word_ratio" in out.column_names


def test_decontaminate_prefilter_identical_to_naive():
    """The chunked-alternation prefilter path (many snippets) must return
    exactly what the naive per-snippet path returns, including for snippets
    containing regex metacharacters (they are escaped into the alternation),
    and for batches with zero survivors."""
    from clickhouse_data_pipeline_ray.functions.textstats import Decontaminate

    texts = [
        "plain document about ray data pipelines",
        "contains the needle-alpha snippet right here",
        "has both needle-alpha and the weird a.b(c)+d marker",
        "nothing to see",
        None,
        "ends with needle-zzz-299",
    ]
    batch = _tbl(texts)
    # 300 snippets: 297 absent fillers + 3 planted (one with metacharacters)
    snippets = [f"needle-zzz-{i}" for i in range(299)] + [
        "needle-alpha",
        "a.b(c)+d",
    ]
    naive = Decontaminate(snippets, prefilter_min=10**9)
    fast = Decontaminate(snippets)  # 300 > 16 -> prefilter active
    assert len(fast.alt_patterns) == 2  # 301 snippets chunked at 256
    out_n, out_f = naive(batch), fast(batch)
    assert out_f.equals(out_n)
    assert out_f.column("doc_id").to_pylist() == [1, 2, 5]
    # doc 5's "needle-zzz-299" also contains "needle-zzz-29" as a substring
    assert out_f.column("n_hits").to_pylist() == [1, 2, 2]

    # zero-survivor batch: prefilter early-returns an empty, correctly-typed table
    clean = _tbl(["alpha", "beta"])
    out_clean = fast(clean)
    assert out_clean.num_rows == 0
    assert out_clean.schema.field("n_hits").type == pa.int64()
    assert out_clean.schema.field("doc_id").type == batch.schema.field("doc_id").type


def test_corpus_freq_score_hand_computed():
    """CorpusFreqScore: integer-exact mean corpus frequency per doc, with
    out-of-vocab terms scoring 0 and the top-K cap breaking ties by
    (count desc, term asc)."""
    from clickhouse_data_pipeline_ray.functions.textstats import CorpusFreqScore

    # corpus counts: the=3, cat=2, sat=1, dog=1
    terms, counts = CorpusFreqScore.build_model(
        ["the", "cat", "sat", "dog"], [3, 2, 1, 1]
    )
    s = CorpusFreqScore(terms, counts)
    out = s(_tbl(["the cat sat", "dog the", "unknown words only", ""]))
    # doc0: 3+2+1=6 over 3 tokens -> mean 2000
    # doc1: 1+3=4 over 2 -> 2000
    # doc2: all OOV -> 0 over 3 -> 0
    # doc3: '' splits to [''] -> 1 OOV token -> 0
    assert out.column("q_sum_wfreq").to_pylist() == [6, 4, 0, 0]
    assert out.column("q_mean_wfreq_milli").to_pylist() == [2000, 2000, 0, 0]

    # cap = 2 keeps (the,3) and (cat,2); tie at count 1 irrelevant here,
    # but a tie at the cap boundary must break by term asc
    t2, c2 = CorpusFreqScore.build_model(["b", "a", "c"], [5, 1, 1], max_vocab=2)
    assert t2 == ["b", "a"] and c2 == [5, 1]  # 'a' < 'c' at the tied count
    s2 = CorpusFreqScore(t2, c2)
    out2 = s2(_tbl(["b a c"]))
    # c is out of vocab: 5+1+0 = 6 over 3 -> 2000
    assert out2.column("q_sum_wfreq").to_pylist() == [6]
    assert out2.column("q_mean_wfreq_milli").to_pylist() == [2000]

    # floor semantics: sum 5 over 2 tokens -> 2500; sum 1 over 3 -> 333
    s3 = CorpusFreqScore(["x"], [1])
    out3 = s3(_tbl(["x x x"]))
    assert out3.column("q_mean_wfreq_milli").to_pylist() == [1000]
    out4 = s3(_tbl(["x y z"]))
    assert out4.column("q_mean_wfreq_milli").to_pylist() == [333]


def test_token_count_batch_bpe_hand_computed():
    """n_bpe_tokens follows the GPT-2-style pretokenization: contraction
    suffix, space-prefixed letter/digit runs, punct runs, whitespace runs."""
    from clickhouse_data_pipeline_ray.functions.textstats import (
        token_count_batch,
    )

    out = token_count_batch(
        _tbl(["it's  a test-case, 42 émojis naïve", "", "   ", "don't"])
    )
    # hand-tokenized:
    # "it's  a test-case, 42 émojis naïve" ->
    #   [it]['s][ ][ a][ test][-][case][,][ 42][ émojis][ naïve] = 11
    # "" -> 0; "   " -> one whitespace run = 1; "don't" -> [don]['t] = 2
    assert out.column("n_bpe_tokens").to_pylist() == [11, 0, 1, 2]
    # ASCII-only word runs: é/ï split "émojis"/"naïve" -> it,s,a,test,case,
    # 42,mojis,na,ve = 9
    assert out.column("n_words").to_pylist() == [9, 0, 0, 2]


# ---------------------------------------------------------------- gopher


def test_gopher_rules_per_doc_oracle():
    """Every rule pinned against a per-doc Python recompute on planted texts
    that each trip exactly one rule."""
    import re

    from clickhouse_data_pipeline_ray.functions.textstats import GopherRules

    good = "the cat and the dog sat on a mat for " + " ".join(
        f"word{i}" for i in range(60)
    )
    texts = {
        "good": good,
        "too_short": "the cat and a dog",
        "long_words": "the a " + " ".join(["anticonstitutionnellement"] * 80),
        "symbols": "the a " + "# " * 40 + " ".join(f"w{i}" for i in range(60)),
        "numbers": "the a " + " ".join(str(i) for i in range(200)),
        "bullets": "the a of "
        + "\n".join(f"- item {i} with some words here" for i in range(50)),
        "ellipsis": "the a of "
        + "\n".join(f"line {i} trailing off..." for i in range(50)),
        "no_stopwords": " ".join(f"token{i}" for i in range(100)),
    }
    batch = pa.table(
        {"doc_id": list(texts), "text": pa.array(list(texts.values()))}
    )
    out = GopherRules()(batch).to_pylist()
    got = {r["doc_id"]: r for r in out}
    assert got["good"]["gopher_pass"] is True
    for k in texts:
        if k != "good":
            assert got[k]["gopher_pass"] is False, k

    # signal-level recompute for every doc
    stop = GopherRules.STOPWORDS
    for r in out:
        t = texts[r["doc_id"]]
        words = re.findall(r"[A-Za-z0-9]+", t)
        assert r["g_n_words"] == len(words)
        alpha = len(re.findall(r"[A-Za-z]", t))
        assert abs(r["g_mean_word_len"] - alpha / max(len(words), 1)) < 1e-5
        lines = t.split("\n")
        bullets = sum(bool(re.match(r"\s*[-*•]", ln)) for ln in lines)
        assert abs(r["g_bullet_frac"] - bullets / len(lines)) < 1e-5
        ell = sum(ln.endswith("...") or ln.endswith("…") for ln in lines)
        assert abs(r["g_ellipsis_frac"] - ell / len(lines)) < 1e-5
        distinct = sum(
            bool(re.search(rf"\b{w}\b", t)) for w in stop
        )
        assert r["g_distinct_stopwords"] == distinct
        aw = sum(bool(re.search(r"[A-Za-z]", w)) for w in words)
        assert abs(r["g_alpha_word_frac"] - aw / max(len(words), 1)) < 1e-5


def test_gopher_rules_dataset_pass(ray_session):
    import ray.data as rd

    from clickhouse_data_pipeline_ray.functions.textstats import GopherRules

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = ds.map_batches(
        GopherRules,
        fn_constructor_kwargs={"min_words": 5},
        batch_format="pyarrow",
        concurrency=2,
    )
    rows = out.take_all()
    assert len(rows) == 500
    assert all("gopher_pass" in r for r in rows)
    # the synthetic corpus is clean prose: most docs pass at min_words=5
    assert sum(r["gopher_pass"] for r in rows) > 250
