"""Unit tests for text-analysis operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.textual import (
    bpe_ish_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    shingles_expr,
    token_count_expr,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr(F.col("text")).alias("v")).first().v


def test_token_counts(spark):
    assert _one(spark, "a b  c", token_count_expr) == 3
    assert _one(spark, "Hello, world! (test)", bpe_ish_token_count_expr) == 3


def test_shingles_short_doc_empty(spark):
    assert _one(spark, "one two", lambda c: shingles_expr(c, 3)) == []
    assert _one(spark, "one two three four", lambda c: shingles_expr(c, 3)) == \
        ["one two three", "two three four"]


def test_fingerprint_normalizes_case_and_ws(spark):
    a = _one(spark, "Hello   World", fingerprint_expr)
    b = _one(spark, "hello world  ", fingerprint_expr)
    c = _one(spark, "hello earth", fingerprint_expr)
    assert a == b != c


def test_lang_id_markers(spark):
    assert _one(spark, "the cat and the dog is here", lang_id_expr) == "en"
    assert _one(spark, "el perro y la casa que tiene", lang_id_expr) == "es"
    assert _one(spark, "der hund und die katze ist da", lang_id_expr) == "de"
    assert _one(spark, "le chat et les maisons des gens", lang_id_expr) == "fr"
    assert _one(spark, "你好世界", lang_id_expr) == "zh"
    assert _one(spark, "xyzzy plugh", lang_id_expr) == "und"


def test_quality_score_range(spark):
    v = _one(spark, "the quick brown fox and the lazy dog " * 10,
             quality_score_expr)
    assert 0.0 <= v <= 1.0
    junk = _one(spark, "!!!???...;;;", quality_score_expr)
    assert junk < v


def test_chunk_documents_boundaries(spark):
    from bigdata_spark_assignment_spark.operators.textual import (
        chunk_documents,
    )
    words_120 = " ".join(f"w{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, words_120), (2, "short doc"), (3, "x")],
        "doc_id long, text string")
    out = chunk_documents(docs, max_tokens=64, overlap=16)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc1: 120 tokens, stride 48 → ceil((120-16)/48)=3 chunks
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert rows[(1, 0)].n_tokens == 64
    assert rows[(1, 0)].chunk_text.startswith("w0 w1 ")
    # overlap: chunk1 starts at token 48 (64-16 overlap with chunk0)
    assert rows[(1, 1)].chunk_text.startswith("w48 ")
    # last chunk: tokens 96..119 → 24 tokens
    assert rows[(1, 2)].n_tokens == 24
    assert rows[(1, 2)].chunk_text.endswith("w119")
    # short docs yield exactly one chunk, intact
    assert rows[(2, 0)].chunk_text == "short doc"
    assert rows[(3, 0)].n_tokens == 1
    # reconstruction: dropping each chunk's 16-token overlap prefix
    # (except chunk 0) re-joins to the original token stream
    parts = [rows[(1, 0)].chunk_text.split(" ")] + [
        rows[(1, i)].chunk_text.split(" ")[16:] for i in (1, 2)]
    assert [w for p in parts for w in p] == words_120.split(" ")


def test_mask_pii_and_counts(spark):
    from bigdata_spark_assignment_spark.operators.textual import (
        mask_pii_expr,
        pii_counts_expr,
    )
    df = spark.createDataFrame(
        [("contact bob@example.com or visit https://x.io/a?b=1 now",),
         ("no pii here",),
         ("two mails: a@b.co c.d@e.org and http://plain.net",)],
        "text string")
    n_e, n_u = pii_counts_expr(F.col("text"))
    out = df.select(mask_pii_expr(F.col("text")).alias("m"),
                    n_e.alias("e"), n_u.alias("u")).collect()
    assert out[0].m == "contact <EMAIL> or visit <URL> now"
    assert (out[0].e, out[0].u) == (1, 1)
    assert out[1].m == "no pii here" and out[1].e == 0
    assert out[2].m == "two mails: <EMAIL> <EMAIL> and <URL>"
    assert (out[2].e, out[2].u) == (2, 1)


def test_repetition_ratio(spark):
    from bigdata_spark_assignment_spark.operators.textual import (
        repetition_ratio_expr,
    )
    df = spark.createDataFrame(
        [("a b c d",), ("spam spam spam spam",), ("x x y y",), ("",)],
        "text string")
    out = [r.r for r in
           df.select(repetition_ratio_expr(F.col("text")).alias("r"))
           .collect()]
    assert out[0] == 0.0
    assert abs(out[1] - 0.75) < 1e-9
    assert abs(out[2] - 0.5) < 1e-9
    # empty text: split('') → [''] (1 token, distinct) → ratio 0
    assert out[3] == 0.0


def test_ngrams_positional_keeps_duplicates(spark):
    from bigdata_spark_assignment_spark.operators.textual import ngrams_expr

    assert _one(spark, "a b a b", lambda c: ngrams_expr(c, 2)) == \
        ["a b", "b a", "a b"]
    assert _one(spark, "a b", lambda c: ngrams_expr(c, 5)) == []


def test_repetition_ngram_filters_planted(spark, tmp_path):
    """Planted-truth check of the q74 metric definitions on a corpus
    where the coverages are hand-computable."""
    from bigdata_spark_assignment_spark.plans.text_plans import (
        repetition_ngram_filters,
    )

    # doc 0: "x y x y x y" — 5 bigrams, "x y" occurs 3x (len 3) -> top2
    # coverage = 9/11; 2 distinct 5-grams, none duplicated -> dup5 = 0.
    # doc 1: "a b c d e a b c d e a b c d e" (29 chars) — 5-gram
    # "a b c d e" occurs 3x (len 9) -> dup5 >= 27/29 > 0.15; top2
    # "a b" occurs 3x (len 3) -> 9/29 > 0.20 is False (0.3103 > 0.2 True).
    rows = [(0, "x y x y x y", "en", "s", 11),
            (1, "a b c d e a b c d e a b c d e", "en", "s", 29)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["lang"]: r for r in
           repetition_ngram_filters(spark, str(tmp_path)).collect()}
    en = out["en"]
    assert en["n_docs"] == 2
    assert en["max_top2gram_frac"] == round(9 / 11, 4)
    # doc 1 dup5: "a b c d e" 3x9=27 plus every other 5-gram window that
    # repeats ("b c d e a" x2=18, "c d e a b" x2=18, "d e a b c" x2=18,
    # "e a b c d" x2=18) -> (27+72)/29
    assert en["max_dup5gram_frac"] == round((27 + 72) / 29, 4)
    assert en["n_flag_top2"] == 2      # 9/11 and 9/29 both > 0.20
    assert en["n_flag_dup5"] == 1      # only doc 1


def test_repetition_paths_equivalent(spark, sf_smoke):
    """The Arrow-batched q74 path and the pure-relational formulation
    must produce identical per-lang aggregates."""
    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.plans.text_plans import (
        _repetition_lang_agg,
        repetition_fracs_relational,
        repetition_ngram_filters,
    )

    docs = load_table(spark, sf_smoke, "documents")
    rel = _repetition_lang_agg(repetition_fracs_relational(docs))
    arrow_rows = sorted(map(tuple, repetition_ngram_filters(spark, sf_smoke)
                            .select(*rel.columns).collect()))
    rel_rows = sorted(map(tuple, rel.collect()))
    assert arrow_rows == rel_rows


@pytest.mark.parametrize("weird", ["\u00a0", "\x0b"])
def test_odd_whitespace_does_not_split_tokens(spark, weird):
    """The explicit WS_CLASS contract: characters the three regex
    engines disagree on under \\s — U+00A0 (whitespace only to
    Python's Unicode \\s) and \\x0B vertical tab (whitespace to Java's
    \\s but NOT to RE2/DuckDB's) — must be PART of a token in every
    path. Pinned by comparing the Arrow window-hash path against the
    JVM-tokenized relational witness on a doc where naive \\s regimes
    disagree, and by DuckDB producing the same token count."""
    import duckdb

    from bigdata_spark_assignment_spark.operators.dedup import (
        shared_window_stats,
    )
    from bigdata_spark_assignment_spark.operators.textual import words_expr

    text = f"alpha{weird}beta w1 w2 w3 w4"
    docs = spark.createDataFrame([(1, text), (2, text)],
                                 "doc_id long, text string")
    # JVM tokenization: 5 tokens (the odd-whitespace token stays whole)
    n_jvm = docs.select(F.size(words_expr(F.col("text"))).alias("n")) \
        .first().n
    assert n_jvm == 5
    # DuckDB (RE2 \s+) agrees
    import duckdb as _dd
    n_duck = _dd.sql(
        "SELECT len(string_split_regex(lower(?), '\\s+'))",
        params=[text]).fetchone()[0]
    assert n_duck == 5
    # both docs share their full 5-token window — 1 shared window; a
    # divergent split (6 tokens) would find 2 shared 5-windows
    out = shared_window_stats(docs, window_tokens=5).first()
    assert out.n_shared_windows == 1
    assert out.n_docs_with_shared == 2


def test_unigram_doc_scores_hand_computed(spark):
    """ln p and the hashed-model score on a 2-doc corpus where the
    unigram LM is computable by hand: corpus tokens = [a a a b], so
    p(a)=3/4, p(b)=1/4."""
    import math

    from bigdata_spark_assignment_spark.operators.textual import (
        hashed_weight_expr,
        unigram_doc_scores,
    )

    docs = spark.createDataFrame([(1, "a a a"), (2, "b")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_doc_scores(docs).collect()}
    assert out[1].logprob == pytest.approx(math.log(3 / 4))
    assert out[2].logprob == pytest.approx(math.log(1 / 4))

    # clf = mean md5 pseudo-weight; single-token docs expose the raw
    # weight, which must be in [-1, 1] and engine-independent
    wa = docs.sparkSession.range(1).select(
        hashed_weight_expr(F.lit("a")).alias("w")).first().w
    assert -1.0 <= wa <= 1.0
    assert out[1].clf == pytest.approx(wa)
    import duckdb
    duck_w = duckdb.sql(
        "SELECT (CAST(('0x' || substr(md5('a'),1,8)) AS BIGINT) % 2001"
        "        - 1000) / 1000.0").fetchone()[0]
    assert wa == pytest.approx(duck_w)


def test_packing_accounting_hand_computed(spark):
    """Concat-and-chunk at 5 tokens/seq over one lang stream:
    docs (3, 4, 2, 6 tokens) concat to 15 tokens -> 3 sequences;
    doc B (tokens 3..6) straddles the 5-boundary, doc D (tokens
    9..14) straddles the 10-boundary; waste = 0 (15 == 3*5)."""
    from bigdata_spark_assignment_spark.operators.textual import (
        packing_accounting,
    )

    rows = [(0, "a b c", "en"), (1, "d e f g", "en"),
            (2, "h i", "en"), (3, "j k l m n o", "en"),
            (4, "x y", "fr")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in
           packing_accounting(docs, seq_tokens=5).collect()}
    assert (out[0].seq_first, out[0].seq_last, out[0].straddles) == (0, 0, False)
    assert (out[1].seq_first, out[1].seq_last, out[1].straddles) == (0, 1, True)
    assert (out[2].seq_first, out[2].seq_last, out[2].straddles) == (1, 1, False)
    assert (out[3].seq_first, out[3].seq_last, out[3].straddles) == (1, 2, True)
    # fr stream is independent: 2 tokens, first sequence only
    assert (out[4].seq_first, out[4].seq_last, out[4].straddles) == (0, 0, False)


def test_chunk_udtf_matches_relational_chunker(spark):
    """The Python UDTF surface (SURVEY §2.8 — absent in the
    reference): a lateral-join chunking UDTF must reproduce the
    relational chunk_documents boundaries exactly. The UDTF is the
    API-surface demonstrator; chunk_documents (pure relational,
    codegen) stays the scale path."""
    from pyspark.sql.functions import udtf

    from bigdata_spark_assignment_spark.operators.textual import (
        chunk_documents,
    )

    @udtf(returnType="chunk_id int, chunk_text string, n_tokens int")
    class ChunkTokens:
        def eval(self, text: str, max_tokens: int, overlap: int):
            import re
            words = re.split("[ \t\n\r\f]+", text.lower()) \
                if text is not None else []
            stride = max_tokens - overlap
            n_chunks = max(
                1, -(-(len(words) - overlap) // stride))  # ceil
            for i in range(n_chunks):
                w = words[i * stride:i * stride + max_tokens]
                yield i, " ".join(w), len(w)

    spark.udtf.register("chunk_tokens", ChunkTokens)
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(120))),
         (2, "short doc"), (3, "x")],
        "doc_id long, text string")
    docs.createOrReplaceTempView("udtf_docs")
    got = sorted(
        spark.sql("""
            SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_tokens
            FROM udtf_docs d,
                 LATERAL chunk_tokens(d.text, 64, 16) c
        """).collect())
    want = sorted(map(tuple, chunk_documents(
        docs, max_tokens=64, overlap=16).collect()))
    assert [tuple(r) for r in got] == want


def test_unicode_normalizers_roundtrip_and_edges(spark):
    """r5 Arrow normalizers: NFC composes decomposed sequences,
    strip_accents folds to the base letters, and both pass through
    None / empty / accent-free text unchanged (incl. CJK, which has no
    combining marks to strip)."""
    from pyspark.sql import functions as F

    from bigdata_spark_assignment_spark.operators.textual import (
        strip_accents_udf,
        unicode_nfc_udf,
    )
    rows = [
        ("dec", "a\u0301e\u0301"),    # decomposed a/e + acute
        ("comp", "\u00e1\u00e9\u00f1"),  # composed same + n-tilde
        ("plain", "hello world"),
        ("empty", ""),
        ("cjk", "你好"),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "k string, t string")
    out = {r.k: r for r in df.select(
        "k", unicode_nfc_udf()(F.col("t")).alias("nfc"),
        strip_accents_udf()(F.col("t")).alias("stripped")).collect()}
    assert out["dec"].nfc == "\u00e1\u00e9"   # composed now
    assert out["dec"].stripped == "ae"
    assert out["comp"].nfc == "\u00e1\u00e9\u00f1"  # already NFC
    assert out["comp"].stripped == "aen"
    for k in ("plain", "empty", "cjk"):
        assert out[k].nfc == dict(rows)[k]
        assert out[k].stripped == dict(rows)[k]
    assert out["none"].nfc is None and out["none"].stripped is None


def _bpe_ref(word_weights: dict, n_merges: int):
    """Pure-Python canonical BPE (Sennrich et al.) with the operator's
    (count desc, l asc, r asc) tie-break — learn + apply reference."""
    vocab = {tuple(w): c for w, c in word_weights.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, c in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], counts[best]))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(syms[i] + syms[i + 1]); i += 2
                else:
                    out.append(syms[i]); i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def test_bpe_learn_matches_reference(spark):
    """r5 session 3: distributed BPE training must reproduce the
    pure-Python canonical reference exactly — merge list (order,
    pairs, weights) AND the re-tokenized corpus under bpe_apply_expr.
    Corpus includes repeat-runs ('aaaa') where leftmost
    non-overlapping semantics are the part naive folds get wrong."""
    from pyspark.sql import functions as F

    from bigdata_spark_assignment_spark.operators.textual import (
        bpe_apply_expr,
        bpe_learn_merges,
    )
    texts = ["low lower lowest", "new newer newest", "aaaa aa aaaa",
             "low low low new new wide wideست"]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    ww = {}
    for t in texts:
        for w in t.lower().split():
            ww[w] = ww.get(w, 0) + 1
    ref_merges, ref_vocab = _bpe_ref(ww, 10)

    got = [(r.l, r.r, r.pair_weight) for r in
           bpe_learn_merges(docs, "text", n_merges=10)
           .orderBy("step").collect()]
    assert got == ref_merges

    # r8 session 2: the bounded-sample driver fit must emit the SAME
    # merge list as the distributed loop (and the reference)
    got_drv = [(r.l, r.r, r.pair_weight) for r in
               bpe_learn_merges(docs, "text", n_merges=10,
                                driver_fit_max_vocab=1000)
               .orderBy("step").collect()]
    assert got_drv == ref_merges
    # a threshold below the vocab size falls through to the
    # distributed loop
    got_fall = [(r.l, r.r, r.pair_weight) for r in
                bpe_learn_merges(docs, "text", n_merges=10,
                                 driver_fit_max_vocab=2)
                .orderBy("step").collect()]
    assert got_fall == ref_merges

    applied = {tuple(r.toks): r.weight for r in
               spark.createDataFrame(list(ww.items()), ["word", "weight"])
               .select(bpe_apply_expr(
                   F.split("word", ""),
                   [(l, r) for l, r, _ in ref_merges]).alias("toks"),
                   "weight")
               .collect()}
    ref_applied = {k: v for k, v in ref_vocab.items()}
    assert applied == ref_applied


def test_bpe_driver_fit_astral_plane_parity(spark):
    """r9, resolving the r8 ADVICE caveat: the driver fit iterates
    Python code points; a UTF-16-code-unit split distributed-side would
    learn a DIFFERENT symbol inventory on astral-plane characters (the
    surrogate-half pair would out-count every real pair here). Measured
    on Spark 4.1, ``F.split(word, '')`` is surrogate-pair-aware (Java
    regex empty-pattern split yields code points), so both paths must
    produce the identical merge list on a U+1D54F corpus — and neither
    may ever emit a lone surrogate half."""
    from bigdata_spark_assignment_spark.operators.textual import (
        bpe_learn_merges,
    )
    texts = ["\U0001D54Fa \U0001D54Fa \U0001D54Fa ba ba"]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    dist = [(r.l, r.r, r.merged, r.pair_weight) for r in
            bpe_learn_merges(docs, "text", n_merges=3)
            .orderBy("step").collect()]
    drv = [(r.l, r.r, r.merged, r.pair_weight) for r in
           bpe_learn_merges(docs, "text", n_merges=3,
                            driver_fit_max_vocab=1000)
           .orderBy("step").collect()]
    assert drv == dist
    # ('𝕏','a') dominates (weight 3 vs ba's 2) — only a code-point
    # split can produce it; a code-unit split would first merge the
    # surrogate halves and change the list
    assert dist[0][:2] == ("\U0001D54F", "a")
    halves = {s for _, _, m, _ in dist for s in m
              if 0xD800 <= ord(s) <= 0xDFFF}
    assert not halves, "distributed split emitted a lone surrogate half"


def test_distribution_drift_entropy_and_kl(spark):
    """r5 session 3: (a) KL ≥ 0 with equality iff the group matches the
    corpus mixture; (b) uniform group entropy = ln(V) exactly; (c) a
    skewed source shows strictly higher KL than a mixture-matching
    one."""
    import math

    from bigdata_spark_assignment_spark.operators.textual import (
        distribution_drift,
    )
    uni = " ".join(f"w{i}" for i in range(8))       # uniform over 8
    rows = ([("a", uni)] * 4                        # matches corpus? no -
            + [("b", uni)] * 4                      # a and b identical
            + [("c", "w0 w0 w0 w0 w0 w0 w0 w1")])   # skewed
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r.source: r for r in
           distribution_drift(df, "source", "text").collect()}
    # a and b have identical distributions -> identical metrics
    assert abs(out["a"].entropy - math.log(8)) < 1e-9
    assert out["a"].kl_vs_corpus >= 0 and out["c"].kl_vs_corpus >= 0
    assert abs(out["a"].kl_vs_corpus - out["b"].kl_vs_corpus) < 1e-12
    assert out["c"].kl_vs_corpus > out["a"].kl_vs_corpus + 0.1
    assert out["c"].entropy < out["a"].entropy      # skew lowers entropy


def test_bm25_hand_computed_and_ranked(spark):
    """BM25 on a 3-doc corpus small enough to compute by hand; checks
    the Robertson idf, length normalization direction, rounded-score
    ranking, and that the query table drives a broadcast join."""
    import math

    from bigdata_spark_assignment_spark.operators.textual import bm25_topk

    rows = [
        (1, "spark spark join"),        # tf(spark)=2, dl=3
        (2, "spark filter scan scan"),  # tf(spark)=1, dl=4
        (3, "join join join"),          # no 'spark', dl=3
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(docs, [("q", ["spark"])], k=3)
    got = {r.doc_id: r for r in out.collect()}
    # doc 3 has no query term -> absent entirely
    assert set(got) == {1, 2}
    n_docs, avgdl = 3, (3 + 4 + 3) / 3
    df = 2
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))

    def score(tf, dl):
        return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)),
                     4)

    assert got[1].score == pytest.approx(score(2, 3))
    assert got[2].score == pytest.approx(score(1, 4))
    # higher tf, shorter doc -> doc 1 ranks first
    assert got[1].rnk == 1 and got[2].rnk == 2
    assert got[1].doc_len == 3 and got[1].n_matched_terms == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bm25_multi_term_and_k_cap(spark):
    from bigdata_spark_assignment_spark.operators.textual import bm25_topk

    rows = [(i, "alpha beta " + ("alpha " * (i % 3))) for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(docs, [("q1", ["alpha", "beta"]),
                           ("q2", ["gamma"])], k=4).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q["q1"]) == 4                      # k cap holds
    assert "q2" not in per_q                          # no gamma anywhere
    ranks = sorted(r.rnk for r in per_q["q1"])
    assert ranks == [1, 2, 3, 4]
    # both terms matched by every doc with i%3>0; n_matched_terms = 2
    assert all(r.n_matched_terms == 2 for r in per_q["q1"])


def test_rrf_fuse_hand_computed_and_truncation(spark):
    """r5 session 5: RRF — hand-checked fused scores, single-list
    items contribute one addend, top_k truncation, deterministic
    tie-break on id."""
    from bigdata_spark_assignment_spark.operators.relational import (
        rrf_fuse,
    )
    rows = [  # two sources for query q: lists [d1, d2] and [d2, d3]
        ("q", 1, 1), ("q", 2, 2),
        ("q", 2, 1), ("q", 3, 2),
    ]
    df = spark.createDataFrame(rows, "query_id string, doc_id long, rnk int")
    out = {r.doc_id: r for r in
           rrf_fuse(df, top_k=3).collect()}
    assert out[2].rrf_score == pytest.approx(1 / 61 + 1 / 62)
    assert out[1].rrf_score == pytest.approx(1 / 61)
    assert out[3].rrf_score == pytest.approx(1 / 62)
    assert out[2].rnk == 1 and out[2].n_sources == 2
    # d1 (1/61) beats d3 (1/62); tie impossible here, but rank order:
    assert out[1].rnk == 2 and out[3].rnk == 3

    assert len(rrf_fuse(df, top_k=1).collect()) == 1


def test_term_match_topk_integer_scores(spark):
    """Coordination ranking: matched-term tf sums, doc_id tie-break,
    and the broadcast-join plan (query table never shuffles the
    postings)."""
    from bigdata_spark_assignment_spark.operators.textual import (
        term_match_topk,
    )
    docs = spark.createDataFrame(
        [(1, "spark join join hash"), (2, "join merge"),
         (3, "nothing relevant"), (4, "hash hash hash")],
        "doc_id long, text string")
    out = term_match_topk(docs, [("q", ["join", "hash"])], k=3).collect()
    ranked = [(r.doc_id, r.match_tf, r.rnk) for r in
              sorted(out, key=lambda r: r.rnk)]
    assert ranked == [(1, 3, 1), (4, 3, 2), (2, 1, 3)]  # tie → doc_id

    plan = (term_match_topk(docs, [("q", ["join"])], k=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_bigram_doc_scores_hand_computed(spark):
    """r5 session 5: corpus bigram LM — hand-checked MLE transition
    probabilities, perplexity relation, short-doc omission, and the
    repetitive-text-scores-higher property."""
    import math

    from bigdata_spark_assignment_spark.operators.textual import (
        bigram_doc_scores,
    )
    docs = spark.createDataFrame(
        [(1, "ab ab ab ab"),        # transitions ab→ab only
         (2, "ab cd ab ef"),        # ab→cd, cd→ab, ab→ef
         (3, "xy")],                # 1 token → omitted
        "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_doc_scores(docs).collect()}
    assert 3 not in out
    # corpus bigram counts: (ab,ab)=3 (ab,cd)=1 (cd,ab)=1 (ab,ef)=1
    # prefix counts: ab=5, cd=1
    lp1 = math.log(3 / 5)                      # each of doc1's 3 bigrams
    assert out[1].bigram_logprob == pytest.approx(lp1)
    assert out[1].bigram_ppl == pytest.approx(math.exp(-lp1))
    assert out[1].n_bigrams == 3
    lp2 = (math.log(1 / 5) + math.log(1 / 1) + math.log(1 / 5)) / 3
    assert out[2].bigram_logprob == pytest.approx(lp2)
    # the repetitive doc is more predictable under the LM
    assert out[1].bigram_logprob > out[2].bigram_logprob


def test_phrase_search_hand_computed(spark):
    """r5 session 5: positional phrase search — overlapping windows
    counted, order matters, multi-word phrases, absent docs omitted,
    and the posting-join plan has no cartesian product."""
    from bigdata_spark_assignment_spark.operators.textual import (
        phrase_search,
    )
    docs = spark.createDataFrame(
        [(1, "a b a b a"),        # 'a b' twice, 'b a' twice
         (2, "b a"),              # 'b a' once, no 'a b'
         (3, "c c c"),            # neither
         (4, "x a b y a b c")],   # 'a b' twice, 'a b c' once
        "doc_id long, text string")
    q = phrase_search(docs, [("ab", ["a", "b"]),
                             ("ba", ["b", "a"]),
                             ("abc", ["a", "b", "c"])])
    got = {(r.phrase_id, r.doc_id): r.n_matches for r in q.collect()}
    assert got == {("ab", 1): 2, ("ab", 4): 2,
                   ("ba", 1): 2, ("ba", 2): 1,
                   ("abc", 4): 1}
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_retrieval_eval_hand_computed(spark):
    """r7: nDCG@2 + max-grade recall@2 vs hand math — exponential
    gains, log2 discounts, ideal tie-break, and the coalesce-to-0
    path when no max-grade candidate reaches the top-k."""
    import math

    from bigdata_spark_assignment_spark.operators.textual import (
        retrieval_eval,
    )
    cand = spark.createDataFrame(
        [("A", 1, 2), ("A", 2, 2), ("A", 3, 1), ("A", 4, 1),
         ("B", 1, 3), ("B", 2, 1)],
        ["query_id", "doc_id", "rel"])
    ranked = spark.createDataFrame(
        [("A", 3, 1, 1), ("A", 1, 2, 2),   # system: d3 then d1
         ("B", 2, 1, 1)],                  # system misses B's best
        ["query_id", "doc_id", "rnk", "n_matched_terms"])
    got = {r.query_id: r for r in
           retrieval_eval(ranked, cand, k=2).collect()}
    l3 = math.log2(3.0)
    exp_a = (1 / 1 + 3 / l3) / (3 / 1 + 3 / l3)
    exp_b = (1 / 1) / (7 / 1 + 1 / l3)
    assert abs(got["A"].ndcg - exp_a) < 1e-12
    assert abs(got["B"].ndcg - exp_b) < 1e-12
    assert got["A"].n_rel_max == 2 and got["A"].n_hit_max == 1
    assert abs(got["A"].recall_max - 0.5) < 1e-12
    assert got["B"].mx == 3 and got["B"].n_hit_max == 0
    assert got["B"].recall_max == 0.0


def test_nb_classifier_planted_separable_corpus(spark):
    """A corpus whose classes use disjoint vocabularies must classify
    perfectly; model-card counts and argmax edge cases hand-checked."""
    from bigdata_spark_assignment_spark.operators.textual import (
        nb_language_classifier,
    )

    # fold = md5('nb:'||id) % 5 — pick ids so both folds are populated
    # regardless of which ids land in fold 0; text is class-disjoint.
    rows = [(i, ("alpha beta gamma" if i % 2 == 0 else "uno dos tres"),
             ("aa" if i % 2 == 0 else "bb"))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    nb = nb_language_classifier(docs)

    pred = {r["doc_id"]: r for r in nb["pred"].collect()}
    assert pred, "test fold must be non-empty for ids 0..39"
    for r in pred.values():
        assert r["pred_lbl"] == r["true_lbl"], r

    model = nb["model"].collect()[0]
    n_test = len(pred)
    assert model["n_train_docs"] == 40 - n_test
    # vocab is the 6 distinct train tokens (both classes always have
    # >= 1 train doc: 20 docs per class, at most ~12 fall in one fold)
    assert model["v"] == 6
    # every train doc contributes exactly 3 tokens
    assert model["n_train_tokens"] == 3 * (40 - n_test)

    # top log-odds tokens per class come from the class's own vocab
    for r in nb["top"].collect():
        own = {"aa": {"alpha", "beta", "gamma"},
               "bb": {"uno", "dos", "tres"}}[r["lbl"]]
        assert r["token"] in own, r
        assert r["lo_micro"] > 0


def test_nb_classifier_oov_doc_falls_back_to_prior(spark):
    """A test-fold doc made of only out-of-vocabulary tokens carries no
    evidence: it must be predicted as the max-prior class (ties broken
    label-ascending)."""
    from bigdata_spark_assignment_spark.operators.textual import (
        nb_language_classifier,
    )

    # doc_id 1 lands in fold 0 for salt 'nb' (md5('nb:1') — asserted
    # below), its text shares no token with any training doc; class
    # 'aa' has more training docs than 'bb' => higher prior.
    rows = [(1, "zzz qqq", "bb")]
    rows += [(i, "alpha beta", "aa") for i in range(2, 20)]
    rows += [(i, "uno dos", "bb") for i in range(20, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    nb = nb_language_classifier(docs)
    pred = {r["doc_id"]: r for r in nb["pred"].collect()}
    assert 1 in pred, "doc_id 1 must hash into the test fold"
    got = pred[1]
    # all its tokens are OOV -> score = prior only; 'aa' trains on more
    # docs than 'bb' in every fold assignment of ids 2..29 (18 vs 10,
    # minus at most ~8 per class held out), so prior('aa') > prior('bb')
    assert got["pred_lbl"] == "aa"
    assert got["true_lbl"] == "bb"


def test_dsir_scores_rank_target_like_docs_higher(spark):
    """DSIR importance: docs sharing the target slice's vocabulary
    must outscore docs from a disjoint vocabulary, and the model
    table must stay within n_buckets rows."""
    from bigdata_spark_assignment_spark.operators.textual import (
        dsir_importance_scores,
    )

    rows = []
    for i in range(20):                       # target: "science" text
        rows.append((i, "atoms orbit nuclei atoms emit photons", True))
    for i in range(20, 40):                   # raw: target-like
        rows.append((i, "photons excite atoms atoms orbit nuclei", False))
    for i in range(40, 60):                   # raw: boilerplate
        rows.append((i, "click here to subscribe click here now", False))
    docs = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    scores, model = dsir_importance_scores(docs, F.col("t"),
                                           n_buckets=64)
    got = {r["doc_id"]: r["dsir_score"] for r in scores.collect()}
    assert len(got) == 60 and model.count() <= 64
    like = sum(got[i] for i in range(20, 40)) / 20
    boiler = sum(got[i] for i in range(40, 60)) / 20
    assert like > boiler + 0.5                # clear separation
    # single-token doc contributes no bigrams
    one = spark.createDataFrame([(0, "word", True), (1, "a b", False)],
                                "doc_id long, text string, t boolean")
    s1, _ = dsir_importance_scores(one, F.col("t"), n_buckets=16)
    assert [r["doc_id"] for r in s1.collect()] == [1]


def test_mmr_select_defers_redundant_candidates(spark):
    """Greedy MMR: after picking the top-relevance doc, a slightly
    less relevant but DISSIMILAR doc must beat a near-duplicate of
    the first pick; ties break toward the min doc_id."""
    from bigdata_spark_assignment_spark.operators.textual import (
        mmr_select,
    )

    cands = spark.createDataFrame(
        [("q1", 1, 10), ("q1", 2, 10), ("q1", 3, 10)],
        "query_id string, doc_id long, rel long")
    # doc 2 is a near-dup of doc 1; doc 3 is unrelated — with equal
    # relevance, the redundancy penalty alone must defer doc 2
    sims = spark.createDataFrame(
        [("q1", 1, 2, 0.95), ("q1", 1, 3, 0.0), ("q1", 2, 3, 0.0)],
        "query_id string, doc_a long, doc_b long, sim double")
    got = sorted((r["step"], r["doc_id"], r["mmr_score"])
                 for r in mmr_select(cands, sims, k=3).collect())
    assert [(s, d) for s, d, _ in got] == [(1, 1), (2, 3), (3, 2)]
    # step-1 score is pure relevance; step-3 pays the redundancy
    assert got[0][2] == 0.7 * 10
    assert abs(got[2][2] - (0.7 * 10 - 0.3 * 0.95)) < 1e-12
    # k caps at the pool size, and a tie prefers the smaller doc_id
    tie = spark.createDataFrame([("q2", 5, 7), ("q2", 4, 7)],
                                "query_id string, doc_id long, rel long")
    empty = sims.filter("query_id = 'nope'")
    out = {r["step"]: r["doc_id"]
           for r in mmr_select(tie, empty, k=5).collect()}
    assert out == {1: 4, 2: 5}
