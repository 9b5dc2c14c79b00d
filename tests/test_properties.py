"""Property-based tests (hypothesis) for the scalar cleaning/text ops:
each Spark expression is checked against a straight-line Python
reference on randomized inputs — the survey-§5 rigor the reference
repo never had.

Examples are batched into one DataFrame per hypothesis case to keep
Spark round-trips bounded; deadlines are disabled (JVM warm-up noise).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.cleaning import (
    DAY_PART_EDGES,
    DAY_PART_LABELS,
    bucketize_expr,
    na_to_null_expr,
    null_to_unknown_expr,
)
from bigdata_spark_assignment_spark.operators.textual import (
    fingerprint_expr,
    token_count_expr,
)

SETTINGS = settings(max_examples=12, deadline=None)


def _day_part_ref(v: int | None) -> str | None:
    if v is None:
        return ""  # NULL fails every WHEN → default, same as SQL CASE
    for i, label in enumerate(DAY_PART_LABELS):
        lo, hi = DAY_PART_EDGES[i], DAY_PART_EDGES[i + 1]
        if (lo <= v < hi) or (i == len(DAY_PART_LABELS) - 1 and lo <= v <= hi):
            return label
    return ""


@SETTINGS
@given(st.lists(st.one_of(st.none(),
                          st.integers(min_value=-100, max_value=2600)),
                min_size=1, max_size=40))
def test_day_part_matches_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v int")
    out = [r.b for r in df.select(
        bucketize_expr(F.col("v"), DAY_PART_EDGES, DAY_PART_LABELS,
                       default="").alias("b")).collect()]
    assert out == [_day_part_ref(v) for v in values]


@SETTINGS
@given(st.lists(st.one_of(st.none(), st.text(max_size=8),
                          st.just("NA"), st.just("Unknow"),
                          st.just(""), st.just(" ")),
                min_size=1, max_size=40))
def test_na_and_unknown_normalization(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(
        na_to_null_expr(F.col("v")).alias("na"),
        null_to_unknown_expr(F.col("v")).alias("unk")).collect()
    for v, r in zip(values, out):
        assert r.na == (None if v == "NA" else v)
        expected_unk = ("unknown"
                        if v is None or v in ("Unknow", "None", "", " ")
                        else v)
        assert r.unk == expected_unk


@SETTINGS
@given(st.lists(st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ",
    min_size=1, max_size=60), min_size=1, max_size=20))
def test_fingerprint_invariance(spark, texts):
    """fingerprint(text) == fingerprint(mangled text) for case and
    whitespace-run mangling, and equals the Python md5 reference.
    ASCII alphabet: non-ASCII case mapping isn't round-trippable
    ('ß'.upper() == 'SS') and Java/Python lowercasing differ on exotic
    code points — the operator's contract is byte-stable normalization,
    not Unicode case folding."""
    rows = [(t, "  " + t.upper().replace(" ", "   ") + " ") for t in texts]
    df = spark.createDataFrame(rows, "a string, b string")
    out = df.select(fingerprint_expr(F.col("a")).alias("fa"),
                    fingerprint_expr(F.col("b")).alias("fb")).collect()
    for (a, _), r in zip(rows, out):
        ref = hashlib.md5(
            re.sub(r"\s+", " ", a.lower()).strip().encode()).hexdigest()
        assert r.fa == ref
        assert r.fb == ref


@SETTINGS
@given(st.lists(st.text(alphabet="ab c\t", min_size=1, max_size=30),
                min_size=1, max_size=20))
def test_token_count_matches_split(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = [r.n for r in df.select(
        token_count_expr(F.col("t")).alias("n")).collect()]
    for t, n in zip(texts, out):
        assert n == len(re.split(r"\s+", t.lower()))


@SETTINGS
@given(st.integers(min_value=1, max_value=300),
       st.integers(min_value=2, max_value=64),
       st.integers(min_value=0, max_value=32))
def test_chunking_reconstruction_invariant(spark, n_tokens, max_tokens,
                                           overlap):
    """For ANY (doc length, window, overlap<window): chunk 0 + each
    later chunk minus its overlap prefix re-joins to the original
    token stream; every chunk except the last has exactly max_tokens
    tokens; chunk count matches the closed form."""
    from bigdata_spark_assignment_spark.operators.textual import (
        chunk_documents,
    )
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    words = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    rows = sorted(chunk_documents(df, max_tokens=max_tokens,
                                  overlap=overlap).collect(),
                  key=lambda r: r.chunk_id)
    stride = max_tokens - overlap
    import math
    expect_chunks = max(1, math.ceil((n_tokens - overlap) / stride))
    assert len(rows) == expect_chunks
    rebuilt = rows[0].chunk_text.split(" ")
    for r in rows[1:]:
        toks = r.chunk_text.split(" ")
        assert toks[:overlap] == rebuilt[-overlap:] if overlap else True
        rebuilt += toks[overlap:]
    assert rebuilt == words
    for r in rows[:-1]:
        assert r.n_tokens == max_tokens


@settings(max_examples=6, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from([f"w{i}" for i in range(12)]),
             min_size=0, max_size=25).map(" ".join),
    min_size=1, max_size=25),
    st.sampled_from([2, 3, 5]))
def test_window_hash_path_matches_text_path(spark, texts, n):
    """For ANY corpus (tiny vocab → dense repeats and cross-doc
    collisions) and window size: the Arrow window-HASH shared-window
    stats equal the window-TEXT re-derivation via positional_ngrams —
    the hash path's correctness contract (dedup.shared_window_stats)."""
    from bigdata_spark_assignment_spark.operators.dedup import (
        shared_window_stats,
    )
    from bigdata_spark_assignment_spark.operators.textual import (
        positional_ngrams,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = shared_window_stats(docs, window_tokens=n).first()

    wins = positional_ngrams(docs, n)
    gs = (wins.groupBy("gram")
          .agg(F.countDistinct("doc_id").alias("nd"),
               F.count(F.lit(1)).alias("no"))
          .filter(F.col("nd") >= 2))
    want_w, want_o = gs.agg(
        F.count(F.lit(1)), F.coalesce(F.sum("no"), F.lit(0))).first()
    want_d = (wins.join(gs.select("gram"), "gram", "leftsemi")
              .agg(F.countDistinct("doc_id")).first()[0])
    assert (got.n_shared_windows, got.n_shared_occurrences,
            got.n_docs_with_shared) == (want_w, want_o, want_d)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=40),
                min_size=1, max_size=40),
       st.sampled_from([4, 16, 64]))
def test_packing_invariants(spark, doc_lens, seq_tokens):
    """For ANY doc-length profile and sequence size: seq ids are
    non-decreasing in stream order, every doc spans exactly the
    sequences its cumulative offsets dictate, straddle ⟺ first<last,
    and total sequences == ceil(total_tokens / seq_tokens)."""
    import math

    from bigdata_spark_assignment_spark.operators.textual import (
        packing_accounting,
    )

    rows = [(i, " ".join(f"t{j}" for j in range(n)), "en")
            for i, n in enumerate(doc_lens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = sorted(packing_accounting(docs, seq_tokens=seq_tokens).collect(),
                 key=lambda r: r.doc_id)
    cum = 0
    for r, n in zip(out, doc_lens):
        assert r.n_toks == n
        assert r.seq_first == cum // seq_tokens
        assert r.seq_last == (cum + n - 1) // seq_tokens
        assert r.straddles == (r.seq_last > r.seq_first)
        cum += n
    assert out[-1].seq_last + 1 == math.ceil(cum / seq_tokens)


# ---------------------------------------------------------------------------
# r5: JPEG codec + Morton key properties (pure Python/numpy — no Spark
# round-trip needed; the Spark seams are covered in test_multimodal /
# test_layout)
# ---------------------------------------------------------------------------


@given(st.integers(1, 33), st.integers(1, 33), st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=None)
def test_jpeg_roundtrip_any_geometry_bounded_error(h, w, seed):
    """Property: for ANY geometry (including non-8-multiples) and any
    pixel content, encode→decode preserves geometry exactly and the
    image mean within the Annex-K quantization error budget."""
    import numpy as np

    from bigdata_spark_assignment_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px))
    assert (out["width"], out["height"]) == (w, h)
    # worst case is white noise; DC-exactness keeps the mean tight even
    # when AC structure is mangled (small images give noisier means).
    # DC-exactness only protects the mean of FULL 8x8 blocks: an image
    # smaller than one block is edge-padded to 8x8 and cropped after
    # decode, so its mean rides the coarsely-quantized AC coefficients
    # instead (a 2x2 255/0 checkerboard measures mean error 16.0, std
    # error 36.6 under adversarial search; full-block geometry stays
    # <= 2.3 / 6.6) — the same behavior as any pad-and-crop JPEG codec.
    if min(h, w) >= 8:
        mean_tol, std_tol = 6.0, 16.0
    else:
        mean_tol, std_tol = 24.0, 48.0
    assert abs(out["feat_mean"] - px.mean()) < mean_tol
    assert abs(out["feat_std"] - px.astype(float).std()) < std_tol


@given(st.lists(st.integers(0, 10**6), min_size=2, max_size=3),
       st.integers(2, 16))
@settings(max_examples=40, deadline=None)
def test_morton_key_is_bijective_on_ranks(vals, bits):
    """Property: the Morton spread is a bijection — de-interleaving the
    z-value recovers each column's quantized rank exactly, for any
    dimension count and bit width. (Parity with the Spark expression is
    pinned separately in test_layout.py.)"""
    from bigdata_spark_assignment_spark.operators.layout import (
        zorder_key_py,
    )
    d = len(vals)
    if d * bits > 63:
        return
    bounds = [(0, 10**6)] * d
    z = zorder_key_py(vals, bounds, bits=bits)
    top = (1 << bits) - 1
    for j, v in enumerate(vals):
        expected_rank = min(top, int(v / 10**6 * (top + 1)))
        got_rank = 0
        for i in range(bits):
            got_rank |= ((z >> (i * d + j)) & 1) << i
        assert got_rank == expected_rank


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SETTINGS
@given(st.lists(st.text(alphabet="abcXYZ01", min_size=0, max_size=9),
                min_size=2, max_size=14),
       st.integers(min_value=1, max_value=2))
def test_fuzzy_join_complete_on_random_strings(spark, strings, d):
    """r5 session 3 (SymSpell lemma, adversarial alphabet): on random
    short strings — including empties, repeats, and duplicates — the
    deletion-neighborhood join must return EXACTLY the reference-DP
    Levenshtein pair set at distance ≤ d."""
    from bigdata_spark_assignment_spark.operators.dedup import (
        fuzzy_join_edit_distance,
    )
    rows = list(enumerate(strings))
    want = {(i, j, _lev_ref(a, b))
            for i, a in rows for j, b in rows
            if i < j and _lev_ref(a, b) <= d}
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {(r.id_a, r.id_b, r.dist)
           for r in fuzzy_join_edit_distance(df, "id", "s",
                                             max_dist=d).collect()}
    assert got == want
