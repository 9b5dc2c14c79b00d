"""Probabilistic record linkage (entity resolution across sources).

The Fellegi-Sunter model (JASA 1969) — the foundation of every
production linkage system (Splink, dedupe.io, census matching): for a
candidate record pair, each compared field contributes a log-likelihood
weight

    agree    →  log2(m / u)
    disagree →  log2((1 − m) / (1 − u))
    missing  →  0                     (no evidence either way)

where m = P(field agrees | pair is a true match) and u = P(field
agrees | pair is a non-match). The pair's match weight is the sum over
fields; two thresholds split pairs into match / possible (clerical
review) / non-match.

Spark-first shape: candidate generation is a BLOCKED equi-join (never
the cross product — u-probabilities make unblocked linkage pointless
anyway), field comparisons and weights are pure codegen CASE
expressions, and the output keeps only pairs at or above the review
threshold, so the emitted volume is O(true matches + review band), not
O(block²). At 100 TB: one shuffle on the block key per side (or a
broadcast when one source is dimension-sized), skewed blocks get the
standard salt/cap treatment upstream, and m/u estimation via EM runs
on a SAMPLE of block pairs offline — here they are caller-supplied
constants, which also keeps the whole operator SQL-mirrorable
(the q33 oracle re-derives every weight end-to-end).

No counterpart in the reference repo (its single pipeline never links
two sources); public-knowledge basis: Fellegi & Sunter 1969,
Herzog/Scheuren/Winkler "Data Quality and Record Linkage Techniques".
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldComparison:
    """One compared field: ``agree`` is a boolean Column over the
    join of ``a.alias("l")`` and ``b.alias("r")`` (reference columns
    as ``F.col("l.name")`` / ``F.col("r.name")``); ``m``/``u`` are the
    Fellegi-Sunter conditional agreement probabilities."""

    name: str
    agree: Column
    m: float
    u: float

    @property
    def w_agree(self) -> float:
        return math.log2(self.m / self.u)

    @property
    def w_disagree(self) -> float:
        return math.log2((1.0 - self.m) / (1.0 - self.u))


def fs_link(a: DataFrame, b: DataFrame,
            id_col_a: str, id_col_b: str,
            block_keys: list[tuple[str, str]],
            fields: list[FieldComparison],
            match_threshold: float,
            review_threshold: float) -> DataFrame:
    """Blocked Fellegi-Sunter linkage of sources ``a`` and ``b``.

    Returns (id_a, id_b, <name>_agree per field, weight, decision)
    for every block-candidate pair with weight ≥ ``review_threshold``;
    decision is 'match' (≥ ``match_threshold``) or 'possible'.

    Field agreement is three-valued: True → w_agree, False →
    w_disagree, NULL (either side missing) → 0 — missing data is no
    evidence, the standard FS convention. Weights are Python-float
    literals summed in field order, so an oracle embedding the same
    repr() literals reproduces the doubles bit-exactly.
    """
    l, r = a.alias("l"), b.alias("r")
    cond = None
    for ka, kb in block_keys:
        eq = F.col(f"l.{ka}") == F.col(f"r.{kb}")
        cond = eq if cond is None else (cond & eq)
    j = l.join(r, cond, "inner")

    weight = F.lit(0.0)
    flags = []
    for fc in fields:
        contrib = (F.when(fc.agree.isNull(), F.lit(0.0))
                   .when(fc.agree, F.lit(fc.w_agree))
                   .otherwise(F.lit(fc.w_disagree)))
        weight = weight + contrib
        flags.append(fc.agree.alias(f"{fc.name}_agree"))

    out = j.select(
        F.col(f"l.{id_col_a}").alias("id_a"),
        F.col(f"r.{id_col_b}").alias("id_b"),
        *flags,
        weight.alias("weight"))
    decision = F.when(F.col("weight") >= F.lit(match_threshold),
                      F.lit("match")).otherwise(F.lit("possible"))
    return (out.filter(F.col("weight") >= F.lit(review_threshold))
            .withColumn("decision", decision))
