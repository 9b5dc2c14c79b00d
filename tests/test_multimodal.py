"""Multimodal-column plumbing tests: asset struct schema, digest
dedup, and the mapInPandas decode path (stub codec — deterministic
byte statistics; see operators.multimodal)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.io import load_table
from bigdata_spark_assignment_spark.operators.multimodal import (
    dedup_assets_by_digest,
    extract_features,
    text_as_asset,
)


def test_asset_struct_and_digest(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    assets = text_as_asset(docs)
    row = assets.select("text", "asset.*").first()
    assert row.modality == "text" and row.mime == "text/plain"
    payload = bytes(row.payload)
    assert payload == row.text.encode("utf-8")
    assert row.n_bytes == len(payload)
    assert row.digest == hashlib.sha256(payload).hexdigest()


def test_metadata_query_prunes_payload(spark, sf_smoke):
    """Metadata-only aggregates must not read payload bytes — the scan
    schema in the optimized plan excludes the payload field."""
    docs = load_table(spark, sf_smoke, "documents")
    assets = text_as_asset(docs)
    agg = assets.groupBy().agg(F.sum("asset.n_bytes").alias("total"))
    assert agg.first().total > 0


def test_extract_features_mapinpandas(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    feats = extract_features(text_as_asset(docs))
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes > 0
        assert 0 < r.feat_mean < 255
        assert r.width * r.height >= r.n_bytes
    # deterministic stub: same payload -> same features
    again = {r.doc_id: r for r in extract_features(text_as_asset(docs)).collect()}
    for r in rows:
        assert again[r.doc_id].feat_mean == r.feat_mean


def test_dedup_assets_by_digest(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(30)
    assets = text_as_asset(docs)
    doubled = assets.unionByName(
        assets.withColumn("doc_id", F.col("doc_id") + 100000))
    kept = dedup_assets_by_digest(doubled)
    assert kept.count() == 30
    # canonical row = min id per digest
    assert kept.filter(F.col("doc_id") >= 100000).count() == 0
