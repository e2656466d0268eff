"""Empty-input robustness: every core op must handle 0 rows."""

from __future__ import annotations

import pytest

from tests.conftest import run_op


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], "id BIGINT, name STRING, v DOUBLE")


def test_relational_ops_on_empty(ctx, spark, empty):
    assert run_op(ctx, "filter.apply", [empty], column="v", operator=">", value=1).count() == 0
    assert run_op(ctx, "select.apply", [empty], columns=["id"]).count() == 0
    assert run_op(ctx, "map.apply", [empty], expression="v * 2", output_column="w").count() == 0
    assert run_op(ctx, "distinct.apply", [empty], columns=["id"], keep="first", order_by="v").count() == 0
    assert run_op(ctx, "sort.apply", [empty], columns="v", limit=5).count() == 0
    g = run_op(ctx, "groupby.apply", [empty], by="name",
               aggregations=[{"column": "v", "operation": "sum", "output_column": "s"}])
    assert g.count() == 0
    r = run_op(ctx, "reduce.apply", [empty], column="v", operation="sum")
    assert r.count() == 1 and r.first()["v"] is None  # SQL SUM of empty = NULL
    assert run_op(ctx, "chunk.apply", [empty], batch_size=10, order_by="id").count() == 0
    other = spark.createDataFrame([(1, "x")], "id BIGINT, r STRING")
    assert run_op(ctx, "join.apply", [empty, other], on="id").count() == 0
    assert run_op(ctx, "join.apply", [empty, other], on="id", salt=4).count() == 0
    assert run_op(ctx, "window.function", [empty], function="row_number",
                  output_column="rn", partition_by="name", order_by="v").count() == 0


def test_datapipe_ops_on_empty(ctx, spark):
    docs = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    assert run_op(ctx, "dedup.exact", [docs], columns="text", id_column="doc_id").count() == 0
    assert run_op(ctx, "dedup.minhash", [docs], column="text", id_column="doc_id").count() == 0
    assert run_op(ctx, "dedup.simhash", [docs], column="text").count() == 0
    assert run_op(ctx, "dedup.ngram_jaccard", [docs], column="text", id_column="doc_id").count() == 0
    assert run_op(ctx, "text.quality", [docs], column="text").count() == 0
    assert run_op(ctx, "text.language_id", [docs], column="text").count() == 0
    vecs = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    assert run_op(ctx, "knn.brute", [vecs], id_column="vec_id", query_ids=[1]).count() == 0
    assert run_op(ctx, "embedding.lsh", [vecs], dim=4).count() == 0
    assert run_op(ctx, "dedup.embedding", [vecs], id_column="vec_id",
                  bucket_column="label").count() == 0


def test_null_text_rows(ctx, spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id BIGINT, text STRING"
    )
    fp = run_op(ctx, "text.fingerprint", [docs], column="text")
    vals = {r["doc_id"]: r["fingerprint"] for r in fp.collect()}
    assert vals[1] is not None and vals[2] is None
    q = run_op(ctx, "text.quality", [docs], column="text")
    assert q.count() == 2  # null text must not crash the featurizer
    sh = run_op(ctx, "dedup.simhash", [docs], column="text")
    assert sh.count() == 2


@pytest.fixture(scope="module")
def empty_text(spark):
    return spark.createDataFrame([], "doc_id BIGINT, text STRING, src STRING")


def test_curation_ops_on_empty(ctx, empty_text):
    assert run_op(ctx, "text.normalize", [empty_text], column="text").count() == 0
    assert run_op(ctx, "pii.redact", [empty_text], column="text",
                  with_counts=True).count() == 0
    assert run_op(ctx, "text.repetition", [empty_text], column="text").count() == 0
    assert run_op(ctx, "text.boilerplate", [empty_text], column="text",
                  id_column="doc_id", group_by="src").count() == 0
    assert run_op(ctx, "decontam.ngram", [empty_text, empty_text], column="text",
                  id_column="doc_id").count() == 0
    fz = run_op(ctx, "join.fuzzy", [empty_text, empty_text], on="text",
                id_column="doc_id")
    assert fz.count() == 0


def test_temporal_ops_on_empty(ctx, spark, empty):
    other = spark.createDataFrame([(1, 5, "x")], "id BIGINT, t BIGINT, tag STRING")
    asof = run_op(ctx, "join.asof", [empty.selectExpr("id", "v AS t"), other],
                  on="t", by="id")
    assert asof.count() == 0
    # empty BUILD side: every probe row survives with null payload
    asof2 = run_op(ctx, "join.asof",
                   [other, empty.selectExpr("id", "v AS t", "name")], on="t", by="id")
    assert asof2.count() == 1 and asof2.first()["r_name"] is None
    iv = spark.createDataFrame([], "id BIGINT, lo BIGINT, hi BIGINT")
    rng = run_op(ctx, "join.range", [other.selectExpr("id", "t AS v"), iv],
                 on="v", lower="lo", upper="hi", by="id", bucket=10)
    assert rng.count() == 0


def test_profile_on_empty(ctx, empty):
    out = {r["column"]: r for r in run_op(ctx, "profile.apply", [empty]).collect()}
    assert out["id"]["n_rows"] == 0 and out["id"]["n_nulls"] == 0
    assert out["id"]["n_distinct"] == 0 and out["id"]["min_value"] is None


def test_components_on_empty_pairs(ctx, spark):
    pairs = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    assert run_op(ctx, "dedup.components", [pairs]).count() == 0
