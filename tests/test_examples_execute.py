"""EXECUTE every transform op's registered example config.

tests/test_metadata.py checks examples against the declared param
metadata (names, types, allowed values) but never runs them — which
let several ops ship examples their own code crashed on (simhash
bits=64, text.extract's array fields, time.resample's aggs shape,
topk's 'score desc', drift.psi's default range...). This suite runs
each example against a kitchen-sink DataFrame carrying every column
the examples reference; a new op's example is executed by default —
opting out requires an entry in EXCLUDE with a reason.
"""

from __future__ import annotations

import datetime as dt

import pytest

from conveyor_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import run_op

# ops whose example cannot run in this harness — reason required
EXCLUDE = {
    "decrypt.apply": "needs ciphertext produced by a matching key",
    "stage.pipeline": "example references a pipeline file on disk",
}

# ops whose example needs STREAMING inputs — built by the
# streaming_sink fixture; the example still executes end-to-end
STREAMING = {
    "stream.count_window", "stream.dedup", "stream.funnel",
    "stream.join", "stream.session_window",
}

# config overrides where the example's value is a placeholder
# (env-var keys / real endpoints), keyed by op name
OVERRIDES = {
    "encrypt.apply": {"key": "0123456789abcdef0123456789abcdef"},
    # the kitchen sink has no (src, dst) pair; reuse two id columns
    "graph.pagerank": {"src_column": "user_id", "dst_column": "customer_id",
                       "iterations": 2},
    # the documented injection hook replaces the real endpoint
    "http.fetch": {"_fetcher": lambda u, m, h, b, t: '{"ok": true}'},
}

# ops whose example needs a specific input SHAPE (pair lists, SCD2
# history, column-collision-free frames); fn(df) -> [inputs]
INPUT_BUILDERS = {
    # a pairs frame: (id_a, id_b) edges
    "dedup.components": lambda df: [
        df.selectExpr("id AS id_a", "id + 1 AS id_b")
    ],
    "dedup.resolve": lambda df: [
        df.selectExpr("id AS id_a", "id + 1 AS id_b")
    ],
    # the example's two weights need two (schema-identical) sources
    "sample.mixture": lambda df: [df, df],
    # second input is a dedup.substring span table
    "text.cut_spans": lambda df: [
        df,
        df.sparkSession.createDataFrame(
            [(1, 2, 0, 0, 3)],
            "id_a LONG, id_b LONG, start_a INT, start_b INT, length INT"),
    ],
    # second input must be a bpe_train merge table
    "text.bpe_encode": lambda df: [
        df,
        df.sparkSession.createDataFrame(
            [(0, "t", "h"), (1, "th", "e")],
            "rank INT, left STRING, right STRING"),
    ],
    # second input is the offline-trained (term, weight) table
    "classify.linear": lambda df: [
        df,
        df.sparkSession.createDataFrame(
            [("quick", 1.0), ("lazy", -1.0)], "term STRING, weight DOUBLE"),
    ],
    # second input is the (term, class, weight) table
    "classify.multiclass": lambda df: [
        df,
        df.sparkSession.createDataFrame(
            [("quick", "a", 1.0), ("lazy", "b", 1.0)],
            "term STRING, class STRING, weight DOUBLE"),
    ],
    # second input is the query set
    "rank.bm25": lambda df: [
        df,
        df.sparkSession.createDataFrame(
            [(1, "quick fox"), (2, "lazy dog")],
            "query_id INT, query STRING"),
    ],
    # corpus + query vectors (same schema works)
    "knn.pq": lambda df: [df, df],
    # vectors + a centroid table (dim 64 matches the kitchen sink's
    # embedding column)
    "embedding.assign_cells": lambda df: [
        df,
        df.sparkSession.createDataFrame(
            [(c, [0.3 * c] * 64) for c in range(2)],
            "cluster INT, centroid ARRAY<DOUBLE>"),
    ],
    # stamped corpus + queries + centroids + codebooks (dim 8, m=2)
    "knn.ivfpq": lambda df: [
        df.sparkSession.createDataFrame(
            [(i, [0.1 * i + 0.01 * d for d in range(8)], i % 2,
              [i % 2, (i + 1) % 2]) for i in range(6)],
            "vec_id LONG, embedding ARRAY<DOUBLE>, ivf_cell INT, "
            "pq_code ARRAY<INT>"),
        df.sparkSession.createDataFrame(
            [(0, [0.05 * d for d in range(8)])],
            "vec_id LONG, embedding ARRAY<DOUBLE>"),
        df.sparkSession.createDataFrame(
            [(c, [0.2 * c] * 8) for c in range(2)],
            "cluster INT, centroid ARRAY<DOUBLE>"),
        df.sparkSession.createDataFrame(
            [(s, j, [0.1 * (s + j)] * 4) for s in range(2)
             for j in range(2)],
            "subspace INT, code INT, centroid ARRAY<DOUBLE>"),
    ],
    # two text corpora (same schema works)
    "stats.jensen_shannon": lambda df: [df, df],
    # two ranked lists
    "rank.rrf": lambda df: [
        df.selectExpr("doc_id", "id AS rank"),
        df.selectExpr("doc_id", "9 - id AS rank"),
    ],
    # source + target corpora (same schema works)
    "mine.bitext": lambda df: [df, df],
    # second input is an embedding.pq codebooks table (dim 64 = 2x32)
    "embedding.pq_encode": lambda df: [
        df,
        df.sparkSession.createDataFrame(
            [(s, 0, [0.1 * s] * 32) for s in range(2)],
            "subspace INT, code INT, centroid ARRAY<DOUBLE>"),
    ],
    # flatten=True collides with the kitchen sink's own 'id' column —
    # that refusal is correct behavior; parse into a clean frame
    "json.parse": lambda df: [df.select("payload")],
    # scd2 history: value columns + the bookkeeping triple
    "scd2.apply": lambda df: [
        df.select("customer_id", "amount", "updated_at").selectExpr(
            "*",
            "updated_at AS valid_from",
            "CAST(NULL AS TIMESTAMP) AS valid_to",
            "true AS is_current",
        ),
        df.select("customer_id", "amount", "updated_at"),
    ],
}


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def kitchen_sink(spark):
    rows = []
    for i in range(1, 9):
        rows.append(
            {
                "id": i,
                "doc_id": i,
                "x": i,
                "user_id": i,
                "customer_id": i % 3,
                "sensor_id": i % 2,
                "event_id": i,
                "_id": f"{i:024x}",
                "name": f"acme corp {i}",
                "text": f"the quick brown fox {i} jumps over the lazy dog",
                "log": f"status={400 + i} path=/p/{i}",
                "html": f"<p>hello <b>{i}</b></p>",
                "props": f'{{"user": {{"id": {i}}}}}',
                "payload": f'{{"id": {i}, "tags": ["a"]}}',
                "ssn": f"123-45-678{i}",
                "content": f"BYTES{i}".encode(),
                "path": f"/data/file{i}.bin",
                "url": f"HTTP://Site{i}.COM:80/p/{i}?utm_source=x&a={i}#f",
                "source": f"src{i % 2}",
                "language": "en" if i % 2 else "fr",
                "region": "east" if i % 2 else "west",
                "status": "active" if i % 2 else "closed",
                "event_type": ["view", "click", "purchase"][i % 3],
                "category": f"cat{i % 2}",
                "amount": 100.0 + i,
                "price": 10.0 * i,
                "discount": 0.1,
                "value": float(i),
                "score": i / 10.0,
                "quality": i / 10.0,
                "latency_ms": 10.0 * i,
                "n_tokens": 100 * i,
                "lat": 10.0 + i,
                "lon": 20.0 + i,
                "q1": float(i),
                "q2": float(i * 2),
                "q3": float(i * 3),
                "lsh_sig": i % 2,
                "ivf_cell": i % 2,
                "embedding": [float((i * 7 + j) % 13) / 13 for j in range(64)],
                "ts": _ts(i * 400.0),
                "updated_at": _ts(i * 400.0),
                "start_ts": _ts(0.0),
                "end_ts": _ts(7200.0),
            }
        )
    return spark.createDataFrame(rows)


def _transform_ops():
    _ensure_loaded()
    return sorted(
        name for name, op in REGISTRY.items()
        if op.kind == "transform" and op.example
        and op.fn.__module__.startswith("conveyor_spark")
    )


# file-format sources/sinks: execute their examples too, with paths
# rewritten into tmp. External-service ops (http/mongodb/kafka/
# stdin/table/file.watch) have dedicated injection-based tests.
_FILE_SINKS = {"csv.write", "json.write", "parquet.write", "orc.write",
               "xml.write", "avro.write"}
_FILE_SOURCES = {"csv.read", "json.read", "parquet.read", "orc.read",
                 "text.read", "binary.read", "xml.read", "avro.read"}


def _io_ops():
    _ensure_loaded()
    return sorted(_FILE_SINKS | _FILE_SOURCES)


@pytest.mark.parametrize("name", _io_ops())
def test_file_io_example_executes(ctx, kitchen_sink, name, tmp_path):
    op = REGISTRY[name]
    cfg = dict(op.example)
    small = kitchen_sink.select("id", "name", "score")
    if name in _FILE_SINKS:
        cfg["path"] = str(tmp_path / cfg["path"])
        run_op(ctx, name, [small], **cfg)
        import os

        assert os.path.exists(cfg["path"])
        return
    # sources: materialize a file of the example's format first
    src = tmp_path / "src"
    fmt = name.split(".")[0]
    if fmt == "csv":
        small.coalesce(1).write.option("header", True).csv(str(src))
    elif fmt == "json":
        # the example reads format=records (a JSON array)
        import json as _j

        src.mkdir()
        rows = [r.asDict() for r in small.collect()]
        (src / "input.json").write_text(_j.dumps(rows))
    elif fmt in ("parquet", "orc"):
        small.coalesce(1).write.format(fmt).save(str(src))
    elif fmt == "avro":
        from conveyor_spark.sources.avro import _avro_format

        small.coalesce(1).write.format(_avro_format(ctx.spark)).save(str(src))
    elif fmt == "xml":
        small.coalesce(1).write.format("xml") \
            .option("rowTag", cfg.get("row_tag", "row")).save(str(src))
    elif fmt == "text":
        src.mkdir()
        (src / "a.txt").write_text("hello corpus\n")
    elif fmt == "binary":
        src.mkdir()
        (src / "img.png").write_bytes(b"\x89PNG fake")
    cfg["path"] = str(src) if fmt != "json" else str(src / "input.json")
    out = run_op(ctx, name, [], **cfg)
    assert out.count() >= 1


@pytest.mark.parametrize("name", _transform_ops())
def test_registered_example_executes(ctx, kitchen_sink, name, tmp_path):
    op = REGISTRY[name]
    if name in EXCLUDE:
        pytest.skip(EXCLUDE[name])
    cfg = dict(op.example)
    cfg.update(OVERRIDES.get(name, {}))
    if name in STREAMING:
        # drain the example end-to-end over a file stream of the same
        # kitchen-sink rows
        from conveyor_spark.streaming.ops import run_available_now

        path = str(tmp_path / "stream_src")
        kitchen_sink.write.mode("overwrite").parquet(path)
        sdf = ctx.spark.readStream.schema(kitchen_sink.schema).parquet(path)
        out = run_op(ctx, name, [sdf] * max(op.min_inputs, 1), **cfg)
        mode = "append" if name in ("stream.dedup", "stream.join") else "update"
        got = run_available_now(
            out, f"t_ex_{name.replace('.', '_')}", output_mode=mode
        )
        got.collect()
        return
    if name in INPUT_BUILDERS:
        inputs = INPUT_BUILDERS[name](kitchen_sink)
    else:
        inputs = [kitchen_sink] * max(op.min_inputs, 1)
    out = run_op(ctx, name, inputs, **cfg)
    # the example must produce a materializable DataFrame
    assert out is not None
    out.limit(5).collect()
