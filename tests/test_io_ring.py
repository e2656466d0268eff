"""I/O ring: excel/mongodb/kafka gating, stream sources, stdout_stream,
stdin.read, http.get."""

from __future__ import annotations

import io
import json

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def test_excel_requires_engine(ctx, spark):
    # openpyxl is absent in this container — ops must fail clearly
    pytest.importorskip("openpyxl", reason="engine present; gating test n/a") if False else None
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl installed; gating path not reachable")
    except ImportError:
        pass
    with pytest.raises(ConfigError, match="openpyxl"):
        run_op(ctx, "excel.read", [], path="/tmp/x.xlsx")
    df = spark.createDataFrame([(1,)], "id INT")
    with pytest.raises(ConfigError, match="openpyxl"):
        run_op(ctx, "excel.write", [df], path="/tmp/x.xlsx")


def test_kafka_requires_classpath(ctx, spark):
    from conveyor_spark.sources.kafka import _has_kafka

    if _has_kafka(spark):
        pytest.skip("kafka package present; gating path not reachable")
    with pytest.raises(ConfigError, match="spark-sql-kafka"):
        run_op(ctx, "kafka.read", [], brokers="b:9092", topic="t")
    df = spark.createDataFrame([(1,)], "id INT")
    with pytest.raises(ConfigError, match="spark-sql-kafka"):
        run_op(ctx, "kafka.write", [df], brokers="b:9092", topic="t")
    with pytest.raises(ConfigError, match="brokers"):
        run_op(ctx, "kafka.read", [], topic="t")


class _FakeCursor:
    def __init__(self, docs):
        self.docs = docs

    def limit(self, n):
        return _FakeCursor(self.docs[:n])

    def __iter__(self):
        return iter(self.docs)


class _FakeCollection:
    def __init__(self, store):
        self.store = store

    def find(self, query=None):
        q = query or {}
        return _FakeCursor([d for d in self.store if all(d.get(k) == v for k, v in q.items())])

    def aggregate(self, pipeline):
        return list(self.store)

    def insert_many(self, docs):
        self.store.extend(docs)


class _FakeClient:
    registry: dict[str, list] = {}

    def __init__(self, key):
        self.key = key

    def __getitem__(self, db):
        return {"c": _FakeCollection(self.registry.setdefault(self.key, []))}  # one collection


def test_mongodb_find_fallback(ctx):
    _FakeClient.registry["t1"] = [
        {"_id": "a1", "name": "Alice", "status": "active"},
        {"_id": "b2", "name": "Bob", "status": "inactive"},
    ]

    def factory():
        return _FakeClient("t1")

    out = run_op(ctx, "mongodb.find", [], uri="mongodb://x", database="d", collection="c",
                 query={"status": "active"}, _client_factory=factory)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["name"] == "Alice"


def test_mongodb_insert_foreach_partition(ctx, spark, tmp_path):
    # the factory ships to executors — define everything in-closure so
    # cloudpickle serializes by value; record writes via filesystem
    sink_dir = str(tmp_path)

    def factory():
        import json as _j
        import os
        import uuid

        class Coll:
            def insert_many(self, docs):
                p = os.path.join(sink_dir, f"{uuid.uuid4().hex}.json")
                with open(p, "w") as f:
                    _j.dump(docs, f)

        class Client:
            def __getitem__(self, db):
                return {"c": Coll()}

        return Client()

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id INT, v STRING").coalesce(1)
    run_op(ctx, "mongodb.insertMany", [df], uri="mongodb://x", database="d",
           collection="c", _client_factory=factory)
    import glob as _glob

    written = []
    for p in _glob.glob(f"{sink_dir}/*.json"):
        written.extend(json.load(open(p)))
    assert sorted(d["id"] for d in written) == [1, 2]
    # NB: foreachPartition runs in executor processes; with local mode
    # + fakes the registry mutation happens in the worker, so we only
    # assert the call path raised nothing. Connection-required paths
    # are gated:
    with pytest.raises(ConfigError, match="pymongo"):
        run_op(ctx, "mongodb.insertMany", [df], uri="mongodb://x", database="d", collection="c")


def test_mongodb_to_object_id(ctx, spark):
    df = spark.createDataFrame(
        [("507F1F77BCF86CD799439011",), ("not-an-oid",), (None,)], "oid STRING"
    )
    out = run_op(ctx, "mongodb.toObjectId", [df], column="oid")
    vals = [r["oid"] for r in out.collect()]
    assert vals[0] == "507f1f77bcf86cd799439011"
    assert vals[1] is not None and len(vals[1]) == 24 and vals[1] != "not-an-oid"
    assert vals[2] is None


def test_stdin_read_formats(ctx):
    out = run_op(ctx, "stdin.read", [], format="jsonl",
                 _text='{"a": 1}\n{"a": 2, "b": "x"}\n')
    rows = out.collect()
    assert len(rows) == 2 and rows[1]["b"] == "x" and rows[0]["b"] is None
    out = run_op(ctx, "stdin.read", [], format="csv", _text="id,name\n1,alice\n")
    assert out.first()["name"] == "alice"
    out = run_op(ctx, "stdin.read", [], format="raw", _text="blob")
    assert out.first()["raw"] == "blob"
    out = run_op(ctx, "stdin.read", [], format="json", _text='[{"x": 1}]')
    assert out.first()["x"] == 1


def test_http_get_injected(ctx):
    def fetcher(url, method, headers, timeout):
        return json.dumps([{"id": 1}, {"id": 2}]).encode()

    out = run_op(ctx, "http.get", [], url="http://api/things", _fetcher=fetcher)
    assert out.count() == 2


def test_stdout_stream_batch(ctx, spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, v STRING")
    buf = io.StringIO()
    run_op(ctx, "stdout_stream.write", [df], format="text", _out=buf)
    lines = buf.getvalue().strip().splitlines()
    assert sorted(lines) == ["id=1 v=a", "id=2 v=b"]


def test_file_watch_stream(ctx, spark, sf_dir, tmp_path):
    sdf = run_op(ctx, "file.watch", [], path=sf_dir, format="parquet",
                 path_glob_filter="region.parquet")
    assert sdf.isStreaming
    from conveyor_spark.streaming.ops import run_available_now

    out = run_available_now(sdf.groupBy("r_name").count(), "t_file_watch")
    assert out.count() == 5


def test_stdin_stream_rate(ctx, spark):
    sdf = run_op(ctx, "stdin.stream", [], mode="rate", rows_per_second=5)
    assert sdf.isStreaming and "value" in sdf.columns
    with pytest.raises(ConfigError, match="port"):
        run_op(ctx, "stdin.stream", [], mode="socket")


def test_http_post_sink(ctx, spark, tmp_path):
    sink_dir = str(tmp_path)

    def sender(url, method, headers, body):
        import os
        import uuid

        with open(os.path.join(sink_dir, f"{uuid.uuid4().hex}.req"), "wb") as f:
            f.write(method.encode() + b" " + url.encode() + b"\n" + body)
        return 200

    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id INT, v STRING").coalesce(1)
    run_op(ctx, "http.post", [df], url="http://api/ingest", batch_size=2, _sender=sender)
    import glob as _glob

    reqs = sorted(_glob.glob(f"{sink_dir}/*.req"))
    assert len(reqs) == 2  # 3 rows, batch_size 2 -> two requests
    payload = open(reqs[0], "rb").read().decode()
    assert payload.startswith("POST http://api/ingest")
    sent = []
    for p in reqs:
        body = open(p, "rb").read().decode().split("\n", 1)[1]
        sent.extend(json.loads(body))
    assert sorted(d["id"] for d in sent) == [1, 2, 3]


def test_spec_plugins_register_ops(spark, tmp_path):
    import sys

    from conveyor_spark.compiler import compile_pipeline
    from conveyor_spark.config.spec import parse_spec

    (tmp_path / "my_plugin.py").write_text(
        "from conveyor_spark.registry import register\n"
        "from pyspark.sql import functions as F\n"
        "@register('custom.tag', kind='transform')\n"
        "def tag(ctx, inputs, config):\n"
        "    return inputs[0].withColumn('tag', F.lit(config.get('value', 'x')))\n"
    )
    sys.path.insert(0, str(tmp_path))
    try:
        spec = parse_spec({
            "pipeline": {"name": "plug"},
            "global": {"plugins": ["my_plugin"]},
            "stages": [
                {"id": "src", "function": "parquet.read",
                 "config": {"path": "/root/testdata/sf0.001/region.parquet"}},
                {"id": "t", "function": "custom.tag", "inputs": ["src"],
                 "config": {"value": "hello"}},
            ],
        })
        out = compile_pipeline(spark, spec).outputs["t"]
        assert out.filter("tag = 'hello'").count() == 5
    finally:
        sys.path.remove(str(tmp_path))


def test_parquet_write_shard_controls(ctx, spark, tmp_path):
    from tests.conftest import run_op
    import glob as _glob

    df = spark.range(0, 100).coalesce(1)
    out = tmp_path / "shards"
    run_op(ctx, "parquet.write", [df], path=str(out),
           max_records_per_file=30, compression="zstd")
    files = _glob.glob(str(out / "*.parquet"))
    assert len(files) == 4  # 30+30+30+10 from one task
    back = spark.read.parquet(str(out))
    assert back.count() == 100
    from conveyor_spark.errors import ConfigError
    import pytest as _pytest
    with _pytest.raises(ConfigError):
        run_op(ctx, "parquet.write", [df], path=str(out), max_records_per_file=0)
