"""Tests for orc/text/binary file IO (sources/files.py)."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def test_orc_roundtrip(ctx, spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)], ["id", "k", "v"])
    out = str(tmp_path / "orc")
    run_op(ctx, "orc.write", [df], path=out, compression="zstd")
    back = run_op(ctx, "orc.read", [], path=out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_write_partition_by_and_shards(ctx, spark, tmp_path):
    df = spark.createDataFrame([(i, "p%d" % (i % 2)) for i in range(20)], ["id", "p"])
    out = str(tmp_path / "orc_parts")
    run_op(ctx, "orc.write", [df.coalesce(1)], path=out, partition_by="p",
           max_records_per_file=3)
    import glob
    files = glob.glob(out + "/p=p0/*.orc")
    assert len(files) >= 4  # 10 rows / cap 3 -> >=4 files per partition
    back = run_op(ctx, "orc.read", [], path=out)
    assert back.count() == 20
    with pytest.raises(ConfigError):
        run_op(ctx, "orc.write", [df], path=out, max_records_per_file=0)


def test_orc_read_filter_pushdown(ctx, spark, tmp_path):
    df = spark.createDataFrame([(i, i * 2) for i in range(100)], ["id", "v"])
    out = str(tmp_path / "orc_pd")
    run_op(ctx, "orc.write", [df], path=out)
    scan = run_op(ctx, "orc.read", [], path=out).filter("id < 5").select("id")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan
    assert scan.count() == 5


def test_text_read_lines_and_whole_file(ctx, tmp_path):
    (tmp_path / "a.txt").write_text("l1\nl2\nl3")
    (tmp_path / "b.txt").write_text("whole doc")
    lines = run_op(ctx, "text.read", [], path=str(tmp_path), glob="a.txt")
    assert sorted(r["value"] for r in lines.collect()) == ["l1", "l2", "l3"]
    whole = run_op(ctx, "text.read", [], path=str(tmp_path), whole_file=True,
                   include_path=True)
    rows = {r["path"].rsplit("/", 1)[-1]: r["value"] for r in whole.collect()}
    assert rows["a.txt"] == "l1\nl2\nl3" and rows["b.txt"] == "whole doc"


def test_binary_read_glob_and_metadata(ctx, tmp_path):
    (tmp_path / "x.bin").write_bytes(b"\x89PNG\r\n\x1a\n12345")
    (tmp_path / "y.txt").write_text("nope")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "z.bin").write_bytes(b"RIFF....WAVE")
    flat = run_op(ctx, "binary.read", [], path=str(tmp_path), glob="*.bin")
    assert {r["path"].rsplit("/", 1)[-1] for r in flat.collect()} == {"x.bin"}
    rec = run_op(ctx, "binary.read", [], path=str(tmp_path), glob="*.bin",
                 recursive=True)
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in rec.collect()}
    assert set(got) == {"x.bin", "z.bin"}
    assert got["x.bin"].startswith(b"\x89PNG")
    meta = run_op(ctx, "binary.read", [], path=str(tmp_path), glob="*.bin",
                  recursive=True, drop_content=True)
    assert "content" not in meta.columns
    assert {r["length"] for r in meta.collect()} == {13, 12}


def test_binary_read_feeds_media_metadata(ctx, tmp_path):
    """The multimodal ingestion seam end-to-end: files -> binary rows
    -> format sniffing, no Python decode in the loop."""
    (tmp_path / "i.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    (tmp_path / "a.wav").write_bytes(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8)
    df = run_op(ctx, "binary.read", [], path=str(tmp_path))
    sniffed = run_op(ctx, "media.metadata", [df], column="content")
    got = {r["path"].rsplit("/", 1)[-1]: r["media_format"] for r in sniffed.collect()}
    assert got == {"i.png": "png", "a.wav": "wav"}


def test_missing_path_errors(ctx, spark):
    for op in ("orc.read", "text.read", "binary.read"):
        with pytest.raises(ConfigError):
            run_op(ctx, op, [])
    with pytest.raises(ConfigError):
        run_op(ctx, "orc.write", [spark.range(1)])


def test_xml_roundtrip(ctx, spark, tmp_path):
    """xml.write -> xml.read: Spark 4's built-in XML source."""
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id LONG, name STRING")
    out = str(tmp_path / "feed")
    run_op(ctx, "xml.write", [df], path=out, row_tag="item", root_tag="feed")
    back = run_op(ctx, "xml.read", [], path=out, row_tag="item",
                  schema="id LONG, name STRING")
    assert sorted((r["id"], r["name"]) for r in back.collect()) == \
        [(1, "alpha"), (2, "beta")]


def test_avro_roundtrip(ctx, spark, tmp_path):
    """avro.write -> avro.read via the embedded AvroFileFormat (the
    spark-avro SHORT-NAME registration is absent on this classpath;
    the implementation itself ships inside spark-sql and the ops
    resolve it by FQCN)."""
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None)],
        "id LONG, name STRING, score DOUBLE")
    out = str(tmp_path / "av")
    run_op(ctx, "avro.write", [df], path=out, compression="deflate")
    back = run_op(ctx, "avro.read", [], path=out)
    assert sorted((r["id"], r["name"], r["score"]) for r in back.collect()) == \
        [(1, "alpha", 1.5), (2, "beta", None)]


def test_avro_missing_classes_raise_config_error(ctx, spark, monkeypatch):
    """Review finding: with NEITHER avro class resolvable the format
    helper silently returned the FQCN and users got a raw JVM
    ClassNotFoundException later; it must refuse with ConfigError
    naming the package."""
    import conveyor_spark.sources.avro as avro_mod

    class _Loader:
        pass

    class _FakeClass:
        @staticmethod
        def forName(*a, **k):
            raise RuntimeError("ClassNotFoundException (simulated)")

    class _FakeLang:
        Class = _FakeClass

    class _FakeUtils:
        @staticmethod
        def getContextOrSparkClassLoader():
            return _Loader()

    class _FakeJvm:
        class org:
            class apache:
                class spark:
                    class util:
                        Utils = _FakeUtils
        class java:
            lang = _FakeLang

    class _FakeSpark:
        _jvm = _FakeJvm

    with pytest.raises(ConfigError, match="spark-avro"):
        avro_mod._avro_format(_FakeSpark())
