"""py.eval, embedding.lsh, stream.count_window."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op

SCRIPT = """
def transform(row):
    if row["status"] == "inactive":
        return None          # drop (reference: js.eval null return)
    return {"id": row["id"], "name": row["name"].upper()}
"""


def test_py_eval_transform_and_drop(ctx, spark):
    df = spark.createDataFrame(
        [(1, "Alice", "active"), (2, "Bob", "inactive"), (3, "Charlie", "active")],
        "id BIGINT, name STRING, status STRING",
    )
    out = run_op(ctx, "py.eval", [df], script=SCRIPT, output_schema="id BIGINT, name STRING")
    rows = {r["id"]: r["name"] for r in out.collect()}
    assert rows == {1: "ALICE", 3: "CHARLIE"}


def test_py_eval_bad_script(ctx, spark):
    df = spark.createDataFrame([(1,)], "id INT")
    with pytest.raises(ConfigError, match="transform"):
        run_op(ctx, "py.eval", [df], script="x = 1")


def test_embedding_lsh_signatures(ctx, spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 1
            (3, [-1.0, 0.0, 0.0, 0.0]),    # antipode of 1
        ],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    out = run_op(ctx, "embedding.lsh", [vecs], bits=16, dim=4)
    sig = {r["vec_id"]: r["lsh_sig"] for r in out.collect()}
    assert sig[1] == sig[2]                      # near-identical vectors collide
    ham13 = bin(sig[1] ^ sig[3]).count("1")
    assert ham13 >= 8                            # antipodes flip ~all hyperplanes
    # deterministic across invocations
    out2 = run_op(ctx, "embedding.lsh", [vecs], bits=16, infer_dim=True)
    assert {r["vec_id"]: r["lsh_sig"] for r in out2.collect()} == sig


def test_stream_count_window(ctx, spark, sf_dir, tmp_path):
    from conveyor_spark.streaming.ops import read_file_stream, run_available_now

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    sdf = read_file_stream(
        spark, sf_dir, batch.schema, "parquet",
        options={"pathGlobFilter": "events.parquet"},
    )
    win = run_op(ctx, "stream.count_window", [sdf], size=100,
                 key_columns="event_type", order_by="event_id")
    import tempfile

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            win.writeStream.format("memory").queryName("t_count_win")
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    out = spark.table("t_count_win")
    rows = out.collect()
    assert len(rows) > 0
    # per key: all but the last window must be exactly `size`
    per_type = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r)
    total = 0
    for t, ws in per_type.items():
        ws = sorted(ws, key=lambda r: r["window_id"])
        for w in ws[:-1]:
            assert w["n_rows"] == 100 and w["closed"]
        assert ws[-1]["n_rows"] <= 100
        total += sum(w["n_rows"] for w in ws)
    assert total == batch.count()


def test_stream_sliding_count_window_cross_batch(ctx, spark, tmp_path):
    """Sliding count windows must continue across micro-batches: two
    files drained one per trigger, size=100/slide=50 over 250 rows
    per key -> windows w0..w3 close at 100 rows each and w4 stays
    open at 50, with the straddling windows topped up by batch 2."""
    from conveyor_spark.streaming.ops import read_file_stream

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "stream_src"
    src.mkdir()
    # plain parquet FILES (a Spark directory write would be skipped by
    # the file-stream source)
    pq.write_table(
        pa.table({"key": ["k"] * 150, "n": list(range(150))}),
        src / "f1.parquet",
    )
    pq.write_table(
        pa.table({"key": ["k"] * 100, "n": list(range(150, 250))}),
        src / "f2.parquet",
    )

    schema = spark.createDataFrame([("k", 1)], "key STRING, n BIGINT").schema
    sdf = read_file_stream(
        spark, str(src), schema, "parquet",
        options={"maxFilesPerTrigger": "1"},
    )
    win = run_op(ctx, "stream.count_window", [sdf], size=100, slide=50,
                 key_columns="key")
    import tempfile

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            win.writeStream.format("memory").queryName("t_slide_win")
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    rows = spark.table("t_slide_win").collect()
    # at least two emissions means more than one micro-batch ran
    assert len(rows) > 5
    final: dict[int, tuple[int, bool]] = {}
    for r in rows:
        wid = r["window_id"]
        if wid not in final or r["n_rows"] > final[wid][0]:
            final[wid] = (r["n_rows"], r["closed"])
    assert final == {
        0: (100, True), 1: (100, True), 2: (100, True), 3: (100, True),
        4: (50, False),
    }
    # a straddling window must have been emitted open before closing
    partials = [r for r in rows if r["n_rows"] < 100]
    assert partials


def test_stream_count_window_rejects_batch(ctx, spark):
    df = spark.createDataFrame([(1, "a")], "id INT, k STRING")
    with pytest.raises(ConfigError, match="streaming path"):
        run_op(ctx, "stream.count_window", [df], size=10, key_columns="k")


def test_py_group_eval_normalize(ctx, spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0)], "k STRING, v DOUBLE"
    )
    script = (
        "def transform(key, pdf):\n"
        "    pdf = pdf.copy()\n"
        "    pdf['v_norm'] = (pdf['v'] - pdf['v'].mean()) / (pdf['v'].max() - pdf['v'].min())\n"
        "    return pdf[['k', 'v', 'v_norm']]\n"
    )
    out = run_op(ctx, "py.group_eval", [df], script=script, group_by="k",
                 output_schema="k STRING, v DOUBLE, v_norm DOUBLE")
    rows = {(r["k"], r["v"]): r["v_norm"] for r in out.collect()}
    assert rows[("a", 1.0)] == -0.5 and rows[("a", 3.0)] == 0.5
    assert rows[("b", 10.0)] == -0.5 and rows[("b", 30.0)] == 0.5


def test_py_group_eval_schema_defaults_to_input(ctx, spark):
    # the param metadata promises "default: input schema" — a
    # shape-preserving script needs no explicit DDL (matches py.eval)
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 3.0)],
                               "k STRING, v DOUBLE")
    out = run_op(ctx, "py.group_eval", [df],
                 script="def transform(k, p):\n    return p.head(1)",
                 group_by="k")
    assert out.schema == df.schema and out.count() == 2


def test_py_group_eval_pins_shuffle_width(ctx, spark):
    # AQE's byte-based coalescing would merge a tiny many-group
    # shuffle to 1-2 tasks, serializing the per-group Python calls;
    # the op pins the width (parallelism param, default = cluster
    # parallelism) and applyInPandas reuses that partitioning
    df = spark.createDataFrame(
        [(i % 50, i) for i in range(500)], "k INT, v INT"
    )
    out = run_op(ctx, "py.group_eval", [df],
                 script="def transform(k, p):\n    return p.head(1)",
                 group_by="k", parallelism=7)
    assert out.rdd.getNumPartitions() == 7
    assert out.count() == 50
    # parallelism=0 opts back into AQE; results identical
    out0 = run_op(ctx, "py.group_eval", [df],
                  script="def transform(k, p):\n    return p.head(1)",
                  group_by="k", parallelism=0)
    assert out0.count() == 50


def test_window_rollup_levels_single_pass(ctx, spark):
    import pytest as _pytest

    from conveyor_spark.errors import ConfigError
    from tests.conftest import run_op

    df = spark.createDataFrame(
        [("2024-01-01 10:15:00", "a", 1.0), ("2024-01-01 10:45:00", "a", 2.0),
         ("2024-01-01 11:05:00", "b", 4.0)],
        ["ts", "k", "v"],
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "k", "v")
    out = run_op(ctx, "window.rollup", [df], time_column="ts",
                 granularities=["hour", "day"], group_by="k",
                 aggregations=[{"column": "v", "operation": "sum",
                                "output_column": "s"}])
    got = {(r["granularity"], str(r["bucket_start"]), r["k"]): r["s"]
           for r in out.collect()}
    assert got[("hour", "2024-01-01 10:00:00", "a")] == 3.0
    assert got[("hour", "2024-01-01 11:00:00", "b")] == 4.0
    assert got[("day", "2024-01-01 00:00:00", "a")] == 3.0

    # single pass: one explode feeding one aggregate — never a Union
    # of per-granularity jobs (post-AQE plan text repeats the initial
    # plan, so count within the final section only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Union" not in final
    assert final.count("Generate explode") == 1

    with _pytest.raises(ConfigError):
        run_op(ctx, "window.rollup", [df], time_column="ts",
               granularities=["fortnight"],
               aggregations=[{"column": "v", "operation": "sum"}])


def test_stateless_module_body_analysis():
    """The namespace-sharing gate must be conservative: only scripts
    whose re-execution per group is provably a no-op may share."""
    from conveyor_spark.transforms.py_eval import _stateless_module_body as ok

    assert ok("import pandas as pd\ndef transform(k, p):\n    return p")
    assert ok("def transform(k, p, n=3):\n    return p.head(n)")
    # mutable module state / aliases / reflection all disqualify
    assert not ok("seen = []\ndef transform(k, p):\n    seen.append(k)\n    return p")
    assert not ok("def transform(k, p, c=[]):\n    c.append(k)\n    return p")
    assert not ok("def transform(k, p):\n    global n\n    n = 1\n    return p")
    assert not ok("def transform(k, p):\n    transform.n = 1\n    return p")
    assert not ok("def transform(k, p):\n    t = transform\n    t.n = 1\n    return p")
    assert not ok("def transform(k, p):\n    transform.__dict__['n'] = 1\n    return p")
    assert not ok("def transform(k, p):\n    globals()['n'] = 1\n    return p")
    assert not ok("class C:\n    n = 0\ndef transform(k, p):\n    return p")
    assert not ok("not python (")
    # dunder-attribute escapes: the exec namespace is reachable
    # through __globals__ on ANY function value, not just a def name
    assert not ok(
        "def transform(k, p):\n"
        "    (lambda: 0).__globals__['n'] = 1\n"
        "    return p"
    )
    assert not ok(
        "def transform(k, p):\n"
        "    t = transform\n"
        "    t.__globals__['n'] = 1\n"
        "    return p"
    )
    # reflective builtins reached as module attributes slip a
    # bare-Name check
    assert not ok(
        "import builtins\n"
        "def transform(k, p):\n"
        "    builtins.getattr(transform, '__globals__')['n'] = 1\n"
        "    return p"
    )
    # from-import ALIASING rebinds a reflective callable past any
    # name-based detection
    assert not ok(
        "from builtins import getattr as g\n"
        "def transform(k, p):\n"
        "    g(transform, '__globals__')['n'] = 1\n"
        "    return p"
    )
    assert not ok("from builtins import *\ndef transform(k, p):\n    return p")
    # reflection by STRING: the attribute name travels as data
    assert not ok(
        "import operator\n"
        "def transform(k, p):\n"
        "    operator.attrgetter('__globals__')(transform)['n'] = 1\n"
        "    return p"
    )
    # a dunder string constant anywhere disqualifies (conservative)
    assert not ok(
        "def transform(k, p):\n"
        "    return p[p['c'] == '__init__']"
    )
    # frame introspection reaches the exec namespace with no dunder
    # and no classic reflective builtin: each accessor and each
    # frame-object attribute must disqualify on its own
    assert not ok(
        "import sys\n"
        "def transform(k, p):\n"
        "    sys._getframe().f_globals['n'] = 1\n"
        "    return p"
    )
    assert not ok(
        "import inspect\n"
        "def transform(k, p):\n"
        "    inspect.currentframe().f_globals['n'] = 1\n"
        "    return p"
    )
    assert not ok(
        "from sys import _getframe as f\n"
        "def transform(k, p):\n"
        "    return p"
    )
    assert not ok(
        "import sys\n"
        "def transform(k, p):\n"
        "    try:\n"
        "        raise ValueError\n"
        "    except ValueError:\n"
        "        fr = sys.exc_info()[2].tb_frame\n"
        "    return p"
    )
    # generator frames expose f_globals through gi_frame
    assert not ok(
        "def transform(k, p):\n"
        "    g = (x for x in [1])\n"
        "    g.gi_frame\n"
        "    return p"
    )
    # the accessor name as a STRING constant (getattr-like helpers
    # taking it as data) disqualifies too
    assert not ok(
        "def transform(k, p):\n"
        "    s = 'f_globals'\n"
        "    return p"
    )
    # ...but ordinary stateless scripts still share
    assert ok("import re\ndef transform(k, p):\n    return p")


def test_group_eval_stateless_script_shares_setup(ctx, spark):
    """A provably-stateless script still produces per-group-correct
    results when its namespace is shared across a whole task."""
    df = spark.createDataFrame(
        [(i % 10, f"x{i}") for i in range(100)], "k INT, s STRING"
    )
    script = (
        "import re\n"
        "def transform(key, pdf):\n"
        "    import pandas as pd\n"
        "    n = int(pdf['s'].str.match(r'x\\d+').sum())\n"
        "    return pd.DataFrame({'k': [key[0]], 'n': [n]})\n"
    )
    out = run_op(ctx, "py.group_eval", [df], script=script, group_by="k",
                 output_schema="k INT, n BIGINT", parallelism=1)
    assert {(r["k"], r["n"]) for r in out.collect()} == {(i, 10) for i in range(10)}
