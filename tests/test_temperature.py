"""sample.temperature vs a literal-Python transcription, plus the
recipe's defining property: alpha < 1 flattens source proportions
(upsamples the tail, downsamples the head)."""

from __future__ import annotations

import hashlib
import math

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def _h(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _py_temperature(rows, alpha, budget=None, max_epochs=10.0, seed="temp"):
    pool = [(i, s) for i, s in rows if i is not None and s is not None]
    counts: dict[str, int] = {}
    for _, s in pool:
        counts[s] = counts.get(s, 0) + 1
    den = 0.0
    for s in sorted(counts):
        den += math.pow(float(counts[s]), alpha)
    b = float(budget) if budget is not None else float(len(pool))
    out = []
    for i, s in pool:
        rate = min(b * math.pow(float(counts[s]), alpha) / den / counts[s],
                   max_epochs)
        full = math.floor(rate)
        thresh = math.floor((rate - full) * 1_000_000.0)
        for e in range(int(full) + 1):
            if e < full or _h(f"{i}#{seed}#{s}#{e}") % 1_000_000 < thresh:
                out.append((i, s, e))
    return sorted(out)


ROWS = (
    [(i, "en") for i in range(100)]
    + [(i + 100, "fr") for i in range(25)]
    + [(i + 200, "sw") for i in range(4)]
    + [(None, "en"), (999, None)]
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id LONG, lang STRING")


@pytest.mark.parametrize("alpha,budget", [(0.5, None), (0.3, 200), (1.0, None)])
def test_temperature_matches_reference(ctx, docs, alpha, budget):
    out = run_op(ctx, "sample.temperature", [docs], by="lang",
                 id_column="doc_id", alpha=alpha, budget=budget)
    got = sorted((r["doc_id"], r["lang"], r["mix_epoch"])
                 for r in out.collect())
    assert got == _py_temperature(ROWS, alpha, budget)


def test_temperature_flattens_proportions(ctx, docs):
    out = run_op(ctx, "sample.temperature", [docs], by="lang",
                 id_column="doc_id", alpha=0.3)
    by_lang = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        by_lang[r["lang"]] += 1
    # natural: en 100 / fr 25 / sw 4. alpha=0.3 must compress the
    # ratio (en shrinks, sw is upsampled past its natural count)
    assert by_lang["en"] < 100
    assert by_lang["sw"] > 4
    assert by_lang["en"] / by_lang["sw"] < 100 / 4


def test_temperature_alpha_one_keeps_everything_once(ctx, docs):
    # alpha=1, default budget: rate = 1 for every source — the whole
    # (non-null) pool exactly once
    out = run_op(ctx, "sample.temperature", [docs], by="lang",
                 id_column="doc_id", alpha=1.0)
    rows = out.collect()
    assert len(rows) == 129
    assert all(r["mix_epoch"] == 0 for r in rows)


def test_temperature_errors(ctx, docs):
    with pytest.raises(ConfigError, match="alpha"):
        run_op(ctx, "sample.temperature", [docs], by="lang",
               id_column="doc_id", alpha=0.0)
    with pytest.raises(ConfigError, match="overwrite"):
        run_op(ctx, "sample.temperature", [docs.selectExpr(
            "doc_id", "lang", "1 AS mix_epoch")],
            by="lang", id_column="doc_id")


def test_temperature_max_epochs_bounded(ctx, docs):
    with pytest.raises(ConfigError, match="max_epochs"):
        run_op(ctx, "sample.temperature", [docs], by="lang",
               id_column="doc_id", max_epochs=1e9)
