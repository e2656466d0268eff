"""validate.schema — assertion stage; passes data through untouched.

Reference: src/modules/transforms/validate.rs:99-225 — required
fields, field types (vocab: validate.rs:227-246), non-nullable, date
fields, unique fields; any violation fails the pipeline.

Spark-first: structural checks (required/types) read ``df.schema`` on
the driver for free. Data checks (non-null, unique, date-parse) are
aggregated in ONE job: a single global aggregate computing every
violation count at once — not one count() action per rule.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from conveyor_spark.errors import ConfigError, ValidationError
from conveyor_spark.registry import OpContext, register

# reference type vocabulary -> acceptable Spark types
_TYPE_VOCAB: dict[str, tuple[type, ...]] = {
    "string": (T.StringType,),
    "int": (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    "int8": (T.ByteType,),
    "int16": (T.ShortType,),
    "int32": (T.IntegerType,),
    "int64": (T.LongType,),
    "float": (T.FloatType, T.DoubleType),
    "float32": (T.FloatType,),
    "float64": (T.DoubleType,),
    "bool": (T.BooleanType,),
    "date": (T.DateType, T.TimestampType),
    "datetime": (T.TimestampType,),
    "timestamp": (T.TimestampType,),
}


@register("validate.schema", kind="transform", doc="Assert schema/data constraints; pass-through")
def validate_schema(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    df = inputs[0]
    fields = {f.name: f.dataType for f in df.schema.fields}

    for name in config.get("required_fields", []):
        if name not in fields:
            raise ValidationError(f"validate.schema: required field {name!r} missing")

    for name, tname in (config.get("field_types") or {}).items():
        if name not in fields:
            raise ValidationError(f"validate.schema: typed field {name!r} missing")
        expected = _TYPE_VOCAB.get(str(tname).lower())
        if expected is None:
            raise ConfigError(f"validate.schema: unknown type {tname!r}")
        if not isinstance(fields[name], expected):
            raise ValidationError(
                f"validate.schema: field {name!r} is {fields[name].simpleString()}, expected {tname}"
            )

    # One aggregate job for all data-level rules.
    aggs: list = []
    labels: list[str] = []
    for name in config.get("non_nullable", []):
        if name not in fields:
            raise ValidationError(f"validate.schema: non_nullable field {name!r} missing")
        aggs.append(F.sum(F.col(name).isNull().cast("long")))
        labels.append(f"null values in {name!r}")
    for name in config.get("date_fields", []):
        if name not in fields:
            raise ValidationError(f"validate.schema: date field {name!r} missing")
        if isinstance(fields[name], (T.DateType, T.TimestampType)):
            continue  # already a temporal type
        # try_* variants: ANSI mode (Spark 4 default) makes to_date
        # throw on malformed input; validation wants a null + count.
        parsed = F.coalesce(
            F.try_to_timestamp(F.col(name)),
            F.expr(f"try_cast(`{name}` AS DATE)").cast("timestamp"),
        )
        aggs.append(F.sum((F.col(name).isNotNull() & parsed.isNull()).cast("long")))
        labels.append(f"unparseable dates in {name!r}")
    for name in config.get("unique_fields", []):
        if name not in fields:
            raise ValidationError(f"validate.schema: unique field {name!r} missing")
        aggs.append(F.count(F.col(name)) - F.countDistinct(F.col(name)))
        labels.append(f"duplicate values in {name!r}")

    if aggs:
        counts = df.agg(*[a.alias(f"v{i}") for i, a in enumerate(aggs)]).first()
        problems = [
            f"{label}: {counts[i]}" for i, label in enumerate(labels) if (counts[i] or 0) > 0
        ]
        if problems:
            raise ValidationError("validate.schema failed: " + "; ".join(problems))
    return df
