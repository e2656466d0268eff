"""Pipeline spec: TOML model, interpolation, structural validation.

Mirrors the reference's config surface (src/core/config.rs:170-201):

    [pipeline]                 # name, version, description
    [global]                   # variables, error_handling, timeout...
    [[stages]]                 # id, function, inputs, [stages.config]

plus ``${ENV_VAR}`` resolution into global.variables
(config.rs:265-293) and ``{{var}}`` interpolation into stage configs
(config.rs:297-356). Validation: non-empty, unique ids, inputs
resolve, acyclic (config.rs:223-261).
"""

from __future__ import annotations

import os
import re
import tomllib
from dataclasses import dataclass, field
from graphlib import CycleError, TopologicalSorter
from typing import Any

from conveyor_spark.errors import ConfigError

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")
_VAR_RE = re.compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")


@dataclass
class StageSpec:
    id: str
    function: str
    inputs: list[str] = field(default_factory=list)
    config: dict[str, Any] = field(default_factory=dict)
    error_strategy: dict[str, Any] = field(default_factory=dict)  # {type, max_retries, retry_delay_seconds}


@dataclass
class PipelineSpec:
    name: str = "pipeline"
    version: str = "0"
    description: str = ""
    variables: dict[str, str] = field(default_factory=dict)
    error_handling: dict[str, Any] = field(default_factory=dict)
    timeout_seconds: float | None = None
    plugins: list[str] = field(default_factory=list)  # python modules registering ops
    # [global.spark]: runtime Spark confs applied at compile (state
    # store provider, shuffle partitions, AQE knobs, ...)
    spark_conf: dict[str, str] = field(default_factory=dict)
    # [global] state_store = "hdfs" | "rocksdb": convenience spelling
    # for the streaming state-store provider class
    state_store: str | None = None
    stages: list[StageSpec] = field(default_factory=list)

    def stage_map(self) -> dict[str, StageSpec]:
        return {s.id: s for s in self.stages}

    def topo_order(self) -> list[str]:
        graph = {s.id: set(s.inputs) for s in self.stages}
        try:
            return list(TopologicalSorter(graph).static_order())
        except CycleError as exc:
            raise ConfigError(f"pipeline has a cycle: {exc.args[1]}") from None


def _resolve_env(value: str, env: dict[str, str]) -> str:
    def sub(m: re.Match[str]) -> str:
        name = m.group(1)
        if name not in env:
            raise ConfigError(f"environment variable {name!r} is not set")
        return env[name]

    return _ENV_RE.sub(sub, value)


def _interpolate(value: Any, variables: dict[str, str]) -> Any:
    """Recursive ``{{var}}`` substitution in stage configs.

    Only names DEFINED in [global].variables substitute at parse
    time; unknown ``{{ x }}`` stays literal — it is (usually) a
    per-row Handlebars template the executing op renders against row
    data (http.fetch urls, mongodb sink queries, ai prompts).
    Raising here made every row-templated config unloadable."""
    if isinstance(value, str):
        def sub(m: re.Match[str]) -> str:
            name = m.group(1)
            if name not in variables:
                return m.group(0)  # leave for row-level templating
            return str(variables[name])

        return _VAR_RE.sub(sub, value)
    if isinstance(value, dict):
        return {k: _interpolate(v, variables) for k, v in value.items()}
    if isinstance(value, list):
        return [_interpolate(v, variables) for v in value]
    return value


def _none_default(value: Any) -> Any:
    """Absent (None) -> {}; any PRESENT falsy value (false, 0, "")
    is a wrong type and must reach _require — `config = false` used
    to silently run the stage with all defaults."""
    return {} if value is None else value


def _require(value: Any, typ: type, what: str) -> Any:
    """Shape check for TOML-representable-but-wrong values: `stages =
    5`, `[global] variables = "x"`, `inputs = 3` are all valid TOML
    that used to escape as TypeError/AttributeError deep in the
    parser or compiler. Every malformed shape must die here as a
    ConfigError naming the offending key (fuzz-locked by
    tests/test_spec_fuzz.py)."""
    if not isinstance(value, typ) or (typ is not bool and isinstance(value, bool)):
        raise ConfigError(
            f"{what} must be a {typ.__name__}, got {type(value).__name__}: {value!r}"
        )
    return value


def parse_spec(data: dict[str, Any], env: dict[str, str] | None = None) -> PipelineSpec:
    env = dict(os.environ) if env is None else env
    _require(data, dict, "pipeline spec")
    meta = _require(data.get("pipeline", {}), dict, "[pipeline]")
    glob = _require(data.get("global", {}), dict, "[global]")
    variables = {
        str(k): _resolve_env(str(v), env)
        for k, v in _require(
            _none_default(glob.get("variables")), dict, "[global].variables"
        ).items()
    }
    stages_raw = data.get("stages", [])
    if not isinstance(stages_raw, list) or not stages_raw:
        raise ConfigError("pipeline must declare at least one [[stages]] entry")
    stages = []
    for raw in stages_raw:
        _require(raw, dict, "[[stages]] entry")
        if "id" not in raw or "function" not in raw:
            raise ConfigError(f"stage missing 'id'/'function': {raw}")
        sid = _require(raw["id"], str, "stage 'id'")
        inputs_raw = raw.get("inputs", [])
        if isinstance(inputs_raw, str):
            # ergonomic: a single upstream may be written unbracketed
            inputs_raw = [inputs_raw]
        _require(inputs_raw, list, f"stage {sid!r} 'inputs'")
        for inp in inputs_raw:
            _require(inp, str, f"stage {sid!r} input")
        stages.append(
            StageSpec(
                id=sid,
                function=_require(raw["function"], str, f"stage {sid!r} 'function'"),
                inputs=list(inputs_raw),
                config=_interpolate(
                    _require(_none_default(raw.get("config")), dict, f"stage {sid!r} 'config'"),
                    variables,
                ),
                error_strategy=_require(
                    _none_default(raw.get("error_strategy")), dict,
                    f"stage {sid!r} 'error_strategy'",
                ),
            )
        )
    spec = PipelineSpec(
        name=str(meta.get("name", "pipeline")),
        version=str(meta.get("version", "0")),
        description=str(meta.get("description", "")),
        variables=variables,
        # [error_handling] lives at top level in the reference's specs
        # (docs/configuration.md:155); [global].error_handling also
        # accepted (earlier shape of this engine's own specs)
        error_handling=_require(
            _none_default(
                data.get("error_handling", glob.get("error_handling"))),
            dict, "[error_handling]",
        ),
        timeout_seconds=glob.get("timeout_seconds"),
        plugins=[
            _require(p, str, "[global].plugins entry")
            for p in _require(glob.get("plugins", []), list, "[global].plugins")
        ],
        spark_conf={
            str(k): str(v)
            for k, v in _require(
                _none_default(glob.get("spark")), dict, "[global.spark]"
            ).items()
        },
        state_store=glob.get("state_store"),
        stages=stages,
    )
    if spec.state_store is not None and spec.state_store not in (
        "hdfs", "rocksdb"
    ):
        raise ConfigError(
            "[global].state_store must be 'hdfs' or 'rocksdb', got "
            f"{spec.state_store!r}"
        )
    if spec.timeout_seconds is not None:
        if isinstance(spec.timeout_seconds, bool) or not isinstance(
            spec.timeout_seconds, (int, float)
        ) or spec.timeout_seconds <= 0:
            raise ConfigError(
                "[global].timeout_seconds must be a positive number, got "
                f"{spec.timeout_seconds!r}"
            )
    validate_spec(spec)
    return spec


def validate_spec(spec: PipelineSpec) -> None:
    ids = [s.id for s in spec.stages]
    if len(ids) != len(set(ids)):
        dupes = sorted({i for i in ids if ids.count(i) > 1})
        raise ConfigError(f"duplicate stage ids: {dupes}")
    known = set(ids)
    for s in spec.stages:
        for inp in s.inputs:
            if inp not in known:
                raise ConfigError(f"stage {s.id!r} references unknown input {inp!r}")
    spec.topo_order()  # raises on cycle


def load_spec(path: str, env: dict[str, str] | None = None) -> PipelineSpec:
    with open(path, "rb") as f:  # noqa: PTH123
        data = tomllib.load(f)
    return parse_spec(data, env)


def unresolved_template_refs(
    spec: "PipelineSpec",
) -> list[tuple[str, str, str]]:
    """``(stage_id, function, var_name)`` for every ``{{name}}`` that
    survived parse-time substitution and does NOT sit under a param
    the op declares ``templated=True`` (http.fetch url, ai.generate
    prompt, mongodb sink query, ...) — i.e. a probable
    [global].variables typo. Shared by `validate` and the compiler so
    `run` users see the warning too, while legitimately row-templated
    configs stay silent."""
    from conveyor_spark.registry import REGISTRY

    def walk(v: Any):
        if isinstance(v, str):
            yield from (m.group(1) for m in _VAR_RE.finditer(v))
        elif isinstance(v, dict):
            for x in v.values():
                yield from walk(x)
        elif isinstance(v, list):
            for x in v:
                yield from walk(x)

    out: list[tuple[str, str, str]] = []
    for stage in spec.stages:
        op = REGISTRY.get(stage.function)
        templated = {
            p.name for p in (op.params or ()) if p.templated
        } if op is not None else set()
        names = set()
        for key, value in stage.config.items():
            if key in templated:
                continue
            names.update(walk(value))
        out.extend((stage.id, stage.function, n) for n in sorted(names))
    return out
