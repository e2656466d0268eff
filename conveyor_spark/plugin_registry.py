"""Plugin registry verbs: search / info / add against a registry file.

Reference parity: `conveyor plugin install|list|info|update` resolves
names through a published registry.json (src/cli/plugin.rs +
src/core/plugin_manager.rs; shape: {"version", "plugins": {name:
{name, version, description, author, ...}}}). The reference downloads
native .dylib/.wasm artifacts; our plugins are Python modules
(importable, registering ops via @register), so an entry carries a
``module`` import path and "install" wires that module into a
pipeline's [global] plugins list — the validated-TOML equivalent of
dropping a dylib into ~/.conveyor/plugins.
"""

from __future__ import annotations

import json
import os
from typing import Any

from conveyor_spark.errors import ConfigError

DEFAULT_REGISTRY = "plugin-registry.json"


def load_registry(path: str | None = None) -> dict[str, Any]:
    """Read a registry file ({version, plugins: {name: entry}})."""
    path = path or os.environ.get("CONVEYOR_SPARK_PLUGIN_REGISTRY", DEFAULT_REGISTRY)
    if not os.path.exists(path):
        raise ConfigError(
            f"plugin registry {path!r} not found (set CONVEYOR_SPARK_PLUGIN_REGISTRY "
            "or pass --registry)"
        )
    with open(path) as f:
        doc = json.load(f)
    plugins = doc.get("plugins")
    if not isinstance(plugins, dict):
        raise ConfigError(f"plugin registry {path!r}: missing 'plugins' table")
    return doc


def search_plugins(query: str, registry_path: str | None = None) -> list[dict[str, Any]]:
    """Name/description substring search (case-insensitive)."""
    doc = load_registry(registry_path)
    q = query.lower()
    hits = []
    for name, entry in sorted(doc["plugins"].items()):
        hay = f"{name} {entry.get('description', '')}".lower()
        if q in hay:
            hits.append({"name": name, **entry})
    return hits


def plugin_info(name: str, registry_path: str | None = None) -> dict[str, Any]:
    doc = load_registry(registry_path)
    entry = doc["plugins"].get(name)
    if entry is None:
        raise ConfigError(
            f"plugin {name!r} not in registry (try: plugin search {name})"
        )
    return {"name": name, **entry}


def add_plugin(
    pipeline_file: str, name: str, registry_path: str | None = None
) -> str:
    """Wire a registry plugin's module into the pipeline's [global]
    plugins list. Returns the module path. The spec is re-validated
    and restored on failure (same contract as every authoring verb)."""
    import tomllib

    entry = plugin_info(name, registry_path)
    module = entry.get("module")
    if not module:
        raise ConfigError(
            f"plugin {name!r} has no 'module' entry — not a Python-module plugin"
        )
    import re

    with open(pipeline_file) as f:
        original = f.read()
    with open(pipeline_file, "rb") as f:
        tomllib.load(f)  # must already parse
    # allow a trailing comment after the header (`[global]  # settings`)
    gm = re.search(r'^\[global\]\s*(#.*)?$', original, re.M)
    if gm:
        # the [global] section ends at the next table header
        end = re.search(r'^\[', original[gm.end():], re.M)
        sec_end = gm.end() + (end.start() if end else len(original) - gm.end())
        section = original[gm.end():sec_end]
        # only match a plugins key INSIDE [global] — a stage config
        # could legitimately carry its own `plugins` key
        pm = re.search(r'^plugins\s*=\s*\[(.*?)\]', section, re.M | re.S)
        if pm:
            existing = pm.group(1).strip()
            # TOML strings may be basic ("x") OR literal ('x') — an
            # already-wired single-quoted entry must not be duplicated
            if f'"{module}"' in existing or f"'{module}'" in existing:
                return module  # already wired
            sep = ", " if existing else ""
            new = f'plugins = [{existing}{sep}"{module}"]'
            updated = (original[: gm.end() + pm.start()] + new
                       + original[gm.end() + pm.end():])
        else:
            updated = (original[: gm.end()] + f'\nplugins = ["{module}"]'
                       + original[gm.end():])
    else:
        updated = f'[global]\nplugins = ["{module}"]\n\n' + original
    with open(pipeline_file, "w") as f:
        f.write(updated)
    try:
        from conveyor_spark.config.spec import load_spec

        load_spec(pipeline_file)
    except Exception:
        with open(pipeline_file, "w") as f:
            f.write(original)
        raise
    return module
