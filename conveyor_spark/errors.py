"""Engine error types (reference: src/core/error.rs semantics)."""

from __future__ import annotations


class ConveyorError(Exception):
    """Base error for the engine."""


class ConfigError(ConveyorError):
    """Invalid pipeline spec / stage config."""


class ValidationError(ConveyorError):
    """Data failed a validate.schema assertion
    (reference: src/modules/transforms/validate.rs:99-225)."""


class FunctionNotFound(ConveyorError):
    """Stage references an unregistered function
    (reference resolution order: src/core/dag_builder.rs:196-269)."""
