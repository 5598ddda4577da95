"""Engine exceptions (parity: /root/reference/mongo2pq/exceptions.py:1-5)."""


class SchemaParseError(Exception):
    """A YAML schema file could not be parsed into a Schema."""


class ConfigParseError(Exception):
    """A YAML config section could not be parsed."""


class NestedValueError(NotImplementedError):
    """A sampled value was a dict/list: flat schemas only, matching the
    reference's explicit rejection of nested documents
    (/root/reference/mongo2pq/schema.py:331-335). Subclasses
    NotImplementedError (the reference's signal) but carries the field
    name so callers can implement skip-with-warning semantics."""

    def __init__(self, field: str):
        self.field = field
        super().__init__(
            f"Nested value in field {field!r}: list/dict inference is not "
            "supported (flat schemas only)"
        )
