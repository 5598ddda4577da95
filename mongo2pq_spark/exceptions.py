"""Engine exceptions (parity: /root/reference/mongo2pq/exceptions.py:1-5)."""


class SchemaParseError(Exception):
    """A YAML schema file could not be parsed into a Schema."""


class ConfigParseError(Exception):
    """A YAML config section could not be parsed."""
