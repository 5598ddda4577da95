"""YAML schema persistence — same on-disk format as the reference
(`!schema` tag, name + field→type-alias mapping; reference
/root/reference/mongo2pq/schema.py:87-108 dump, :173-202 load), so
schema files round-trip between the two engines."""

from __future__ import annotations

from pathlib import Path

import yaml

from mongo2pq_spark.exceptions import SchemaParseError
from mongo2pq_spark.schema.model import Schema
from mongo2pq_spark.schema.types import alias_for_type, type_for_alias


def dump_schema_to_file(
    schema: Schema, filename: str | None = None, destination: Path = Path(".")
) -> Path:
    destination = Path(destination)
    destination.mkdir(parents=True, exist_ok=True)
    path = destination / (filename or f"{schema.name}.yaml")

    class _Dumper(yaml.SafeDumper):
        pass

    def _represent(dumper: yaml.SafeDumper, s: Schema):
        return dumper.represent_mapping(
            "!schema",
            {
                "name": s.name,
                "fields": {n: alias_for_type(t) for n, t in s.fields.items()},
            },
        )

    _Dumper.add_representer(Schema, _represent)
    with path.open("w") as out:
        yaml.dump(schema, out, Dumper=_Dumper, sort_keys=False)
    return path


def load_schema_from_file(schema_file: Path) -> Schema:
    class _Loader(yaml.SafeLoader):
        pass

    def _construct(loader: yaml.SafeLoader, node: yaml.MappingNode) -> Schema:
        mapping = loader.construct_mapping(node, deep=True)
        try:
            fields = {
                name: type_for_alias(alias)
                for name, alias in mapping["fields"].items()
            }
        except Exception as exc:
            raise SchemaParseError(
                f"Arrow types couldn't be constructed from aliases: {exc!s}"
            )
        return Schema(mapping["name"], fields=fields)

    _Loader.add_constructor("!schema", _construct)

    try:
        with Path(schema_file).open("r") as stream:
            loaded = yaml.load(stream, Loader=_Loader)
    except OSError as exc:
        raise SchemaParseError(f"Schema file {schema_file!s} couldn't be opened: {exc!s}")
    except yaml.constructor.ConstructorError as exc:
        raise SchemaParseError(f"Schema file {schema_file!s} couldn't be parsed: {exc!s}")

    if not isinstance(loaded, Schema):
        raise SchemaParseError(
            f"Schema file {schema_file!s} doesn't contain a !schema definition"
        )
    return loaded
