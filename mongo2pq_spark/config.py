"""YAML config → schema rewrite rules.

Same config surface as the reference (/root/reference/mongo2pq/config.py
and sample_config.yaml): a ``schema:`` section maps collection names to
ordered rule lists of

- ``retype_equals`` / ``retype_contains`` / ``retype_regex``
  (fieldname test → force ``fieldtype``, any Arrow alias), and
- ``rename_regex`` / ``rename_regex_upper``
  (regex substitution with group backrefs; ``upper: [i, ...]``
  uppercases those groups).

Parsing is warn-and-skip for malformed nodes, warn for unknown root
keys, and ``ConfigParseError`` for structurally broken sections —
matching the reference's tolerance (config.py:10-36, 39-82).
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Any, Iterable, Mapping

import yaml

from mongo2pq_spark.exceptions import ConfigParseError
from mongo2pq_spark.schema.types import type_for_alias

logger = logging.getLogger(__name__)


def parse_config(config_path: Path) -> Mapping[str, Any]:
    section_parsers = {"schema": parse_schema_config}

    with Path(config_path).open("r") as stream:
        raw = yaml.safe_load(stream)
    if not isinstance(raw, dict):
        logger.warning(
            "config ignored: outermost node must parse to a mapping, got %s",
            type(raw).__name__,
        )
        return {}

    parsed: dict[str, Any] = {}
    for section, parser in section_parsers.items():
        if (node := raw.pop(section, None)) is not None:
            try:
                parsed[section] = parser(node)
            except ConfigParseError as err:
                logger.warning("config section %r ignored: %s", section, err)
    if raw:
        logger.warning("unknown config keys ignored: %s", ", ".join(raw))
    return parsed


def parse_schema_config(node: Any) -> Mapping[str, Iterable]:
    if not isinstance(node, dict):
        raise ConfigParseError(
            f"schema config must parse to a mapping, not {type(node).__name__}"
        )

    parsed: dict[str, list] = {}
    for collection, rule_nodes in node.items():
        if not isinstance(rule_nodes, list):
            raise ConfigParseError(
                f"collection node {collection!r} must parse to a list,"
                f" not {type(rule_nodes).__name__}"
            )
        rules = []
        for index, rule_node in enumerate(rule_nodes):
            if not isinstance(rule_node, dict):
                _warn(collection, index, "is not a mapping")
                continue
            kind = rule_node.get("type")
            if kind is None:
                _warn(collection, index, "is missing the required key 'type'")
                continue
            if kind.startswith("retype_"):
                rule = _parse_retype(collection, index, rule_node)
            elif kind.startswith("rename_"):
                rule = _parse_rename(collection, index, rule_node)
            else:
                _warn(collection, index, f"has unknown type {kind!r}")
                rule = None
            if rule is not None:
                rules.append(rule)
        parsed[collection] = rules
    return parsed


def _parse_retype(collection: str, index: int, node: Mapping[str, str]):
    try:
        field_type = type_for_alias(node["fieldtype"])
        field_name = node["fieldname"]
    except KeyError:
        _warn(collection, index, "needs keys (type, fieldname, fieldtype)")
        return None
    except ValueError:
        _warn(collection, index, f"has unknown fieldtype {node.get('fieldtype')!r}")
        return None

    mode = node["type"].removeprefix("retype_")
    if mode == "equals":
        field_test = lambda name: name == field_name  # noqa: E731
    elif mode == "contains":
        field_test = lambda name: field_name in name  # noqa: E731
    elif mode == "regex":
        pattern = re.compile(field_name)
        field_test = lambda name: pattern.search(name) is not None  # noqa: E731
    else:
        _warn(collection, index, f"has unknown retype mode {mode!r}")
        return None
    return {"type": "retype", "field_type": field_type, "field_test": field_test}


def _parse_rename(collection: str, index: int, node: Mapping[str, Any]):
    try:
        old_name, new_name = node["oldname"], node["newname"]
    except KeyError:
        _warn(collection, index, "needs keys (type, oldname, newname)")
        return None
    try:
        pattern = re.compile(old_name)
    except re.error:
        _warn(collection, index, f"has invalid oldname regex {old_name!r}")
        return None

    mode = node["type"].removeprefix("rename_")
    if mode == "regex":
        rename_function = lambda name: pattern.sub(new_name, name)  # noqa: E731
    elif mode == "regex_upper":
        upper_groups = node.get("upper")
        if not isinstance(upper_groups, list):
            _warn(collection, index, "rename_regex_upper needs a list-valued 'upper'")
            return None

        def _upper_repl(match: re.Match) -> str:
            result = new_name
            group_index = 1
            while rf"\{group_index}" in result:
                piece = match.group(group_index) or ""
                if group_index in upper_groups:
                    piece = piece.upper()
                result = result.replace(rf"\{group_index}", piece)
                group_index += 1
            return result

        rename_function = lambda name: pattern.sub(_upper_repl, name)  # noqa: E731
    else:
        _warn(collection, index, f"has unknown rename mode {mode!r}")
        return None
    return {"type": "rename", "rename_function": rename_function}


def _warn(collection: str, index: int, message: str) -> None:
    logger.warning(
        "schema-config node %d for %r %s; node ignored", index, collection, message
    )
