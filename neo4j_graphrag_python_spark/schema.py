"""Graph schema — the extraction-guidance and pruning contract.

Semantics ported from the reference ``experimental/components/schema.py``:
  * ``PropertyType``            — schema.py:49-75
  * ``NodeType``                — schema.py:78-112
  * ``RelationshipType``        — schema.py:115-142
  * ``GraphSchema``             — schema.py:145-290

The object is driver-side and immutable; executors receive it by closure
capture inside pandas UDFs (it is tiny).  The property-type vocabulary maps
onto Spark types when typed columns are materialized (SURVEY.md §1.2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable, Optional, Sequence, Union

ALLOWED_PROPERTY_TYPES = frozenset(
    {
        "BOOLEAN",
        "DATE",
        "DURATION",
        "FLOAT",
        "INTEGER",
        "LIST",
        "LOCAL_DATETIME",
        "LOCAL_TIME",
        "POINT",
        "STRING",
        "ZONED_DATETIME",
        "ZONED_TIME",
    }
)


class SchemaValidationError(ValueError):
    pass


@dataclass(frozen=True)
class PropertyType:
    """A typed, optionally-required property (reference schema.py:49-75)."""

    name: str
    type: str = "STRING"
    description: str = ""
    required: bool = False

    def __post_init__(self) -> None:
        if self.type not in ALLOWED_PROPERTY_TYPES:
            raise SchemaValidationError(
                f"invalid property type {self.type!r}; "
                f"allowed: {sorted(ALLOWED_PROPERTY_TYPES)}"
            )

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "type": self.type,
            "description": self.description,
            "required": self.required,
        }


def _parse_properties(props: Iterable[Any]) -> tuple[PropertyType, ...]:
    out = []
    for p in props:
        if isinstance(p, PropertyType):
            out.append(p)
        else:
            out.append(
                PropertyType(
                    name=p["name"],
                    type=p.get("type", "STRING"),
                    description=p.get("description", ""),
                    required=bool(p.get("required", False)),
                )
            )
    return tuple(out)


@dataclass(frozen=True)
class NodeType:
    """Entity type (reference schema.py:85-112).

    ``additional_properties`` defaults to True iff no properties are declared
    (schema.py:93-95); declaring zero properties with
    ``additional_properties=False`` is invalid (schema.py:104-112).
    """

    label: str
    description: str = ""
    properties: tuple[PropertyType, ...] = ()
    additional_properties: Optional[bool] = None

    def __post_init__(self) -> None:
        object.__setattr__(self, "properties", _parse_properties(self.properties))
        if self.additional_properties is None:
            object.__setattr__(
                self, "additional_properties", len(self.properties) == 0
            )
        if not self.additional_properties and not self.properties:
            raise SchemaValidationError(
                f"NodeType {self.label!r}: additional_properties=False requires "
                "at least one defined property"
            )

    @classmethod
    def coerce(cls, value: Union[str, dict[str, Any], "NodeType"]) -> "NodeType":
        # plain string coerced to {label: s} (reference schema.py:97-102)
        if isinstance(value, cls):
            return value
        if isinstance(value, str):
            return cls(label=value)
        return cls(
            label=value["label"],
            description=value.get("description", ""),
            properties=_parse_properties(value.get("properties", ())),
            additional_properties=value.get("additional_properties"),
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "label": self.label,
            "description": self.description,
            "properties": [p.to_dict() for p in self.properties],
            "additional_properties": self.additional_properties,
        }


@dataclass(frozen=True)
class RelationshipType:
    """Relationship type — same shape as NodeType (reference schema.py:115-142)."""

    label: str
    description: str = ""
    properties: tuple[PropertyType, ...] = ()
    additional_properties: Optional[bool] = None

    def __post_init__(self) -> None:
        object.__setattr__(self, "properties", _parse_properties(self.properties))
        if self.additional_properties is None:
            object.__setattr__(
                self, "additional_properties", len(self.properties) == 0
            )
        if not self.additional_properties and not self.properties:
            raise SchemaValidationError(
                f"RelationshipType {self.label!r}: additional_properties=False "
                "requires at least one defined property"
            )

    @classmethod
    def coerce(
        cls, value: Union[str, dict[str, Any], "RelationshipType"]
    ) -> "RelationshipType":
        if isinstance(value, cls):
            return value
        if isinstance(value, str):
            return cls(label=value)
        return cls(
            label=value["label"],
            description=value.get("description", ""),
            properties=_parse_properties(value.get("properties", ())),
            additional_properties=value.get("additional_properties"),
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "label": self.label,
            "description": self.description,
            "properties": [p.to_dict() for p in self.properties],
            "additional_properties": self.additional_properties,
        }


Pattern = tuple[str, str, str]  # (start_label, relationship_type, end_label)


@dataclass(frozen=True)
class GraphSchema:
    """Immutable graph schema (reference schema.py:145-290).

    Validation rules (schema.py:179-221):
      * patterns require relationship_types, and every label/type used in a
        pattern must be declared;
      * ``additional_patterns=False`` requires
        ``additional_relationship_types=False``;
      * the ``additional_*`` booleans default to True iff the corresponding
        collection is empty (schema.py:162-170).
    """

    node_types: tuple[NodeType, ...] = ()
    relationship_types: tuple[RelationshipType, ...] = ()
    patterns: tuple[Pattern, ...] = ()
    additional_node_types: Optional[bool] = None
    additional_relationship_types: Optional[bool] = None
    additional_patterns: Optional[bool] = None

    def __post_init__(self) -> None:
        object.__setattr__(
            self,
            "node_types",
            tuple(NodeType.coerce(n) for n in self.node_types),
        )
        object.__setattr__(
            self,
            "relationship_types",
            tuple(RelationshipType.coerce(r) for r in self.relationship_types),
        )
        object.__setattr__(
            self, "patterns", tuple(tuple(p) for p in self.patterns)
        )
        if self.additional_node_types is None:
            object.__setattr__(
                self, "additional_node_types", len(self.node_types) == 0
            )
        if self.additional_relationship_types is None:
            object.__setattr__(
                self,
                "additional_relationship_types",
                len(self.relationship_types) == 0,
            )
        if self.additional_patterns is None:
            object.__setattr__(self, "additional_patterns", len(self.patterns) == 0)

        if self.patterns:
            if not self.relationship_types:
                raise SchemaValidationError(
                    "patterns defined but no relationship_types declared"
                )
            node_labels = {n.label for n in self.node_types}
            rel_labels = {r.label for r in self.relationship_types}
            for start, rel, end in self.patterns:
                if rel not in rel_labels:
                    raise SchemaValidationError(
                        f"pattern relationship {rel!r} not declared"
                    )
                if start not in node_labels or end not in node_labels:
                    raise SchemaValidationError(
                        f"pattern labels ({start!r},{end!r}) not declared"
                    )
        if not self.additional_patterns and self.additional_relationship_types:
            raise SchemaValidationError(
                "additional_patterns=False requires additional_relationship_types=False"
            )

        # label → type indexes (reference schema.py:223-227)
        object.__setattr__(
            self, "_node_index", {n.label: n for n in self.node_types}
        )
        object.__setattr__(
            self, "_rel_index", {r.label: r for r in self.relationship_types}
        )

    def node_type_from_label(self, label: str) -> Optional[NodeType]:
        return self._node_index.get(label)  # type: ignore[attr-defined]

    def relationship_type_from_label(self, label: str) -> Optional[RelationshipType]:
        return self._rel_index.get(label)  # type: ignore[attr-defined]

    # -- (de)serialization — reference schema.py:229-290 -------------------

    def to_dict(self) -> dict[str, Any]:
        return {
            "node_types": [n.to_dict() for n in self.node_types],
            "relationship_types": [r.to_dict() for r in self.relationship_types],
            "patterns": [list(p) for p in self.patterns],
            "additional_node_types": self.additional_node_types,
            "additional_relationship_types": self.additional_relationship_types,
            "additional_patterns": self.additional_patterns,
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "GraphSchema":
        return cls(
            node_types=tuple(data.get("node_types", ())),
            relationship_types=tuple(data.get("relationship_types", ())),
            patterns=tuple(tuple(p) for p in data.get("patterns", ())),
            additional_node_types=data.get("additional_node_types"),
            additional_relationship_types=data.get("additional_relationship_types"),
            additional_patterns=data.get("additional_patterns"),
        )

    def save(self, path: Union[str, Path]) -> None:
        path = Path(path)
        if path.suffix in (".yaml", ".yml"):
            import yaml

            path.write_text(yaml.safe_dump(self.to_dict()))
        else:
            path.write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def load(cls, path: Union[str, Path]) -> "GraphSchema":
        path = Path(path)
        if path.suffix in (".yaml", ".yml"):
            import yaml

            return cls.from_dict(yaml.safe_load(path.read_text()))
        return cls.from_dict(json.loads(path.read_text()))


# Spark-type mapping for the property vocabulary (SURVEY.md §1.2).
SPARK_TYPE_FOR_PROPERTY = {
    "STRING": "string",
    "INTEGER": "bigint",
    "FLOAT": "double",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "ZONED_DATETIME": "timestamp",
    "LOCAL_DATETIME": "timestamp_ntz",
    "DURATION": "interval day to second",
    "LIST": "array<string>",
    "POINT": "struct<x:double,y:double,srid:int>",
    "LOCAL_TIME": "string",
    "ZONED_TIME": "string",
}


def demo_schema() -> GraphSchema:
    """The FIXTURES.md §4 schema used by tests, entry() and bench."""
    return GraphSchema(
        node_types=(
            {
                "label": "Person",
                "properties": [{"name": "name", "type": "STRING", "required": True}],
            },
            {"label": "Organization", "properties": [{"name": "name"}]},
            {"label": "Location", "properties": [{"name": "name"}]},
        ),
        relationship_types=("WORKS_FOR", "LOCATED_IN", "KNOWS"),
        patterns=(
            ("Person", "WORKS_FOR", "Organization"),
            ("Organization", "LOCATED_IN", "Location"),
            ("Person", "KNOWS", "Person"),
        ),
    )
