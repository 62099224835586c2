"""Metadata-filter DSL → Catalyst Column compiler.

Reference: ``neo4j_graphrag/filters.py:26-369`` — a dict DSL compiled to a
Cypher WHERE clause.  Same semantics, compiled to a pyspark Column instead
(predicates stay in the JVM and push down to parquet scans):

  * ``{"field": value}``                → equality
  * ``{"field": {"$op": value}}``       → one of $eq $ne $lt $lte $gt $gte
    $in $nin $like $ilike $between
  * ``{"$and": [...]}`` / ``{"$or": [...]}``; a multi-key dict is an
    implicit AND (filters.py:319-323)
  * ``$like``  → CONTAINS with a trailing ``%`` stripped (filters.py:108-114)
  * ``$ilike`` → lowercases both sides (filters.py:117-124)
  * ``$between`` → low <= field <= high (filters.py:285-295)

Validation errors mirror the reference's FilterValidationError cases.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Callable

from pyspark.sql import Column, functions as F


class FilterValidationError(ValueError):
    pass


OPERATOR_PREFIX = "$"
OPERATOR_AND = "$and"
OPERATOR_OR = "$or"


def _clean_in(value: Any) -> list:
    if not isinstance(value, (list, tuple)):
        raise FilterValidationError(f"$in/$nin expect a list, got {type(value)}")
    for v in value:
        if not isinstance(v, (str, int, float)):
            raise FilterValidationError(
                f"Unsupported type: {type(v)} for value: {v}"
            )
    return list(value)


def _clean_like(value: Any) -> str:
    if not isinstance(value, str):
        raise FilterValidationError(
            f"Expected string value, got {type(value)}: {value}"
        )
    return value.rstrip("%")


_SIMPLE_OPS: dict[str, Callable[[Column, Any], Column]] = {
    "$eq": lambda c, v: c == v,
    "$ne": lambda c, v: c != v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$in": lambda c, v: c.isin(_clean_in(v)),
    "$nin": lambda c, v: ~c.isin(_clean_in(v)),
    "$like": lambda c, v: c.contains(_clean_like(v)),
    "$ilike": lambda c, v: F.lower(c).contains(_clean_like(v).lower()),
}

SUPPORTED_OPERATORS = set(_SIMPLE_OPS) | {"$between"}


def _field_filter(field: str, value: Any, col_fn) -> Column:
    if not isinstance(field, str):
        raise FilterValidationError(
            f"Field should be a string but got: {type(field)} with value: {field}"
        )
    if field.startswith(OPERATOR_PREFIX):
        raise FilterValidationError(
            f"Invalid filter condition. Expected a field but got an operator: {field}"
        )
    if isinstance(value, dict):
        if len(value) != 1:
            raise FilterValidationError(
                "Invalid filter condition. Expected a single-operator dict, "
                f"got {len(value)} keys"
            )
        operator, filter_value = list(value.items())[0]
        operator = operator.lower()
        if operator not in SUPPORTED_OPERATORS:
            raise FilterValidationError(
                f"Invalid operator: {operator}. Expected one of "
                f"{sorted(SUPPORTED_OPERATORS)}"
            )
    else:
        operator, filter_value = "$eq", value

    col = col_fn(field)
    if operator == "$between":
        if not isinstance(filter_value, (list, tuple)) or len(filter_value) != 2:
            raise FilterValidationError(
                f"Expected lower and upper bounds in a list, got {filter_value}"
            )
        low, high = filter_value
        return (F.lit(low) <= col) & (col <= F.lit(high))
    return _SIMPLE_OPS[operator](col, filter_value)


def filter_to_column(
    filter: dict[str, Any], col_fn: Callable[[str], Column] | None = None
) -> Column:
    """Compile a filter dict to a boolean Column.

    ``col_fn`` maps a field name to a Column — default ``F.col``; pass e.g.
    ``lambda f: F.col("properties").getItem(f)`` to filter graph-node
    property bags.
    """
    col_fn = col_fn or F.col
    if not isinstance(filter, dict):
        raise FilterValidationError(f"Filter must be a dictionary, got {type(filter)}")
    if len(filter) > 1:
        # implicit AND (reference filters.py:319-323)
        return filter_to_column(
            {OPERATOR_AND: [{k: v} for k, v in filter.items()]}, col_fn
        )
    if not filter:
        raise FilterValidationError("Filter must not be empty")
    key, value = list(filter.items())[0]
    if not key.startswith(OPERATOR_PREFIX):
        return _field_filter(key, value, col_fn)
    if not isinstance(value, list):
        raise FilterValidationError(
            f"Expected a list, but got {type(value)} for value: {value}"
        )
    parts = [filter_to_column(el, col_fn) for el in value]
    if not parts:
        raise FilterValidationError(f"{key} requires a non-empty list")
    if key.lower() == OPERATOR_AND:
        return reduce(lambda a, b: a & b, parts)
    if key.lower() == OPERATOR_OR:
        return reduce(lambda a, b: a | b, parts)
    raise FilterValidationError(f"Unsupported operator: {key}")
