"""Filter DSL → Column compiler (reference filters.py semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graphrag_python_spark.functions.filters import (
    FilterValidationError,
    filter_to_column,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "Alice", 30, "Paris"),
            (2, "Bob", 25, "Berlin"),
            (3, "carol", 35, "London"),
            (4, "Dave", 40, None),
        ],
        ["id", "name", "age", "city"],
    )


def ids(df, cond):
    return sorted(r["id"] for r in df.where(cond).collect())


def test_eq_implicit(people) -> None:
    assert ids(people, filter_to_column({"name": "Alice"})) == [1]


def test_implicit_and_multi_key(people) -> None:
    assert ids(people, filter_to_column({"age": {"$gte": 30}, "city": "Paris"})) == [1]


def test_comparisons(people) -> None:
    assert ids(people, filter_to_column({"age": {"$lt": 30}})) == [2]
    assert ids(people, filter_to_column({"age": {"$lte": 30}})) == [1, 2]
    assert ids(people, filter_to_column({"age": {"$gt": 35}})) == [4]
    assert ids(people, filter_to_column({"age": {"$ne": 30}})) == [2, 3, 4]


def test_in_nin(people) -> None:
    assert ids(people, filter_to_column({"city": {"$in": ["Paris", "Berlin"]}})) == [1, 2]
    assert ids(people, filter_to_column({"city": {"$nin": ["Paris", "Berlin"]}})) == [3]


def test_between(people) -> None:
    assert ids(people, filter_to_column({"age": {"$between": [25, 32]}})) == [1, 2]


def test_like_strips_percent(people) -> None:
    assert ids(people, filter_to_column({"name": {"$like": "Ali%"}})) == [1]


def test_ilike_lowercases_both(people) -> None:
    assert ids(people, filter_to_column({"name": {"$ilike": "CAROL%"}})) == [3]


def test_and_or(people) -> None:
    f = {"$or": [{"name": "Alice"}, {"$and": [{"age": {"$gte": 35}}, {"city": "London"}]}]}
    assert ids(people, filter_to_column(f)) == [1, 3]


@pytest.mark.parametrize(
    "bad",
    [
        {"$unknown": [{"a": 1}]},
        {"name": {"$regex": "x"}},
        {"name": {"$eq": 1, "$ne": 2}},
        {"$and": "not-a-list"},
        {"$eq": 1},
        "not-a-dict",
        {},
    ],
)
def test_validation_errors(bad) -> None:
    with pytest.raises(FilterValidationError):
        filter_to_column(bad)  # type: ignore[arg-type]


def test_property_bag_col_fn(spark) -> None:
    df = spark.createDataFrame(
        [(1, {"name": "Alice"}), (2, {"name": "Bob"})],
        "id int, properties map<string,string>",
    )
    cond = filter_to_column(
        {"name": {"$ilike": "alice"}}, lambda f: F.col("properties").getItem(f)
    )
    assert [r["id"] for r in df.where(cond).collect()] == [1]
