"""Tool/parameter schemas (Q9) — mirrors reference tests/unit/tool/test_tool.py."""

from __future__ import annotations

import pytest

from neo4j_graphrag_python_spark.tools import (
    ArrayParameter,
    BooleanParameter,
    IntegerParameter,
    NumberParameter,
    ObjectParameter,
    StringParameter,
    Tool,
    ToolParameter,
    ToolParameterError,
    retriever_as_tool,
)


def test_string_parameter() -> None:
    p = StringParameter(description="A string", required=True, enum=["a", "b"])
    d = p.model_dump_tool()
    assert d == {
        "type": "string",
        "description": "A string",
        "required": True,
        "enum": ["a", "b"],
    }


def test_integer_and_number_bounds() -> None:
    d = IntegerParameter(description="An int", minimum=0, maximum=10).model_dump_tool()
    assert d["type"] == "integer" and d["minimum"] == 0 and d["maximum"] == 10
    d = NumberParameter(description="A number", minimum=1.5, maximum=3.5).model_dump_tool()
    assert d["type"] == "number" and d["minimum"] == 1.5 and d["maximum"] == 3.5


def test_boolean_parameter() -> None:
    d = BooleanParameter(description="A bool").model_dump_tool()
    assert d == {"type": "boolean", "description": "A bool"}


def test_array_parameter_and_validation() -> None:
    arr = ArrayParameter(
        description="An array",
        items=StringParameter(description="str"),
        min_items=1,
        max_items=5,
    )
    d = arr.model_dump_tool()
    assert d["type"] == "array"
    assert d["items"]["type"] == "string"
    assert d["minItems"] == 1 and d["maxItems"] == 5
    # dict items promoted recursively (reference _preprocess_items)
    arr2 = ArrayParameter(
        description="arr", items={"type": "integer", "description": "i"}
    )
    assert isinstance(arr2.items, IntegerParameter)
    with pytest.raises(ToolParameterError):
        ArrayParameter(description="bad", items="nope")


def test_object_parameter_and_validation() -> None:
    obj = ObjectParameter(
        description="An object",
        properties={
            "name": StringParameter(description="n"),
            "age": {"type": "integer", "description": "a"},
        },
        required_properties=["name"],
        additional_properties=False,
    )
    assert isinstance(obj.properties["age"], IntegerParameter)
    d = obj.model_dump_tool()
    assert d["type"] == "object"
    assert d["properties"]["name"]["type"] == "string"
    assert d["required"] == ["name"]
    assert d["additionalProperties"] is False
    # exclude drops named properties and the required list
    d2 = obj.model_dump_tool(exclude=["age", "required"])
    assert "age" not in d2["properties"] and "required" not in d2
    with pytest.raises(ToolParameterError):
        ObjectParameter(description="bad", properties={"x": 42})


def test_from_dict_dispatch() -> None:
    p = ToolParameter.from_dict(
        {"type": "string", "description": "s", "enum": ["x"]}
    )
    assert isinstance(p, StringParameter) and p.enum == ["x"]
    with pytest.raises(ToolParameterError, match="type is required"):
        ToolParameter.from_dict({"description": "no type"})
    with pytest.raises(ToolParameterError, match="Unknown parameter type"):
        ToolParameter.from_dict({"type": "tuple", "description": "?"})


def test_tool_class_with_dict_parameters() -> None:
    calls = []

    def exec_fn(**kwargs):
        calls.append(kwargs)
        return "ok"

    t = Tool(
        name="search",
        description="find things",
        parameters={
            "type": "object",
            "description": "params",
            "properties": {"q": {"type": "string", "description": "query"}},
            "required_properties": ["q"],
        },
        execute_func=exec_fn,
    )
    assert t.get_name() == "search" and t.get_description() == "find things"
    schema = t.get_parameters()
    assert schema["properties"]["q"]["type"] == "string"
    assert t.execute(q="hello") == "ok"
    assert calls == [{"q": "hello"}]


def test_retriever_as_tool(spark) -> None:
    """A Spark retriever wrapped as a tool: schema for the LLM, DataFrame
    out of execute()."""
    from neo4j_graphrag_python_spark.functions.embedding import embed_text
    from neo4j_graphrag_python_spark.retrievers import vector_search
    from neo4j_graphrag_python_spark.types import NODES_SCHEMA

    nodes = spark.createDataFrame(
        [
            ("n0", "Person", True, {"name": "Alice"},
             [float(x) for x in embed_text("Alice")], "c", "u"),
        ],
        NODES_SCHEMA,
    )
    tool = retriever_as_tool(
        "vector_search",
        "cosine top-k over entity embeddings",
        lambda query_text, top_k=5: vector_search(
            nodes, query_text=query_text, top_k=top_k
        ),
    )
    schema = tool.get_parameters()
    assert schema["required"] == ["query_text"]
    assert schema["additionalProperties"] is False
    res = tool.execute(query_text="Alice", top_k=1)
    assert res.collect()[0]["id"] == "n0"
