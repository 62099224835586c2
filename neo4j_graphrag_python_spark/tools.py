"""Tool / parameter schemas for LLM tool-calling (Q9).

Reference: tool.py (typed parameter classes with ``model_dump_tool``
producing the provider-facing JSON-schema dict, ``ToolParameter.from_dict``
dispatch by type, and the ``Tool`` wrapper binding name/description/
parameters to an execute callable; :7-265).

Re-derived as frozen-ish dataclasses (this repo's convention — pydantic is
not a dependency; schema.py made the same trade).  Semantics preserved:

  * from_dict dispatches on ``type`` and rejects unknown types;
  * nested dict parameters are promoted to typed parameters recursively
    (objects' properties, arrays' items);
  * model_dump_tool emits exactly the reference's key set, including the
    camelCase JSON-schema keys (minItems/maxItems/additionalProperties)
    and the per-parameter ``required`` flag;
  * ObjectParameter.model_dump_tool honors ``exclude``.

The natural Spark tool is a retriever: ``retriever_as_tool`` wraps any
(spark, **params) → DataFrame callable with a declared parameter schema,
which is what an agentic GraphRAG loop hands to the LLM.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


class ToolParameterError(ValueError):
    pass


@dataclass
class ToolParameter:
    description: str
    required: bool = False

    type: str = ""  # set by subclasses

    def model_dump_tool(self) -> dict[str, Any]:
        out: dict[str, Any] = {"type": self.type, "description": self.description}
        if self.required:
            out["required"] = True
        return out

    @staticmethod
    def from_dict(data: dict[str, Any]) -> "ToolParameter":
        if not isinstance(data, dict):
            raise ToolParameterError(f"parameter must be a dict, got {type(data)}")
        ptype = data.get("type")
        if not ptype:
            raise ToolParameterError("Parameter type is required")
        classes: dict[str, type] = {
            "string": StringParameter,
            "integer": IntegerParameter,
            "number": NumberParameter,
            "boolean": BooleanParameter,
            "object": ObjectParameter,
            "array": ArrayParameter,
        }
        cls = classes.get(ptype)
        if cls is None:
            raise ToolParameterError(f"Unknown parameter type: {ptype}")
        kwargs = {k: v for k, v in data.items() if k != "type"}
        return cls(**kwargs)


@dataclass
class StringParameter(ToolParameter):
    enum: list[str] | None = None
    type: str = "string"

    def model_dump_tool(self) -> dict[str, Any]:
        out = ToolParameter.model_dump_tool(self)
        if self.enum:
            out["enum"] = self.enum
        return out


@dataclass
class IntegerParameter(ToolParameter):
    minimum: int | None = None
    maximum: int | None = None
    type: str = "integer"

    def model_dump_tool(self) -> dict[str, Any]:
        out = ToolParameter.model_dump_tool(self)
        if self.minimum is not None:
            out["minimum"] = self.minimum
        if self.maximum is not None:
            out["maximum"] = self.maximum
        return out


@dataclass
class NumberParameter(ToolParameter):
    minimum: float | None = None
    maximum: float | None = None
    type: str = "number"

    def model_dump_tool(self) -> dict[str, Any]:
        out = ToolParameter.model_dump_tool(self)
        if self.minimum is not None:
            out["minimum"] = self.minimum
        if self.maximum is not None:
            out["maximum"] = self.maximum
        return out


@dataclass
class BooleanParameter(ToolParameter):
    type: str = "boolean"


@dataclass
class ArrayParameter(ToolParameter):
    items: "ToolParameter | dict[str, Any] | None" = None
    min_items: int | None = None
    max_items: int | None = None
    type: str = "array"

    def __post_init__(self) -> None:
        if isinstance(self.items, dict):
            self.items = ToolParameter.from_dict(self.items)
        if not isinstance(self.items, ToolParameter):
            raise ToolParameterError(
                f"Items must be a ToolParameter or dict, got {type(self.items)}"
            )

    def model_dump_tool(self) -> dict[str, Any]:
        out = ToolParameter.model_dump_tool(self)
        out["items"] = self.items.model_dump_tool()
        if self.min_items is not None:
            out["minItems"] = self.min_items
        if self.max_items is not None:
            out["maxItems"] = self.max_items
        return out


@dataclass
class ObjectParameter(ToolParameter):
    properties: dict[str, Any] = field(default_factory=dict)
    required_properties: list[str] = field(default_factory=list)
    additional_properties: bool = True
    type: str = "object"

    def __post_init__(self) -> None:
        promoted = {}
        for name, p in self.properties.items():
            if isinstance(p, dict):
                promoted[name] = ToolParameter.from_dict(p)
            elif isinstance(p, ToolParameter):
                promoted[name] = p
            else:
                raise ToolParameterError(
                    f"Property {name} must be a ToolParameter or dict, got {type(p)}"
                )
        self.properties = promoted

    def model_dump_tool(self, exclude: list[str] | None = None) -> dict[str, Any]:
        exclude = exclude or []
        out = ToolParameter.model_dump_tool(self)
        out["properties"] = {
            name: p.model_dump_tool()
            for name, p in self.properties.items()
            if name not in exclude
        }
        if self.required_properties and "required" not in exclude:
            out["required"] = self.required_properties
        if not self.additional_properties and "additional_properties" not in exclude:
            out["additionalProperties"] = False
        return out


class Tool:
    """Name + description + parameter schema + execute callable
    (reference tool.py:211-265)."""

    def __init__(
        self,
        name: str,
        description: str,
        parameters: "ObjectParameter | dict[str, Any]",
        execute_func: Callable[..., Any],
    ) -> None:
        self._name = name
        self._description = description
        if isinstance(parameters, dict):
            param = ToolParameter.from_dict(parameters)
            if not isinstance(param, ObjectParameter):
                raise ToolParameterError("tool parameters must be an object schema")
            parameters = param
        self._parameters = parameters
        self._execute_func = execute_func

    def get_name(self) -> str:
        return self._name

    def get_description(self) -> str:
        return self._description

    def get_parameters(self, exclude: list[str] | None = None) -> dict[str, Any]:
        return self._parameters.model_dump_tool(exclude)

    def execute(self, **kwargs: Any) -> Any:
        return self._execute_func(**kwargs)


def retriever_as_tool(
    name: str,
    description: str,
    retriever_fn: Callable[..., Any],
    parameters: "ObjectParameter | dict[str, Any] | None" = None,
) -> Tool:
    """Wrap a retriever callable as a Tool with a default
    (query_text, top_k) schema — the shape an agentic GraphRAG loop hands
    to an LLM for tool-calling."""
    params = parameters or {
        "type": "object",
        "description": "retriever parameters",
        "properties": {
            "query_text": {
                "type": "string",
                "description": "natural-language query",
                "required": True,
            },
            "top_k": {
                "type": "integer",
                "description": "number of results",
                "minimum": 1,
                "maximum": 1000,
            },
        },
        "required_properties": ["query_text"],
        "additional_properties": False,
    }
    return Tool(name, description, params, retriever_fn)
