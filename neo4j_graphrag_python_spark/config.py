"""Declarative pipeline configuration — the reference's config-file runner.

Reference: experimental/pipeline/config/runner.py:95-131
(``PipelineRunner.from_config_file``: read JSON/YAML → validate → build
the pipeline) and the template config objects under
experimental/pipeline/config/template_pipeline/.  Spark-first: a config
file deserializes into the same ``PipelineConfig`` / ``GraphSchema``
dataclasses the programmatic API uses, then ``run_kg_pipeline`` consumes
them — no separate orchestration layer to configure, because the DAG is
the lazy Spark plan.

Unknown keys fail loudly (the reference's pydantic models also reject
extras) so a typo'd knob can't silently fall back to defaults.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

from neo4j_graphrag_python_spark.schema import GraphSchema
from neo4j_graphrag_python_spark.types import (
    LexicalGraphConfig,
    PipelineConfig,
    SplitterConfig,
)


class ConfigError(ValueError):
    pass


def _build_dataclass(cls, data: dict[str, Any], where: str):
    allowed = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data) - allowed
    if unknown:
        raise ConfigError(
            f"unknown {where} option(s): {sorted(unknown)}; allowed: {sorted(allowed)}"
        )
    try:
        return cls(**data)
    except (TypeError, ValueError) as e:
        raise ConfigError(f"invalid {where} config: {e}") from e


def pipeline_config_from_dict(
    data: dict[str, Any],
) -> tuple[PipelineConfig, GraphSchema | None]:
    """Dict → (PipelineConfig, optional GraphSchema).

    Sections: ``splitter``, ``lexical``, ``schema`` (the GraphSchema
    node_types/relationship_types/patterns dict), plus top-level
    PipelineConfig scalars (on_error, perform_entity_resolution, ...).
    """
    if not isinstance(data, dict):
        raise ConfigError("pipeline config must be a mapping")
    data = dict(data)
    schema = None
    if "schema" in data:
        schema_data = data.pop("schema")
        if schema_data is not None:
            try:
                schema = GraphSchema.from_dict(schema_data)
            except Exception as e:  # noqa: BLE001
                raise ConfigError(f"invalid schema section: {e}") from e
    sub = {}
    if "splitter" in data:
        sub["splitter"] = _build_dataclass(
            SplitterConfig, data.pop("splitter") or {}, "splitter"
        )
    if "lexical" in data:
        sub["lexical"] = _build_dataclass(
            LexicalGraphConfig, data.pop("lexical") or {}, "lexical"
        )
    cfg = _build_dataclass(PipelineConfig, {**data, **sub}, "pipeline")
    if cfg.on_error not in ("IGNORE", "RAISE"):
        raise ConfigError("on_error must be IGNORE or RAISE")
    return cfg, schema


def load_pipeline_config(
    path: str | Path,
) -> tuple[PipelineConfig, GraphSchema | None]:
    """Read a JSON or YAML pipeline config file (reference
    from_config_file, runner.py:111-117 — format chosen by extension)."""
    p = Path(path)
    text = p.read_text()
    if p.suffix.lower() in (".yaml", ".yml"):
        try:
            import yaml
        except ImportError as e:  # pragma: no cover
            raise ConfigError("pyyaml is required for YAML configs") from e
        data = yaml.safe_load(text)
    elif p.suffix.lower() == ".json":
        data = json.loads(text)
    else:
        raise ConfigError(f"unsupported config extension: {p.suffix!r}")
    return pipeline_config_from_dict(data or {})
