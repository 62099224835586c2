"""Declarative config loader (reference from_config_file, runner.py:111-117)."""

from __future__ import annotations

import json

import pytest

from neo4j_graphrag_python_spark.config import (
    ConfigError,
    load_pipeline_config,
    pipeline_config_from_dict,
)


def test_defaults_from_empty() -> None:
    cfg, schema = pipeline_config_from_dict({})
    assert cfg.perform_entity_resolution is True
    assert cfg.splitter.chunk_size == 4000
    assert schema is None


def test_full_yaml_roundtrip(tmp_path) -> None:
    yml = """
splitter:
  chunk_size: 600
  chunk_overlap: 200
  approximate: false
lexical:
  chunk_node_label: Chunklet
on_error: RAISE
perform_entity_resolution: false
schema:
  node_types:
    - label: Person
      properties: [{name: name, type: STRING}]
    - Company
  relationship_types: [WORKS_FOR]
  patterns:
    - [Person, WORKS_FOR, Company]
"""
    p = tmp_path / "pipeline.yaml"
    p.write_text(yml)
    cfg, schema = load_pipeline_config(p)
    assert cfg.splitter.chunk_size == 600 and cfg.splitter.approximate is False
    assert cfg.lexical.chunk_node_label == "Chunklet"
    assert cfg.on_error == "RAISE" and cfg.perform_entity_resolution is False
    assert schema is not None
    assert schema.node_type_from_label("Person") is not None
    assert schema.node_type_from_label("Company") is not None


def test_json_config(tmp_path) -> None:
    p = tmp_path / "pipeline.json"
    p.write_text(json.dumps({"splitter": {"chunk_size": 100, "chunk_overlap": 10}}))
    cfg, _ = load_pipeline_config(p)
    assert cfg.splitter.chunk_size == 100


def test_unknown_key_rejected() -> None:
    with pytest.raises(ConfigError, match="unknown"):
        pipeline_config_from_dict({"splitter": {"chunk_sise": 100}})
    with pytest.raises(ConfigError, match="unknown"):
        pipeline_config_from_dict({"not_a_knob": 1})


def test_invalid_values_rejected() -> None:
    with pytest.raises(ConfigError):
        pipeline_config_from_dict({"splitter": {"chunk_size": -1}})
    with pytest.raises(ConfigError):
        pipeline_config_from_dict({"on_error": "EXPLODE"})
    with pytest.raises(ConfigError):
        pipeline_config_from_dict({"schema": {"node_types": [123]}})


def test_bad_extension(tmp_path) -> None:
    p = tmp_path / "pipeline.toml"
    p.write_text("x = 1")
    with pytest.raises(ConfigError, match="extension"):
        load_pipeline_config(p)


def test_config_drives_pipeline(spark, tmp_path) -> None:
    """A config file end-to-end: loaded knobs visibly change pipeline
    behavior (no resolution → mentions stay unmerged)."""
    from neo4j_graphrag_python_spark.operators.extractor import (
        demo_rules,
        regex_extractor,
    )
    from neo4j_graphrag_python_spark.plans.pipeline import run_kg_pipeline
    from neo4j_graphrag_python_spark.transcripts import ensure_transcripts

    p = tmp_path / "p.yaml"
    p.write_text(
        "splitter: {chunk_size: 600, chunk_overlap: 200}\n"
        "perform_entity_resolution: false\n"
    )
    cfg, schema = load_pipeline_config(p)
    t = spark.read.parquet(ensure_transcripts("/root/testdata/sf0.001"))
    res = run_kg_pipeline(t, regex_extractor(demo_rules()), config=cfg)
    assert res.resolution_stats is None
    from pyspark.sql import functions as F

    n_entities = res.nodes.where(F.col("is_entity")).count()
    assert n_entities > 36  # unresolved mentions ≫ canonical entity count
