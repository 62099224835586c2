"""End-to-end KG pipeline on synthetic transcripts: lexical graph shape,
triple P/R ≥ 0.95 vs ground truth, per-turn lineage invariant, resume."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from neo4j_graphrag_python_spark import transcripts as tr
from neo4j_graphrag_python_spark.operators.extractor import demo_rules, regex_extractor
from neo4j_graphrag_python_spark.plans.pipeline import (
    run_kg_pipeline,
    triples_view,
)
from neo4j_graphrag_python_spark.schema import demo_schema
from neo4j_graphrag_python_spark.types import PipelineConfig, SplitterConfig

SF = 0.0005  # ~100 conversations — fast but non-trivial


@pytest.fixture(scope="module")
def transcripts_df(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("fixtures") / "transcripts.parquet"
    tr.write_transcripts(path, SF)
    return spark.read.parquet(str(path))


@pytest.fixture(scope="module")
def kg(transcripts_df):
    cfg = PipelineConfig(
        splitter=SplitterConfig(chunk_size=600, chunk_overlap=200, approximate=True)
    )
    result = run_kg_pipeline(
        transcripts_df,
        regex_extractor(demo_rules()),
        schema=demo_schema(),
        config=cfg,
    )
    result.nodes = result.nodes.cache()
    result.edges = result.edges.cache()
    return result


def test_triples_match_ground_truth(kg) -> None:
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in triples_view(kg.nodes, kg.edges).collect()
    }
    expected = tr.expected_triples(SF)
    assert expected, "fixture must plant triples"
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected)
    assert precision >= 0.95, f"precision {precision} (got {len(got)}, tp {tp})"
    assert recall >= 0.95, f"recall {recall}"
    # with chunk-overlap-safe sentence lengths this should be exact
    assert got == expected


def test_lexical_graph_shape(kg, transcripts_df) -> None:
    n_convs = transcripts_df.select("conv_id").distinct().count()
    labels = {
        r["label"]: r["count"]
        for r in kg.nodes.groupBy("label").count().collect()
    }
    assert labels["Document"] == n_convs
    assert labels["Chunk"] >= n_convs  # ≥1 chunk per conversation
    types = {
        r["type"]: r["count"]
        for r in kg.edges.groupBy("type").count().collect()
    }
    assert types["FROM_DOCUMENT"] == labels["Chunk"]
    assert types["NEXT_CHUNK"] == labels["Chunk"] - n_convs
    assert types.get("FROM_CHUNK", 0) > 0
    # entity nodes exist and carry names
    assert labels.get("Person", 0) > 0


def test_edges_are_deduped_and_canonical(kg) -> None:
    dupes = (
        kg.edges.groupBy("start_node_id", "type", "end_node_id")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dupes == 0
    # every entity edge endpoint resolves to an existing node
    non_lex = kg.edges.where(
        ~F.col("type").isin(["FROM_DOCUMENT", "NEXT_CHUNK", "FROM_CHUNK"])
    )
    ids = kg.nodes.select(F.col("id").alias("nid"))
    dangling = (
        non_lex.join(ids, non_lex.start_node_id == ids.nid, "left_anti").count()
        + non_lex.join(ids, non_lex.end_node_id == ids.nid, "left_anti").count()
    )
    assert dangling == 0


def test_resolution_stats(kg) -> None:
    stats = kg.resolution_stats
    assert stats is not None
    assert stats.number_of_nodes_to_resolve > stats.number_of_created_nodes > 0


def test_checkpointed_run_and_resume(transcripts_df, tmp_path) -> None:
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(
        splitter=SplitterConfig(chunk_size=600, chunk_overlap=200),
        checkpoint_dir=ckpt,
    )
    r1 = run_kg_pipeline(
        transcripts_df, regex_extractor(demo_rules()), demo_schema(), cfg
    )
    t1 = sorted(
        (r["subj"], r["pred"], r["obj"])
        for r in triples_view(r1.nodes, r1.edges).collect()
    )
    assert (Path(ckpt) / "graph_rows" / "_SUCCESS").exists()
    # second run reuses checkpoints (idempotent resume) → identical output
    r2 = run_kg_pipeline(
        transcripts_df, regex_extractor(demo_rules()), demo_schema(), cfg
    )
    t2 = sorted(
        (r["subj"], r["pred"], r["obj"])
        for r in triples_view(r2.nodes, r2.edges).collect()
    )
    assert t1 == t2


def _node_rows(nodes) -> set:
    return {
        (r["id"], r["label"], r["is_entity"],
         tuple(sorted((r["properties"] or {}).items())))
        for r in nodes.collect()
    }


def _bucket_digests(out_dir: Path, buckets) -> dict[int, tuple]:
    """Per-bucket sorted (name, md5) of every data file — byte identity."""
    import hashlib

    digests = {}
    for b in buckets:
        files = sorted((out_dir / f"_bucket={b}").glob("*.parquet"))
        digests[b] = tuple(
            (f.name, hashlib.md5(f.read_bytes()).hexdigest()) for f in files
        )
        assert digests[b], f"bucket {b} has no data files"
    return digests


def test_pipeline_killed_mid_run_resumes_byte_identical(
    spark, transcripts_df, tmp_path
) -> None:
    """Full-pipeline kill-and-resume e2e (VERDICT r3 #7).

    Phase 1 kills the pipeline AFTER the chunks checkpoint commits (the
    extractor poisons every chunk under OnError.RAISE).  Phase 2 re-runs
    with a working extractor: the committed chunks stage must be reused
    (its _SUCCESS mtime does not move), and the output must equal an
    uninterrupted run's.  Phase 3 crashes the resumable SINK between
    bucket commits (manifests + files for two buckets removed): the
    re-run must rewrite only those buckets, leave every completed
    bucket's parquet files byte-identical, and read back equal to the
    uninterrupted run.
    """
    from neo4j_graphrag_python_spark.operators.writer import (
        read_resumable,
        write_resumable,
    )

    splitter = SplitterConfig(chunk_size=600, chunk_overlap=200)

    # --- uninterrupted reference run ---------------------------------
    r_ok = run_kg_pipeline(
        transcripts_df,
        regex_extractor(demo_rules()),
        demo_schema(),
        PipelineConfig(splitter=splitter,
                       checkpoint_dir=str(tmp_path / "ckpt_ok")),
    )
    expected_rows = _node_rows(r_ok.nodes)

    # --- phase 1: die after the chunks stage commits ------------------
    ckpt = tmp_path / "ckpt_crash"

    def poisoned(texts):
        # json-repair can balance bare braces into a valid empty graph, so
        # poison with a SHAPE violation instead: nodes must be a list
        return ['{"nodes": 5, "relationships": []}' for _ in texts]

    with pytest.raises(Exception, match="improper format"):
        run_kg_pipeline(
            transcripts_df,
            poisoned,
            demo_schema(),
            PipelineConfig(splitter=splitter, checkpoint_dir=str(ckpt),
                           on_error="RAISE"),
        )
    chunks_marker = ckpt / "chunks" / "_SUCCESS"
    assert chunks_marker.exists(), "chunks stage should have committed"
    assert not (ckpt / "graph_rows" / "_SUCCESS").exists()
    chunks_mtime = chunks_marker.stat().st_mtime_ns

    # --- phase 2: resume from the checkpoint with a good extractor ----
    r_resumed = run_kg_pipeline(
        transcripts_df,
        regex_extractor(demo_rules()),
        demo_schema(),
        PipelineConfig(splitter=splitter, checkpoint_dir=str(ckpt)),
    )
    assert chunks_marker.stat().st_mtime_ns == chunks_mtime, (
        "resume must reuse the committed chunks stage, not resplit"
    )
    assert (ckpt / "graph_rows" / "_SUCCESS").exists()
    assert _node_rows(r_resumed.nodes) == expected_rows

    # --- phase 3: crash the resumable sink between bucket commits -----
    out = tmp_path / "nodes_out"
    first = write_resumable(r_resumed.nodes, str(out), "id", num_buckets=8)
    assert sorted(first["written"]) == list(range(8))
    # simulate a crash that killed the job after 6 of 8 buckets committed
    import shutil

    lost = [1, 5]
    for b in lost:
        (out / "_manifest" / f"{b}.json").unlink()
        shutil.rmtree(out / f"_bucket={b}")
    survivors = [b for b in range(8) if b not in lost]
    before = _bucket_digests(out, survivors)

    second = write_resumable(r_resumed.nodes, str(out), "id", num_buckets=8)
    assert sorted(second["written"]) == lost
    assert second["skipped"] == survivors
    assert _bucket_digests(out, survivors) == before, (
        "completed buckets must not be rewritten on resume"
    )
    assert _node_rows(read_resumable(spark, str(out))) == expected_rows


def test_metrics_collection_and_log(spark, transcripts_df, tmp_path) -> None:
    """collect_metrics populates stage walls + status/chunk counts and
    appends a (run_ts, metric, value) batch to <ckpt>/metrics_log per
    attempt — the resumed run adds a second batch (attempt history)."""
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(
        splitter=SplitterConfig(chunk_size=600, chunk_overlap=200),
        checkpoint_dir=ckpt,
        collect_metrics=True,
    )
    r1 = run_kg_pipeline(
        transcripts_df, regex_extractor(demo_rules()), demo_schema(), cfg
    )
    m = r1.metrics
    assert m["extract_s"] > 0 and "prune_s" in m
    assert m["rows_ok"] > 0 and m["rows_error"] == 0
    assert m["n_chunks"] > 0
    assert m["nodes_to_resolve"] > m["nodes_created"] > 0
    log = spark.read.parquet(str(Path(ckpt) / "metrics_log"))
    assert log.columns == ["run_ts", "metric", "value"]
    assert log.count() == len(m)
    # resume appends a second attempt's batch
    r2 = run_kg_pipeline(
        transcripts_df, regex_extractor(demo_rules()), demo_schema(), cfg
    )
    log2 = spark.read.parquet(str(Path(ckpt) / "metrics_log"))
    assert log2.count() == len(m) + len(r2.metrics)
    assert log2.select("run_ts").distinct().count() == 2
    # same counts both attempts (idempotent resume), only walls differ
    for key in ("rows_ok", "n_chunks", "nodes_created"):
        assert r2.metrics[key] == m[key]


def test_metrics_off_by_default(kg) -> None:
    assert kg.metrics == {}
