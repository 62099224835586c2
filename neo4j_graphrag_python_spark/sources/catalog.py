"""Catalog-table (lakehouse) targets for graph materialization.

The north-rule deployment writes the KG to **Iceberg tables** on a real
cluster; the sandbox has no Iceberg runtime jar, so everything here is
built on the format-agnostic DataFrameWriterV2 / catalog API and tested
against the session catalog with parquet-backed tables — swapping
``file_format="iceberg"`` (plus the usual Iceberg catalog confs on the
cluster) is the ONLY difference in production.  Nothing below imports or
requires Iceberg classes; capability is probed at runtime.

Reference parity: the reference's Neo4jWriter upserts nodes/relationships
into Neo4j by id (kg_writer.py:87-221, neo4j_queries.py:55-109).  On a
lakehouse the same contract is:

* ``create_or_replace``   — full materialization (initial build),
* ``append``              — blind insert (lexical chunks from new convs),
* ``merge_upsert``        — id-keyed upsert of a delta batch: MERGE INTO
  on engines with ACID row-level ops (Iceberg/Delta), and a documented
  read-union-antijoin-replace fallback for plain-file catalog tables
  (non-atomic, single-writer — exactly what parquet gives you; the
  fallback exists so the SEMANTICS are testable in this sandbox).

Scale notes: MERGE INTO on Iceberg is a distributed join between the
delta and only the data files whose key ranges overlap (copy-on-write)
— the delta side should be small relative to the table, which is the KG
incremental-update shape (new conversations arriving).  The fallback
path reads the full table once; it is for tests and small tables only
and says so loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def catalog_supports_merge(spark: SparkSession, table: str) -> bool:
    """True when MERGE INTO can run against ``table``'s catalog.

    Iceberg/Delta register SQL extensions that implement row-level MERGE;
    the stock session catalog over parquet files does not (Spark parses
    MERGE but the v2 write support check fails at analysis).  Probing the
    extension conf is cheap and does not touch the table.
    """
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "IcebergSparkSessionExtensions" in ext or "DeltaSparkSessionExtensions" in ext


def write_catalog_table(
    df: DataFrame,
    table: str,
    mode: str = "create_or_replace",
    file_format: str = "parquet",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write ``df`` to a catalog table via the DataFrameWriterV2 API.

    ``file_format='iceberg'`` on a cluster with the Iceberg catalog
    configured; ``'parquet'`` against the session catalog here.  The V2
    API (``writeTo``) is the same for both — this is the point.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    w = df.writeTo(table).using(file_format)
    if partition_by:
        w = w.partitionedBy(*[F.col(c) for c in partition_by])
    if mode == "create_or_replace":
        try:
            w.createOrReplace()
        except AnalysisException as e:
            # V2 catalogs (Iceberg/Delta) run atomic REPLACE TABLE AS
            # SELECT; the V1 session catalog used in tests cannot —
            # emulate with drop + create (non-atomic, test-only path).
            if "UNSUPPORTED_FEATURE" not in str(e):
                raise
            df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
            w.create()
    elif mode == "append":
        try:
            w.append()
        except AnalysisException as e:
            # same V1-catalog test-only fallback as above
            if "v1 table" not in str(e):
                raise
            df.write.format(file_format).mode("append").saveAsTable(table)
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    # the session caches each table's file listing; after a replace the
    # cached entries point at deleted files — invalidate explicitly
    df.sparkSession.catalog.refreshTable(table)


def merge_upsert(
    spark: SparkSession,
    delta: DataFrame,
    table: str,
    key_cols: tuple[str, ...],
    file_format: str = "parquet",
    precedence: tuple[str, ...] = (),
) -> None:
    """Upsert ``delta`` into catalog table ``table`` keyed by ``key_cols``.

    The lakehouse analog of the reference writer's id-keyed node/edge
    upsert (neo4j_queries.py:55-109: MERGE on id, SET properties).  Rows
    whose key exists are REPLACED by the delta row (last-write-wins, like
    the reference's ``SET n += props``); new keys are inserted.

    ``precedence`` switches matched-row semantics to MIN-WINS: the delta
    row replaces the stored row only when its precedence tuple is
    strictly lower (lexicographic over the named columns, which must be
    non-null).  Min is associative and commutative, so a feed split into
    micro-batches converges to the same table REGARDLESS of trigger
    size/arrival order, and a replayed batch is a no-op — the invariant
    the incremental entity-resolution path builds on.

    On an ACID catalog (Iceberg/Delta) this issues one MERGE INTO —
    a distributed join against only the overlapping data files.  On the
    plain session catalog it falls back to read → anti-join (or
    min-of-union for precedence) → union → createOrReplace: correct but
    full-table-rewriting and single-writer; fine for tests and small
    tables, and the production path is the MERGE one.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not spark.catalog.tableExists(table):
        # first batch of an incremental feed: the merge degenerates to
        # table creation (same shape Iceberg's MERGE INTO needs anyway —
        # the table must exist before MERGE can target it).  With
        # precedence the delta itself may carry key duplicates: keep the
        # min-precedence row per key.
        if precedence:
            delta = _min_by_key(delta, key_cols, precedence)
        write_catalog_table(delta, table, "create_or_replace", file_format)
        return
    if catalog_supports_merge(spark, table):
        from pyspark.errors import AnalysisException, UnsupportedOperationException

        if precedence:
            delta = _min_by_key(delta, key_cols, precedence)
        delta.createOrReplaceTempView("_merge_delta")
        on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
        matched = "WHEN MATCHED"
        if precedence:
            s_t = ", ".join(
                f"'{c}', s.{c}" for c in precedence
            )
            t_t = ", ".join(
                f"'{c}', t.{c}" for c in precedence
            )
            matched += (
                f" AND named_struct({s_t}) < named_struct({t_t})"
            )
        try:
            spark.sql(
                f"MERGE INTO {table} t USING _merge_delta s ON {on} "
                f"{matched} THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            return
        except (AnalysisException, UnsupportedOperationException) as e:
            # the extension probe is session-wide, not per-table: with
            # Iceberg/Delta extensions LOADED but ``table`` living in a
            # plain V1 session catalog (parquet), MERGE fails at
            # analysis — fall through to the read-antijoin rewrite for
            # exactly the KNOWN v1-table signatures (stock Spark 4
            # raises UNSUPPORTED_FEATURE.TABLE_OPERATION "does not
            # support MERGE INTO TABLE"; older builds phrase it "MERGE
            # INTO TABLE is not supported").  Any other analysis error
            # (schema mismatch, duplicate source keys, missing columns)
            # is a genuine failure the rewrite would only mask — re-raise.
            msg = str(e)
            if not (
                "does not support MERGE" in msg
                or "MERGE INTO TABLE is not supported" in msg
                or "UNSUPPORTED_FEATURE.TABLE_OPERATION" in msg
            ):
                raise
    current = spark.read.table(table)
    keys = [k for k in key_cols]
    if precedence:
        merged = _min_by_key(
            current.unionByName(delta.select(*current.columns)),
            key_cols,
            precedence,
        )
    else:
        # keep current rows whose key is NOT in the delta, then add the delta
        survivors = current.join(
            delta.select(*keys).dropDuplicates(keys), keys, "left_anti"
        )
        merged = survivors.unionByName(delta)
    # writing over the table being read requires materializing first on
    # the file-backed fallback; localCheckpoint keeps it in block storage
    merged = merged.localCheckpoint(eager=True)
    write_catalog_table(merged, table, "create_or_replace", file_format)


def _min_by_key(
    df: DataFrame, key_cols: tuple[str, ...], precedence: tuple[str, ...]
) -> DataFrame:
    """One row per key: the min-precedence row (map-side combinable)."""
    cols = list(df.columns)
    return (
        df.groupBy(*key_cols)
        .agg(
            F.min_by(
                F.struct(*cols), F.struct(*[F.col(c) for c in precedence])
            ).alias("_r")
        )
        .select(*[F.col(f"_r.{c}").alias(c) for c in cols])
    )


def materialize_graph(
    nodes: DataFrame,
    edges: DataFrame,
    target: str,
    mode: str = "create_or_replace",
    file_format: str = "parquet",
    partition_nodes_by: tuple[str, ...] = (),
    partition_edges_by: tuple[str, ...] = (),
) -> dict:
    """Materialize a KG as ``{target}_nodes`` / ``{target}_edges`` catalog
    tables (Iceberg in production).  ``mode='merge'`` upserts by the graph
    keys (node ``id``; edge ``(start_node_id, type, end_node_id)`` — the
    reference's edge identity, kg_writer.py rel merge).
    """
    spark = nodes.sparkSession
    nt, et = f"{target}_nodes", f"{target}_edges"
    if mode == "merge":
        merge_upsert(spark, nodes, nt, ("id",), file_format)
        merge_upsert(
            spark, edges, et, ("start_node_id", "type", "end_node_id"), file_format
        )
    else:
        write_catalog_table(nodes, nt, mode, file_format, partition_nodes_by)
        write_catalog_table(edges, et, mode, file_format, partition_edges_by)
    # NB: on the V1 fallback a replace is drop+create, so OTHER sessions
    # holding a cached file listing must refreshTable before reading
    # (ACID catalogs snapshot-isolate this away — another reason the
    # production path is Iceberg).
    spark.catalog.refreshTable(nt)
    spark.catalog.refreshTable(et)
    return {
        "nodes_table": nt,
        "edges_table": et,
        "node_count": spark.read.table(nt).count(),
        "edge_count": spark.read.table(et).count(),
    }
