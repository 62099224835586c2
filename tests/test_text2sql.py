"""Text2SQL retriever — the Text2Cypher analog (Q4 + P10).

Mirrors the reference test matrix (tests/unit/retrievers/test_text2cypher.py):
fence extraction, prompt composition with schema/examples, custom prompt,
prompt_params overrides, happy path, and syntax-error surfacing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graphrag_python_spark.text2sql import (
    EDGES_VIEW,
    NODES_VIEW,
    Text2SqlRetrievalError,
    Text2SqlRetriever,
    Text2SqlTemplate,
    assert_read_only_sql,
    extract_sql,
    render_graph_schema,
)


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("p1", "Person", {"name": "Alice"}, True),
            ("p2", "Person", {"name": "Bob"}, True),
            ("c1", "Company", {"name": "Globex"}, True),
        ],
        "id string, label string, properties map<string,string>, is_entity boolean",
    )
    edges = spark.createDataFrame(
        [
            ("p1", "c1", "WORKS_FOR", {}),
            ("p2", "c1", "WORKS_FOR", {}),
            ("p1", "p2", "KNOWS", {}),
        ],
        "start_node_id string, end_node_id string, type string,"
        " properties map<string,string>",
    )
    return nodes, edges


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("SELECT 1", "SELECT 1"),
        ("```SELECT 1```", "SELECT 1"),
        ("SQL query: ```SELECT a FROM t;```", "SELECT a FROM t;"),
        ("```sql\nSELECT a FROM t\n```", "SELECT a FROM t"),
        ("```SQL\nSELECT a FROM t\n```", "SELECT a FROM t"),
        # first fenced block wins (reference matches[0])
        ("```SELECT 1``` and ```SELECT 2```", "SELECT 1"),
        ("  SELECT `multi word` FROM t  ", "SELECT `multi word` FROM t"),
    ],
)
def test_extract_sql(raw: str, expected: str) -> None:
    assert extract_sql(raw) == expected


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT 1",
        "select properties['name'] from graph_nodes where label = 'Person'",
        "WITH t AS (SELECT 1 AS x) SELECT * FROM t",
        "SELECT 1;",  # trailing separator is fine
        "-- a comment mentioning drop tables\nSELECT 1",
        "SELECT `multi word col` FROM graph_nodes",
    ],
)
def test_read_only_guard_accepts(sql: str) -> None:
    assert assert_read_only_sql(sql) == sql


@pytest.mark.parametrize(
    "sql,reason",
    [
        ("DROP TABLE graph_nodes", "SELECT/WITH"),
        ("INSERT OVERWRITE TABLE t SELECT 1", "SELECT/WITH"),
        ("CREATE TABLE t AS SELECT 1", "SELECT/WITH"),
        ("SET spark.sql.shuffle.partitions=1", "SELECT/WITH"),
        # multi-statement smuggling behind a valid first statement
        ("SELECT 1; DROP TABLE graph_nodes", "multi-statement"),
        # Spark's grammar admits ctes before DML — WITH-first is not enough
        ("WITH x AS (SELECT 1) INSERT INTO t SELECT * FROM x", "'INSERT'"),
        ("WITH x AS (SELECT 1) DELETE FROM t", "'DELETE'"),
        ("", "empty"),
        ("/* only a comment */", "empty"),
        # script transformation: SELECT-first, no write verb, runs a shell
        # command — must die on the USING-<string-literal> marker
        (
            "SELECT TRANSFORM(text) USING 'cat /etc/passwd' FROM documents",
            "script transformation",
        ),
        (
            "SELECT TRANSFORM(text) USING r'rm -rf /' AS (out STRING) "
            "FROM documents",
            "script transformation",
        ),
        # arbitrary static Java method invocation
        (
            "SELECT reflect('java.lang.System', 'getenv', 'PATH')",
            "reflect",
        ),
        (
            "SELECT java_method('java.lang.Runtime', 'getRuntime')",
            "java_method",
        ),
    ],
)
def test_read_only_guard_rejects(sql: str, reason: str) -> None:
    with pytest.raises(Text2SqlRetrievalError, match=reason):
        assert_read_only_sql(sql)


def test_read_only_guard_accepts_join_using_and_hof_transform() -> None:
    # join-USING is followed by `(` and the higher-order transform() takes
    # no string-literal USING — neither matches the script-transform marker
    ok = (
        "SELECT transform(arr, x -> x + 1) AS bumped "
        "FROM a JOIN b USING (id)"
    )
    assert assert_read_only_sql(ok) == ok


def test_structural_guard_rejects_script_transform_plan(spark) -> None:
    from neo4j_graphrag_python_spark.text2sql import assert_read_only_plan

    with pytest.raises(Text2SqlRetrievalError, match="read-only guard"):
        assert_read_only_plan(
            spark,
            "SELECT TRANSFORM(text) USING 'id' AS (out STRING) "
            "FROM documents",
        )
    for bad in [
        "DROP TABLE graph_nodes",
        "CACHE TABLE t",
        # the statement hides under UnresolvedWith — root-class checks miss
        # it; the tree walk must find the nested InsertIntoStatement
        "WITH x AS (SELECT 1) INSERT INTO t SELECT * FROM x",
    ]:
        with pytest.raises(Text2SqlRetrievalError, match="read-only guard"):
            assert_read_only_plan(spark, bad)
    ok = "WITH t AS (SELECT 1 AS one) SELECT * FROM t ORDER BY one LIMIT 5"
    assert assert_read_only_plan(spark, ok) == ok


def test_retriever_rejects_write_sql_before_execution(spark, graph) -> None:
    """A hallucinated/injected DROP must raise, not run with session
    privileges (the reference's Neo4j enforces read-only routing
    server-side; spark.sql cannot — VERDICT r3 wrong-item #1)."""
    nodes, edges = graph
    r = Text2SqlRetriever(
        spark,
        lambda p: "DROP TABLE graph_nodes",
        nodes=nodes,
        edges=edges,
        schema_text="s",
    )
    with pytest.raises(Text2SqlRetrievalError, match="read-only guard"):
        r.search("drop everything")
    # the views are intact: a well-behaved model still works afterwards
    r.llm_fn = lambda p: f"SELECT count(*) AS n FROM {NODES_VIEW}"
    assert r.search("how many nodes").records.collect()[0]["n"] == 3


def test_template_includes_schema_examples_and_query() -> None:
    t = Text2SqlTemplate()
    p = t.format(schema="THE_SCHEMA", examples="THE_EXAMPLES", query_text="q?")
    assert "THE_SCHEMA" in p and "THE_EXAMPLES" in p and "q?" in p
    with pytest.raises(Exception):
        t.format(schema="s")  # query_text is required


def test_render_graph_schema(graph) -> None:
    nodes, edges = graph
    s = render_graph_schema(nodes, edges)
    # enhanced format (reference format_schema is_enhanced): typed
    # properties with value samples, not STRING-everywhere
    assert "- **Person**" in s
    assert "- `name`: STRING Available options: ['Alice', 'Bob']" in s
    assert "(:Person)-[:WORKS_FOR]->(:Company)" in s
    assert NODES_VIEW in s and EDGES_VIEW in s


def test_render_graph_schema_compact(graph) -> None:
    nodes, edges = graph
    s = render_graph_schema(nodes, edges, is_enhanced=False)
    assert "Person {name: STRING}" in s


def test_happy_path(spark, graph) -> None:
    nodes, edges = graph
    seen_prompts: list[str] = []

    def llm(prompt: str) -> str:
        seen_prompts.append(prompt)
        return (
            "```sql\nSELECT properties['name'] AS name FROM graph_nodes "
            "WHERE label = 'Person' ORDER BY name\n```"
        )

    r = Text2SqlRetriever(spark, llm, nodes=nodes, edges=edges)
    res = r.search("who are the people?")
    assert [x["name"] for x in res.records.collect()] == ["Alice", "Bob"]
    assert res.metadata["sql"].startswith("SELECT")
    # the auto-fetched schema is in the prompt (reference get_schema path)
    assert "(:Person)-[:KNOWS]->(:Person)" in seen_prompts[0]
    assert "who are the people?" in seen_prompts[0]


def test_join_query_over_edges(spark, graph) -> None:
    nodes, edges = graph

    def llm(prompt: str) -> str:
        return """
SELECT n.properties['name'] AS employee
FROM graph_edges e
JOIN graph_nodes n ON e.start_node_id = n.id
WHERE e.type = 'WORKS_FOR'
ORDER BY employee
"""

    r = Text2SqlRetriever(spark, llm, nodes=nodes, edges=edges)
    res = r.search("who works for Globex?")
    assert [x["employee"] for x in res.records.collect()] == ["Alice", "Bob"]


def test_syntax_error_surfaces(spark, graph) -> None:
    nodes, edges = graph
    r = Text2SqlRetriever(
        spark, lambda p: "SELEC broken FROM", nodes=nodes, edges=edges
    )
    with pytest.raises(Text2SqlRetrievalError, match="Failed to get search result"):
        r.search("anything")


def test_examples_and_schema_override(spark, graph) -> None:
    nodes, edges = graph
    prompts: list[str] = []

    def llm(prompt: str) -> str:
        prompts.append(prompt)
        return "SELECT 1 AS one"

    r = Text2SqlRetriever(
        spark,
        llm,
        nodes=nodes,
        edges=edges,
        schema_text="INIT_SCHEMA",
        examples=["USER INPUT: x QUERY: SELECT x"],
    )
    r.search("q1")
    assert "INIT_SCHEMA" in prompts[0]
    assert "USER INPUT: x QUERY: SELECT x" in prompts[0]
    # search-time prompt_params override both (reference :190-204)
    r.search("q2", prompt_params={"schema": "OVERRIDE_SCHEMA", "examples": "EX2"})
    assert "OVERRIDE_SCHEMA" in prompts[1] and "INIT_SCHEMA" not in prompts[1]
    assert "EX2" in prompts[1]


def test_custom_prompt(spark, graph) -> None:
    nodes, edges = graph
    prompts: list[str] = []

    def llm(prompt: str) -> str:
        prompts.append(prompt)
        return "SELECT 1 AS one"

    r = Text2SqlRetriever(
        spark,
        llm,
        nodes=nodes,
        edges=edges,
        custom_prompt="This is a custom prompt. {query_text}",
    )
    res = r.search("hello")
    assert prompts[0] == "This is a custom prompt. hello"
    assert res.records.collect()[0]["one"] == 1


def test_invalid_query_text(spark, graph) -> None:
    nodes, edges = graph
    r = Text2SqlRetriever(spark, lambda p: "SELECT 1", nodes=nodes, edges=edges)
    with pytest.raises(ValueError):
        r.search("")


def test_generated_sql_is_catalyst_planned(spark, graph) -> None:
    """The executed query is a real DataFrame: lazily planned, filter
    pushdown visible in the plan — not a collected result."""
    nodes, edges = graph

    def llm(prompt: str) -> str:
        return "SELECT id FROM graph_nodes WHERE label = 'Person'"

    r = Text2SqlRetriever(spark, llm, nodes=nodes, edges=edges)
    res = r.search("people ids")
    plan = res.records._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in plan or "label" in plan


def test_analysis_error_surfaces_as_retrieval_error(spark, graph) -> None:
    """A hallucinated column (AnalysisException) is a retrieval failure,
    like Cypher unknown-identifier errors (review finding)."""
    nodes, edges = graph
    r = Text2SqlRetriever(
        spark, lambda p: "SELECT namez FROM graph_nodes", nodes=nodes, edges=edges
    )
    with pytest.raises(Text2SqlRetrievalError):
        r.search("anything")
