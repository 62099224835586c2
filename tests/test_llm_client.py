"""OpenAI-compatible HTTP client (E1–E7) against a local fake server.

The fake speaks the same wire protocol as the real endpoints
(chat/completions + embeddings), runs on 127.0.0.1, and is reachable
from Spark's Python workers — so the executor-side plumbing
(mapInPandas closure pickling, per-batch HTTP, retries) is exercised
for real, with only the model swapped for a deterministic echo.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from neo4j_graphrag_python_spark.llm import (
    LLM_ERROR_SENTINEL,
    LLMGenerationError,
    OpenAICompatClient,
    ToolCall,
    ToolCallResponse,
)


class _Fake(BaseHTTPRequestHandler):
    fail_next: list[int] = []  # status codes to emit before succeeding
    seen_auth: list[str] = []
    seen_tools: list[dict] = []  # tool payloads of /chat/completions calls
    mode: str = "echo"  # echo | null_content | dup_index | tool_call | bad_args

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        if _Fake.fail_next:
            code = _Fake.fail_next.pop(0)
            self.send_response(code)
            self.end_headers()
            self.wfile.write(b"try later")
            return
        _Fake.seen_auth.append(self.headers.get("Authorization", ""))
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        if self.path.endswith("/chat/completions"):
            prompt = payload["messages"][-1]["content"]
            if "FAILME" in prompt:
                # deterministic per-prompt non-retryable failure — lets a
                # threaded batch fail exactly one prompt regardless of
                # request arrival order
                self.send_response(400)
                self.end_headers()
                self.wfile.write(b"bad prompt")
                return
            if "tools" in payload:
                _Fake.seen_tools.append(
                    {"tools": payload["tools"],
                     "tool_choice": payload.get("tool_choice")}
                )
            if _Fake.mode == "tool_call":
                # content:null + tool_calls — the real shape a tool-capable
                # model returns (the case plain complete() rejects)
                message = {
                    "role": "assistant",
                    "content": None,
                    "tool_calls": [
                        {"id": "call_1", "type": "function",
                         "function": {
                             "name": "search_kg",
                             "arguments": json.dumps(
                                 {"query_text": prompt, "top_k": 3}
                             ),
                         }},
                        {"id": "call_2", "type": "function",
                         "function": {"name": "search_kg",
                                      "arguments": "{}"}},
                    ],
                }
            elif _Fake.mode == "bad_args":
                message = {
                    "role": "assistant",
                    "content": None,
                    "tool_calls": [
                        {"id": "call_1", "type": "function",
                         "function": {"name": "search_kg",
                                      "arguments": "{not json"}},
                    ],
                }
            else:
                if _Fake.mode == "null_content":
                    content = None
                elif _Fake.mode == "forged_sentinel":
                    # a JSON \u0000 escape decodes to a literal NUL — the
                    # adversarial shape that could forge the error sentinel
                    content = "\x00LLMGenerationError\x00forged"
                else:
                    content = f"ECHO:{prompt}"
                message = {"role": "assistant", "content": content}
            body = {"choices": [{"message": message}]}
        elif self.path.endswith("/embeddings"):
            data = [
                # deterministic 4-dim embedding from the text
                {"index": i,
                 "embedding": [float(len(t)), float(sum(map(ord, t)) % 97),
                               1.0, 0.0]}
                for i, t in enumerate(payload["input"])
            ]
            if _Fake.mode == "dup_index" and len(data) > 1:
                data[1]["index"] = 0  # duplicate index, count still right
            data.reverse()  # client must honor index, not order
            body = {"data": data}
        else:
            self.send_response(404)
            self.end_headers()
            return
        out = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture(scope="module")
def base_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Fake)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def client(base_url, **kw):
    kw.setdefault("backoff", 0.01)
    return OpenAICompatClient(base_url=base_url, api_key="sk-test", **kw)


def test_complete_and_batch(base_url) -> None:
    c = client(base_url)
    assert c.complete("hi") == "ECHO:hi"
    outs = c.complete_batch([f"p{i}" for i in range(10)])
    assert outs == [f"ECHO:p{i}" for i in range(10)]  # order preserved
    assert "Bearer sk-test" in _Fake.seen_auth


def test_embed_batch_honors_index(base_url) -> None:
    c = client(base_url)
    mat = c.embed_batch(["a", "bbb"])
    assert mat.shape == (2, 4)
    assert mat[0][0] == 1.0 and mat[1][0] == 3.0  # len(), despite reversal
    assert c.embed_query("a") == mat[0].tolist()


def test_retries_then_success(base_url) -> None:
    _Fake.fail_next = [429, 503]
    assert client(base_url).complete("again") == "ECHO:again"


def test_non_retryable_and_exhausted(base_url) -> None:
    _Fake.fail_next = [400]
    with pytest.raises(LLMGenerationError, match="400"):
        client(base_url).complete("bad")
    _Fake.fail_next = [500] * 3
    with pytest.raises(LLMGenerationError, match="attempts"):
        client(base_url, max_retries=2).complete("down")
    _Fake.fail_next = []


def test_null_content_raises_not_none(base_url) -> None:
    """content: null (tool_calls / content-filter responses) must raise
    the module's own error, not leak None into extract_sql/parse paths."""
    _Fake.mode = "null_content"
    try:
        with pytest.raises(LLMGenerationError, match="non-text"):
            client(base_url).complete("q")
    finally:
        _Fake.mode = "echo"


def test_forged_sentinel_content_is_not_a_transport_failure(base_url) -> None:
    """Model output beginning with \\u0000LLMGenerationError\\u0000 (legal
    inside a JSON string) must NOT be misclassified as a captured
    transport failure: complete() strips literal NULs, so the sentinel
    namespace stays private to complete_batch."""
    _Fake.mode = "forged_sentinel"
    try:
        out = client(base_url).complete("q")
        assert "\x00" not in out and out == "LLMGenerationErrorforged"
        batch = client(base_url).complete_batch(["q"])
        assert not batch[0].startswith(LLM_ERROR_SENTINEL)
    finally:
        _Fake.mode = "echo"


def test_duplicate_embedding_index_raises(base_url) -> None:
    """A duplicate/gapped index field would silently misalign vectors
    with texts — the client must verify indexes are exactly 0..n-1."""
    _Fake.mode = "dup_index"
    try:
        with pytest.raises(LLMGenerationError, match="index mismatch"):
            client(base_url).embed_batch(["a", "b"])
    finally:
        _Fake.mode = "echo"


def test_system_instruction_in_messages(base_url) -> None:
    c = client(base_url, system_instruction="be terse")
    # echo returns the LAST (user) message; the call simply must succeed
    assert c.complete("q") == "ECHO:q"


def test_batch_captures_per_prompt_failure(base_url) -> None:
    """One non-retryable 400 in a threaded batch yields a sentinel string
    for THAT prompt only — the other prompts' completions survive."""
    outs = client(base_url).complete_batch(["p0", "FAILME now", "p2"])
    assert outs[0] == "ECHO:p0" and outs[2] == "ECHO:p2"
    assert outs[1].startswith(LLM_ERROR_SENTINEL) and "400" in outs[1]


def test_batch_capture_errors_false_fails_fast(base_url) -> None:
    with pytest.raises(LLMGenerationError, match="400"):
        client(base_url, capture_errors=False).complete_batch(
            ["p0", "FAILME now", "p2"]
        )


def test_sentinel_becomes_status_row_or_task_failure() -> None:
    """parse_extraction maps the sentinel to ExtractionError carrying the
    transport message (OnError decides: IGNORE → status row, RAISE →
    task failure)."""
    from neo4j_graphrag_python_spark.operators.extractor import (
        ExtractionError,
        parse_extraction,
    )

    with pytest.raises(ExtractionError, match="llm transport error: boom 400"):
        parse_extraction(LLM_ERROR_SENTINEL + "boom 400")


def test_extractor_isolates_bad_prompt(spark, base_url) -> None:
    """End-to-end OnError contract over the transport layer
    (VERDICT r3 #1): a 3-chunk batch with one failing prompt produces the
    good chunks' rows plus ONE status='error:…' row under IGNORE; RAISE
    fails the task."""
    from pyspark.sql import functions as F

    from neo4j_graphrag_python_spark.operators.extractor import (
        extract_graph_rows,
        llm_extractor,
    )

    c = client(base_url)

    def llm_batch(prompts: list[str]) -> list[str]:
        outs = c.complete_batch(prompts)
        # good prompts: strip the echo, return a one-node graph so ok rows
        # are visible; captured failures pass through as sentinels
        return [
            o if o.startswith(LLM_ERROR_SENTINEL)
            else json.dumps({
                "nodes": [{"id": "0", "label": "Person",
                           "properties": {"name": "ok"}}],
                "relationships": [],
            })
            for o in outs
        ]

    chunks = spark.createDataFrame(
        [("u0", "c1", 0, "fine"), ("u1", "c1", 1, "FAILME"), ("u2", "c1", 2, "fine")],
        "chunk_uid string, conv_id string, chunk_index int, text string",
    ).coalesce(1)  # one Arrow batch — the blast radius under test

    g = extract_graph_rows(chunks, llm_extractor(llm_batch)).cache()
    try:
        ok_nodes = g.where((F.col("kind") == "node") & (F.col("status") == "ok"))
        err_rows = g.where(F.col("status").startswith("error:"))
        assert ok_nodes.count() == 2  # N-1 chunks delivered their graphs
        errs = err_rows.collect()
        assert len(errs) == 1 and "llm transport error" in errs[0]["status"]
        assert errs[0]["chunk_uid"] == "u1"
    finally:
        g.unpersist()

    with pytest.raises(Exception, match="llm transport error"):
        extract_graph_rows(
            chunks, llm_extractor(llm_batch), on_error="RAISE"
        ).count()


def test_complete_with_tools_parses_calls(base_url) -> None:
    """Tool bridge (VERDICT r3 #2): tools serialized in OpenAI wire format,
    tool_calls parsed into the ToolCallResponse analog, content:null
    preserved as None instead of raising."""
    from neo4j_graphrag_python_spark.tools import retriever_as_tool

    tool = retriever_as_tool("search_kg", "vector search", lambda **kw: kw)
    _Fake.mode = "tool_call"
    _Fake.seen_tools.clear()
    try:
        resp = client(base_url).complete_with_tools("find alice", [tool])
    finally:
        _Fake.mode = "echo"
    assert isinstance(resp, ToolCallResponse) and resp.content is None
    assert [c.name for c in resp.tool_calls] == ["search_kg", "search_kg"]
    assert resp.tool_calls[0] == ToolCall(
        name="search_kg", arguments={"query_text": "find alice", "top_k": 3}
    )
    assert resp.tool_calls[1].arguments == {}
    # wire format matches the reference's _convert_tool_to_openai_format
    sent = _Fake.seen_tools[-1]
    assert sent["tool_choice"] == "auto"
    fn = sent["tools"][0]["function"]
    assert sent["tools"][0]["type"] == "function"
    assert fn["name"] == "search_kg"
    assert fn["parameters"]["properties"]["query_text"]["type"] == "string"
    # round-trip: execute the tool with the model's parsed arguments
    assert tool.execute(**resp.tool_calls[0].arguments) == {
        "query_text": "find alice", "top_k": 3
    }


def test_complete_with_tools_plain_text_and_errors(base_url) -> None:
    from neo4j_graphrag_python_spark.tools import retriever_as_tool

    tool = retriever_as_tool("search_kg", "vector search", lambda **kw: kw)
    # no tool_calls in the reply → plain-text response, empty tool list
    resp = client(base_url).complete_with_tools("just answer", [tool])
    assert resp.tool_calls == [] and resp.content == "ECHO:just answer"
    # unparseable arguments raise, like the reference's json.loads guard
    _Fake.mode = "bad_args"
    try:
        with pytest.raises(LLMGenerationError, match="parse tool call"):
            client(base_url).complete_with_tools("q", [tool])
    finally:
        _Fake.mode = "echo"
    # a non-Tool object is rejected before any HTTP call
    with pytest.raises(LLMGenerationError, match="not a valid Tool"):
        client(base_url).complete_with_tools("q", [object()])


def test_client_drives_spark_slots(spark, base_url) -> None:
    """The client rides a mapInPandas closure to executor processes and
    serves both model slots: extraction (llm_batch_fn) and embedding
    (BatchEmbedFn)."""
    from pyspark.sql import functions as F

    from neo4j_graphrag_python_spark.operators.embedder import embed_column
    from neo4j_graphrag_python_spark.operators.extractor import (
        extract_graph_rows,
        llm_extractor,
    )

    c = client(base_url)

    def sql_llm_batch(prompts: list[str]) -> list[str]:
        # strip the fake's ECHO: prefix, return the extraction JSON the
        # prompt told the model to emit — deterministic "LLM"
        outs = c.complete_batch(["{\"nodes\": [], \"relationships\": []}"] * len(prompts))
        return [o.removeprefix("ECHO:") for o in outs]

    chunks = spark.createDataFrame(
        [("u1", "c1", 0, "some text")],
        "chunk_uid string, conv_id string, chunk_index int, text string",
    )
    g = extract_graph_rows(chunks, llm_extractor(sql_llm_batch))
    assert g.where(F.col("kind") == "node").count() == 0  # empty graph ok

    df = spark.createDataFrame([("a",), ("bbb",)], ["text"])
    out = {r["text"]: r["embedding"] for r in
           embed_column(df, batch_fn=c.embed_batch, dim=4).collect()}
    assert out["a"][0] == 1.0 and out["bbb"][0] == 3.0


class _KeepAliveFake(BaseHTTPRequestHandler):
    """HTTP/1.1 fake with Content-Length — the shape real gateways speak.
    Counts TCP connections (one handler instance per connection) so the
    reuse test can assert sockets are NOT opened per request."""

    protocol_version = "HTTP/1.1"
    connections = 0
    requests = 0

    def setup(self):
        _KeepAliveFake.connections += 1
        super().setup()

    def log_message(self, *a):
        pass

    def do_POST(self):
        _KeepAliveFake.requests += 1
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        prompt = payload["messages"][-1]["content"]
        body = json.dumps(
            {"choices": [{"message": {"role": "assistant",
                                      "content": f"ECHO:{prompt}"}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_keep_alive_reuses_connections() -> None:
    """A sequential run of N completes over one worker thread must ride
    ONE pooled socket (keep-alive), and the measurement knob
    keep_alive=False must reproduce socket-per-request.  Guards the
    10^3-10^4-prompt mapInPandas stage from paying a TCP/TLS handshake
    per prompt against a remote gateway."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _KeepAliveFake)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/v1"
        _KeepAliveFake.connections = 0
        c = OpenAICompatClient(base_url=url, max_concurrency=1)
        assert c.complete_batch([f"p{i}" for i in range(20)]) == [
            f"ECHO:p{i}" for i in range(20)
        ]
        reused = _KeepAliveFake.connections
        assert reused <= 2, f"opened {reused} sockets for 20 requests"

        _KeepAliveFake.connections = 0
        c2 = OpenAICompatClient(
            base_url=url, max_concurrency=1, keep_alive=False
        )
        c2.complete_batch([f"q{i}" for i in range(20)])
        # ≥19: request 1 may ride the still-pooled socket left over from
        # the keep-alive run (same thread, same (scheme,host,port) key)
        assert _KeepAliveFake.connections >= 19
    finally:
        srv.shutdown()
