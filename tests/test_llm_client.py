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
    LLMGenerationError,
    OpenAICompatClient,
)


class _Fake(BaseHTTPRequestHandler):
    fail_next: list[int] = []  # status codes to emit before succeeding
    seen_auth: list[str] = []
    mode: str = "echo"  # echo | null_content | dup_index

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
            content = None if _Fake.mode == "null_content" else f"ECHO:{prompt}"
            body = {
                "choices": [
                    {"message": {"role": "assistant", "content": content}}
                ]
            }
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
