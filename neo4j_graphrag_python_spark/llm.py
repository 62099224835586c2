"""HTTP LLM / embedding clients for the pluggable model slots (E1–E7).

The reference ships seven HTTP clients (llm/openai_llm.py,
anthropic_llm.py, …, embeddings/*), all reducing to the same two
contracts: ``LLMInterface.invoke(input) -> LLMResponse(content=str)``
(llm/base.py:28-88) and ``Embedder.embed_query(text) -> list[float]``
(embeddings/base.py:20-34).  This module provides ONE stdlib-only client
speaking the OpenAI-compatible wire protocol — ``POST
{base_url}/chat/completions`` and ``POST {base_url}/embeddings`` — which
today is the lingua franca served by most hosted and self-hosted model
gateways, so a single client covers the practical surface of the seven.

Spark-first design points:

* **Picklable by construction** — the client is a small dataclass of
  strings/numbers, so it ships inside ``mapInPandas`` closures to
  executors (the reference clients hold live SDK sessions; here each
  executor worker opens its own connections lazily).
* **Batched at the Arrow-batch boundary** — ``complete_batch`` fans a
  batch's prompts over a bounded thread pool (HTTP latency dominates;
  threads overlap it), ``embed_batch`` uses the natively-batched
  embeddings endpoint.  These plug directly into the existing slots:
  ``llm_extractor(client.complete_batch)``,
  ``embed_column(..., batch_fn=client.embed_batch)``,
  ``Text2SqlRetriever(spark, client.complete)``.
* **Bounded retries** with exponential backoff on 429/5xx/URLError —
  transient rate limits must not fail a 10^5-task stage.

No third-party SDK is imported; the transport is stdlib ``http.client``
over a thread-local keep-alive connection pool (one live socket per
worker thread × gateway — a 10³-10⁴-prompt ``mapInPandas`` stage must
not pay a TCP/TLS handshake per prompt).  Tests run against a local
``http.server`` fake speaking the same protocol.
"""

from __future__ import annotations

import http.client
import json
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from urllib.parse import urlsplit


class LLMGenerationError(RuntimeError):
    """Analog of the reference's LLMGenerationError (exceptions.py):
    raised when the endpoint keeps failing after retries or returns a
    malformed payload."""


_RETRYABLE = {429, 500, 502, 503, 504}

#: Thread-local keep-alive connection pool, keyed (scheme, host, port).
#: One live gateway connection per (executor worker thread × host):
#: ``complete_batch``'s thread pool fans prompts over ≤max_concurrency
#: threads and each keeps its socket across requests — measured (see
#: BENCH.md §llm extraction) the per-request TCP handshake is the
#: difference between socket-per-request urllib and a sustained
#: 10³-10⁴-prompt stage against a remote gateway (handshake = 1 RTT,
#: TLS = 2 more; at 50 ms RTT that triples per-prompt latency).
#: Thread-local ⇒ no locking and no cross-thread response interleaving.
_CONN_POOL = threading.local()

#: Process-wide batch executors keyed by max_concurrency — one pool of
#: long-lived worker threads per (python worker × concurrency setting),
#: so thread-local connections persist across Arrow batches.
_EXECUTORS: dict[int, ThreadPoolExecutor] = {}
_EXECUTORS_LOCK = threading.Lock()


def _shared_executor(max_workers: int) -> ThreadPoolExecutor:
    ex = _EXECUTORS.get(max_workers)
    if ex is None:
        with _EXECUTORS_LOCK:
            ex = _EXECUTORS.get(max_workers)
            if ex is None:
                ex = _EXECUTORS[max_workers] = ThreadPoolExecutor(
                    max_workers=max_workers,
                    thread_name_prefix="llm-client",
                )
    return ex


def _pooled_connection(
    scheme: str, host: str, port: int, timeout: float
) -> http.client.HTTPConnection:
    pool = getattr(_CONN_POOL, "conns", None)
    if pool is None:
        pool = _CONN_POOL.conns = {}
    key = (scheme, host, port)
    conn = pool.get(key)
    if conn is None:
        cls = (
            http.client.HTTPSConnection
            if scheme == "https"
            else http.client.HTTPConnection
        )
        conn = pool[key] = cls(host, port, timeout=timeout)
    else:
        # two clients with different timeouts can share a pooled socket
        # (the key is endpoint-only): re-apply the CALLER's timeout to
        # both the connection (governs future connects) and the live
        # socket (governs this request's reads) on every checkout
        conn.timeout = timeout
        if conn.sock is not None:
            conn.sock.settimeout(timeout)
    return conn

#: Prefix marking a per-prompt transport failure captured by
#: ``complete_batch``.  The NUL bytes cannot appear in content returned
#: by ``complete`` — it strips literal NULs (a JSON ``\\u0000`` escape
#: WOULD otherwise decode to one, letting adversarial model output forge
#: this prefix) — so downstream parsers can detect captured
#: failures unambiguously: ``parse_extraction`` maps a sentinel string to
#: an ``ExtractionError`` carrying the transport message, which the
#: extractor's OnError handling turns into a ``status='error:…'`` row
#: (IGNORE) or a task failure (RAISE) — the reference's OnError contract
#: (entity_relation_extractor.py:218-226) extended to the transport
#: layer, where one bad prompt must not fail a whole Arrow batch.
LLM_ERROR_SENTINEL = "\x00LLMGenerationError\x00"


@dataclass
class ToolCall:
    """One tool invocation requested by the model (reference
    llm/types.py ToolCall: name + parsed-JSON arguments)."""

    name: str
    arguments: dict


@dataclass
class ToolCallResponse:
    """Reference llm/types.py ToolCallResponse: the model's tool calls
    plus optional assistant text (``content`` is None/"" when the model
    went straight to tools — the case a plain ``complete`` rejects)."""

    tool_calls: list[ToolCall]
    content: str | None = None


@dataclass
class OpenAICompatClient:
    """Minimal OpenAI-protocol client (chat completions + embeddings).

    ``api_key`` falls back to the environment variable named by
    ``api_key_env`` at CALL time (so executors resolve their own env,
    and no secret is baked into pickled closures).
    """

    base_url: str
    model: str = "gpt-4o-mini"
    embedding_model: str = "text-embedding-3-small"
    api_key: str | None = None
    api_key_env: str = "OPENAI_API_KEY"
    timeout: float = 60.0
    max_retries: int = 4
    backoff: float = 0.5
    max_concurrency: int = 8
    system_instruction: str | None = None
    extra_params: dict = field(default_factory=dict)
    capture_errors: bool = True
    #: close the socket after every response (measurement/debug knob —
    #: reproduces the socket-per-request behavior keep-alive replaced)
    keep_alive: bool = True

    # -- wire ------------------------------------------------------------

    def _send_once(
        self, url: str, body: bytes, headers: dict
    ) -> tuple[int, bytes]:
        """One HTTP round trip over the thread-local keep-alive pool.

        A pooled socket can be stale (server idled it out, HTTP/1.0
        gateway closes per response): the first send error closes the
        connection and retries ONCE on a fresh socket — so keep-alive is
        an optimization, never a correctness assumption, and plain
        close-per-response servers cost exactly what socket-per-request
        urllib did.  Error responses are fully drained here (read before
        return), so no socket is held through a backoff sleep."""
        parts = urlsplit(url)
        port = parts.port or (443 if parts.scheme == "https" else 80)
        reqpath = parts.path + (f"?{parts.query}" if parts.query else "")
        for fresh in (False, True):
            conn = _pooled_connection(
                parts.scheme, parts.hostname or "", port, self.timeout
            )
            try:
                conn.request("POST", reqpath, body=body, headers=headers)
                resp = conn.getresponse()
                data = resp.read()
                if resp.will_close or not self.keep_alive:
                    conn.close()
                return resp.status, data
            except (http.client.HTTPException, OSError):
                conn.close()
                if fresh:
                    raise
        raise AssertionError("unreachable")

    def _post(self, path: str, payload: dict) -> dict:
        url = self.base_url.rstrip("/") + path
        body = json.dumps(payload).encode("utf-8")
        key = self.api_key or os.environ.get(self.api_key_env, "")
        headers = {"Content-Type": "application/json"}
        if key:
            headers["Authorization"] = f"Bearer {key}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                status, data = self._send_once(url, body, headers)
            except (http.client.HTTPException, TimeoutError, OSError) as e:
                last_err = e
            else:
                if status < 400:
                    return json.loads(data.decode("utf-8"))
                if status not in _RETRYABLE:
                    raise LLMGenerationError(
                        f"{url} returned {status}: {data[:500]!r}"
                    )
                last_err = LLMGenerationError(
                    f"{url} returned {status}: {data[:500]!r}"
                )
            if attempt < self.max_retries:
                time.sleep(self.backoff * (2**attempt))
        raise LLMGenerationError(
            f"{url} failed after {self.max_retries + 1} attempts: {last_err}"
        ) from (last_err if not isinstance(last_err, LLMGenerationError) else None)

    # -- LLMInterface.invoke analog ---------------------------------------

    def complete(self, prompt: str) -> str:
        """One prompt → the assistant message content (reference
        LLMInterface.invoke → LLMResponse.content)."""
        messages = []
        if self.system_instruction:
            messages.append(
                {"role": "system", "content": self.system_instruction}
            )
        messages.append({"role": "user", "content": prompt})
        out = self._post(
            "/chat/completions",
            {"model": self.model, "messages": messages, **self.extra_params},
        )
        try:
            content = out["choices"][0]["message"]["content"]
        except (KeyError, IndexError, TypeError) as e:
            raise LLMGenerationError(f"malformed completion payload: {out}") from e
        if not isinstance(content, str):
            # tool_calls / content-filter responses carry content: null —
            # fail HERE with the module's own error, not later with a
            # confusing NoneType crash in extract_sql/parse_extraction
            raise LLMGenerationError(
                f"completion returned non-text content: {out}"
            )
        # A JSON string may carry \u0000 escapes that json.loads decodes to
        # literal NULs — adversarial model output could then forge the
        # LLM_ERROR_SENTINEL prefix and be misclassified as a transport
        # failure.  NUL carries no textual meaning, so strip it: real
        # content is unaffected and the sentinel namespace stays private
        # to complete_batch.
        return content.replace("\x00", "")

    def complete_batch(self, prompts: list[str]) -> list[str]:
        """Arrow-batch fan-out over a bounded thread pool — the
        ``llm_batch_fn`` shape ``llm_extractor`` consumes.  Order
        preserved.

        Per-prompt failure isolation (``capture_errors=True``, default):
        a prompt whose request fails non-retryably (or exhausts retries)
        yields an ``LLM_ERROR_SENTINEL``-prefixed string instead of
        raising, so ONE bad prompt cannot fail the whole Arrow batch →
        task → stage.  ``parse_extraction`` recognizes the sentinel and
        raises ``ExtractionError`` with the transport message, which
        OnError.IGNORE absorbs as a ``status='error:…'`` row and
        OnError.RAISE propagates as a task failure — transport errors now
        get exactly the reference's parse-error treatment
        (entity_relation_extractor.py:218-226).  Set
        ``capture_errors=False`` to get fail-fast batches (the first
        failure raises, as rounds ≤3 behaved)."""
        if not prompts:
            return []

        fn = self.complete
        if self.capture_errors:

            def fn(p: str) -> str:  # noqa: F811 - deliberate wrapper
                try:
                    return self.complete(p)
                except LLMGenerationError as e:
                    return LLM_ERROR_SENTINEL + str(e)

        workers = max(1, min(self.max_concurrency, len(prompts)))
        if workers == 1:
            return [fn(p) for p in prompts]
        # process-cached pool, NOT a fresh `with ThreadPoolExecutor(...)`
        # per call: complete_batch runs once per Arrow batch, and tearing
        # the pool down each time kills its threads — and with them every
        # thread-local keep-alive socket, silently reverting to
        # handshake-per-batch.  A long-lived pool makes connection reuse
        # span the whole task (ThreadPoolExecutor's atexit hook still
        # drains it at interpreter shutdown).
        return list(_shared_executor(self.max_concurrency).map(fn, prompts))

    # -- LLMInterface.invoke_with_tools analog -----------------------------

    def _tool_payload(self, tool) -> dict:
        """tools.Tool → OpenAI wire format (reference openai_llm.py
        _convert_tool_to_openai_format:106-125) — duck-typed on the
        get_name/get_description/get_parameters contract."""
        try:
            return {
                "type": "function",
                "function": {
                    "name": tool.get_name(),
                    "description": tool.get_description(),
                    "parameters": tool.get_parameters(),
                },
            }
        except AttributeError as e:
            raise LLMGenerationError(
                f"Tool {tool} is not a valid Tool object"
            ) from e

    def complete_with_tools(
        self, prompt: str, tools, tool_choice: str = "auto"
    ) -> ToolCallResponse:
        """Send the prompt with tool definitions; parse the model's tool
        calls (reference LLMInterface.invoke_with_tools, llm/base.py:90-115,
        with the OpenAI handling of openai_llm.py:161-230):

        * no ``tool_calls`` in the reply → a plain-text
          ``ToolCallResponse(tool_calls=[], content=text or "")``;
        * otherwise every call's JSON ``arguments`` string is parsed
          (unparseable arguments raise LLMGenerationError, like the
          reference's json.loads guard at openai_llm.py:219-224), and
          ``content`` may be None — the case ``complete`` rejects.
        """
        messages = []
        if self.system_instruction:
            messages.append(
                {"role": "system", "content": self.system_instruction}
            )
        messages.append({"role": "user", "content": prompt})
        out = self._post(
            "/chat/completions",
            {
                "model": self.model,
                "messages": messages,
                "tools": [self._tool_payload(t) for t in tools],
                "tool_choice": tool_choice,
                **self.extra_params,
            },
        )
        try:
            message = out["choices"][0]["message"]
            raw_calls = message.get("tool_calls") or []
        except (KeyError, IndexError, TypeError, AttributeError) as e:
            raise LLMGenerationError(f"malformed completion payload: {out}") from e
        if not raw_calls:
            return ToolCallResponse(
                tool_calls=[], content=message.get("content") or ""
            )
        calls = []
        for tc in raw_calls:
            fn_part = (tc or {}).get("function") or {}
            try:
                args = json.loads(fn_part.get("arguments") or "{}")
            except json.JSONDecodeError as e:
                raise LLMGenerationError(
                    f"Failed to parse tool call arguments: {e}"
                ) from e
            name = fn_part.get("name")
            if not isinstance(name, str) or not name:
                raise LLMGenerationError(f"tool call missing function name: {tc}")
            if not isinstance(args, dict):
                raise LLMGenerationError(
                    f"tool call arguments must be an object, got: {args!r}"
                )
            calls.append(ToolCall(name=name, arguments=args))
        return ToolCallResponse(tool_calls=calls, content=message.get("content"))

    # -- Embedder analog ---------------------------------------------------

    def embed_batch(self, texts: list[str]):
        """Natively-batched embeddings call — the ``BatchEmbedFn`` shape
        for ``embed_column``/``embed_unique``.  Returns a 2-D float32
        ndarray aligned with the input order (the endpoint's ``index``
        field is honored, not assumed)."""
        import numpy as np

        if not texts:
            return np.zeros((0, 0), dtype=np.float32)
        out = self._post(
            "/embeddings",
            {"model": self.embedding_model, "input": list(texts)},
        )
        try:
            rows = sorted(out["data"], key=lambda d: d["index"])
            idxs = [r["index"] for r in rows]
            mat = np.asarray([r["embedding"] for r in rows], dtype=np.float32)
        except (KeyError, TypeError) as e:
            raise LLMGenerationError(f"malformed embeddings payload: {out}") from e
        # the index SET must be exactly 0..n-1 — duplicate or gapped
        # indexes would silently misalign vectors with texts
        if idxs != list(range(len(texts))):
            raise LLMGenerationError(
                f"embeddings index mismatch: sent {len(texts)} inputs, "
                f"got indexes {idxs[:10]}{'…' if len(idxs) > 10 else ''}"
            )
        return mat

    def embed_query(self, text: str) -> list[float]:
        """Reference Embedder.embed_query parity (embeddings/base.py:27)."""
        return self.embed_batch([text])[0].tolist()
