"""Drive the HTTP LLM extraction path at bench scale: `llm_extractor`
(operators/extractor.py) with `OpenAICompatClient.complete_batch` inside
`extract_graph_rows`' mapInPandas, against a local fake OpenAI-protocol
server with injected per-request latency.  Measures end-to-end
prompts/sec, server-observed TCP connections vs requests (keep-alive +
cross-batch thread-pool reuse: connections should track worker threads,
not batches or prompts), and the per-prompt failure-isolation overhead
(a slice of prompts 400-fail; the run must finish with error rows, not
task failures).

Usage: python scripts/bench_llm_extract.py [sf] [latency_ms] [fail_pct]
  (defaults 0.1 20 1.0)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graphrag_python_spark.llm import OpenAICompatClient  # noqa: E402
from neo4j_graphrag_python_spark.operators.extractor import (  # noqa: E402
    extract_graph_rows,
    llm_extractor,
)
from neo4j_graphrag_python_spark.session import build_spark  # noqa: E402

EXTRACTION = json.dumps(
    {
        "nodes": [
            {"id": "0", "label": "Person", "properties": {"name": "Ada"}}
        ],
        "relationships": [],
    }
)


class _Gateway(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    latency_s = 0.02
    connections = 0
    requests = 0
    failures = 0
    lock = threading.Lock()

    def setup(self):
        with _Gateway.lock:
            _Gateway.connections += 1
        super().setup()

    def log_message(self, *a):
        pass

    def do_POST(self):
        with _Gateway.lock:
            _Gateway.requests += 1
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        prompt = payload["messages"][-1]["content"]
        time.sleep(_Gateway.latency_s)
        if "FAILME" in prompt:
            with _Gateway.lock:
                _Gateway.failures += 1
            body = b"injected failure"
            self.send_response(400)
        else:
            body = json.dumps(
                {
                    "choices": [
                        {
                            "message": {
                                "role": "assistant",
                                "content": EXTRACTION,
                            }
                        }
                    ]
                }
            ).encode()
            self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    latency_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    fail_pct = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _Gateway.latency_s = latency_ms / 1000.0

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Gateway)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base_url = f"http://127.0.0.1:{srv.server_port}/v1"

    spark = build_spark(
        "bench-llm", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as em

    chunks = (
        em.q_kg_chunks_fixed(spark, f"/root/testdata/sf{sf}")
        .select(
            F.concat_ws("#", "conv_id", "chunk_index").alias("chunk_uid"),
            "conv_id",
            F.col("chunk_index"),
            # plant deterministic failures: fail_pct% of chunks carry the
            # marker the fake 400s on — isolation must absorb them as
            # error rows, never task failures
            F.when(
                F.pmod(F.xxhash64("conv_id", "chunk_index"), 10000)
                < int(fail_pct * 100),
                F.concat(F.lit("FAILME "), F.col("chunk_text")),
            )
            .otherwise(F.col("chunk_text"))
            .alias("text"),
        )
        .localCheckpoint()
    )
    n_chunks = chunks.count()

    client = OpenAICompatClient(
        base_url=base_url, max_concurrency=8, max_retries=1, backoff=0.05
    )
    extractor = llm_extractor(client.complete_batch)

    t0 = time.time()
    rows = extract_graph_rows(chunks, extractor, on_error="IGNORE")
    by_status = {
        r["status"]: r["n"]
        for r in rows.groupBy(
            F.when(F.col("status") == "ok", "ok").otherwise("error").alias(
                "status"
            )
        )
        .agg(F.countDistinct("chunk_uid").alias("n"))
        .collect()
    }
    wall = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "sf": sf,
                "chunks": n_chunks,
                "latency_ms": latency_ms,
                "fail_pct": fail_pct,
                "wall_s": wall,
                "prompts_per_sec": round(n_chunks / wall, 1),
                "chunks_ok": by_status.get("ok", 0),
                "chunks_error": by_status.get("error", 0),
                "server_requests": _Gateway.requests,
                "server_connections": _Gateway.connections,
                "server_injected_failures": _Gateway.failures,
                "requests_per_connection": round(
                    _Gateway.requests / max(_Gateway.connections, 1), 1
                ),
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )
    srv.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
