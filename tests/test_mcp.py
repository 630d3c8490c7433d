"""MCP stdio tool surface: tool semantics mirror the reference's
tests/lean_explore/mcp/test_tools.py — single/batch inputs, list-shaped
returns, None for missing ids, display_statement_text stripped — plus
the JSON-RPC framing (initialize / tools/list / tools/call) the
reference gets from the FastMCP package."""

from __future__ import annotations

import io
import json

import pytest

from lean_explore_spark.api.server import SearchAPI
from lean_explore_spark.index.builder import IndexBuilder
from lean_explore_spark.mcp.server import MCPServer
from lean_explore_spark.query.service import SearchService
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def mcp(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("mcp") / "idx"
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    IndexBuilder(spark, str(out), num_shards=2, num_buckets=4).build(
        docs, resume=False
    )
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    svc = SearchService(spark, str(out), emb, doc_meta=docs)
    docs_meta = docs.selectExpr(
        "doc_id", "concat('https://corpus/doc/', doc_id) AS url", "text"
    )
    api = SearchAPI(svc, doc_meta=docs_meta, dependencies={0: [1, 2], 1: []})
    return MCPServer(api)


def _call(mcp, name, args, rid=1):
    resp = mcp.handle(
        {
            "jsonrpc": "2.0",
            "id": rid,
            "method": "tools/call",
            "params": {"name": name, "arguments": args},
        }
    )
    assert resp["id"] == rid and "error" not in resp
    result = resp["result"]
    assert result["isError"] is False
    return json.loads(result["content"][0]["text"])


def test_initialize_and_tools_list(mcp):
    init = mcp.handle({"jsonrpc": "2.0", "id": 0, "method": "initialize"})
    assert init["result"]["serverInfo"]["name"] == "lean-explore-spark"
    assert "tools" in init["result"]["capabilities"]
    # notification gets NO response
    assert (
        mcp.handle({"jsonrpc": "2.0", "method": "notifications/initialized"})
        is None
    )
    tools = mcp.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
    names = {t["name"] for t in tools["result"]["tools"]}
    assert names == {"search", "get_by_id", "get_dependencies"}
    for t in tools["result"]["tools"]:
        assert t["inputSchema"]["type"] == "object"


def test_search_single_and_batch(mcp):
    out = _call(mcp, "search", {"query": "fast table scan", "limit": 3})
    assert isinstance(out, list) and len(out) == 1
    body = out[0]
    assert body["query"] == "fast table scan"
    assert body["count"] == len(body["results"]) <= 3
    for item in body["results"]:
        assert "display_statement_text" not in item  # MCP strips it
        assert "statement_text" in item
    batch = _call(
        mcp, "search", {"query": ["fast table scan", "merge join"], "limit": 2}
    )
    assert [b["query"] for b in batch] == ["fast table scan", "merge join"]


def test_get_by_id_single_batch_and_missing(mcp):
    got = _call(mcp, "get_by_id", {"group_id": 0})
    assert len(got) == 1 and got[0]["id"] == 0
    assert "display_statement_text" not in got[0]
    batch = _call(mcp, "get_by_id", {"group_id": [0, 999999999, 1]})
    assert batch[0]["id"] == 0 and batch[1] is None and batch[2]["id"] == 1


def test_get_dependencies(mcp):
    got = _call(mcp, "get_dependencies", {"group_id": [0, 999999999]})
    assert got[0]["source_group_id"] == 0 and got[0]["count"] == 2
    assert [c["id"] for c in got[0]["citations"]] == [1, 2]
    for c in got[0]["citations"]:
        assert "display_statement_text" not in c
    assert got[1] is None


def test_jsonrpc_errors(mcp):
    bad = mcp.handle({"jsonrpc": "2.0", "id": 9, "method": "nope"})
    assert bad["error"]["code"] == -32601
    badtool = mcp.handle(
        {
            "jsonrpc": "2.0",
            "id": 10,
            "method": "tools/call",
            "params": {"name": "nope", "arguments": {}},
        }
    )
    assert badtool["error"]["code"] == -32602


def test_stdio_pump(mcp):
    """Full stdio transport: newline-delimited JSON-RPC in/out."""
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        "not-json",
        json.dumps(
            {
                "jsonrpc": "2.0",
                "id": 2,
                "method": "tools/call",
                "params": {
                    "name": "search",
                    "arguments": {"query": "fast table scan", "limit": 2},
                },
            }
        ),
    ]
    out = io.StringIO()
    mcp.serve(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
    resps = [json.loads(ln) for ln in out.getvalue().splitlines()]
    # 3 responses: initialize, parse error, tools/call (no notification)
    assert len(resps) == 3
    assert resps[0]["id"] == 1
    assert resps[1]["error"]["code"] == -32700
    body = json.loads(resps[2]["result"]["content"][0]["text"])
    assert body[0]["count"] <= 2
