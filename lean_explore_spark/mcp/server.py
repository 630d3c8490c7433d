"""MCP tool surface over the search service — reference entry point B.

The reference exposes search / get_by_id / get_dependencies as MCP
tools over stdio (src/lean_explore/mcp/tools.py:82-270, app.py:43+,
launched from cli/main.py:640+) via the ``mcp`` FastMCP package.  That
package is not in this container, so this module implements the same
surface directly on the PUBLIC protocol: MCP is JSON-RPC 2.0 over
stdio — ``initialize`` → ``notifications/initialized`` →
``tools/list`` / ``tools/call`` — one JSON object per line.

Tool semantics mirror the reference exactly:

* every tool accepts a single value OR a list and always RETURNS a
  list (tools.py get_by_id/get_dependencies docstrings);
* missing ids yield ``null`` entries, preserving input order;
* ``display_statement_text`` is stripped from every result item —
  the reference omits it over MCP because the full statement_text is
  preferred for model consumption (tools.py:54-80);
* ``search`` applies ``limit`` per query AFTER the backend search,
  defaulting to 10 (tools.py:88).

The backend is the same ``SearchAPI`` the HTTP server uses, so MCP
and HTTP serve identical bodies (modulo the MCP field stripping).
"""

from __future__ import annotations

import json
import sys
from typing import Any, Dict, List, Optional

from lean_explore_spark.api.server import SearchAPI

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "lean-explore-spark", "version": "0.3.0"}

_TOOLS: List[Dict[str, Any]] = [
    {
        "name": "search",
        "description": (
            "Search statement groups by a query string or list of "
            "strings; optional package filters; limit per query."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {
                    "anyOf": [
                        {"type": "string"},
                        {"type": "array", "items": {"type": "string"}},
                    ]
                },
                "package_filters": {
                    "type": "array",
                    "items": {"type": "string"},
                },
                "limit": {"type": "integer", "default": 10},
            },
            "required": ["query"],
        },
    },
    {
        "name": "get_by_id",
        "description": "Retrieve statement group(s) by unique id(s).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "group_id": {
                    "anyOf": [
                        {"type": "integer"},
                        {"type": "array", "items": {"type": "integer"}},
                    ]
                }
            },
            "required": ["group_id"],
        },
    },
    {
        "name": "get_dependencies",
        "description": (
            "Retrieve direct dependencies (citations) for statement "
            "group(s)."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "group_id": {
                    "anyOf": [
                        {"type": "integer"},
                        {"type": "array", "items": {"type": "integer"}},
                    ]
                }
            },
            "required": ["group_id"],
        },
    },
]


def _strip_display(item: Optional[dict]) -> Optional[dict]:
    """Reference tools.py:54-80: omit display_statement_text over MCP."""
    if item is None:
        return None
    return {k: v for k, v in item.items() if k != "display_statement_text"}


class MCPServer:
    """Tool dispatch over a SearchAPI backend; transport-agnostic —
    ``handle`` takes one JSON-RPC request dict and returns the response
    dict (or None for notifications), ``serve`` pumps stdio lines."""

    def __init__(self, api: SearchAPI) -> None:
        self.api = api
        self.initialized = False

    # -- tools (reference tools.py:82-270 semantics) -------------------

    def tool_search(
        self,
        query,
        package_filters: Optional[List[str]] = None,
        limit: int = 10,
    ) -> List[dict]:
        queries = [query] if isinstance(query, str) else list(query)
        limit = max(1, int(limit))
        out = []
        for q in queries:
            body = self.api.search(q, package_filters, limit)
            body["results"] = [_strip_display(r) for r in body["results"]]
            body["count"] = len(body["results"])
            out.append(body)
        return out

    def tool_get_by_id(self, group_id) -> List[Optional[dict]]:
        ids = [group_id] if isinstance(group_id, int) else list(group_id)
        return [_strip_display(self.api.get_by_id(int(g))) for g in ids]

    def tool_get_dependencies(self, group_id) -> List[Optional[dict]]:
        ids = [group_id] if isinstance(group_id, int) else list(group_id)
        out: List[Optional[dict]] = []
        for g in ids:
            body = self.api.get_dependencies(int(g))
            if body is not None:
                body["citations"] = [
                    _strip_display(c) for c in body["citations"]
                ]
            out.append(body)
        return out

    # -- JSON-RPC plumbing ---------------------------------------------

    def _result(self, rid, result) -> dict:
        return {"jsonrpc": "2.0", "id": rid, "result": result}

    def _error(self, rid, code: int, message: str) -> dict:
        return {
            "jsonrpc": "2.0",
            "id": rid,
            "error": {"code": code, "message": message},
        }

    def handle(self, req: dict) -> Optional[dict]:
        rid = req.get("id")
        method = req.get("method", "")
        params = req.get("params") or {}

        if method == "initialize":
            self.initialized = True
            return self._result(
                rid,
                {
                    "protocolVersion": PROTOCOL_VERSION,
                    "serverInfo": SERVER_INFO,
                    "capabilities": {"tools": {}},
                },
            )
        if method == "notifications/initialized":
            return None  # notification: no response
        if method == "ping":
            return self._result(rid, {})
        if method == "tools/list":
            return self._result(rid, {"tools": _TOOLS})
        if method == "tools/call":
            name = params.get("name")
            args = params.get("arguments") or {}
            fn = {
                "search": self.tool_search,
                "get_by_id": self.tool_get_by_id,
                "get_dependencies": self.tool_get_dependencies,
            }.get(name)
            if fn is None:
                return self._error(rid, -32602, f"unknown tool {name!r}")
            try:
                result = fn(**args)
            except TypeError as e:
                return self._error(rid, -32602, f"bad arguments: {e}")
            except Exception as e:  # tool runtime error → isError result
                return self._result(
                    rid,
                    {
                        "content": [{"type": "text", "text": str(e)}],
                        "isError": True,
                    },
                )
            return self._result(
                rid,
                {
                    "content": [
                        {"type": "text", "text": json.dumps(result)}
                    ],
                    "isError": False,
                },
            )
        return self._error(rid, -32601, f"method {method!r} not found")

    def serve(self, stdin=None, stdout=None) -> None:
        """Line-delimited JSON-RPC pump (MCP stdio transport)."""
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
            except json.JSONDecodeError:
                resp = self._error(None, -32700, "parse error")
            else:
                resp = self.handle(req)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()
