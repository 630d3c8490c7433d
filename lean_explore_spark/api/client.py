"""HTTP client for the serving API — reference client parity.

Mirrors the reference httpx client surface
(src/lean_explore/api/client.py:39-219): ``search`` / ``get_by_id`` /
``get_dependencies``, each accepting a single value OR a list (list
inputs fan out concurrently, results return in input order; 404 maps
to ``None``).  Differences forced by this container: stdlib
``urllib`` + a thread pool instead of httpx/asyncio, and ``base_url``
points at a local ``APIServer`` instead of a hosted endpoint (S12
remote fetch is n/a without network — COVERAGE.md).

Auth parity: the reference sends ``Authorization: Bearer <api_key>``;
the header is attached here identically so a gateway in front of the
server sees the same contract.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Union

_MAX_FANOUT = 8


class Client:
    """Synchronous client; list inputs fan out over a thread pool
    (the stdlib twin of the reference's asyncio.gather)."""

    def __init__(
        self,
        base_url: str,
        api_key: str = "",
        timeout: float = 10.0,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    # -- plumbing ----------------------------------------------------

    def _get(self, path: str, params: Optional[dict] = None):
        url = f"{self.base_url}{path}"
        if params:
            url += "?" + urllib.parse.urlencode(params, doseq=True)
        req = urllib.request.Request(url)
        if self.api_key:
            req.add_header("Authorization", f"Bearer {self.api_key}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def _post(self, path: str, body: dict):
        data = json.dumps(body).encode("utf-8")
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=data,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        if self.api_key:
            req.add_header("Authorization", f"Bearer {self.api_key}")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def _fan_out(self, fn, items: list) -> list:
        if len(items) <= 1:
            return [fn(x) for x in items]
        with ThreadPoolExecutor(min(_MAX_FANOUT, len(items))) as pool:
            return list(pool.map(fn, items))

    # -- surface (reference client.py:85-219) --------------------------

    def search(
        self,
        query: Union[str, List[str]],
        package_filters: Optional[List[str]] = None,
        limit: int = 50,
    ) -> Union[dict, List[dict]]:
        """Single query → one APISearchResponse-shaped dict; a list →
        list of them in input order (concurrent, like the reference's
        gather)."""
        single = isinstance(query, str)
        queries = [query] if single else list(query)

        def one(q: str) -> dict:
            params: dict = {"q": q, "limit": limit}
            if package_filters:
                params["pkg"] = package_filters
            return self._get("/search", params)

        out = self._fan_out(one, queries)
        return out[0] if single else out

    def batch_search(
        self,
        queries: List[str],
        package_filters: Optional[List[str]] = None,
        limit: int = 50,
    ) -> dict:
        """Server-side batch (ONE round trip; POST /search) — the
        transport-efficient twin of ``search(list)``."""
        body: dict = {"queries": list(queries), "limit": limit}
        if package_filters:
            body["pkg"] = package_filters
        return self._post("/search", body)

    def lexical_search(
        self, query: str, k: int = 50, distributed: bool = False
    ) -> dict:
        return self._get(
            "/lexical_search",
            {"q": query, "k": k, "distributed": str(distributed).lower()},
        )

    def get_by_id(
        self, group_id: Union[int, List[int]]
    ) -> Union[Optional[dict], List[Optional[dict]]]:
        single = isinstance(group_id, int)
        ids = [group_id] if single else list(group_id)
        out = self._fan_out(
            lambda g: self._get(f"/statement_groups/{int(g)}"), ids
        )
        return out[0] if single else out

    def get_dependencies(
        self, group_id: Union[int, List[int]]
    ) -> Union[Optional[dict], List[Optional[dict]]]:
        single = isinstance(group_id, int)
        ids = [group_id] if single else list(group_id)
        out = self._fan_out(
            lambda g: self._get(f"/statement_groups/{int(g)}/dependencies"),
            ids,
        )
        return out[0] if single else out
