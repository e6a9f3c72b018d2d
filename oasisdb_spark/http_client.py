"""HTTP client SDK — the network twin of the embedded OasisClient.

Reference: client-sdk/Python/client.py (OasisDBClient over requests).
Same method surface and response shapes, rebuilt on stdlib urllib (no
third-party dependency), pointed at any server speaking the reference
route table — including this repo's own ``oasisdb_spark.server``. Code
written against the reference SDK ports by changing the import; code
written against the embedded ``OasisClient`` ports by swapping the
constructor (base_url instead of SparkSession + warehouse).

Errors surface as ``OasisDBError(status_code, message)`` for any
non-2xx response, mirroring the SDK's contract.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from urllib.parse import quote
from typing import Any, Iterable, Mapping, Optional, Sequence

__all__ = ["HttpOasisClient", "OasisDBError"]


class OasisDBError(RuntimeError):
    """Non-2xx server response (client-sdk/Python/client.py:41-46)."""

    def __init__(self, status_code: int, message: Optional[str] = None):
        self.status_code = status_code
        super().__init__(message or f"HTTP {status_code}")


def _seg(value) -> str:
    """Percent-encode one URL path segment (safe='' so '/', '?', '#',
    spaces and non-ASCII in collection/document ids route correctly —
    the server unquotes symmetrically)."""
    return quote(str(value), safe="")


class HttpOasisClient:
    """High-level HTTP client with the reference SDK's method surface."""

    def __init__(self, base_url: str = "http://localhost:8080", timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _request(self, method: str, path: str, body: Optional[dict] = None):
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            f"{self.base_url}{path}", data=data, method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
        except urllib.error.HTTPError as e:
            raw = e.read()
            msg = None
            try:
                msg = json.loads(raw).get("error")
            except Exception:
                pass
            raise OasisDBError(e.code, msg) from None
        return json.loads(raw) if raw else None

    # System ------------------------------------------------------------
    def health_check(self) -> bool:
        return self._request("GET", "/") == {"status": "ok"}

    # Collections -------------------------------------------------------
    def create_collection(
        self,
        name: str,
        dimension: int,
        *,
        index_type: str = "hnsw",
        parameters: Optional[Mapping[str, Any]] = None,
    ) -> dict:
        payload: dict[str, Any] = {"name": name, "dimension": dimension, "index_type": index_type}
        if parameters:
            payload["parameters"] = dict(parameters)
        return self._request("POST", "/v1/collections", payload)

    def get_collection(self, name: str) -> dict:
        return self._request("GET", f"/v1/collections/{_seg(name)}")

    def list_collections(self) -> dict:
        return self._request("GET", "/v1/collections")

    def delete_collection(self, name: str) -> None:
        self._request("DELETE", f"/v1/collections/{_seg(name)}")

    # Documents ---------------------------------------------------------
    def upsert_document(
        self,
        collection: str,
        *,
        doc_id: str,
        vector: Sequence[float],
        parameters: Optional[Mapping[str, Any]] = None,
    ) -> dict:
        payload: dict[str, Any] = {"id": doc_id, "vector": list(vector)}
        if parameters:
            payload["parameters"] = dict(parameters)
        return self._request("POST", f"/v1/collections/{_seg(collection)}/documents", payload)

    def batch_upsert_documents(self, collection: str, documents: Iterable[Mapping[str, Any]]) -> None:
        self._request(
            "POST",
            f"/v1/collections/{_seg(collection)}/documents/batchupsert",
            {"documents": [dict(d) for d in documents]},
        )

    def get_document(self, collection: str, doc_id: str) -> dict:
        return self._request("GET", f"/v1/collections/{_seg(collection)}/documents/{_seg(doc_id)}")

    def delete_document(self, collection: str, doc_id: str) -> None:
        self._request("DELETE", f"/v1/collections/{_seg(collection)}/documents/{_seg(doc_id)}")

    # Index -------------------------------------------------------------
    def build_index(self, collection: str, documents: Iterable[Mapping[str, Any]] = ()) -> None:
        self._request(
            "POST",
            f"/v1/collections/{_seg(collection)}/buildindex",
            {"documents": [dict(d) for d in documents]},
        )

    def set_params(self, collection: str, parameters: Mapping[str, Any]) -> None:
        self._request(
            "POST",
            f"/v1/collections/{_seg(collection)}/documents/setparams",
            {"parameters": dict(parameters)},
        )

    # Search ------------------------------------------------------------
    def search_vectors(self, collection: str, vector: Sequence[float], *, limit: int = 10) -> dict:
        return self._request(
            "POST",
            f"/v1/collections/{_seg(collection)}/vectors/search",
            {"vector": list(vector), "limit": limit},
        )

    def search_documents(
        self,
        collection: str,
        vector: Sequence[float],
        *,
        limit: int = 10,
        filter: Optional[Mapping[str, Any]] = None,
    ) -> dict:
        payload: dict[str, Any] = {"vector": list(vector), "limit": limit}
        if filter:
            payload["filter"] = dict(filter)
        return self._request("POST", f"/v1/collections/{_seg(collection)}/documents/search", payload)

    # Lifecycle ---------------------------------------------------------
    def close(self) -> None:
        pass  # urllib is connectionless per request

    def __enter__(self) -> "HttpOasisClient":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.close()
