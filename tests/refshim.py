"""Import the reference package (read-only, /root/reference) for
differential tests.

The reference's modules import optional third-party clients at module load;
we stub the few that are absent so the *pure functions under test* import
cleanly.  PUBLIC UNTRUSTED CONTENT: we execute only the specific pure
functions being differentially tested.
"""

from __future__ import annotations

import sys
import types

_REF = "/root/reference"


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _AnyAttr:
    def __getattr__(self, k):
        return _AnyAttr()

    def __call__(self, *a, **k):
        return _AnyAttr()


class _MiniNanoVectorDB:
    """Minimal in-process stand-in for the public ``nano_vectordb`` package
    (absent from this container), implementing just the surface the
    reference's NanoVectorDBStorage calls during insert/finalize: upsert,
    get, delete, query, save, plus the storage_file attribute.  Vectors are
    kept as plain lists; query does brute-force cosine — fidelity is not
    the point (insert-path tests never rank), availability is."""

    def __init__(self, embedding_dim, storage_file=None, **kwargs):
        import json
        import os

        self.embedding_dim = embedding_dim
        self.storage_file = storage_file
        self._data: dict[str, dict] = {}
        if storage_file and os.path.exists(storage_file):
            try:
                with open(storage_file) as f:
                    for rec in json.load(f).get("data", []):
                        self._data[rec["__id__"]] = rec
            except Exception:
                pass

    def upsert(self, datas):
        for rec in datas:
            rec = dict(rec)
            vec = rec.get("__vector__")
            if vec is not None and hasattr(vec, "tolist"):
                rec["__vector__"] = vec.tolist()
            self._data[rec["__id__"]] = rec
        return {"update": [], "insert": [r["__id__"] for r in datas]}

    def get(self, ids):
        return [self._data[i] for i in ids if i in self._data]

    def delete(self, ids):
        for i in ids:
            self._data.pop(i, None)

    def query(self, query, top_k=10, better_than_threshold=None, **kwargs):
        import math

        q = list(query)
        qn = math.sqrt(sum(x * x for x in q)) or 1.0
        scored = []
        for rec in self._data.values():
            v = rec.get("__vector__") or []
            vn = math.sqrt(sum(x * x for x in v)) or 1.0
            dot = sum(a * b for a, b in zip(q, v))
            m = dot / (qn * vn)
            if better_than_threshold is None or m >= better_than_threshold:
                scored.append({**rec, "__metrics__": m})
        scored.sort(key=lambda r: -r["__metrics__"])
        return scored[:top_k]

    def save(self):
        import json

        if not self.storage_file:
            return
        with open(self.storage_file, "w") as f:
            json.dump(
                {"embedding_dim": self.embedding_dim, "data": list(self._data.values())},
                f,
            )


def load_reference():
    """Return the reference lightrag package (or None if unavailable)."""
    _stub("json_repair", repair_json=lambda s, **k: s)
    _stub("nano_vectordb", NanoVectorDB=_MiniNanoVectorDB)
    _stub(
        "httpx",
        AsyncClient=_AnyAttr(),
        Client=_AnyAttr(),
        Timeout=_AnyAttr(),
        HTTPError=Exception,
    )
    # lightrag.rerank's module-level imports (HTTP client + retry lib are
    # unused by the pure chunk/aggregate functions under differential test)
    _stub(
        "aiohttp",
        ClientError=type("ClientError", (Exception,), {}),
        ClientResponseError=type("ClientResponseError", (Exception,), {}),
        ClientSession=_AnyAttr(),
    )
    class _OrAnything:  # rerank.py composes retry predicates with `|`
        def __or__(self, other):
            return self

        def __ror__(self, other):
            return self

    _stub(
        "tenacity",
        retry=lambda *a, **k: (lambda fn: fn),
        retry_if_exception_type=lambda *a, **k: _OrAnything(),
        stop_after_attempt=lambda *a, **k: _AnyAttr(),
        wait_exponential=lambda *a, **k: _AnyAttr(),
    )
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    try:
        import lightrag.operate  # noqa: F401
        import lightrag.utils  # noqa: F401

        return sys.modules["lightrag"]
    except Exception:
        return None
