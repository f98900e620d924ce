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


def load_reference():
    """Return the reference lightrag package (or None if unavailable)."""
    _stub("json_repair", repair_json=lambda s, **k: s)
    _stub(
        "httpx",
        AsyncClient=_AnyAttr(),
        Client=_AnyAttr(),
        Timeout=_AnyAttr(),
        HTTPError=Exception,
    )
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    try:
        import lightrag.operate  # noqa: F401
        import lightrag.utils  # noqa: F401

        return sys.modules["lightrag"]
    except Exception:
        return None
