"""ID/hash helpers (reference-parity).

- ``compute_args_hash``  ~ /root/reference/lightrag/utils.py:680-718
- ``compute_mdhash_id``  ~ utils.py:794-800

Single-argument hashing is plain ``md5(str(arg))`` so document/chunk ids are
stable; multi-argument hashing length-prefixes each field ("{len}:{field}")
to make field boundaries unambiguous (prevents ("abc","x") vs ("ab","cx")
collisions).
"""

from __future__ import annotations

from hashlib import md5
from typing import Any


def compute_args_hash(*args: Any) -> str:
    if len(args) <= 1:
        payload = "".join(str(a) for a in args)
    else:
        payload = "".join(f"{len(s)}:{s}" for s in (str(a) for a in args))
    try:
        return md5(payload.encode("utf-8")).hexdigest()
    except UnicodeEncodeError:
        return md5(payload.encode("utf-8", errors="replace")).hexdigest()


def compute_mdhash_id(content: str, prefix: str = "") -> str:
    """``{prefix}{md5(content)}`` — doc ids use prefix ``doc-``
    (pipeline.py:937-946), VDB entity rows ``ent-``, relation rows ``rel-``."""
    return prefix + compute_args_hash(content)
