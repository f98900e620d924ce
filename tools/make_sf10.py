"""Materialize the sf10 TIMING corpus: 100 key-shifted copies of the
sf0.1 documents/embeddings/events tables -> /tmp/sf10 (~500k docs, 200k
vectors, 10M events).

Second decade of the scale probe (BENCH.md): sf1 (10x) caught the LSH
band-width and minhash-fold defects that sf0.1 could not; sf10 (100x)
tests auto_rows_per_band's growth curve and the connected-components
round count for real.  Restricted to the tables the dedup/ANN/kg probe
list reads — 100x lineitem would be gigabytes for queries the probe does
not run (tpch stays an sf1 row).

Usage: python tools/make_sf10.py [out_dir]   (idempotent)
"""

from __future__ import annotations

import sys

import make_sf1


def build(out_dir: str = "/tmp/sf10") -> str:
    return make_sf1.build(
        out_dir,
        copies=100,
        tables=["region", "nation", "documents", "embeddings", "events"],
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    print(build(out))
