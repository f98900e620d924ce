"""Pure parity functions (no Spark imports) — safe to ship into executors."""
