"""Expression-level helper library (all JVM-side built-ins, no Python UDFs
in batch paths — SURVEY.md §2.8: zero UDFs needed for parity)."""
