"""Query plans: the engine's read surface.

- :mod:`analytics` — the driver-testdata query registry (queries + DuckDB
  oracles) covering every relational operator class of SURVEY §2.
- :mod:`queries` — the reference EP3 read-path parity layer over the
  domain-shaped tables (find_account, headers, receipts+logs, …).
"""
