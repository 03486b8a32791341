"""Pure extraction kernels (no Spark imports).

Two parallel implementations live here on purpose:

* scalar ``*_one`` functions — the simple row-wise **reference oracle**, the
  engine's analogue of the reference repo's per-document pipeline
  (/root/reference/src/pdf_extractor/extractor.py:40-132);
* vectorized pandas ``*_series`` / batch functions — what actually runs inside
  ``mapInPandas`` on the cluster.

Tests assert the two agree byte-for-byte on every row (SURVEY.md §5.2); that
equality is the north-rule correctness gate ("per-turn text equality under
stable turn ordering").
"""
