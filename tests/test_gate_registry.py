"""Gate-registry invariants: the driver's correctness run samples the
FIRST 50 rows of queries() in dict order, so the family-spanning tier
must stay exactly 50 names, all resolvable, all first."""

from __future__ import annotations


def test_tier1_is_exactly_the_first_fifty():
    from jetro_spark.gate import _TIER1, all_oracles, all_queries

    qs = list(all_queries())
    assert len(_TIER1) == 50
    assert len(set(_TIER1)) == 50
    missing = [k for k in _TIER1 if k not in qs]
    assert not missing, f"tier names not in registry: {missing}"
    assert qs[:50] == [k for k in _TIER1 if k in qs], \
        "tier must be the registry prefix, in tier order"
    # every oracle key is a registered query (driver contract)
    assert set(all_oracles()) <= set(qs)
