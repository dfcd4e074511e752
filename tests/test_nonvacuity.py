"""Every registered query must return rows at sf0.01 (r4 verdict item
10): an empty result and a broken pipeline are indistinguishable to a
hash-parity check (empty == empty vacuously matches), so emptiness
itself is the bug — queries whose natural sf0.01 result would be empty
carry seeded fixtures (`seed_near_duplicates` twins, planted
contamination, ...) precisely so this test can exist."""

from __future__ import annotations

import os

import pytest

from climate_data_pipeline_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_NONVACUITY_SF",
                        "/root/testdata/sf0.01")

# queries whose emptiness at sf0.01 is DOCUMENTED and intentional
# (none today — additions need a comment justifying why a seeded
# fixture is impossible)
ALLOWED_EMPTY: set[str] = set()


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="driver testdata not present")
def test_every_query_returns_rows_at_sf001(spark):
    qs = registry.queries()
    empty = []
    for name, fn in sorted(qs.items()):
        if name in ALLOWED_EMPTY:
            continue
        # limit(1) keeps the check cheap where plans can short-circuit;
        # aggregates always return >= 1 row anyway
        if fn(spark, SF_DIR).limit(1).count() == 0:
            empty.append(name)
    assert not empty, (
        f"{len(empty)} queries returned ZERO rows at sf0.01 — a vacuous "
        f"hash match proves nothing; seed a fixture: {empty}")
