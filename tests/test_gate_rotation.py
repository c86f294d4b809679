"""Gate-rotation arithmetic: the driver samples the FIRST 50 queries, so the
head of the ordering (everything before _GATE_LAST) must never exceed 50 —
otherwise a new registration silently pushes a stale query out of the sample
(the r5 failure mode flagged in ADVICE). With the registry held at 100
entries the two lists flip each round and every query is re-verified on a
2-round cycle.
"""

import __spark_entry__ as entry
from bigtwine_streamprocessor_spark import registry

SAMPLE = 50


def test_gate_head_fits_driver_sample():
    mid = [
        q
        for q in registry.QUERIES
        if q not in entry._GATE_FIRST and q not in entry._GATE_LAST
    ]
    head = len(entry._GATE_FIRST) + len(mid)
    assert head <= SAMPLE, (
        f"gate head is {head} > {SAMPLE}: {len(mid)} unlisted quer"
        f"{'y' if len(mid) == 1 else 'ies'} {mid} would overflow the driver "
        "sample — promote into _GATE_FIRST (dropping something to _GATE_LAST) "
        "or registry grew past 100"
    )


def test_gate_lists_exactly_cover_registry():
    listed = entry._GATE_FIRST + entry._GATE_LAST
    assert len(listed) == len(set(listed)), "duplicate gate entries"
    unknown = [q for q in listed if q not in registry.QUERIES]
    assert not unknown, f"gate lists name unregistered queries: {unknown}"


def test_rotation_closes_in_two_rounds():
    """100 registered / 50-slot sample: the flip covers everything."""
    assert len(registry.QUERIES) <= 2 * SAMPLE, (
        "registry grew past 100 — the 50-slot rotation no longer closes in "
        "2 rounds; trim a twin or document the accepted tail in COVERAGE.md"
    )
    assert len(entry._GATE_FIRST) <= SAMPLE
