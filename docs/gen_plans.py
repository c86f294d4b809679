#!/usr/bin/env python
"""Regenerate docs/PLANS.md: formatted physical plans of representative
registry queries. Plan SHAPE is the artifact — it is what survives a 1000x
scale-up; tests/test_plans.py pins the properties, this file shows them."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bigtwine_streamprocessor_spark import registry  # noqa: E402
from bigtwine_streamprocessor_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
PICK = {
    "neel_assembled": "flagship fused assembly — expect zero exchanges",
    "join_bloom_pruned": "bloom bitmask broadcast + hash join",
    "decontaminate_benchmark": "broadcast gram semijoin",
    "dedup_lsh_pairs": "banded-LSH candidate self-join on uniform keys",
    "pack_sequences": "per-source window, no global sort",
    "agg_pricing_summary": "pushed filters + partial aggregation",
    "join_shipping_priority": "semijoin-reduced fact-fact + TakeOrdered top-k",
    "sketch_kmv_distinct": "two-phase salted top-k, digest-only shuffles",
    "embedding_random_projection": "literal-matrix map-only scan, no exchange",
}

HEADER = """# Physical-plan audit snapshots

`.explain('formatted')` of representative queries at sf0.001 (plan
SHAPE is scale-invariant; row counts are not). Regenerate with:
`python docs/gen_plans.py`. The properties asserted in
`tests/test_plans.py` (no CartesianProduct, no BatchEvalPython,
broadcast shapes, pushed filters, window partitioning) are the pinned
contract; this file is the human-readable evidence.
"""


def main() -> None:
    spark = get_spark(app_name="plans", shuffle_partitions=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    parts = [HEADER]
    for name, why in PICK.items():
        df = registry.QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(mode)
        parts.append(f"## {name}\n\n_{why}_\n\n```\n{plan.strip()}\n```\n")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
