"""End-to-end tests of the monthly cube load (SURVEY §3.1, §5).

Asserts the reference's own operational invariants: every mapping wave
drives its unmapped count to zero in the processed window, re-running a
stage is a no-op (S4:102 'prevention of overwriting existing data'), and
rows outside the month window are never touched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_loading_scripts_spark.constants import (
    UNMAPPED_PATRON_ID,
    UNMAPPED_RESTAURANT_KEY,
)
from etl_loading_scripts_spark.pipeline.domain import build_domain
from etl_loading_scripts_spark.pipeline.monthly_load import full_window, run_monthly_load
from etl_loading_scripts_spark.pipeline.stages import stage2_patron_dims


@pytest.fixture(scope="module")
def loaded(spark, sf_dir):
    dom = build_domain(spark, sf_dir)
    window = full_window(dom)
    out, metrics = run_monthly_load(spark, dom, window)
    return dom, out, metrics, window


def test_mapping_waves_reach_zero_unmapped(loaded):
    _, _, metrics, _ = loaded
    # S1: every txn gets a fingerprint (new ones were registered)
    assert metrics["stage1_unmapped_after"] == 0
    # S2:90-94: zero unmapped patrons in the window
    assert metrics["stage2_unmapped_after"] == 0
    # S3: fingerprints fully mapped; restaurants unmapped only where the
    # merchant has no dim row (suppkey%4==0 seeded gap)
    assert metrics["stage3_unmapped_fingerprints"] == 0
    assert metrics["stage3_unmapped_restaurants"] > 0
    # S4: every billing-group label resolves after normalization
    assert metrics["stage4_unmapped_after"] == 0


def test_fact_row_count_preserved(loaded):
    dom, out, _, _ = loaded
    assert out.fact_transaction.count() == dom.fact_transaction.count()


def test_new_fingerprints_registered_for_missing_merchants(loaded):
    dom, out, _, _ = loaded
    before = dom.pos_fingerprints.count()
    after = out.pos_fingerprints.count()
    assert after > before  # the suppkey%4==0 merchants got registered
    # registry keys remain unique
    assert out.pos_fingerprints.select("fingerprint_id").distinct().count() == after


def test_patron_wave_is_idempotent(spark, loaded):
    dom, out, _, window = loaded
    fact2, dim2, m2 = stage2_patron_dims(
        dom.raw_transactions, out.fact_transaction, out.dim_patron, window
    )
    assert m2["stage2_unmapped_after"] == 0
    assert dim2.count() == out.dim_patron.count()  # no duplicate inserts
    # already-mapped fact rows unchanged
    diff = (
        fact2.select("txn_id", "patron_id")
        .exceptAll(out.fact_transaction.select("txn_id", "patron_id"))
        .count()
    )
    assert diff == 0


def test_billing_group_names_normalized(loaded):
    _, out, _, _ = loaded
    names = [r["billing_group_name"] for r in out.dim_billing_group.collect()]
    assert all('"' not in n and "TERMED" not in n and "  " not in n for n in names)
    assert out.dim_billing_group.select("billing_group_key").distinct().count() == len(names)


def test_restaurant_names_scrubbed(loaded):
    _, out, _, _ = loaded
    assert out.dim_restaurant.filter(F.col("restaurant_name").contains("�")).count() == 0


def test_unmapped_restaurants_match_seeded_gap(spark, loaded):
    dom, out, _, window = loaded
    # exactly the transactions whose merchant lacks a dim row stay unmapped
    lo, hi = window
    unmapped = out.fact_transaction.filter(
        (F.col("restaurant_key") == UNMAPPED_RESTAURANT_KEY)
        & F.col("datekey").between(lo, hi)
    ).count()
    expected = dom.raw_transactions.filter(F.col("site_id") % 4 == 0).count()
    assert unmapped == expected
    # and no patron sentinel survives anywhere in-window
    assert (
        out.fact_transaction.filter(F.col("patron_id") == UNMAPPED_PATRON_ID)
        .filter(F.col("datekey").between(lo, hi))
        .count()
        == 0
    )
