"""Smoke test for examples/confront.py — proves the public façade
composes outside the query registry (r3 verdict task 8): the reference's
README workflow (normalize → union → confront → report) runs green as a
plain user script."""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_confront_example_runs_green(spark):
    import confront as ex

    out = ex.run(spark)
    products = out["products"].collect()
    assert len(products) == 6
    by_isin = {
        (r.isin, r.provider): r for r in products
    }
    # locale normalization through the façade: comma decimals parsed,
    # newline share-class suffix stripped, both date dialects ISO
    ish = by_isin[("IE00B5BMR087", "ishares")]
    assert ish.ter_pct == 0.07 and ish.nav == 543.21
    assert ish.name == "iShares Core S&P 500"
    assert ish.currency == "EUR" and ish.nav_date == "2025-08-28"
    van = by_isin[("IE00B3XXRP09", "vanguard")]
    assert van.nav_date == "2025-08-28"  # dd/mm/yyyy dialect

    conf = {r.isin: r for r in out["confront"].collect()}
    assert list(conf) == ["IE00B4L5Y983"]  # the one overlapping ISIN
    row = conf["IE00B4L5Y983"]
    assert row.cheaper == "vanguard"  # 0.19 < 0.20
    assert row.ishares_nav == 101.55 and row.vanguard_nav == 99.80

    rep = {(r.provider, r.fund_type): r for r in out["report"].collect()}
    assert rep[("ishares", "equity")].n_products == 2
    assert rep[("vanguard", "bond")].n_products == 1
    assert rep[("ishares", "bond")].avg_ter_pct == 0.2


@pytest.mark.slow  # full example-script integration replay (~17 s); round8 steps test keeps the fast-lane example pin
def test_lakehouse_store_example_runs_green(spark, tmp_path):
    """The snapshot-store lifecycle example (commit -> evolve -> prune
    -> erase -> WAP -> compact -> expire) runs green as a plain user
    script, with every step's invariant visible in its output."""
    import lakehouse_store as ex

    out = ex.run(spark, root=str(tmp_path / "store"))
    assert (out["v0"], out["v1"], out["v2"]) == (0, 1, 2)
    assert "type changed" in out["refused"]
    assert out["pruning"]["files_selected"] < out["pruning"]["files_total"]
    assert out["band_rows"] == 200
    # erasure: customer 3 owns ~1/7 of orders; time travel unaffected
    assert out["rows_after_delete"] < 1000 == out["rows_time_travel"]
    assert out["audit_ok"] is False and out["main_version"] == 2
    assert out["compaction"]["deletes_folded"] is True
    assert out["deletes_in_compacted"] is None
    assert out["rows_compacted"] == out["rows_after_delete"]
    # expiry kept main's pinned version alive
    assert 2 in out["versions_left"]
    assert out["main_still_readable"] == out["rows_after_delete"]


def test_lakehouse_example_round8_steps(spark, tmp_path):
    """The appended round-8 lifecycle steps: O(delta) appends, the
    re-delivered batch deduped by positional deletes, the CDC tail
    replaying every commit's delta, and vacuum leaving committed data
    untouched."""
    import lakehouse_store as ex

    out = ex.run(spark, root=str(tmp_path / "store"))
    assert out["feed_rows"] == 700
    assert out["feed_rows_deduped"] == 700  # dup copies gone, data kept
    # feed: 500 + 200 + 100 inserts, 100 pre-image deletes
    assert out["cdc_ops"] == {"insert": 800, "delete": 100}
    assert out["vacuumed"] == ["d-crashed-writer"]
    assert out["feed_rows_after_vacuum"] == 700


@pytest.mark.slow  # checkpoint-folding integration replay (~13 s)
def test_lakehouse_example_round10_checkpoints(spark, tmp_path):
    """The appended round-10 step: pushing the feed log past a fold
    point writes a manifest-log checkpoint, and TIMESTAMP AS OF
    resolves through it identically to the walk."""
    import lakehouse_store as ex

    out = ex.run(spark, root=str(tmp_path / "store"))
    assert out["log_checkpoints_on_disk"], "no checkpoint folded"
    assert out["checkpoint_folds_versions"] >= 10
    assert out["as_of_resolves_via_checkpoint"] is True
