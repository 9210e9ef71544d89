"""Registry hygiene: the QUERIES dict, the driver entry points, and
OPERATORS.md must stay in sync — a registry reorder (round 5 moved the
39 never-driver-verified queries into the driver's first-50 window)
must not silently drop an oracle or orphan a docs row."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _registry():
    from duo_spark.queries import QUERIES
    return QUERIES


def test_every_query_has_an_oracle():
    """Every registered query ships DuckDB oracle SQL (the driver's
    weaker rows-only fallback is reserved for genuinely
    non-SQL-expressible ops — currently none)."""
    missing = [k for k, (_fn, sql) in _registry().items() if not sql]
    assert not missing, f"queries without oracle SQL: {missing}"


def test_entry_points_mirror_registry():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    reg = _registry()
    assert list(q) == list(reg)          # same names, same ORDER
    assert set(o) <= set(q)
    assert set(o) == {k for k, (_f, sql) in reg.items() if sql is not None}


def test_operators_md_matches_registry():
    md = (REPO / "OPERATORS.md").read_text()
    rows = re.findall(r"^\| `([a-z0-9_]+)` \|", md, re.M)
    reg = set(_registry())
    assert set(rows) == reg, (
        f"OPERATORS.md drift: missing={sorted(reg - set(rows))} "
        f"stale={sorted(set(rows) - reg)}"
    )
    assert len(rows) == len(set(rows)), "duplicate OPERATORS.md rows"


def test_registry_names_unique_and_wellformed():
    reg = _registry()
    assert len(reg) == len(set(reg))
    for k in reg:
        assert re.fullmatch(r"[a-z0-9_]+", k), k


def test_bench_covers_registry():
    """Every registry query is either benched or explicitly excluded
    with a documented reason — bench coverage can't silently rot."""
    import bench

    reg = set(_registry())
    benched = set(bench.BENCH_QUERIES)
    assert len(bench.BENCH_QUERIES) == len(benched), "duplicate bench entries"
    assert benched <= reg, f"bench names not in registry: {benched - reg}"
    assert not (benched & bench.BENCH_EXCLUDED)
    uncovered = reg - benched - bench.BENCH_EXCLUDED
    assert not uncovered, f"registry queries neither benched nor excluded: {uncovered}"


def test_bench_artifact_sf_guard(tmp_path):
    """ADVICE r9: only baseline-sf runs may write the committed
    BENCH.json; any other sf routes to .tmp/BENCH_local.json."""
    import bench

    here = str(tmp_path)
    assert bench.artifact_path(here, bench.BASELINE_SF).endswith("BENCH.json")
    off = bench.artifact_path(here, 0.001)
    assert off.endswith("BENCH_local.json") and "/.tmp/" in off.replace("\\", "/")
    assert bench.artifact_path(here, -1.0).endswith("BENCH_local.json")


def test_round10_window_holds_the_skipped_round8_debt():
    """VERDICT r9 #1: the 16 never-driver-checked r7/r8 additions and
    the 12 operators rewritten in round 8 must sit inside the first-50
    driver window (plus this round's own additions/changes — rule 1/2).
    Locks the ordering against accidental refactors."""
    window = list(_registry())[:50]
    never_checked = {
        "scd2_history", "hll_rollup", "cms_sliding", "streaming_hll_rollup",
        "label_resolution", "annotator_kappa", "moments_quantiles",
        "validate_orders", "hard_negatives", "hard_negatives_lsh",
        "k_anonymity", "streaming_moments_rollup", "hll_sliding",
        "contamination_report", "packing_stats", "streaming_anomaly",
    }
    r8_changed = {
        "key_skew_profile", "url_dedup", "span_merge",
        "streaming_span_merge", "streaming_span_merge_fast",
        "streaming_parquet_sink", "bpe_merges", "bpe_vocab",
        "random_projection", "cms_topk", "bloom_semijoin", "hll_distinct",
    }
    r10_added_or_changed = {
        "t_closeness", "hll_audience_overlap", "service_concurrency",
        "trace_waterfall", "multimodal_decode_audio",
        "multimodal_decode_image", "salted_join_skew", "readability",
        "zipf_slope", "column_mi",
    }
    for group in (never_checked, r8_changed, r10_added_or_changed):
        missing = group - set(window)
        assert not missing, f"fell out of the driver window: {sorted(missing)}"
