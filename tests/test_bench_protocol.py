"""The bench tail-budget protocol (VERDICT r5 #7 / r7 #2 / r8 #1): the
three protected stdout lines (sf1_queries + sf1_rates + headline) must
fit the driver's 2000-char capture TOGETHER, and the per-query medians
— the noise-vs-code separator — must survive every realistic payload.
No Spark needed: _fit_tail is pure dict surgery."""

from __future__ import annotations

import json

import bench


def _payload(n_queries=21, fat_rows=True):
    qnames = [f"q{i:02d}_some_longish_entry_name" for i in range(n_queries)]
    sf1_lines = [
        {
            "detail": "sf1_queries",
            "queries": {k: 1.23456 + i / 7 for i, k in enumerate(qnames)},
            "queries_med": {k: 1.3456 + i / 7 for i, k in enumerate(qnames)},
            "rate_queries": {
                "count_by_month": 0.2444,
                "count_by_month_x4": 0.4233,
                "quantile_avg_by_group": 0.8971,
                "quantile_avg_by_group_x4": 2.8341,
            },
            "total": 43.574,
            "total_med": 45.219,
        },
        {
            "detail": "sf1_rates",
            "cores": 32,
            "baseline_cores": 128,
            "baseline_rps": {
                "count_by_month": 260_000_000,
                "quantile_avg_by_group": 36_300_000,
            },
            "calibration": {
                "ref_sec": 0.65, "load": 0.97,
                "pre_sec": 0.671, "post_sec": 0.649,
            },
            "floor_probe": {
                "empty_job_sec": 0.141, "single_shot_sec": 0.239,
                "floor_share": 0.59,
            },
            "rates": {
                k: {
                    "sec": 0.244, "sec_med": 0.28, "sec_max": 0.31,
                    "rows_per_sec": 24_590_164,
                    "marginal_rows_per_sec": 33_112_582,
                    "per_core_vs_baseline": 0.378,
                    "per_core_vs_baseline_med": 0.33,
                }
                for k in (
                    "count_by_month", "count_by_month_x4",
                    "count_by_month_x8",
                    "quantile_avg_by_group", "quantile_avg_by_group_x4",
                )
            },
        },
        {
            "detail": "tail_summary",
            "ann_prune": {
                "files": 256, "np4_kept": 132, "np4_sec": 1.209,
                "full_sec": 1.342, "merged_files": 16,
                "merged_np4_kept": 9,
            },
            "ann_pq": {
                "vec_index_bytes": 1404081, "pq_index_bytes": 193242,
                "bytes_ratio": 7.27, "sec_vec_search": 0.323,
                "sec_pq_search": 0.604,
            },
            "pipeline": {
                "total": 26.113, "docs_in": 5000, "docs_out": 3126,
                "packed_docs": 318,
            },
        },
    ]
    out = {
        "metric": "headline-suite wall time",
        "value": 18.649,
        "unit": "sec",
        "queries": {k: 0.45678 + i / 9 for i, k in enumerate(qnames)},
        "sf": 0.1,
        "repeat": 3,
        "rows": {
            "lineitem": 600000, "events": 100000, "documents": 5000,
            "embeddings": 2000, "embedding_dim": 64,
            **({"orders": 150000, "customer": 15000} if fat_rows else {}),
        },
        "delta_total_vs_r08": 0.995,
        "ingest_rows_per_sec": 1387602,
        "ingest_vs_baseline": 2.011,
        "ingest_cold_rows_per_sec": 1170722,
        "sf1_total": 43.574,
    }
    return sf1_lines, out


def _tail(sf1_lines, out):
    return sum(len(json.dumps(o)) + 1 for o in sf1_lines + [out])


def test_fit_tail_keeps_queries_med_within_budget():
    sf1_lines, out = _payload()
    bench._fit_tail(sf1_lines, out, ("r08", {}))
    assert _tail(sf1_lines, out) <= 1990
    # the r8 verdict's exact complaint: the med must survive the shed
    assert "queries_med" in sf1_lines[0]
    assert len(sf1_lines[0]["queries_med"]) == 21
    # mins stay alongside, totals stay, the rates keep their criterion
    # numbers (sec + per_core_vs_baseline) for every shape
    assert "queries" in sf1_lines[0]
    assert "total" in sf1_lines[0] and "total_med" in sf1_lines[0]
    for r in sf1_lines[1]["rates"].values():
        assert "sec" in r and "per_core_vs_baseline" in r
    # VERDICT r11 #6: the pipeline claim survives in the tail_summary —
    # at minimum its composed wall time — for every realistic payload
    ts = next(o for o in sf1_lines if o.get("detail") == "tail_summary")
    assert ts.get("pipeline", {}).get("total") == 26.113
    # the claim-bearing ann numbers survive too
    assert ts["ann_prune"]["np4_sec"] == 1.209
    assert ts["ann_pq"]["bytes_ratio"] == 7.27


def test_fit_tail_key_shortening_is_lossless_on_codes():
    sf1_lines, out = _payload()
    before_min = dict(sf1_lines[0]["queries"])
    bench._fit_tail(sf1_lines, out, ("r08", {}))
    got = sf1_lines[0]["queries"]
    # codes map 1:1 to the original names, values round to 2dp
    assert set(got) == {k.split("_", 1)[0] for k in before_min}
    for k, v in before_min.items():
        assert got[k.split("_", 1)[0]] == round(v, 2)


def test_fit_tail_untouched_when_already_small():
    sf1_lines, out = _payload(n_queries=3, fat_rows=False)
    bench._fit_tail(sf1_lines, out, ("r08", {}), budget=4000)
    # nothing sheds when the tail already fits: full names, full meds
    assert "rate_queries" in sf1_lines[0]
    assert any("_" in k for k in sf1_lines[0]["queries"])
    assert "sec_max" in next(iter(sf1_lines[1]["rates"].values()))
