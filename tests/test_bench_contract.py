"""Driver-parseability contract for bench.py's stdout line.

The driver tail-captures ~2000 chars of bench output and json-parses the
last line. BENCH_r06..r08 all recorded "parsed": null because the raw
queries_runs series grew the single JSON line past the capture (VERDICT r8
"What's wrong" #1). These tests pin the fix: the headline line stays under
a hard budget with the driver-contract keys, and the full series lives in
the BENCH_DETAIL.json payload instead.
"""

import json

import bench

# Leave headroom under the driver's ~2000-char tail: Spark may still emit a
# few short lines before the final one inside the captured window.
LINE_BUDGET = 1800


def _fake_runs():
    # Worst realistic case: every headline + cold line present, N_RUNS
    # samples each, 3-decimal values with two-digit integer parts.
    names = bench.HEADLINE + [
        "candle_chain_cold",
        "candle_cache_cold",
        "kmeans_train_cold",
        "ivf_index_build_cold",
        "events_scan_full",
        "events_scan_pruned_3d",
        "skew_join_agg_naive",
        "skew_join_agg_salted",
        "join_orderkey_bucketed",
        "join_orderkey_shuffled",
    ]
    return {n: [round(10 + 0.001 * i, 3) for i in range(bench.N_RUNS)] for n in names}


def test_headline_line_fits_driver_tail_capture():
    line, _ = bench.summarize(_fake_runs(), sf=0.1)
    assert len(line) <= LINE_BUDGET, (
        f"headline JSON line is {len(line)} chars; the driver's ~2000-char "
        "tail capture truncated BENCH output for three rounds — move data "
        "to the detail dict, not the stdout line"
    )


def test_headline_line_has_driver_contract_keys():
    line, detail = bench.summarize(_fake_runs(), sf=0.1)
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed, f"driver-contract key {key} missing"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    # headline value = sum of per-query medians, series-comparable r1..r8
    assert parsed["value"] == round(sum(q[2] for q in _fake_runs().values()), 3)
    # the full series lives in the detail payload, NOT the stdout line
    assert "queries_runs" not in parsed
    assert "queries_runs" in detail and "methodology" in detail
    assert set(detail["queries_runs"]) == set(parsed["queries"])


def test_medians_and_minima_agree_with_series():
    runs = {"q": [3.0, 1.0, 2.0, 9.0, 2.5]}
    line, detail = bench.summarize(runs, sf=0.01)
    parsed = json.loads(line)
    assert parsed["queries"]["q"] == 2.5  # median of 5 sorted [1,2,2.5,3,9]
    assert detail["queries_min"]["q"] == 1.0
    assert parsed["min_total_sec"] == 1.0
    assert parsed["first_run_total_sec"] == 3.0


def test_detail_payload_carries_required_proof_blocks(tmp_path):
    """VERDICT r10 task #7: BENCH_DETAIL.json is load-bearing evidence
    (methodology, scaling slopes, pruning proofs) — write_detail must carry
    the scaling block forward across rewrites, and a refactor that drops a
    required key must fail here, not silently in the next judge read."""
    path = str(tmp_path / "BENCH_DETAIL.json")
    scaling = {"queries": {"q": {"ratio_min": 1.0}}, "measured_commit": "abc1234"}
    json.dump({"scaling": scaling}, open(path, "w"))

    _, detail = bench.summarize(_fake_runs(), sf=0.1)
    detail["partition_pruning"] = {"full": 10, "pruned": 2}
    detail["host_canary"] = {
        "cpu_codegen_min_sec": 0.1,
        "cpu_codegen_bursts": [
            {"at": "pre_cold", "t_rel_sec": 0.0, "samples": [0.1], "min_sec": 0.1}
        ],
    }
    written = bench.write_detail(detail, path)
    assert written["scaling"] == scaling  # carried forward, stamp intact
    on_disk = json.load(open(path))
    for key in bench.DETAIL_REQUIRED_KEYS:
        assert key in on_disk, f"required proof block {key} missing"


def test_detail_corrupt_prior_is_loud_not_silent(tmp_path, capsys):
    path = str(tmp_path / "BENCH_DETAIL.json")
    open(path, "w").write("{not json")
    _, detail = bench.summarize(_fake_runs(), sf=0.1)
    bench.write_detail(detail, path)
    assert "could not carry forward" in capsys.readouterr().err
    assert "scaling" not in json.load(open(path))


def test_committed_detail_file_has_required_proof_blocks():
    import os

    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL.json")
    on_disk = json.load(open(path))
    for key in bench.DETAIL_REQUIRED_KEYS:
        assert key in on_disk, f"committed BENCH_DETAIL.json lost {key}"
    # the scaling block must carry its provenance stamp (ADVICE r10)
    assert "measured_commit" in on_disk["scaling"]
    # the canary must be BURST-LOCAL (VERDICT r15 task #2): a series of
    # labeled samples spanning the run, bracketed by pre_cold and end, so
    # a mid-run load burst is attributable to the lines it poisoned
    bursts = on_disk["host_canary"]["cpu_codegen_bursts"]
    labels = [b["at"] for b in bursts]
    assert labels[0] == "pre_cold" and labels[-1] == "end"
    assert len(labels) >= 8, "burst series too sparse to localize load"
    # and PAGE-CACHE instrumented (r17 blind-spot closure): every burst
    # carries the eviction-sensitive first-read statistic, and the record
    # ships its own cold/warm sensitivity calibration — without these the
    # io excusal rule in tools/adjudicate.py silently cannot run
    assert all("io_first_sec" in b for b in bursts), (
        "committed record lost the page-cache canary series"
    )
    calib_cold = on_disk["host_canary"]["pagecache_calib_cold_sec"]
    calib_warm = on_disk["host_canary"]["pagecache_calib_warm_sec"]
    assert calib_cold is None or calib_cold / calib_warm >= 3.0, (
        "committed record's own calibration shows the io canary cannot "
        "separate eviction from warm jitter on the bench host"
    )


def test_pagecache_canary_probe_separates_cold_from_warm(tmp_path):
    """r17 blind-spot closure: the io excusal rule in tools/adjudicate.py
    is meaningful only while an evicted (cold) canary read is far above a
    cached (warm) one. make_pagecache_canary self-calibrates exactly that
    pair; on this host the 64 MiB file measures 43x. Assert the separation
    on a smaller file with a generous margin — if a future host/filesystem
    collapses it (e.g. DONTNEED unsupported), this fails here instead of
    the adjudicator silently losing its io signal."""
    import pytest as _pytest

    def _fs_type(path):
        # longest-prefix mount-point match from /proc/mounts
        best, fs = "", None
        try:
            for line in open("/proc/mounts"):
                parts = line.split()
                if len(parts) >= 3 and path.startswith(parts[1]) and len(
                    parts[1]
                ) > len(best):
                    best, fs = parts[1], parts[2]
        except OSError:
            pass
        return fs

    if _fs_type(str(tmp_path)) in ("tmpfs", "ramfs"):
        # memory-backed fs: the pages ARE the file, DONTNEED evicts
        # nothing, cold ~= warm by construction. The bench-side canary
        # fails SAFE there (io never clears the 0.05 s absolute floor,
        # so it can never excuse a move) and the committed-record
        # calibration assert above makes the neutering visible.
        _pytest.skip("tmp_path is memory-backed — fadvise cannot evict")

    path, cold, warm = bench.make_pagecache_canary(str(tmp_path), mb=16)
    assert warm > 0
    if cold is None:
        _pytest.skip("posix_fadvise unavailable — io canary self-disables")
    # well above the adjudicator's 3x excusal threshold, well below the
    # measured 40x+, so the assertion is robust to fs/host variation
    assert cold / warm >= 3.0, (
        f"eviction cold read {cold:.4f}s is not separable from warm "
        f"{warm:.4f}s — the io excusal rule would be miscalibrated here"
    )
