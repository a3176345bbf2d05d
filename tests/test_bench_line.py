"""bench.py output-line guarantees (r9 advisor low): the driver keeps
only the last ~2000 chars of the bench line; a front-truncated line is
not valid JSON, so the line must fit BY CONSTRUCTION, with the
headline total reconstructible from whatever survives the clamp.
No Spark session needed — pure payload-shaping logic.
"""

from __future__ import annotations

import json

from bench import HEADLINE, clamp_line


def _payload(n_queries: int) -> dict:
    return {
        "spread_hot": {f"q_hot_{i}": 1.5 + i for i in range(8)},
        "spread_med": 0.4,
        "spread_max": 2.2,
        "queries": {f"q_lane_{i:03d}": round(0.1 + i * 0.05, 3)
                    for i in range(n_queries)},
        "runs": 3,
        "sf": 0.1,
        "metric": "headline_queries_total_sec",
        "value": round(sum(0.1 + i * 0.05 for i in range(n_queries)), 3),
        "unit": "sec",
    }


def test_fits_and_stays_valid_json_at_any_limit():
    for limit in (400, 800, 1200, 1950):
        p = _payload(60)
        line = clamp_line(p, limit)
        assert len(line) <= limit, (limit, len(line))
        d = json.loads(line)  # must never be torn
        for k in ("metric", "value", "unit", "queries", "sf"):
            assert k in d, f"driver-contract key {k} lost at limit={limit}"


def test_total_reconstructible_after_drop():
    p = _payload(60)
    d = json.loads(clamp_line(p, 700))
    assert d.get("queries_dropped", 0) > 0  # the clamp actually fired
    assert abs(sum(d["queries"].values())
               + d.get("queries_dropped_sec", 0.0) - d["value"]) < 0.05


def test_untouched_when_it_fits():
    p = _payload(10)
    line = clamp_line(p, 5000)
    d = json.loads(line)
    assert "queries_dropped" not in d
    assert "spread_hot" in d
    assert len(d["queries"]) == 10


def test_drops_cheapest_first():
    p = _payload(60)  # queries dict is cheap->expensive by construction
    d = json.loads(clamp_line(p, 1000))
    kept = list(d["queries"])
    # survivors are the most expensive suffix of the original ordering
    assert kept == [f"q_lane_{i:03d}" for i in
                    range(60 - len(kept), 60)]


def test_real_headline_set_fits_default_limit():
    """The actual headline set at realistic timing magnitudes must fit
    the default 1950-char limit WITHOUT dropping anything — the clamp
    is a seatbelt, not the normal path."""
    p = {
        "spread_hot": {k: 1.234 for k in HEADLINE[:8]},
        "spread_med": 0.443,
        "spread_max": 2.216,
        "queries": {k: 12.345 for k in HEADLINE},
        "runs": 3,
        "calib_ratio": 1.152,
        "calib_drift": 1.083,
        "calib_pos": {"start": 1.052, "mid": 1.021, "end": 1.139},
        "calib_par": {"start": 1.054, "mid": 1.102, "end": 1.071},
        "par_eff": {"start": 0.672, "mid": 0.691, "end": 0.643},
        "calib_mem": {"start": 581.2, "mid": 544.9, "end": 603.1,
                      "lanes_min": 498.7},
        "box": "steady",
        "sf": 0.1,
        "metric": "headline_queries_total_sec",
        "value": 55.123,
        "unit": "sec",
    }
    d = json.loads(clamp_line(p, 1950))
    assert "queries_dropped" not in d
    assert len(d["queries"]) == len(HEADLINE)
    # the drift instruments must survive the normal (no-clamp) path —
    # these are the fields the judge reads to adjudicate a noisy
    # session (r13 verdict #1: the throughput probe + box verdict)
    assert d["calib_drift"] == 1.083
    assert d["calib_pos"]["end"] == 1.139
    assert d["calib_par"]["mid"] == 1.102
    assert d["par_eff"]["end"] == 0.643
    assert d["calib_mem"]["mid"] == 544.9
    assert d["box"] == "steady"


def test_no_rounding_drift_across_many_drops():
    """r10 advisor low: queries_dropped_sec accumulates UNROUNDED and
    rounds once at emit, so the reconstruction error stays at one
    rounding ulp (0.0005) however many keys are folded — not
    ~0.0005 per dropped key."""
    p = _payload(120)
    p["value"] = round(sum(p["queries"].values()), 3)
    d = json.loads(clamp_line(p, 600))
    assert d["queries_dropped"] >= 100  # nearly everything folded
    assert abs(sum(d["queries"].values())
               + d["queries_dropped_sec"] - d["value"]) <= 0.0006


def test_calibration_ratio_against_newest_same_sf_record(tmp_path):
    """r11 verdict nit #1: the calib keys' median timing ratio is taken
    against the NEWEST committed BENCH record at the SAME sf; records
    at other sf values and older rounds are ignored; no comparable
    record -> None (never a crash)."""
    from bench import CALIBRATION, calibration_ratio

    (tmp_path / "BENCH_r10.json").write_text(json.dumps(
        {"sf": 0.1, "queries": {k: 1.0 for k in CALIBRATION}}))
    (tmp_path / "BENCH_r11.json").write_text(json.dumps(
        {"sf": 0.1, "queries": {k: 2.0 for k in CALIBRATION}}))
    (tmp_path / "BENCH_r12.json").write_text(json.dumps(
        {"sf": 0.01, "queries": {k: 0.1 for k in CALIBRATION}}))
    cur = {k: 2.3 for k in CALIBRATION}
    # r11 is the newest sf=0.1 record; r12 is sf-mismatched
    assert calibration_ratio(cur, 0.1, root=str(tmp_path)) == 1.15
    # sf with no record at all
    assert calibration_ratio(cur, 1.0, root=str(tmp_path)) is None
    # prior record clamped the calibration keys away -> no points
    (tmp_path / "BENCH_r13.json").write_text(json.dumps(
        {"sf": 0.1, "queries": {"q_other": 5.0}}))
    assert calibration_ratio(cur, 0.1, root=str(tmp_path)) is None
    # the sf filter is per-record: the sf=0.01 line pairs with r12 only
    assert calibration_ratio(cur, 0.01, root=str(tmp_path)) == 23.0
    # driver-wrapped shape: the record lives under "parsed"
    (tmp_path / "BENCH_r14.json").write_text(json.dumps(
        {"sf": "0.1", "rc": "0",
         "parsed": {"sf": 0.1, "queries": {k: 4.6 for k in CALIBRATION}}}))
    assert calibration_ratio(cur, 0.1, root=str(tmp_path)) == 0.5


def test_calibration_ratio_excludes_current_round(tmp_path):
    """r12 advisor low: a re-run inside round N must not calibrate
    against round N's own freshly-written BENCH file (ratio ~1.0 would
    silently neutralize the instrument). current_round=N masks records
    rN and later; older rounds still match."""
    from bench import CALIBRATION, calibration_ratio

    (tmp_path / "BENCH_r11.json").write_text(json.dumps(
        {"sf": 0.1, "queries": {k: 2.0 for k in CALIBRATION}}))
    (tmp_path / "BENCH_r13.json").write_text(json.dumps(
        {"sf": 0.1, "queries": {k: 2.3 for k in CALIBRATION}}))
    cur = {k: 2.3 for k in CALIBRATION}
    # without the guard the self-comparison reads exactly 1.0
    assert calibration_ratio(cur, 0.1, root=str(tmp_path)) == 1.0
    # with it, r13 is masked and r11 is the newest eligible record
    assert calibration_ratio(
        cur, 0.1, root=str(tmp_path), current_round=13) == 1.15
    # nothing older than the mask -> None, never a crash
    assert calibration_ratio(
        cur, 0.1, root=str(tmp_path), current_round=11) is None


def test_infer_current_round(tmp_path, monkeypatch):
    """Round inference: newest CORRECTNESS_rN.json + 1 (the driver
    writes it at the END of round N); $SPARK_GRAFT_ROUND overrides;
    no artifacts -> None."""
    from bench import infer_current_round

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    assert infer_current_round(str(tmp_path)) is None
    (tmp_path / "CORRECTNESS_r09.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r12.json").write_text("{}")
    assert infer_current_round(str(tmp_path)) == 13
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    assert infer_current_round(str(tmp_path)) == 7


def test_calibration_drift_flags_contaminated_tail():
    """r12 verdict 'what's wrong' #2: the positional trio readings,
    each normalized by the session's own best-of-N, expose a session
    whose tail ran hot — drift = max/min of per-position medians."""
    from bench import CALIBRATION, calibration_drift

    best = {k: 1.0 for k in CALIBRATION}
    # steady session: every position reads ~the session best
    drift, pos = calibration_drift(
        {"start": {k: 1.05 for k in CALIBRATION},
         "mid": {k: 1.02 for k in CALIBRATION},
         "end": {k: 1.08 for k in CALIBRATION}},
        best,
    )
    assert drift is not None and drift < 1.1
    assert set(pos) == {"start", "mid", "end"}
    # contaminated tail (the BENCH_r12 exhibit): end readings 4x hot
    drift, pos = calibration_drift(
        {"start": {k: 1.0 for k in CALIBRATION},
         "mid": {k: 1.1 for k in CALIBRATION},
         "end": {k: 4.0 for k in CALIBRATION}},
        best,
    )
    assert drift == 4.0
    # degenerate inputs: fewer than 2 usable positions -> (None, ...)
    drift, _ = calibration_drift({"start": {k: 1.0 for k in CALIBRATION}},
                                 best)
    assert drift is None
    drift, _ = calibration_drift(
        {"start": {"q_x": 1.0}, "end": {"q_x": 2.0}}, {"q_x": 0.0})
    assert drift is None


def test_floor_limit_sheds_detail_fields_and_stays_valid_json(capsys):
    """r10 advisor low: a limit below fixed-fields + one query entry
    used to exit the fold loop with an over-limit line. Now the
    optional detail fields (spread_med/spread_max/runs) shed next;
    the line stays valid JSON and keeps the driver-contract keys. An
    irreducibly over-limit core logs to stderr instead of silently
    inviting the driver's front-truncation."""
    p = _payload(60)
    line = clamp_line(p, 230)
    d = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in d
    assert len(line) <= 230
    # pathological floor: still valid JSON, loudly flagged
    p2 = _payload(60)
    line2 = clamp_line(p2, 10)
    json.loads(line2)
    assert "clamp_line floor" in capsys.readouterr().err


def test_cpu_tree_seconds_counts_self_and_descendants():
    """r13 verdict #1: the throughput probe's CPU reading must cover
    the whole process tree (getrusage can't see the live JVM). Pure
    /proc logic — burn CPU in THIS process and in a child, and the
    tree total must rise by at least the burned amount."""
    import subprocess

    from bench import cpu_tree_seconds

    c0 = cpu_tree_seconds()
    if c0 is None:  # off-Linux: documented graceful degrade
        return
    assert c0 > 0
    # self-burn ~0.2 s
    t_end = __import__("time").process_time() + 0.2
    while __import__("time").process_time() < t_end:
        pass
    # child-burn ~0.2 s (cstime/cutime credited to self once reaped)
    import sys

    subprocess.run(
        [sys.executable, "-c",
         "import time\nt=time.process_time()+0.2\n"
         "while time.process_time()<t: pass"],
        check=True,
    )
    c1 = cpu_tree_seconds()
    assert c1 is not None and c1 - c0 >= 0.3, (c0, c1)


def test_box_verdict_decision_table():
    """r13 verdict #1's decision rule: latency-trio benign + throughput
    probe hot => throttled box; the trio's direction semantics are
    unchanged for the un-throttled cases."""
    from bench import box_verdict

    steady_eff = {"start": 0.67, "mid": 0.69, "end": 0.64}
    # clean session
    assert box_verdict(1.1, {"start": 1.05, "mid": 1.0, "end": 1.02},
                       steady_eff) == "steady"
    # the BENCH_r13 exhibit: trio reads benign START-heavy drift, but
    # the 32-way probe ran at quota efficiency -> throttled wins
    assert box_verdict(
        1.47, {"start": 1.31, "mid": 1.16, "end": 0.89},
        {"start": 0.64, "mid": 0.12, "end": 0.13}) == "throttled"
    # throttled even with NO trio drift at all (quota for the whole
    # session scales the trio uniformly -> drift ~1)
    assert box_verdict(1.02, {"start": 1.0, "mid": 1.0, "end": 1.0},
                       {"start": 0.12, "mid": 0.13, "end": 0.12}) \
        == "throttled"
    # start-heavy latency drift, healthy probe: benign JIT warm-up
    assert box_verdict(2.5, {"start": 2.5, "mid": 1.1, "end": 1.0},
                       steady_eff) == "warmup-heavy"
    # end-heavy latency drift, healthy probe: load arrived mid-session
    # (the BENCH_r12 exhibit)
    assert box_verdict(4.0, {"start": 1.0, "mid": 1.1, "end": 4.0},
                       steady_eff) == "contaminated"
    # degraded inputs: no /proc efficiencies -> fall back to the trio
    assert box_verdict(4.0, {"start": 1.0, "end": 4.0},
                       {"start": None, "end": None}) == "contaminated"
    assert box_verdict(None, {}, {}) == "steady"
    # the r14 exhibit: CPU probe clean, trio clean, but first-touch
    # memory bandwidth collapsed at one position -> mem-degraded
    # (allocation-heavy Arrow/numpy lanes stall while codegen is fine)
    assert box_verdict(
        1.1, {"start": 1.05, "mid": 1.0, "end": 1.02}, steady_eff,
        {"start": 581.2, "mid": 24.7, "end": 549.0}) == "mem-degraded"
    # the within-session ratio form (the ACTUAL r14 bench reading:
    # 1427/253/1181 — every value above the absolute floor, but the
    # mid reading at 0.18x the session best)
    assert box_verdict(
        1.1, {"start": 1.05, "mid": 1.0, "end": 1.02}, steady_eff,
        {"start": 1427.3, "mid": 253.3, "end": 1181.5}) == "mem-degraded"
    # clean memory band stays steady; throttled outranks mem-degraded
    assert box_verdict(
        1.1, {"start": 1.0}, steady_eff,
        {"start": 581.2, "mid": 544.9, "end": 603.1}) == "steady"
    assert box_verdict(
        1.0, {}, {"start": 0.12}, {"start": 24.7}) == "throttled"


def test_box_verdict_mem_suspect_tier():
    """r14 verdict #2: the 0.3x cutoff alone certified BENCH_r14's
    official session (min 0.59x of best) as "steady" while untouched
    alloc-heavy lanes ran 1.7-2.4x over every reproduction. The soft
    tier flags the 0.3x-0.6x band as mem-suspect without touching the
    hard flag; the documented clean band (readings within ~0.8x of
    each other) still reads steady."""
    from bench import box_verdict

    steady_eff = {"start": 0.67, "mid": 0.69, "end": 0.64}
    trio = {"start": 1.05, "mid": 1.0, "end": 1.02}
    # THE r14 official exhibit: 1570.9/1249.7/934.8, min 0.59x of best
    assert box_verdict(
        1.1, trio, steady_eff,
        {"start": 1570.9, "mid": 1249.7, "end": 934.8}) == "mem-suspect"
    # just inside the clean band (0.8x) stays steady
    assert box_verdict(
        1.1, trio, steady_eff,
        {"start": 1400.0, "mid": 1180.0, "end": 1150.0}) == "steady"
    # hard tier still wins below 0.3x (the r14 mid-stall exhibit)
    assert box_verdict(
        1.1, trio, steady_eff,
        {"start": 1427.3, "mid": 253.3, "end": 1181.5}) == "mem-degraded"
    # the soft flag outranks the trio's drift classification: a 0.5x
    # mem dip IS the explanation for a hot tail, not a separate story
    assert box_verdict(
        2.5, {"start": 1.0, "mid": 1.1, "end": 2.5}, steady_eff,
        {"start": 1400.0, "mid": 700.0, "end": 1300.0}) == "mem-suspect"
    # per-lane samples participate via the lanes_min fold
    assert box_verdict(
        1.1, trio, steady_eff,
        {"start": 1400.0, "mid": 1350.0, "end": 1380.0,
         "lanes_min": 700.0}) == "mem-suspect"


def test_cpu_delta_nulls_impossible_negatives():
    """r14 verdict #4: a worker alive at the start sample that exits
    (and gets reparented away) before the end sample subtracts its
    whole accumulated CPU from the tree total — BENCH_r14 recorded
    cpu_s -196.38. The delta helper emits None for that contaminated
    pair instead of an impossible negative or a misleading 0."""
    from bench import cpu_delta

    assert cpu_delta(10.0, 12.5) == 2.5
    assert cpu_delta(10.0, 10.0) == 0.0
    assert cpu_delta(210.0, 13.62) is None  # the r14 exhibit shape
    assert cpu_delta(None, 12.5) is None
    assert cpu_delta(10.0, None) is None


def test_cpu_delta_with_synthetic_exiting_child():
    """The real mechanism, reproduced: a DOUBLE-FORKED grandchild (so
    its CPU is never credited to our cutime — it reparents to init on
    its parent's exit, exactly like a pandas_udf daemon's workers)
    burns CPU inside the sample window and exits. The raw tree delta
    goes negative; cpu_delta must return a usable value or None,
    never a negative."""
    import subprocess
    import sys
    import time as _time

    from bench import cpu_delta, cpu_tree_seconds

    if cpu_tree_seconds() is None:  # off-Linux degrade
        return
    # child spawns a CPU-burning grandchild, waits for the burn to be
    # underway, then EXITS without reaping it -> grandchild reparents
    # to init and leaves our tree with its accumulated CPU
    child = subprocess.Popen(
        [sys.executable, "-c", (
            "import subprocess, sys, time\n"
            "p = subprocess.Popen([sys.executable, '-c',\n"
            "    'import time\\n"
            "t=time.process_time()+0.6\\n"
            "while time.process_time()<t: pass'])\n"
            "time.sleep(0.45)\n"  # grandchild has burned ~0.45 s\n
        )],
    )
    _time.sleep(0.3)  # sample while child+grandchild are in our tree
    cpu0 = cpu_tree_seconds()
    child.wait()       # child exits; grandchild now orphaned
    _time.sleep(0.5)   # grandchild finishes and exits too
    cpu1 = cpu_tree_seconds()
    # r15 self-review: "d is None or d >= 0" is cpu_delta's
    # unconditional postcondition — asserting only that would pass
    # even when the race never reproduced. Check the RAW delta: the
    # fixture is only evidence when it actually went negative.
    raw = cpu1 - cpu0
    if raw >= 0:
        import pytest

        pytest.skip(f"negative-delta race not reproduced (raw={raw:.3f}) "
                    "— timing-dependent; covered by the pure cases above")
    assert cpu_delta(cpu0, cpu1) is None, (cpu0, cpu1, raw)


def test_par_probe_rows_scales_per_core(monkeypatch):
    """r14 advisor low: the probe's row count is per-core so probe
    wall stays ~1 s on any box (the old absolute 6.4e9 total cost
    tens of seconds per invocation on a small-core host);
    $SPARK_GRAFT_PAR_ROWS still overrides with an absolute total."""
    from bench import PAR_PROBE_ROWS_PER_CPU, par_probe_rows

    monkeypatch.delenv("SPARK_GRAFT_PAR_ROWS", raising=False)
    assert par_probe_rows(32) == 32 * PAR_PROBE_ROWS_PER_CPU
    assert par_probe_rows(4) == 4 * PAR_PROBE_ROWS_PER_CPU
    assert par_probe_rows(0) == PAR_PROBE_ROWS_PER_CPU  # degenerate
    monkeypatch.setenv("SPARK_GRAFT_PAR_ROWS", "123456")
    assert par_probe_rows(32) == 123456


def test_emission_order_json_line_last():
    """r14 verdict #1 (the round's parsed:null root cause): the round
    driver records only the last ~2000 chars of COMBINED output, so
    the budgeted JSON line must be the final print in main() — every
    side-channel diagnostic (bench-cpu, bench-mem) must be emitted
    BEFORE it, with stderr flushed ahead of the stdout print. Pinned
    statically against the source so the guarantee cannot regress
    without touching this test."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    i_cpu = src.index('"bench-cpu: "')
    i_mem = src.index('"bench-mem: "')
    i_flush = src.index("sys.stderr.flush()")
    i_json = src.index("print(clamp_line(")
    assert i_cpu < i_json and i_mem < i_json, \
        "side-channel lines must precede the JSON line"
    assert i_cpu < i_flush < i_json, \
        "stderr must be flushed between the side channel and the JSON line"
    # and nothing prints after the JSON line in main()
    tail = src[i_json:]
    assert tail.count("print(") == 1, \
        "the JSON line must be the last print in main()"


def test_mem_first_touch_probe_runs():
    """The probe must return a sane MB/s on this box (clean band
    ~550-600; anything positive passes — the band is environment) and
    never crash."""
    from bench import mem_first_touch_mbps

    v = mem_first_touch_mbps(mb=16)
    assert v is None or v > 0


def test_clamp_sheds_probe_fields_before_driver_contract():
    """The new probe fields shed under pressure like the other detail
    fields — valid JSON with the driver-contract keys intact."""
    p = _payload(60)
    p["calib_par"] = {"start": 1.054, "mid": 1.102, "end": 1.071}
    p["par_eff"] = {"start": 0.672, "mid": 0.691, "end": 0.643}
    p["box"] = "steady"
    line = clamp_line(p, 260)
    d = json.loads(line)
    assert len(line) <= 260
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in d
    assert "calib_par" not in d and "par_eff" not in d
