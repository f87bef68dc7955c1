#!/usr/bin/env python3
"""Self-test for the bench-gate tools (run by round_close.sh step 0).

Pins the round-17 verdict Next #1 contract:
  - reprobe_check.py overwrites ONLY the `quiescent` entry of a
    noise-confirmed query; the as-measured `quiescent_insuite` reading
    stays on the record untouched;
  - the session-state leak gate fails when a query's insuite/solo
    divergence recurs in two consecutive rounds, and passes on a
    first occurrence;
and the bench_regress.py retirement contract (Next #8): a query named
in the candidate's `excluded` list is RETIRED, not MISSING.

No Spark, no sbt — pure JSON fixtures through the real scripts.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(HERE, script), *args],
        capture_output=True, text=True)


def write(d, path):
    with open(path, "w") as f:
        json.dump(d, f)
    return path


def bench_doc(quiescent, excluded=(), insuite=None):
    return {"metric": "total", "value": 1.0, "unit": "sec", "wall": 1.0,
            "excluded": list(excluded), "queries": dict(quiescent),
            "quiescent_total": sum(v for v in quiescent.values() if v >= 0),
            "quiescent": dict(quiescent),
            "quiescent_insuite": dict(insuite or quiescent), "sf": 0.1}


def test_regress_retired_vs_missing(tmp):
    base = write(bench_doc({"a": 1.0, "b": 2.0}),
                 os.path.join(tmp, "base.json"))
    # absent + named excluded -> RETIRED, exit 0
    cand = write(bench_doc({"a": 1.1}, excluded=["b"]),
                 os.path.join(tmp, "cand_retired.json"))
    r = run("bench_regress.py", base, cand)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "RETIRED  b:" in r.stdout, r.stdout
    # absent, NOT excluded -> MISSING, exit 1
    cand = write(bench_doc({"a": 1.1}),
                 os.path.join(tmp, "cand_missing.json"))
    r = run("bench_regress.py", base, cand)
    assert r.returncode == 1 and "MISSING  b:" in r.stdout, r.stdout
    # crashed -> FAILED, exit 1 (a crash must never pass the gate)
    cand = write(bench_doc({"a": 1.1, "b": -1.0}),
                 os.path.join(tmp, "cand_failed.json"))
    r = run("bench_regress.py", base, cand)
    assert r.returncode == 1 and "FAILED  b:" in r.stdout, r.stdout


def test_reprobe_overwrite_keeps_insuite(tmp):
    base = write(bench_doc({"a": 1.0, "b": 2.0}),
                 os.path.join(tmp, "rb_base.json"))
    # candidate measured a 20s in-suite spike on b (baseline 2s)
    cand_path = write(bench_doc({"a": 1.1, "b": 20.0}),
                      os.path.join(tmp, "rb_cand.json"))
    probe = os.path.join(tmp, "probe.out")
    with open(probe, "w") as f:
        f.write("[probe] b                        2.10 s  (5 rows)\n")
    r = run("reprobe_check.py", base, cand_path, probe)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "NOISE-CONFIRMED" in r.stdout, r.stdout
    out = json.load(open(cand_path))
    assert out["quiescent"]["b"] == 2.10, out["quiescent"]
    # the in-suite reading is the record — never rewritten
    assert out["quiescent_insuite"]["b"] == 20.0, out["quiescent_insuite"]
    # a reproduced regression still fails
    cand_path = write(bench_doc({"a": 1.1, "b": 20.0}),
                      os.path.join(tmp, "rb_cand2.json"))
    with open(probe, "w") as f:
        f.write("[probe] b                       19.50 s  (5 rows)\n")
    r = run("reprobe_check.py", base, cand_path, probe)
    assert r.returncode == 1 and "CONFIRMED-REGRESSION" in r.stdout, r.stdout


def test_reprobe_leak_gate(tmp):
    # round N-1 (committed baseline): b already diverged insuite 20 vs
    # solo-confirmed 2
    base = write(bench_doc({"a": 1.0, "b": 2.0},
                           insuite={"a": 1.0, "b": 20.0}),
                 os.path.join(tmp, "lk_base.json"))
    # round N: b spikes in-suite again, solo re-probe is quiet again ->
    # two consecutive rounds of insuite/solo divergence = leak, exit 1
    cand_path = write(bench_doc({"a": 1.1, "b": 21.0}),
                      os.path.join(tmp, "lk_cand.json"))
    probe = os.path.join(tmp, "lk_probe.out")
    with open(probe, "w") as f:
        f.write("[probe] b                        2.05 s  (5 rows)\n")
    r = run("reprobe_check.py", base, cand_path, probe)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "SESSION-STATE-LEAK  b:" in r.stdout, r.stdout
    # first occurrence (baseline had no divergence) -> noise, exit 0
    base1 = write(bench_doc({"a": 1.0, "b": 2.0}),
                  os.path.join(tmp, "lk_base1.json"))
    cand_path = write(bench_doc({"a": 1.1, "b": 21.0}),
                      os.path.join(tmp, "lk_cand1.json"))
    r = run("reprobe_check.py", base1, cand_path, probe)
    assert r.returncode == 0, r.stdout + r.stderr


def test_oracle_ratio_report(tmp):
    # flags only >2x AND >5s; skips crashed (-1) and unpaired queries;
    # informational — exit 0 even with flagged rows
    bench = write(bench_doc({"a": 30.0, "b": 3.0, "c": 12.0, "d": -1.0}),
                  os.path.join(tmp, "bench.json"))
    times = write({"total_sec": 20.0,
                   "queries": {"a": 3.0, "b": 1.0, "c": 11.0, "d": 1.0,
                               "unpaired": 1.0}},
                  os.path.join(tmp, "times.json"))
    r = run("oracle_ratio.py", bench, times)
    assert r.returncode == 0, r.stderr
    assert "RATIO  a:" in r.stdout, r.stdout      # 10x, +27s -> flagged
    assert "RATIO  b:" not in r.stdout, r.stdout  # 3x but only +2s
    assert "RATIO  c:" not in r.stdout, r.stdout  # +1s, 1.1x
    assert "RATIO  d:" not in r.stdout, r.stdout  # crashed, skipped
    assert "1 over" in r.stdout, r.stdout


def main():
    with tempfile.TemporaryDirectory() as tmp:
        test_regress_retired_vs_missing(tmp)
        test_reprobe_overwrite_keeps_insuite(tmp)
        test_reprobe_leak_gate(tmp)
        test_oracle_ratio_report(tmp)
    print("tools self-test: OK")


if __name__ == "__main__":
    main()
