"""Driver-contract helpers in bench.py that don't need a SparkSession."""

from __future__ import annotations

import bench


def test_corrected_vs_prev_uses_host_norm_ratio(tmp_path, monkeypatch):
    prev = tmp_path / "BENCH_r09.json"
    prev.write_text(
        '{"parsed": {"queries": {"a": 2.0, "b": 1.0},'
        ' "host_norm": {"kernel_docs_per_sec": 100000}}}'
    )
    monkeypatch.setattr(bench, "REPO", tmp_path)
    out = bench._corrected_vs_prev(
        {"a": 1.0, "c": 5.0}, {"kernel_docs_per_sec": 200000}
    )
    assert out["prev"] == "BENCH_r09.json"
    assert out["norm_ratio"] == 2.0
    # a: (1.0/2.0) * 2.0 = 1.0 — pure host drift reads as 1.0
    assert out["queries"] == {"a": 1.0}
    assert out["common_total_corrected_ratio"] == 1.0


def test_corrected_vs_prev_degrades_gracefully(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", tmp_path)
    assert "status" in bench._corrected_vs_prev(
        {"a": 1.0}, {"kernel_docs_per_sec": 1}
    )
    assert "status" in bench._corrected_vs_prev({"a": 1.0}, {"error": "x"})
    bad = tmp_path / "BENCH_r01.json"
    bad.write_text('{"parsed": {"queries": {}}}')
    out = bench._corrected_vs_prev({"a": 1.0}, {"kernel_docs_per_sec": 1})
    assert out["status"].startswith("prior-unreadable")
