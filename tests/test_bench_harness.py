"""
Fault-injection tests for bench.py's harness itself (NOT its measurements).

The driver parses the LAST JSON line of bench.py's stdout into the round
record; two of the first four rounds produced null records because a single
section crash aborted the whole run before any JSON was printed.  These
tests pin the harness contract:

* every section (including the headline device section) is retried and its
  failure is recorded WITHOUT aborting the run,
* the cumulative report is re-emitted after every section, so a mid-run kill
  still leaves a parseable snapshot,
* main() exits 0 whenever any section produced a number.
"""
import importlib.util
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    """Import bench.py as a throwaway module with all sections stubbed out
    and the partial-report file pointed into tmp_path."""
    spec = importlib.util.spec_from_file_location("bench_under_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "PARTIAL_PATH", tmp_path / "partial.json")
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)  # skip backoff waits

    def stub(payload):
        return lambda: dict(payload)

    monkeypatch.setattr(mod, "bench_device", stub({"value": 12345.0}))
    monkeypatch.setattr(mod, "bench_host_pipeline", stub({"host_pipeline_audio_sec_per_sec": 100.0}))
    monkeypatch.setattr(mod, "bench_e2e_tpu", stub({"e2e_tpu_audio_sec_per_sec": 200.0}))
    monkeypatch.setattr(mod, "bench_e2e_tpu_adpcm4", stub({"e2e_tpu_audio_sec_per_sec_adpcm4": 300.0}))
    monkeypatch.setattr(mod, "bench_e2e_cached", stub({"e2e_cached_audio_sec_per_sec": 400.0}))
    monkeypatch.setattr(mod, "bench_precomputed", stub({"precomputed_audio_sec_per_sec": 500.0}))
    yield mod
    sys.modules.pop("bench_under_test", None)


def last_json_line(captured: str) -> dict:
    lines = [ln for ln in captured.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in output: {captured!r}"
    return json.loads(lines[-1])


def all_json_lines(captured: str) -> list:
    return [json.loads(ln) for ln in captured.splitlines() if ln.startswith("{")]


def test_all_sections_ok(bench, capsys):
    rc = bench.main()
    out = capsys.readouterr().out
    report = last_json_line(out)
    assert rc == 0
    assert report["value"] == 12345.0
    assert report["vs_baseline"] == pytest.approx(1.234)
    assert report["precomputed_audio_sec_per_sec"] == 500.0
    assert not any(k.endswith("_error") for k in report)
    # One emission per section: a kill after any section leaves a record.
    assert len(all_json_lines(out)) == len(bench.SECTION_NAMES)


def test_headline_crash_does_not_zero_the_record(bench, capsys, monkeypatch):
    """The exact round-4 failure mode: bench_device raises on the chip."""

    def boom():
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    monkeypatch.setattr(bench, "bench_device", boom)
    rc = bench.main()
    report = last_json_line(capsys.readouterr().out)
    assert rc == 0  # other sections produced numbers
    assert "bench_device_error" in report
    assert "FAILED_PRECONDITION" in report["bench_device_error"]
    assert report["value"] == 0.0  # placeholder, but the key EXISTS
    assert report["host_pipeline_audio_sec_per_sec"] == 100.0
    assert report["e2e_cached_audio_sec_per_sec"] == 400.0


def test_transient_failure_is_retried_to_success(bench, capsys, monkeypatch):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient tunnel error")
        return {"value": 777.0}

    monkeypatch.setattr(bench, "bench_device", flaky)
    rc = bench.main()
    report = last_json_line(capsys.readouterr().out)
    assert rc == 0
    assert calls["n"] == 3
    assert report["value"] == 777.0
    assert "bench_device_error" not in report  # cleared on eventual success
    assert report["vs_baseline"] == pytest.approx(0.078)


def test_aux_crash_keeps_headline_and_later_sections(bench, capsys, monkeypatch):
    def boom():
        raise ValueError("host pipeline exploded")

    monkeypatch.setattr(bench, "bench_host_pipeline", boom)
    rc = bench.main()
    out = capsys.readouterr().out
    report = last_json_line(out)
    assert rc == 0
    assert report["value"] == 12345.0
    assert report["bench_host_pipeline_error"].startswith("ValueError")
    assert report["precomputed_audio_sec_per_sec"] == 500.0


def test_partial_snapshot_after_each_section(bench, capsys):
    """A mid-run kill leaves the previous section's snapshot: every emitted
    line must be valid JSON carrying the headline keys."""
    bench.main()
    lines = all_json_lines(capsys.readouterr().out)
    for snap in lines:
        assert "value" in snap and "metric" in snap and "unit" in snap
    # Every emission is self-describing about completeness.
    assert lines[-1]["status"] == "complete"
    assert all("partial" in l["status"] for l in lines[:-1])
    # bench_device's number is present from its section onward.
    dev_idx = bench.SECTION_NAMES.index("bench_device")
    assert lines[dev_idx]["value"] == 12345.0
    # The on-disk mirror matches the final line.
    on_disk = json.loads(bench.PARTIAL_PATH.read_text())
    assert on_disk == lines[-1]


def test_total_failure_exits_nonzero_but_still_emits(bench, capsys, monkeypatch):
    def boom():
        raise RuntimeError("everything is down")

    for name in bench.SECTION_NAMES:
        monkeypatch.setattr(bench, name, boom)
    rc = bench.main()
    report = last_json_line(capsys.readouterr().out)
    assert rc == 1
    for name in bench.SECTION_NAMES:
        assert f"{name}_error" in report
