"""Timing/throughput tracer (SURVEY §5.1 build item)."""
import threading
import time

import numpy as np
import pytest

from lhotse_tpu import Fbank
from lhotse_tpu.tracing import (
    add_work, format_tracing_report, is_tracing_enabled, reset_tracing, set_tracing_enabled,
    trace_span, traced, tracing_report)


@pytest.fixture(autouse=True)
def _tracing():
    set_tracing_enabled(True)
    reset_tracing()
    yield
    set_tracing_enabled(False)
    reset_tracing()


def test_trace_span_accumulates():
    for _ in range(3):
        with trace_span("unit", work=2.0):
            time.sleep(0.001)
    rep = tracing_report()
    assert rep["unit"]["calls"] == 3
    assert rep["unit"]["work"] == 6.0
    assert rep["unit"]["total_s"] >= 0.003
    assert rep["unit"]["throughput"] == pytest.approx(6.0 / rep["unit"]["total_s"])


def test_add_work_attributes_to_innermost_span():
    with trace_span("outer"):
        with trace_span("inner"):
            add_work(5.0)
    rep = tracing_report()
    assert rep["inner"]["work"] == 5.0
    assert rep["outer"]["work"] == 0.0
    # Named attribution works outside any span.
    add_work(1.5, name="counter")
    assert tracing_report()["counter"]["work"] == 1.5


def test_traced_decorator_and_disable():
    @traced("fn")
    def fn():
        return 42

    assert fn() == 42
    assert tracing_report()["fn"]["calls"] == 1
    set_tracing_enabled(False)
    assert not is_tracing_enabled()
    fn()  # no-op recording
    assert tracing_report()["fn"]["calls"] == 1


def test_tracer_thread_safety():
    def work():
        for _ in range(50):
            with trace_span("mt"):
                add_work(1.0)

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    rep = tracing_report()
    assert rep["mt"]["calls"] == 200 and rep["mt"]["work"] == 200.0


def test_extractor_reports_audio_seconds():
    fb = Fbank()
    audio = [
        (np.random.RandomState(i).randn(16000 + i * 800) * 0.1).astype(np.float32)
        for i in range(4)
    ]
    fb.extract_batch(audio, 16000)
    fb.extract_batch(audio, 16000)
    rep = tracing_report()
    k = "Fbank.extract_batch"
    expected = 2 * sum(len(a) for a in audio) / 16000
    assert rep[k]["calls"] == 2
    assert rep[k]["work"] == pytest.approx(expected)
    assert rep[k]["throughput"] > 0
    assert "Fbank.extract_batch" in format_tracing_report(rep)


def test_report_formatting_empty():
    assert "no spans" in format_tracing_report({})


def test_feature_pipeline_reports_audio_seconds(tmp_path):
    from lhotse_tpu import CutSet
    from lhotse_tpu.testing.dummies import dummy_cut

    from lhotse_tpu import Recording
    from lhotse_tpu.audio.wavio import write_wav

    base = []
    for i in range(6):
        path = tmp_path / f"rec{i}.wav"
        write_wav(path, (np.random.RandomState(i).randn(1, 16000) * 0.1).astype(np.float32), 16000)
        base.append(Recording.from_file(path).to_cut())
    cuts = CutSet.from_cuts(base)
    out = cuts.compute_and_store_features_batch(
        extractor=Fbank(), storage_path=tmp_path / "feats",
        manifest_path=tmp_path / "cuts.jsonl.gz", batch_duration=2.0, num_workers=1)
    assert len(out) == 6 and all(c.has_features for c in out)
    rep = tracing_report()
    k = "CutSet.compute_and_store_features_batch"
    assert rep[k]["work"] == pytest.approx(6.0)
    assert rep[k]["calls"] == 3  # 2s batches over 6x1s cuts


class TestMetricsHooks:
    def test_emit_pushes_report_and_swallow_errors(self):
        from lhotse_tpu.tracing import (
            emit_metrics,
            register_metrics_hook,
            reset_tracing,
            set_tracing_enabled,
            trace_span,
            unregister_metrics_hook,
        )

        got = []

        def ok_hook(payload):
            got.append(payload)

        def bad_hook(payload):
            raise RuntimeError("exporter down")

        register_metrics_hook(bad_hook)
        register_metrics_hook(ok_hook)
        try:
            set_tracing_enabled(True)
            reset_tracing()
            with trace_span("unit.work", work=2.0):
                pass
            emit_metrics(extra={"step": 7})
        finally:
            set_tracing_enabled(False)
            unregister_metrics_hook(bad_hook)
            unregister_metrics_hook(ok_hook)
        assert len(got) == 1
        assert got[0]["unit.work"]["work"] == 2.0
        assert got[0]["extra"] == {"step": 7}

    def test_emit_without_hooks_is_noop(self):
        from lhotse_tpu.tracing import emit_metrics

        emit_metrics()  # must not raise
