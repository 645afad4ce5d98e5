"""
Whisper ASR pseudo-labeling workflow.

Parity target: `/root/reference/lhotse/workflows/whisper.py:11-200`
(``annotate_with_whisper``): run Whisper over a RecordingSet or CutSet,
turning its segmentation + transcription + language id into supervisions.

Two interchangeable model backends (the reference supports only the first):

- ``"openai"`` — the original ``whisper`` package (optional dependency);
- ``"transformers"`` — any ``openai/whisper-*`` checkpoint through the
  HuggingFace ASR pipeline with segment timestamps.

``backend="auto"`` picks whichever is importable.
"""
from __future__ import annotations

import logging
from typing import Generator, List, Optional, Union

from lhotse_tpu.audio import RecordingSet
from lhotse_tpu.cut import CutSet
from lhotse_tpu.qa import trim_supervisions_to_recordings
from lhotse_tpu.supervision import SupervisionSegment
from lhotse_tpu.utils import add_durations, fastcopy, is_module_available


def annotate_with_whisper(
    manifest: Union[RecordingSet, CutSet], model_name: str = "base", device: str = "cpu",
    force_nonoverlapping: bool = False, download_root: Optional[str] = None, backend: str = "auto",
    transcribe_fn=None, **decode_options) -> Generator:
    """
    Annotate recordings or cuts with Whisper ASR (segmentation,
    transcription, language id). For a CutSet the existing supervisions are
    overwritten. Yields cuts; use ``CutSet.open_writer()`` to persist.

    ``transcribe_fn`` overrides the model: a callable
    ``(audio_f32_16k, **decode_options) -> ([(start, end, text), ...],
    language)`` — the injection point for tests and custom ASR backends
    (the MMS aligner's ``emission_fn`` pattern).
    """
    transcribe = (
        transcribe_fn
        if transcribe_fn is not None
        else _make_transcriber(
            model_name=model_name, device=device, download_root=download_root,
            backend=backend)
    )
    if isinstance(manifest, RecordingSet):
        items = ((r, r.to_cut()) for r in manifest)
    elif isinstance(manifest, CutSet):
        items = ((c, c) for c in manifest)
    else:
        raise ValueError("The `manifest` must be either a RecordingSet or a CutSet.")

    is_recording_set = isinstance(manifest, RecordingSet)
    for item, cut in items:
        if item.num_channels > 1:
            logging.warning(
                f"Skipping '{item.id}': it has {item.num_channels} channels, "
                f"but only mono input is supported."
            )
            continue
        audio = item.resample(16000).load_audio()[0]
        segments, language = transcribe(audio, **decode_options)
        supervisions = [
            SupervisionSegment( id=f"{cut.id}-{i:06d}", recording_id=getattr(cut, "recording_id", cut.id), start=round(start, ndigits=8), duration=add_durations( min(end, cut.duration), -start, sampling_rate=16000 ), text=text.strip(), language=language, ) for i,
            (start, end, text) in enumerate(segments) if end - start > 0]
        if force_nonoverlapping:
            supervisions = _postprocess_timestamps(supervisions)
        if is_recording_set:
            if supervisions:
                cut.supervisions = list(
                    trim_supervisions_to_recordings(
                        recordings=item, supervisions=supervisions, verbose=False
                    )
                )
            yield cut
        else:
            yield fastcopy(cut, supervisions=supervisions)


def _make_transcriber(model_name: str, device: str, download_root: Optional[str], backend: str):
    """Returns transcribe(audio, **opts) -> (segments, language) where
    segments is a list of (start_sec, end_sec, text)."""
    if backend == "auto":
        backend = "openai" if is_module_available("whisper") else "transformers"

    if backend == "openai":
        assert is_module_available("whisper"), (
            "backend='openai' expects the OpenAI `whisper` package "
            "(pip install openai-whisper)."
        )
        import whisper

        model = whisper.load_model(model_name, device=device, download_root=download_root)

        def transcribe(audio, **opts):
            result = whisper.transcribe(model=model, audio=audio, **opts)
            return (
                [(s["start"], s["end"], s["text"]) for s in result["segments"]], result["language"])

        return transcribe

    if backend == "transformers":
        assert is_module_available("transformers"), (
            "backend='transformers' expects the `transformers` package."
        )
        from transformers import pipeline

        checkpoint = (model_name if "/" in model_name else f"openai/whisper-{model_name}")
        pipe = pipeline(
            "automatic-speech-recognition", model=checkpoint, device=device,
            model_kwargs={"cache_dir": download_root} if download_root else None)

        def transcribe(audio, **opts):
            language = opts.pop("language", None)
            generate_kwargs = {"language": language} if language else {}
            result = pipe(
                {"array": audio, "sampling_rate": 16000}, return_timestamps=True,
                generate_kwargs=generate_kwargs, **opts)
            segments = [
                (c["timestamp"][0], c["timestamp"][1], c["text"])
                for c in result.get("chunks", [])
                if c["timestamp"][0] is not None and c["timestamp"][1] is not None
            ]
            return segments, language

        return transcribe

    raise ValueError(f"Unknown whisper backend: {backend}")


def _postprocess_timestamps(supervisions: List[SupervisionSegment],) -> List[SupervisionSegment]:
    """Truncate each segment at the next one's start (Whisper end timestamps
    overshoot; assumes non-overlapping speech). Reference: whisper.py:172-200."""
    supervisions = sorted(supervisions, key=lambda s: s.start)
    if len(supervisions) < 2:
        return supervisions
    out = []
    for cur, nxt in zip(supervisions, supervisions[1:]):
        if cur.end > nxt.start:
            cur = cur.trim(end=nxt.start)
        out.append(cur)
    out.append(supervisions[-1])
    return out
