"""
CTC acoustic-model aligner backed by HuggingFace ``transformers``.

The reference's ``ASRForcedAligner``
(`/root/reference/lhotse/workflows/forced_alignment/asr_aligner.py:11-60`)
wraps torchaudio's WAV2VEC2_* pipeline bundles. torchaudio is not a
dependency of this framework, so the equivalent here wraps any
``transformers`` CTC checkpoint (default ``facebook/wav2vec2-base-960h`` —
the same acoustic model the reference default bundle ships). The trellis /
backtrack / merge math is shared, model-free numpy in :mod:`.ctc`.
"""
from __future__ import annotations

import re
from typing import List, Optional

import numpy as np

from lhotse_tpu.supervision import AlignmentItem
from lhotse_tpu.utils import is_module_available
from lhotse_tpu.workflows.forced_alignment.base import FailedToAlign, ForcedAligner
from lhotse_tpu.workflows.forced_alignment.ctc import align_ctc_emission


def make_discard_symbols_regex(labels) -> "re.Pattern":
    return re.compile(rf"[^{' '.join(labels)}]")


def normalize_asr_text(text: str, discard_symbols: "re.Pattern") -> str:
    """Uppercase, spell out digits when num2words is available, map spaces to
    the CTC word separator, and drop out-of-vocabulary symbols."""
    if is_module_available("num2words"):
        from num2words import num2words

        text = re.sub(r"(\d+)", lambda x: num2words(int(x.group(0))), text)
    return re.sub(discard_symbols, "", text.upper().replace(" ", "|"))


class TransformersForcedAligner(ForcedAligner):
    """Word-level CTC forced alignment with a transformers checkpoint."""

    def __init__(
        self, bundle_name: str = "facebook/wav2vec2-base-960h", device: str = "cpu", **kwargs):
        super().__init__(device=device)
        assert is_module_available("transformers"), (
            "TransformersForcedAligner requires the 'transformers' package."
        )
        import torch  # transformers CTC models are torch modules
        from transformers import AutoModelForCTC, AutoProcessor

        self.bundle_name = bundle_name
        self.processor = AutoProcessor.from_pretrained(bundle_name)
        self.model = AutoModelForCTC.from_pretrained(bundle_name).to(device).eval()
        self._torch = torch
        vocab = self.processor.tokenizer.get_vocab()
        self.dictionary = {k.upper(): v for k, v in vocab.items()}
        self.blank_id = self.model.config.pad_token_id or 0
        labels = [k for k in self.dictionary if len(k) == 1 and k not in ("<", ">")]
        self.discard_symbols = make_discard_symbols_regex(labels)
        self._sample_rate = int(getattr(self.processor.feature_extractor, "sampling_rate", 16000))

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    def normalize_text(self, text: str, language: Optional[str] = None) -> str:
        return normalize_asr_text(text, self.discard_symbols)

    def align(self, audio: np.ndarray, transcript: str) -> List[AlignmentItem]:
        torch = self._torch
        audio = np.atleast_2d(np.asarray(audio, dtype=np.float32))
        with torch.inference_mode():
            logits = self.model(torch.from_numpy(audio).to(self.device)).logits
            emission = torch.log_softmax(logits, dim=-1)[0].cpu().numpy()

        words = align_ctc_emission(emission, transcript, self.dictionary, blank_id=self.blank_id)
        if not words:
            raise FailedToAlign("No words survived alignment.")
        ratio = audio.shape[1] / emission.shape[0]
        return [
            AlignmentItem(
                symbol=w.label,
                start=round(int(ratio * w.start) / self.sample_rate, ndigits=8),
                duration=round(
                    int(ratio * (w.end - w.start)) / self.sample_rate, ndigits=8
                ),
                score=w.score,
            )
            for w in words
        ]


# Parity alias: the reference names its wav2vec2 CTC aligner `ASRForcedAligner`
# (`lhotse/workflows/forced_alignment/asr_aligner.py:79`).
ASRForcedAligner = TransformersForcedAligner
