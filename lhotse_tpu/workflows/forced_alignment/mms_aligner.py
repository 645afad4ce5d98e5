"""
Multilingual (MMS) forced aligner.

Parity target:
`/root/reference/lhotse/workflows/forced_alignment/mms_aligner.py` — there it
wraps torchaudio's ``MMS_FA`` pipeline bundle plus the ``uroman`` romanizer.
This framework does not depend on torchaudio, so the acoustic model is any
``transformers`` CTC checkpoint with a romanized (latin) vocabulary — the
default is a public port of the same MMS 300m forced-alignment model — and
the trellis math is the shared model-free numpy in :mod:`.ctc`.

Romanization: ``uroman`` is used when installed (same contract as the
reference); otherwise a documented best-effort fallback romanizes via
Unicode NFKD decomposition (exact for Latin-script languages, lossy for
other scripts — a warning is emitted once when it drops characters).

Word tokenization for languages written without spaces (zh/ja/ko/th/my/km)
delegates to the same optional tokenizers the reference uses (jieba, nagisa,
kss, attacut, pyidaungsu, khmernltk) and degrades to character-level
alignment with a warning when they are absent.
"""
from __future__ import annotations

import logging
import re
import unicodedata
import warnings
from typing import List, Optional, Sequence, Tuple

import numpy as np

from lhotse_tpu.supervision import AlignmentItem
from lhotse_tpu.utils import is_module_available
from lhotse_tpu.workflows.forced_alignment.base import FailedToAlign, ForcedAligner
from lhotse_tpu.workflows.forced_alignment.ctc import ctc_forced_align

# Languages whose orthography has no spaces between words (Korean does use
# spaces, but morpheme-level splits align much better).
LANGUAGES_WITHOUT_SPACES = ("zh", "ja", "ko", "th", "my", "km", "lo")

# transformers port of torchaudio's MMS_FA bundle (wav2vec2 300m fine-tuned
# on romanized text of 1130+ languages).
DEFAULT_MMS_CHECKPOINT = "MahmoudAshraf/mms-300m-1130-forced-aligner"

_TOKENIZER_FOR_LANGUAGE = {
    "zh": ("jieba", "jieba", lambda mod, text: mod.lcut(text)),
    "ja": ("nagisa", "nagisa", lambda mod, text: mod.tagging(text).words),
    "ko": ("kss", "kss", lambda mod, text: mod.split_morphemes(text, return_pos=False)),
    "th": ("attacut", "attacut", lambda mod, text: mod.tokenize(text)),
    "my": ("pyidaungsu", "pyidaungsu", lambda mod, text: mod.tokenize(text, form="word")),
    "km": ("khmernltk", "khmer-nltk", lambda mod, text: mod.word_tokenize(text)),
}

# Minimal language-name table for when ``langcodes`` is unavailable; covers
# the names that commonly appear in supervision metadata.
_LANGUAGE_NAMES = {
    "english": "en", "chinese": "zh", "mandarin": "zh", "japanese": "ja",
    "korean": "ko", "thai": "th", "burmese": "my", "khmer": "km", "lao": "lo",
    "french": "fr", "german": "de", "spanish": "es", "italian": "it",
    "portuguese": "pt", "russian": "ru", "arabic": "ar", "hindi": "hi",
    "vietnamese": "vi", "indonesian": "id", "dutch": "nl", "polish": "pl",
    "turkish": "tr", "swahili": "sw",
}


def normalize_language(language: Optional[str]) -> Optional[str]:
    """Top-level two-letter code for a language tag or an English language
    name (reference mms_aligner.py:185-208); best-effort without langcodes."""
    if language is None:
        return None
    if is_module_available("langcodes"):
        from langcodes import Language, tag_parser

        try:
            return Language.get(language).language
        except tag_parser.LanguageTagError:
            if is_module_available("language_data"):
                return Language.find(language).language
            # fall through to the table lookup
    tag = language.strip().lower().replace("_", "-").split("-")[0]
    if 2 <= len(tag) <= 3 and tag.isalpha():
        return tag[:2] if len(tag) == 3 and tag in ("zho", "jpn", "kor") else tag
    return _LANGUAGE_NAMES.get(tag)


def word_tokenize(text: str, language: Optional[str] = None) -> List[str]:
    """Split text into words, using a language-specific tokenizer for
    no-space orthographies when one is installed."""
    language = normalize_language(language)
    if language not in LANGUAGES_WITHOUT_SPACES:
        return text.split()
    spec = _TOKENIZER_FOR_LANGUAGE.get(language)
    if spec is not None:
        module_name, pip_name, tokenize = spec
        if is_module_available(module_name):
            mod = __import__(module_name)
            return list(tokenize(mod, text))
        warnings.warn(
            f"Tokenizing {language!r} text needs the '{module_name}' package "
            f"(pip install {pip_name}); falling back to character-level "
            f"alignment.")
    else:
        logging.warning(
            f"Language {language!r} has no spaces between words and no "
            f"supported tokenizer; proceeding with character-level alignment.")
    return [ch for ch in text if not ch.isspace()]


def _nfkd_romanize(word: str) -> str:
    """Best-effort romanization without uroman: decompose and keep ASCII
    letters/apostrophes. Exact for Latin-script input."""
    decomposed = unicodedata.normalize("NFKD", word.lower().replace("’", "'"))
    return "".join(c for c in decomposed if (c.isascii() and c.isalpha()) or c == "'")


def romanize_words(words: Sequence[str], language: Optional[str] = None) -> List[str]:
    """uroman when available, NFKD fallback otherwise."""
    if is_module_available("uroman"):
        from uroman import uroman

        sep = _safe_separator("".join(words))
        romanized = uroman(sep.join(words), language=language).split(sep)
        return [w.lower().replace("’", "'") for w in romanized]
    out = [_nfkd_romanize(w) for w in words]
    if any(w and not r for w, r in zip(words, out)):
        warnings.warn(
            "Some words could not be romanized without the 'uroman' package "
            "(pip install uroman-python); they will be dropped from the "
            "alignment.")
    return out


def _safe_separator(text: str) -> str:
    """A single character absent from the text (reference mms_aligner.py:211)."""
    for candidate in "#$%^&~_":
        if candidate not in text:
            return candidate
    return " "


class MMSForcedAligner(ForcedAligner):
    """Multilingual word-level forced alignment on romanized text.

    :param bundle_name: transformers CTC checkpoint with a romanized
        vocabulary (default: the MMS 300m forced-alignment port).
    :param check_language: warn when supervisions carry no language tag.
    :param emission_fn / vocab: advanced/testing — bypass the transformers
        model with ``emission_fn(audio) -> (frames, vocab) log-probs`` and an
        explicit ``{char: id}`` vocabulary.
    """

    def __init__(
        self,
        bundle_name: str = DEFAULT_MMS_CHECKPOINT,
        device: str = "cpu",
        check_language: bool = True,
        emission_fn=None,
        vocab: Optional[dict] = None,
        sample_rate: int = 16000,
        blank_id: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(device=device)
        self.check_language = check_language
        if emission_fn is not None:
            assert vocab is not None, "vocab is required together with emission_fn"
            self._emission_fn = emission_fn
            self.dictionary = dict(vocab)
            self.blank_id = 0 if blank_id is None else blank_id
            self._sample_rate = sample_rate
        else:
            assert is_module_available("transformers"), (
                "MMSForcedAligner requires the 'transformers' package "
                "(or pass emission_fn/vocab explicitly).")
            import torch
            from transformers import AutoModelForCTC, AutoProcessor

            self.processor = AutoProcessor.from_pretrained(bundle_name)
            self.model = AutoModelForCTC.from_pretrained(bundle_name).to(device).eval()
            self.dictionary = {
                k.lower(): v for k, v in self.processor.tokenizer.get_vocab().items()
            }
            self.blank_id = (
                blank_id if blank_id is not None
                else (self.model.config.pad_token_id or 0))
            self._sample_rate = int(
                getattr(self.processor.feature_extractor, "sampling_rate", sample_rate))

            def emission(audio: np.ndarray) -> np.ndarray:
                with torch.inference_mode():
                    logits = self.model(
                        torch.from_numpy(np.atleast_2d(audio)).to(self.device)
                    ).logits
                    return torch.log_softmax(logits, dim=-1)[0].cpu().numpy()

            self._emission_fn = emission
        letters = [k for k in self.dictionary if len(k) == 1]
        self._discard_re = re.compile(rf"[^{re.escape(''.join(letters))}]")

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    def normalize_text(
        self, text: str, language: Optional[str] = None
    ) -> List[Tuple[str, str]]:
        """(original_word, romanized_normalized_word) pairs; empty
        normalizations and bare dashes are dropped (they cannot align)."""
        norm_language = normalize_language(language)
        if norm_language is None and self.check_language:
            logging.warning(
                "No language tag on the supervision text; multilingual "
                "alignment may misbehave for languages written without "
                "spaces. Pass check_language=False to silence this.")
        orig_words = word_tokenize(text, language)
        romanized = romanize_words(orig_words, language=norm_language)
        norm_words = [self._discard_re.sub("", w).strip() for w in romanized]
        return [
            (orig, norm)
            for orig, norm in zip(orig_words, norm_words)
            if norm not in ("", "-")
        ]

    def align(
        self, audio: np.ndarray, transcript: List[Tuple[str, str]]
    ) -> List[AlignmentItem]:
        if not transcript:
            raise FailedToAlign("Empty transcript after normalization.")
        audio = np.atleast_2d(np.asarray(audio, dtype=np.float32))
        emission = self._emission_fn(audio)

        # Flatten the words into one token sequence, remembering the slice of
        # token indices each word owns (no inter-word separator symbol is
        # assumed — the MMS vocabulary has none).
        tokens: List[int] = []
        spans: List[Tuple[int, int]] = []
        for _, norm in transcript:
            start = len(tokens)
            try:
                tokens.extend(self.dictionary[c] for c in norm)
            except KeyError as e:
                raise FailedToAlign(f"Character not in the MMS vocabulary: {e}")
            spans.append((start, len(tokens)))

        try:
            path = ctc_forced_align(emission, tokens, blank_id=self.blank_id)
        except FailedToAlign:
            raise
        except Exception as e:
            raise FailedToAlign from e

        # Group path points into words by token-index span.
        frames_per_token: dict = {}
        for p in path:
            lo, hi = frames_per_token.setdefault(p.token_index, [p.time_index, p.time_index])
            frames_per_token[p.token_index] = [min(lo, p.time_index), max(hi, p.time_index)]
        ratio = audio.shape[1] / emission.shape[0] / self.sample_rate
        items = []
        for (orig, _), (lo_tok, hi_tok) in zip(transcript, spans):
            token_range = [
                frames_per_token[i] for i in range(lo_tok, hi_tok) if i in frames_per_token
            ]
            if not token_range:
                raise FailedToAlign(f"Word {orig!r} received no frames.")
            start_frame = token_range[0][0]
            end_frame = token_range[-1][1] + 1
            scores = [
                p.score for p in path if lo_tok <= p.token_index < hi_tok
            ]
            items.append(
                AlignmentItem(
                    symbol=orig,
                    start=round(ratio * start_frame, ndigits=8),
                    duration=round(ratio * (end_frame - start_frame), ndigits=8),
                    score=float(np.mean(scores)),
                )
            )
        return items
