"""Multilingual MMS forced aligner (workflows/forced_alignment/mms_aligner.py).

The acoustic model is injected via ``emission_fn``/``vocab`` (no network in
this env), so these tests pin the full text-normalization -> romanization ->
trellis -> word-span pipeline against synthetic emissions.
"""
import numpy as np
import pytest

from lhotse_tpu.testing.dummies import dummy_cut, dummy_supervision
from lhotse_tpu.workflows import align_supervisions
from lhotse_tpu.workflows.forced_alignment import FailedToAlign, MMSForcedAligner
from lhotse_tpu.workflows.forced_alignment.mms_aligner import (
    normalize_language,
    romanize_words,
    word_tokenize,
)

# MMS-style romanized vocabulary: blank first, then lowercase letters.
VOCAB = {"<blank>": 0}
for ch in "abcdefghijklmnopqrstuvwxyz'":
    VOCAB[ch] = len(VOCAB)

SR = 16000
FRAMES_PER_SEC = 50  # wav2vec2-style 20 ms stride


def peaked_emission_for(chars, frames_per_char=3, lead=2):
    """Emission strongly peaked on each char in sequence, blanks elsewhere."""
    n_frames = lead + frames_per_char * len(chars) + lead
    em = np.full((n_frames, len(VOCAB)), -12.0)
    em[:, 0] = -0.5  # blank mildly likely everywhere
    t = lead
    for c in chars:
        em[t : t + frames_per_char, 0] = -12.0
        em[t : t + frames_per_char, VOCAB[c]] = 0.0
        t += frames_per_char
    return em - np.log(np.sum(np.exp(em), axis=1, keepdims=True))


def make_aligner(chars_expected, **kwargs):
    def emission_fn(audio):
        return peaked_emission_for(chars_expected)

    return MMSForcedAligner(
        emission_fn=emission_fn, vocab=VOCAB, sample_rate=SR,
        check_language=False, **kwargs)


class TestHelpers:
    def test_normalize_language_tags(self):
        assert normalize_language("en") == "en"
        assert normalize_language("en-US") == "en"
        assert normalize_language("zh_CN") == "zh"
        assert normalize_language(None) is None

    def test_normalize_language_names(self):
        assert normalize_language("English") == "en"
        assert normalize_language("Mandarin") == "zh"

    def test_word_tokenize_spaced(self):
        assert word_tokenize("hello  world", "en") == ["hello", "world"]

    def test_word_tokenize_no_space_language(self):
        # jieba is installed in this env -> real word segmentation; the
        # fallback (char-level + warning) triggers for e.g. Lao, which has
        # no supported tokenizer at all.
        toks = word_tokenize("你好吗", "zh")
        assert toks and "".join(toks) == "你好吗"

    def test_word_tokenize_unsupported_no_space_language_chars(self):
        toks = word_tokenize("ສະບາຍດີ", "lo")
        assert toks == list("ສະບາຍດີ")

    def test_romanize_latin_with_diacritics(self):
        assert romanize_words(["Café", "naïve"]) == ["cafe", "naive"]

    def test_romanize_apostrophe_variants(self):
        assert romanize_words(["don’t"]) == ["don't"]


class TestNormalizeText:
    def test_pairs_and_dropped_words(self):
        aligner = make_aligner("catsat")
        pairs = aligner.normalize_text("Cat -- sat 42", language="en")
        # "--" and "42" normalize to empty/dash and are dropped.
        assert pairs == [("Cat", "cat"), ("sat", "sat")]

    def test_diacritics_fold_into_vocab(self):
        aligner = make_aligner("cafe")
        pairs = aligner.normalize_text("café", language="fr")
        assert pairs == [("café", "cafe")]


class TestAlign:
    def test_word_spans_ordered_and_scored(self):
        aligner = make_aligner("catsat")
        transcript = [("cat", "cat"), ("sat", "sat")]
        audio = np.zeros((1, SR), dtype=np.float32)
        items = aligner.align(audio, transcript)
        assert [i.symbol for i in items] == ["cat", "sat"]
        assert items[0].start < items[1].start
        assert items[0].duration > 0 and items[1].duration > 0
        assert 0.0 < items[0].score <= 1.0
        # Non-overlapping words in a monotone alignment.
        assert items[0].start + items[0].duration <= items[1].start + 1e-6

    def test_empty_transcript_raises(self):
        aligner = make_aligner("x")
        with pytest.raises(FailedToAlign):
            aligner.align(np.zeros((1, SR), dtype=np.float32), [])

    def test_oov_character_raises(self):
        aligner = make_aligner("cat")
        with pytest.raises(FailedToAlign):
            aligner.align(
                np.zeros((1, SR), dtype=np.float32), [("!!", "!!")])

    def test_end_to_end_attaches_alignment(self):
        cut = dummy_cut(
            0, with_data=True, duration=1.0,
            supervisions=[dummy_supervision(0, duration=1.0, text="cat sat")])
        gen = align_supervisions(
            [cut],
            aligner_factory=lambda: make_aligner("catsat"),
        )
        (aligned,) = list(gen)
        ali = aligned.supervisions[0].alignment["word"]
        assert [a.symbol for a in ali] == ["cat", "sat"]
        assert all(a.duration > 0 for a in ali)


def test_align_with_torchaudio_mms_bundle_routes_to_mms():
    """MMS_FA is no longer rejected with NotImplementedError; empty input
    drains cleanly (the model is only constructed when cuts arrive)."""
    from lhotse_tpu.workflows.forced_alignment.workflow import align_with_torchaudio

    assert list(align_with_torchaudio([], bundle_name="MMS_FA")) == []
