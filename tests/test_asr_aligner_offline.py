"""
End-to-end CTC forced alignment through a REAL transformers wav2vec2 model —
a tiny random-initialized checkpoint built and saved locally, so the full
model path (processor, CTC head, emission extraction, trellis, backtrack,
merge) runs without any network access.
"""
import json
import warnings

import numpy as np
import pytest

pytest.importorskip("transformers")
pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_ctc_checkpoint(tmp_path_factory):
    import torch
    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2ForCTC,
        Wav2Vec2Processor,
    )

    d = tmp_path_factory.mktemp("tiny_w2v2")
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, ch in enumerate("ABCDEFGHIJKLMNOPQRSTUVWXYZ'"):
        vocab[ch] = 5 + i
    (d / "vocab.json").write_text(json.dumps(vocab))
    tok = Wav2Vec2CTCTokenizer(str(d / "vocab.json"), pad_token="<pad>",
                               word_delimiter_token="|")
    fe = Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False)
    Wav2Vec2Processor(feature_extractor=fe, tokenizer=tok).save_pretrained(d)
    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_stride=(5, 4, 4), conv_kernel=(10, 3, 3),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    Wav2Vec2ForCTC(cfg).save_pretrained(d)
    return str(d)


@pytest.fixture
def cut():
    from lhotse_tpu.testing.dummies import dummy_cut, dummy_supervision

    c = dummy_cut(0, duration=1.0, with_data=True,
                  supervisions=[dummy_supervision(0, duration=1.0)])
    c.supervisions[0].text = "HELLO WORLD"
    c.custom = {}
    return c


def test_transformers_aligner_end_to_end(tiny_ctc_checkpoint, cut):
    from lhotse_tpu.workflows.forced_alignment.asr_aligner import (
        TransformersForcedAligner,
    )

    aligner = TransformersForcedAligner(bundle_name=tiny_ctc_checkpoint, device="cpu")
    aligned = aligner(cut)
    ali = aligned.supervisions[0].alignment["word"]
    assert [a.symbol for a in ali] == ["HELLO", "WORLD"]
    # Timestamps are monotonic, non-negative, within the cut.
    assert ali[0].start >= 0.0
    assert ali[0].start <= ali[1].start
    for a in ali:
        assert a.duration > 0 and a.start + a.duration <= cut.duration + 1e-6


def test_align_supervisions_workflow(tiny_ctc_checkpoint, cut):
    from lhotse_tpu import CutSet
    from lhotse_tpu.workflows import align_supervisions

    cuts = CutSet.from_cuts([cut])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = list(align_supervisions(cuts, model_name=tiny_ctc_checkpoint))
    assert len(out) == 1
    ali = out[0].supervisions[0].alignment["word"]
    assert [a.symbol for a in ali] == ["HELLO", "WORLD"]
    # Serialization keeps the alignment attached.
    reloaded = type(out[0]).from_dict(out[0].to_dict())
    assert reloaded.supervisions[0].alignment["word"] == ali
