"""
TokenConstraint + TextExample sampling (the LM/multimodal path, reference:
lhotse/dataset/sampling/base.py:705 TokenConstraint, lhotse/cut/text.py) —
previously untested.
"""
import numpy as np
import pytest

from lhotse_tpu.cut.text import TextExample, TextPairExample
from lhotse_tpu.dataset.sampling.base import TokenConstraint
from lhotse_tpu.dataset.sampling.dynamic import DynamicCutSampler
from lhotse_tpu.lazy import LazyTxtIterator


def _example(n_tokens: int) -> TextExample:
    return TextExample(text="x " * n_tokens, tokens=np.arange(n_tokens))


class TestTokenConstraint:
    def test_padded_budget_semantics(self):
        """Cost model = num_examples x longest_seen (the padded tensor)."""
        c = TokenConstraint(max_tokens=100)
        c.add(_example(40))
        assert not c.close_to_exceeding()
        c.add(_example(10))  # 2 x 40 = 80 <= 100
        assert not c.exceeded()
        c.add(_example(30))  # 3 x 40 = 120 > 100
        assert c.exceeded()

    def test_longest_seen_governs(self):
        c = TokenConstraint(max_tokens=100)
        c.add(_example(10))
        c.add(_example(50))  # 2 x 50 = 100: at budget
        assert not c.exceeded()
        c.add(_example(10))  # 3 x 50 = 150
        assert c.exceeded()

    def test_max_examples(self):
        c = TokenConstraint(max_tokens=10_000, max_examples=2)
        c.add(_example(5))
        assert not c.close_to_exceeding()
        c.add(_example(5))
        assert c.close_to_exceeding()

    def test_reset(self):
        c = TokenConstraint(max_tokens=50)
        c.add(_example(49))
        c.reset()
        assert c.num_examples == 0 and c.current == 0 and c.longest_seen == 0
        c.add(_example(49))
        assert not c.exceeded()

    def test_quadratic_length_penalty(self):
        plain = TokenConstraint(max_tokens=100)
        quad = TokenConstraint(max_tokens=100, quadratic_length=10)
        plain.add(_example(50))
        quad.add(_example(50))
        # Effective length 50 + 50^2/10 = 300 > 100: quadratic exceeds.
        assert not plain.exceeded()
        assert quad.exceeded()

    def test_measure_length_uses_tokens(self):
        c = TokenConstraint(max_tokens=10)
        assert c.measure_length(_example(7)) == 7
        pair = TextPairExample(source=_example(3), target=_example(9))
        assert c.measure_length(pair) == 3


class TestTextSampling:
    def test_dynamic_sampler_with_token_constraint(self):
        examples = [_example(n) for n in [10, 12, 30, 8, 25, 14, 40, 5]]

        class _Eager:
            def __iter__(self):
                return iter(examples)

            def __len__(self):
                return len(examples)

        sampler = DynamicCutSampler(
            _Eager(),
            constraint=TokenConstraint(max_tokens=80),
            world_size=1,
            rank=0,
            shuffle=False,
        )
        batches = list(sampler)
        got = [e for b in batches for e in b]
        assert [e.num_tokens for e in got] == [e.num_tokens for e in examples]
        for b in batches:
            b = list(b)
            # The batch closes ON the crossing element (reference
            # DurationBatcher semantics), so the budget holds for every
            # proper prefix.
            if len(b) > 1:
                prefix = b[:-1]
                longest = max(e.num_tokens for e in prefix)
                assert len(prefix) * longest <= 80, [e.num_tokens for e in b]

    def test_lazy_txt_iterator_yields_text_examples(self, tmp_path):
        path = tmp_path / "corpus.txt"
        path.write_text("hello world\nsecond line\n\nthird\n")
        examples = list(LazyTxtIterator(path))
        # Empty lines are preserved as empty-text examples (reference
        # LazyTxtIterator semantics: every line is an example).
        texts = [e.text for e in examples]
        assert "hello world" in texts and "third" in texts
        assert all(isinstance(e, TextExample) for e in examples)
        assert examples[0].num_tokens is None  # not tokenized yet
