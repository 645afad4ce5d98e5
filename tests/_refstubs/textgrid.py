"""Functional stand-in for the ``textgrid`` package (absent in this env),
backed by lhotse_tpu's own Praat TextGrid reader — lets the reference's
meeting-corpus recipes (AliMeeting, AISHELL-4, ICMC-ASR) run for
differential tests.  The reference uses only
``TextGrid.fromFile(path) -> .tiers[] -> .name / .intervals[] ->
.minTime / .maxTime / .mark``."""


class TextGrid:
    def __init__(self, tiers):
        self.tiers = tiers

    @classmethod
    def fromFile(cls, path):
        from lhotse_tpu.recipes.textgrid import read_textgrid

        return cls(read_textgrid(path))
