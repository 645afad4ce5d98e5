"""Functional stand-in for the forked ``textgrids`` package (Praat-textgrids,
absent in this env), backed by lhotse_tpu's own TextGrid reader — used by the
reference's NSC recipe.  The reference needs: ``TextGrid(path, coding=...)``
behaving as a dict of tier-name -> list of segments with .xmin/.xmax/.text,
plus ``.keys()``."""
from types import SimpleNamespace


class TextGrid(dict):
    def __init__(self, path=None, coding=None):
        super().__init__()
        if path is not None:
            from lhotse_tpu.recipes.textgrid import read_textgrid

            for tier in read_textgrid(path):
                self[tier.name] = [
                    SimpleNamespace(xmin=iv.minTime, xmax=iv.maxTime, text=iv.mark)
                    for iv in tier.intervals
                ]
