"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/wenet_speech.py`."""
from typing import Sequence

import click

from lhotse_tpu.bin.modes.cli_base import prepare
from lhotse_tpu.recipes.wenet_speech import WENET_SPEECH_PARTS, prepare_wenet_speech
from lhotse_tpu.utils import Pathlike

__all__ = []


@prepare.command(name="wenet-speech", context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--dataset-parts", type=click.Choice(("all",) + WENET_SPEECH_PARTS), multiple=True,
    default=["all"])
@click.option("-j", "--num-jobs", type=int, default=1)
def wenet_speech(
    corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts: Sequence[str], num_jobs: int):
    """WenetSpeech ASR data preparation."""
    prepare_wenet_speech(
        corpus_dir, dataset_parts=list(dataset_parts), output_dir=output_dir, num_jobs=num_jobs)
