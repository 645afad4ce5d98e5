"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/ljspeech.py`."""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.ljspeech import download_ljspeech, prepare_ljspeech
from lhotse_tpu.utils import Pathlike

__all__ = ["ljspeech"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def ljspeech(corpus_dir: Pathlike, output_dir: Pathlike):
    """LJSpeech TTS data preparation."""
    prepare_ljspeech(corpus_dir, output_dir=output_dir)


@download.command(name="ljspeech", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def ljspeech_dl(target_dir: Pathlike):
    """LJSpeech download."""
    download_ljspeech(target_dir)
