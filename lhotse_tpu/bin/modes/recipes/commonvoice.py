"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/commonvoice.py`."""
from typing import Sequence

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.commonvoice import (
    COMMONVOICE_DEFAULT_SPLITS, COMMONVOICE_SPLITS, DEFAULT_COMMONVOICE_RELEASE,
    download_commonvoice, prepare_commonvoice)
from lhotse_tpu.utils import Pathlike

__all__ = ["commonvoice"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-l", "--language", "languages", type=str, multiple=True, default=["auto"],
    help="Language code(s) to prepare ('auto' scans the corpus dir).")
@click.option(
    "-s", "--split", "splits", type=click.Choice(COMMONVOICE_SPLITS), multiple=True,
    default=COMMONVOICE_DEFAULT_SPLITS)
@click.option("-j", "--num-jobs", type=int, default=1)
def commonvoice(
    corpus_dir: Pathlike, output_dir: Pathlike, languages: Sequence[str], splits: Sequence[str],
    num_jobs: int):
    """CommonVoice ASR data preparation."""
    if len(languages) == 1:
        languages = languages[0]
    prepare_commonvoice(
        corpus_dir, output_dir=output_dir, languages=languages, splits=splits, num_jobs=num_jobs)


@download.command(name="commonvoice", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option(
    "-l", "--language", "--languages", "languages", type=str, multiple=True, default=["all"])
@click.option("--release", type=str, default=DEFAULT_COMMONVOICE_RELEASE)
def commonvoice_dl(target_dir: Pathlike, languages: Sequence[str], release: str):
    """CommonVoice download."""
    if len(languages) == 1:
        languages = languages[0]
    download_commonvoice(target_dir, languages=languages, release=release)
