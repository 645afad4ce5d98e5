"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/gigaspeech.py`."""
from typing import Sequence

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.gigaspeech import (
    GIGASPEECH_PARTS, download_gigaspeech, prepare_gigaspeech)
from lhotse_tpu.utils import Pathlike

__all__ = ["gigaspeech"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--subset", "--dataset-parts", "dataset_parts",
    type=click.Choice(("auto",) + GIGASPEECH_PARTS), multiple=True, default=["auto"])
@click.option("-j", "--num-jobs", type=int, default=1)
def gigaspeech(
    corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts: Sequence[str], num_jobs: int):
    """GigaSpeech ASR data preparation (requires 'speechcolab')."""
    if len(dataset_parts) == 1:
        dataset_parts = dataset_parts[0]
    prepare_gigaspeech(
        corpus_dir, output_dir=output_dir, dataset_parts=dataset_parts, num_jobs=num_jobs)


@download.command(name="gigaspeech", context_settings=dict(show_default=True))
@click.argument("password", type=str)
@click.argument("target_dir", type=click.Path())
@click.option(
    "-p", "--subset", "--dataset-parts", "dataset_parts",
    type=click.Choice(("auto",) + GIGASPEECH_PARTS), multiple=True, default=["auto"])
@click.option("--host", type=str, default="tsinghua")
def gigaspeech_dl(password: str, target_dir: Pathlike, dataset_parts: Sequence[str], host: str):
    """GigaSpeech download (requires 'speechcolab' and the corpus password)."""
    if len(dataset_parts) == 1:
        dataset_parts = dataset_parts[0]
    download_gigaspeech(password, target_dir, dataset_parts=dataset_parts, host=host)
