"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/libritts.py`."""
from typing import Sequence

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.libritts import (download_libritts, download_librittsr, prepare_libritts)
from lhotse_tpu.utils import Pathlike

__all__ = ["libritts", "librittsr"]


def _prepare_opts(fn):
    fn = click.option(
        "-p", "--dataset-parts", type=str, default=["all"], multiple=True,
        help="Dataset parts to prepare (e.g. dev-clean).")(fn)
    fn = click.option("-j", "--num-jobs", type=int, default=1)(fn)
    fn = click.option(
        "--link-previous-utterance/--no-previous-utterance",
        "--link-previous-utt/--no-link-previous-utt", "link_previous_utt", default=False,
        help="Attach the previous utterance id to supervisions (for TTS chains).")(fn)
    return fn


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@_prepare_opts
def libritts(
    corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts: Sequence[str], num_jobs: int,
    link_previous_utt: bool):
    """LibriTTS TTS data preparation."""
    if len(dataset_parts) == 1:
        dataset_parts = dataset_parts[0]
    prepare_libritts(
        corpus_dir, output_dir=output_dir, dataset_parts=dataset_parts, num_jobs=num_jobs,
        link_previous_utt=link_previous_utt)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@_prepare_opts
def librittsr(
    corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts: Sequence[str], num_jobs: int,
    link_previous_utt: bool):
    """LibriTTS-R TTS data preparation."""
    if len(dataset_parts) == 1:
        dataset_parts = dataset_parts[0]
    prepare_libritts(
        corpus_dir, output_dir=output_dir, dataset_parts=dataset_parts, num_jobs=num_jobs,
        link_previous_utt=link_previous_utt)


@download.command(name="libritts", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("-p", "--dataset-parts", type=str, default=["all"], multiple=True)
def libritts_dl(target_dir: Pathlike, dataset_parts: Sequence[str]):
    """LibriTTS download."""
    download_libritts(target_dir, dataset_parts=list(dataset_parts))


@download.command(name="librittsr", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("-p", "--dataset-parts", type=str, default=["all"], multiple=True)
def librittsr_dl(target_dir: Pathlike, dataset_parts: Sequence[str]):
    """LibriTTS-R download."""
    download_librittsr(target_dir, dataset_parts=list(dataset_parts))
