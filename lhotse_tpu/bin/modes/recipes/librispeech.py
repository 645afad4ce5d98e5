"""
Reference behavior: `/root/reference/lhotse/bin/modes/recipes/librispeech.py`.
"""
from typing import Sequence

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.librispeech import download_librispeech, prepare_librispeech
from lhotse_tpu.utils import Pathlike

__all__ = ["librispeech"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "--alignments-dir", type=click.Path(exists=True, dir_okay=True), default=None,
    help="Directory holding the optional forced alignments.")
@click.option(
    "-p", "--dataset-parts", type=str, default=["auto"], multiple=True,
    help="Which dataset parts to prepare; repeat `-p` for several.")
@click.option(
    "-j", "--num-jobs", type=int, default=1,
    help="How many threads to use (can speed up slow disks).")
@click.option(
    "--normalize-text", type=click.Choice(["none", "lower"], case_sensitive=False), default="none",
    help="Text normalization applied to the transcripts.")
def librispeech(
    corpus_dir: Pathlike, output_dir: Pathlike, alignments_dir: Pathlike,
    dataset_parts: Sequence[str], num_jobs: int, normalize_text: str):
    """(Mini) LibriSpeech ASR data preparation."""
    if len(dataset_parts) == 1:
        dataset_parts = dataset_parts[0]
    prepare_librispeech(
        corpus_dir, output_dir=output_dir, alignments_dir=alignments_dir, num_jobs=num_jobs,
        dataset_parts=dataset_parts, normalize_text=normalize_text)


@download.command(name="librispeech", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option(
    "--full/--mini", default=False, help="Download LibriSpeech (full) or mini LibriSpeech.")
@click.option(
    "--alignments/--no-alignments", default=False, help="Also download the word alignments.")
def librispeech_dl(target_dir: Pathlike, full: bool, alignments: bool):
    """(Mini) LibriSpeech download."""
    download_librispeech(
        target_dir, dataset_parts="librispeech" if full else "mini_librispeech",
        alignments=alignments)
