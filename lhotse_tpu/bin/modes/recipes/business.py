"""
CLI for the business-speech corpora (SPGISpeech, Earnings-22).
Reference behavior: `/root/reference/lhotse/bin/modes/recipes/{spgispeech,earnings22}.py`.
"""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes import (
    download_earnings22, download_spgispeech, prepare_earnings22, prepare_spgispeech)
from lhotse_tpu.utils import Pathlike

__all__ = []


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--normalize-text/--no-normalize-text", default=True)
@click.option("-j", "--num-jobs", type=int, default=1)
def spgispeech(corpus_dir: Pathlike, output_dir: Pathlike, normalize_text: bool, num_jobs: int):
    """SPGISpeech data preparation."""
    prepare_spgispeech(
        corpus_dir, output_dir=output_dir, normalize_text=normalize_text, num_jobs=num_jobs)


@download.command(name="spgispeech", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def spgispeech_dl(target_dir: Pathlike):
    """SPGISpeech download (form-gated; prints instructions)."""
    download_spgispeech(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--normalize-text/--no-normalize-text", default=False)
def earnings22(corpus_dir: Pathlike, output_dir: Pathlike, normalize_text: bool):
    """Earnings-22 data preparation."""
    prepare_earnings22(corpus_dir, output_dir=output_dir, normalize_text=normalize_text)


@download.command(name="earnings22", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def earnings22_dl(target_dir: Pathlike):
    """Earnings-22 download (manual; prints instructions)."""
    download_earnings22(target_dir)
