"""
CLI commands for CSJ, NSC, and SBCSAE.

Reference behavior: `/root/reference/lhotse/bin/modes/recipes/{csj,nsc,sbcsae}.py`.
"""
from typing import Optional, Sequence

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = ["csj", "nsc", "sbcsae"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("manifest_dir", type=click.Path())
@click.option(
    "-t", "--transcript-dir", type=click.Path(),
    help="Directory where per-speaker transcripts are materialized.")
@click.option("-p", "--dataset-parts", type=str, multiple=True)
@click.option("-j", "--num-jobs", type=int, default=16)
def csj(
    corpus_dir: Pathlike, manifest_dir: Pathlike, transcript_dir: Optional[Pathlike],
    dataset_parts: Sequence[str], num_jobs: int):
    """CSJ (Corpus of Spontaneous Japanese) data preparation."""
    from lhotse_tpu.recipes.csj import prepare_csj

    prepare_csj(
        corpus_dir=corpus_dir, transcript_dir=transcript_dir,
        manifest_dir=manifest_dir, dataset_parts=list(dataset_parts) or None,
        nj=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--dataset-part", type=str, default="PART3_SameCloseMic",
    help="Which part of NSC to prepare, e.g. PART3_SameCloseMic.")
@click.option("-j", "--num-jobs", type=int, default=1)
def nsc(corpus_dir: Pathlike, output_dir: Pathlike, dataset_part: str, num_jobs: int):
    """NSC (National Speech Corpus of Singapore English) data preparation."""
    from lhotse_tpu.recipes.nsc import prepare_nsc

    prepare_nsc(
        corpus_dir, dataset_part=dataset_part, output_dir=output_dir,
        num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "--geolocation", is_flag=True, default=False,
    help="Attach speaker hometown coordinates (requires geopy).")
@click.option(
    "--omit-realignments", is_flag=True, default=False,
    help="Only output the original corpus segmentation.")
def sbcsae(
    corpus_dir: Pathlike, output_dir: Pathlike, geolocation: bool,
    omit_realignments: bool):
    """SBCSAE (Santa Barbara Corpus) data preparation."""
    from lhotse_tpu.recipes.sbcsae import prepare_sbcsae

    prepare_sbcsae(
        corpus_dir, output_dir=output_dir, geolocation=geolocation,
        omit_realignments=omit_realignments)


@download.command(name="sbcsae", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("--force-download", is_flag=True, default=False)
def sbcsae_dl(target_dir: Pathlike, force_download: bool):
    """SBCSAE download."""
    from lhotse_tpu.recipes.sbcsae import download_sbcsae

    download_sbcsae(target_dir, force_download=force_download)
