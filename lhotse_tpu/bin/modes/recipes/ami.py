"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/ami.py`."""
from typing import Optional

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.ami import MICS, PARTITIONS, download_ami, prepare_ami
from lhotse_tpu.utils import Pathlike

__all__ = ["ami"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "--annotations", "--annotations-dir", "annotations_dir", type=click.Path(exists=True),
    default=None,
    help="Provide if annotations were downloaded to a different directory than the corpus.")
@click.option("--mic", type=click.Choice(MICS), default="ihm")
@click.option("--partition", type=click.Choice(sorted(PARTITIONS)), default="full-corpus-asr")
@click.option(
    "--normalize-text", type=click.Choice(["none", "upper", "kaldi"], case_sensitive=False),
    default="kaldi")
@click.option("--max-words-per-segment", type=int, default=None)
@click.option("--merge-consecutive/--no-merge-consecutive", default=False)
@click.option("--keep-punctuation/--no-keep-punctuation", default=False)
def ami(
    corpus_dir: Pathlike, output_dir: Pathlike, annotations_dir: Optional[Pathlike], mic: str,
    partition: str, normalize_text: str, max_words_per_segment: Optional[int],
    merge_consecutive: bool, keep_punctuation: bool):
    """AMI Meeting Corpus data preparation."""
    prepare_ami(
        corpus_dir, annotations_dir=annotations_dir, output_dir=output_dir, mic=mic,
        partition=partition, normalize_text=normalize_text,
        max_words_per_segment=max_words_per_segment, merge_consecutive=merge_consecutive,
        keep_punctuation=keep_punctuation)


@download.command(name="ami", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--annotations", type=click.Path(), default=None)
@click.option("--mic", type=click.Choice(MICS), default="ihm")
@click.option("--url", type=str, default="http://groups.inf.ed.ac.uk/ami",
              help="AMI download URL.")
@click.option("--force-download", is_flag=True, default=False)
def ami_dl(
    target_dir: Pathlike, annotations: Optional[Pathlike], mic: str, url: str,
    force_download: bool):
    """AMI Meeting Corpus download."""
    download_ami(target_dir, annotations=annotations, mic=mic, url=url,
                 force_download=force_download)
