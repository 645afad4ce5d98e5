"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/icsi.py`."""
from typing import Optional

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.icsi import MIC_TO_CHANNELS, download_icsi, prepare_icsi
from lhotse_tpu.utils import Pathlike

__all__ = ["icsi"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("audio_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--transcripts-dir", type=click.Path(exists=True), default=None)
@click.option("--mic", type=click.Choice(sorted(MIC_TO_CHANNELS)), default="ihm")
@click.option(
    "--normalize-text", type=click.Choice(["none", "upper", "kaldi"], case_sensitive=False),
    default="kaldi")
def icsi(
    audio_dir: Pathlike, output_dir: Pathlike, transcripts_dir: Optional[Pathlike], mic: str,
    normalize_text: str):
    """ICSI Meeting Corpus data preparation."""
    prepare_icsi(
        audio_dir, transcripts_dir=transcripts_dir, output_dir=output_dir, mic=mic,
        normalize_text=normalize_text)


@download.command(name="icsi", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--mic", type=click.Choice(sorted(MIC_TO_CHANNELS)), default="ihm")
def icsi_dl(target_dir: Pathlike, mic: str):
    """ICSI Meeting Corpus download."""
    download_icsi(target_dir, mic=mic)
