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
@click.option(
    "--save-to-wav", is_flag=True, default=False,
    help="For sdm/ihm/mdm, decode the .sph channels once and store WAVs "
    "under OUTPUT_DIR/wavs for faster reads.")
def icsi(
    audio_dir: Pathlike, output_dir: Pathlike, transcripts_dir: Optional[Pathlike], mic: str,
    normalize_text: str, save_to_wav: bool):
    """ICSI Meeting Corpus data preparation."""
    prepare_icsi(
        audio_dir, transcripts_dir=transcripts_dir, output_dir=output_dir, mic=mic,
        normalize_text=normalize_text, save_to_wav=save_to_wav)


@download.command(name="icsi", context_settings=dict(show_default=True))
@click.argument("audio_dir", type=click.Path())
@click.option(
    "--transcripts-dir", type=click.Path(), default=None,
    help="Download annotations to a different directory than the audio.")
@click.option("--mic", type=click.Choice(sorted(MIC_TO_CHANNELS)), default="ihm")
@click.option("--url", type=str, default="http://groups.inf.ed.ac.uk/ami",
              help="ICSI download URL.")
@click.option("--force-download", is_flag=True, default=False)
def icsi_dl(
    audio_dir: Pathlike, transcripts_dir: Optional[Pathlike], mic: str, url: str,
    force_download: bool):
    """ICSI Meeting Corpus download."""
    download_icsi(
        audio_dir, transcripts_dir=transcripts_dir, mic=mic, url=url,
        force_download=force_download)
