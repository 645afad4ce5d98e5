"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/musan.py`."""
from typing import Sequence

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.musan import download_musan, prepare_musan
from lhotse_tpu.utils import Pathlike

__all__ = ["musan"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--parts", type=click.Choice(["music", "speech", "noise"]), multiple=True,
    default=["music", "speech", "noise"], help="Which MUSAN parts to prepare.")
@click.option(
    "--use-vocals/--no-vocals", default=True, help="Include music recordings with vocals.")
def musan(corpus_dir: Pathlike, output_dir: Pathlike, parts: Sequence[str], use_vocals: bool):
    """MUSAN data preparation (noise/music/speech for augmentation)."""
    prepare_musan(corpus_dir, output_dir=output_dir, parts=parts, use_vocals=use_vocals)


@download.command(name="musan", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def musan_dl(target_dir: Pathlike):
    """MUSAN download."""
    download_musan(target_dir)
