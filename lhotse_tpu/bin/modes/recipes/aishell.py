"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/aishell.py`."""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.aishell import download_aishell, prepare_aishell
from lhotse_tpu.utils import Pathlike

__all__ = ["aishell"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def aishell(corpus_dir: Pathlike, output_dir: Pathlike):
    """AISHELL-1 ASR data preparation."""
    prepare_aishell(corpus_dir, output_dir=output_dir)


@download.command(name="aishell", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def aishell_dl(target_dir: Pathlike):
    """AISHELL-1 download."""
    download_aishell(target_dir)
