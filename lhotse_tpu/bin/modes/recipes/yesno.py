"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/yesno.py`."""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.yesno import download_yesno, prepare_yesno
from lhotse_tpu.utils import Pathlike

__all__ = ["yesno"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def yesno(corpus_dir: Pathlike, output_dir: Pathlike):
    """YesNo ASR data preparation."""
    prepare_yesno(corpus_dir, output_dir=output_dir)


@download.command(name="yesno", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def yesno_dl(target_dir: Pathlike):
    """YesNo download."""
    download_yesno(target_dir)
