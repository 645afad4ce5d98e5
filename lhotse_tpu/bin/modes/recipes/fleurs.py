"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/fleurs.py`."""
from typing import Sequence

import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.fleurs import download_fleurs, prepare_fleurs
from lhotse_tpu.utils import Pathlike

__all__ = ["fleurs"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-l", "--lang", "--language", "languages", type=str, multiple=True, default=["all"])
@click.option("-j", "--num-jobs", type=int, default=1)
def fleurs(corpus_dir: Pathlike, output_dir: Pathlike, languages: Sequence[str], num_jobs: int):
    """FLEURS multilingual benchmark data preparation."""
    prepare_fleurs(corpus_dir, output_dir=output_dir, languages=list(languages), num_jobs=num_jobs)


@download.command(name="fleurs", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option(
    "-l", "--lang", "--language", "languages", type=str, multiple=True, default=["all"])
@click.option("--force-download", is_flag=True, default=False)
def fleurs_dl(target_dir: Pathlike, languages: Sequence[str], force_download: bool):
    """FLEURS download (streams through HuggingFace datasets)."""
    download_fleurs(target_dir, languages=list(languages), force_download=force_download)
