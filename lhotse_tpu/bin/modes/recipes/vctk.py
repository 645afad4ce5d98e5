"""Reference behavior: `/root/reference/lhotse/bin/modes/recipes/vctk.py`."""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes.vctk import download_vctk, prepare_vctk
from lhotse_tpu.utils import Pathlike

__all__ = ["vctk"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--use-edinburgh-vctk-url", is_flag=True, default=False)
@click.option("--mic-id", type=click.Choice(["mic1", "mic2"]), default="mic2")
def vctk(corpus_dir: Pathlike, output_dir: Pathlike, use_edinburgh_vctk_url: bool, mic_id: str):
    """VCTK TTS data preparation."""
    prepare_vctk(
        corpus_dir, output_dir=output_dir, use_edinburgh_vctk_url=use_edinburgh_vctk_url,
        mic_id=mic_id)


@download.command(name="vctk", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--use-edinburgh-vctk-url", is_flag=True, default=False)
def vctk_dl(target_dir: Pathlike, use_edinburgh_vctk_url: bool):
    """VCTK download."""
    download_vctk(target_dir, use_edinburgh_vctk_url=use_edinburgh_vctk_url)
