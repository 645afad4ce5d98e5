"""
CLI commands for English domain-specific corpora (ATC, broadcast, podcast,
medical, SLU, audiovisual).

Reference behavior: `/root/reference/lhotse/bin/modes/recipes/{aspire,
broadcast_news,this_american_life,uwb_atcc,atcosim,slu,grid,medical}.py`.
"""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = [
    "aspire", "broadcast_news", "this_american_life", "uwb_atcc", "atcosim", "slu",
    "grid", "medical"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "--mic", type=click.Choice(["single", "multi"]), default="single",
    help="Single- or multi-channel variant.")
def aspire(corpus_dir: Pathlike, output_dir: Pathlike, mic: str):
    """ASpIRE (LDC2017S21) data preparation."""
    from lhotse_tpu.recipes.aspire import prepare_aspire

    prepare_aspire(corpus_dir, output_dir=output_dir, mic=mic)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("audio_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("transcript_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--absolute-paths", type=bool, default=False)
def broadcast_news(
    audio_dir: Pathlike, transcript_dir: Pathlike, output_dir: Pathlike,
    absolute_paths: bool):
    """1997 English Broadcast News (HUB4) data preparation."""
    from lhotse_tpu.recipes.broadcast_news import prepare_broadcast_news

    prepare_broadcast_news(
        audio_dir, transcript_dir, output_dir=output_dir, absolute_paths=absolute_paths)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def this_american_life(corpus_dir: Pathlike, output_dir: Pathlike):
    """This American Life podcast data preparation."""
    from lhotse_tpu.recipes.this_american_life import prepare_this_american_life

    prepare_this_american_life(corpus_dir, output_dir=output_dir)


@download.command(name="this-american-life", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("--force-download", is_flag=True, default=False)
def this_american_life_dl(target_dir: Pathlike, force_download: bool):
    """This American Life download (metadata + episode mp3s)."""
    from lhotse_tpu.recipes.this_american_life import download_this_american_life

    download_this_american_life(target_dir, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--silence-sym", type=str, default="")
@click.option("--breath-sym", type=str, default="")
@click.option("--noise-sym", type=str, default="")
@click.option("--foreign-sym", type=str, default="<unk>")
@click.option("--partial-sym", type=str, default="<unk>")
@click.option("--unintelligble-sym", type=str, default="<unk>")
@click.option("--unknown-sym", type=str, default="<unk>")
def uwb_atcc(
    corpus_dir: Pathlike, output_dir: Pathlike, silence_sym: str, breath_sym: str,
    noise_sym: str, foreign_sym: str, partial_sym: str, unintelligble_sym: str,
    unknown_sym: str):
    """UWB-ATCC air traffic control data preparation."""
    from lhotse_tpu.recipes.uwb_atcc import prepare_uwb_atcc

    prepare_uwb_atcc(
        corpus_dir, output_dir=output_dir, silence_sym=silence_sym,
        breath_sym=breath_sym, noise_sym=noise_sym, foreign_sym=foreign_sym,
        partial_sym=partial_sym, unintelligble_sym=unintelligble_sym,
        unknown_sym=unknown_sym)


@download.command(name="uwb-atcc", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
def uwb_atcc_dl(target_dir: Pathlike):
    """UWB-ATCC download."""
    from lhotse_tpu.recipes.uwb_atcc import download_uwb_atcc

    download_uwb_atcc(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--silence-sym", type=str, default="")
@click.option("--breath-sym", type=str, default="")
@click.option("--foreign-sym", type=str, default="<unk>")
@click.option("--partial-sym", type=str, default="<unk>")
@click.option("--unknown-sym", type=str, default="<unk>")
def atcosim(
    corpus_dir: Pathlike, output_dir: Pathlike, silence_sym: str, breath_sym: str,
    foreign_sym: str, partial_sym: str, unknown_sym: str):
    """ATCOSIM air traffic control simulation data preparation."""
    from lhotse_tpu.recipes.atcosim import prepare_atcosim

    prepare_atcosim(
        corpus_dir, output_dir=output_dir, silence_sym=silence_sym,
        breath_sym=breath_sym, foreign_sym=foreign_sym, partial_sym=partial_sym,
        unknown_sym=unknown_sym)


@download.command(name="atcosim", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
def atcosim_dl(target_dir: Pathlike):
    """ATCOSIM download (ISO image)."""
    from lhotse_tpu.recipes.atcosim import download_atcosim

    download_atcosim(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def slu(corpus_dir: Pathlike, output_dir: Pathlike):
    """Fluent-Speech-Commands-style SLU data preparation."""
    from lhotse_tpu.recipes.slu import prepare_slu

    prepare_slu(corpus_dir, output_dir=output_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--with-supervisions/--no-supervisions", default=True)
@click.option("-j", "--jobs", "--num-jobs", "num_jobs", type=int, default=1)
def grid(corpus_dir: Pathlike, output_dir: Pathlike, with_supervisions: bool, num_jobs: int):
    """Grid audiovisual corpus data preparation."""
    from lhotse_tpu.recipes.grid import prepare_grid

    prepare_grid(
        corpus_dir, output_dir=output_dir, with_supervisions=with_supervisions,
        num_jobs=num_jobs)


@download.command(name="grid", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("--force-download", is_flag=True, default=False)
def grid_dl(target_dir: Pathlike, force_download: bool):
    """Grid corpus download (via zenodo_get)."""
    from lhotse_tpu.recipes.grid import download_grid

    download_grid(target_dir, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def medical(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs: int):
    """Medical (simulated patient-physician interviews) data preparation."""
    from lhotse_tpu.recipes.medical import prepare_medical

    prepare_medical(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@download.command(name="medical", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("--force-download", is_flag=True, default=False)
def medical_dl(target_dir: Pathlike, force_download: bool):
    """Medical corpus download."""
    from lhotse_tpu.recipes.medical import download_medical

    download_medical(target_dir, force_download=force_download)
