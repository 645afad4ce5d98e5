"""CLI for TTS/style corpora and augmentation-resource recipes (tranche 2)."""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = [
    "cmu_arctic", "cmu_arctic_dl", "l2_arctic", "hifitts", "hifitts_dl", "adept", "adept_dl",
    "daily_talk", "daily_talk_dl", "ears", "ears_dl", "rir_noise", "rir_noise_dl", "wham",
    "wham_dl", "librilight_dl"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def cmu_arctic(corpus_dir: Pathlike, output_dir: Pathlike):
    """CMU ARCTIC data preparation."""
    from lhotse_tpu.recipes import prepare_cmu_arctic

    prepare_cmu_arctic(corpus_dir, output_dir=output_dir)


@download.command(name="cmu-arctic", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def cmu_arctic_dl(target_dir: Pathlike):
    """CMU ARCTIC download."""
    from lhotse_tpu.recipes import download_cmu_arctic

    download_cmu_arctic(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def l2_arctic(corpus_dir: Pathlike, output_dir: Pathlike):
    """L2-ARCTIC data preparation."""
    from lhotse_tpu.recipes import prepare_l2_arctic

    prepare_l2_arctic(corpus_dir, output_dir=output_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def hifitts(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs):
    """Hi-Fi TTS data preparation."""
    from lhotse_tpu.recipes import prepare_hifitts

    prepare_hifitts(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@download.command(name="hifitts", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def hifitts_dl(target_dir: Pathlike):
    """Hi-Fi TTS download."""
    from lhotse_tpu.recipes import download_hifitts

    download_hifitts(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def adept(corpus_dir: Pathlike, output_dir: Pathlike):
    """ADEPT prosody corpus data preparation."""
    from lhotse_tpu.recipes import prepare_adept

    prepare_adept(corpus_dir, output_dir=output_dir)


@download.command(name="adept", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def adept_dl(target_dir: Pathlike):
    """ADEPT download."""
    from lhotse_tpu.recipes import download_adept

    download_adept(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def daily_talk(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs: int):
    """DailyTalk data preparation."""
    from lhotse_tpu.recipes import prepare_daily_talk

    prepare_daily_talk(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@download.command(name="daily-talk", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--force-download", is_flag=True, default=False)
def daily_talk_dl(target_dir: Pathlike, force_download: bool):
    """DailyTalk download."""
    from lhotse_tpu.recipes import download_daily_talk

    download_daily_talk(target_dir, force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def ears(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs: int):
    """EARS data preparation."""
    from lhotse_tpu.recipes import prepare_ears

    prepare_ears(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@download.command(name="ears", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def ears_dl(target_dir: Pathlike):
    """EARS download."""
    from lhotse_tpu.recipes import download_ears

    download_ears(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--parts", type=str, multiple=True,
    default=["point_noise", "iso_noise", "real_rir", "sim_rir"],
    help="Corpus parts to prepare.")
def rir_noise(corpus_dir: Pathlike, output_dir: Pathlike, parts):
    """RIRs and Noises corpus data preparation."""
    from lhotse_tpu.recipes import prepare_rir_noise

    prepare_rir_noise(corpus_dir, output_dir=output_dir, parts=list(parts))


@download.command(name="rir-noise", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def rir_noise_dl(target_dir: Pathlike):
    """RIRs and Noises download."""
    from lhotse_tpu.recipes import download_rir_noise

    download_rir_noise(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def wham(corpus_dir: Pathlike, output_dir: Pathlike):
    """WHAM! noise data preparation."""
    from lhotse_tpu.recipes import prepare_wham

    prepare_wham(corpus_dir, output_dir=output_dir)


@download.command(name="wham", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def wham_dl(target_dir: Pathlike):
    """WHAM! noise download."""
    from lhotse_tpu.recipes import download_wham

    download_wham(target_dir)


@download.command(name="librilight", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--subset", default="small")
def librilight_dl(target_dir: Pathlike, subset):
    """Libri-Light download (not implemented upstream either; placeholder).

    Use the official URLs printed by this command.
    """
    from lhotse_tpu.recipes.librilight import LIBRILIGHT

    click.echo(
        "Fetch the tars directly:\n"
        + "\n".join(
            f"  https://dl.fbaipublicfiles.com/librilight/data/{p}.tar"
            for p in LIBRILIGHT
        )
    )
