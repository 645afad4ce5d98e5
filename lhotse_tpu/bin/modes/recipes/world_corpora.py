"""
CLI commands for the remaining world-language corpora.

Reference behavior: `/root/reference/lhotse/bin/modes/recipes/{bengaliai_speech,
but_reverb_db,edacc,himia,icmcasr,ksponspeech,oto_speech,radio,reazonspeech}.py`.
"""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = [
    "bengaliai_speech", "but_reverb_db", "edacc", "himia", "icmcasr", "ksponspeech",
    "oto_speech", "radio", "reazonspeech"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def bengaliai_speech(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs: int):
    """Bengali.AI Speech data preparation."""
    from lhotse_tpu.recipes.bengaliai_speech import prepare_bengaliai_speech

    prepare_bengaliai_speech(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-p", "--parts", type=str, multiple=True, default=["silence", "rir"])
def but_reverb_db(corpus_dir: Pathlike, output_dir: Pathlike, parts):
    """BUT Speech@FIT Reverb Database data preparation."""
    from lhotse_tpu.recipes.but_reverb_db import prepare_but_reverb_db

    prepare_but_reverb_db(corpus_dir, output_dir=output_dir, parts=list(parts))


@download.command(name="but-reverb-db", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("--force-download", is_flag=True, default=False)
def but_reverb_db_dl(target_dir: Pathlike, force_download: bool):
    """BUT Reverb DB download."""
    from lhotse_tpu.recipes.but_reverb_db import download_but_reverb_db

    download_but_reverb_db(target_dir, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def edacc(corpus_dir: Pathlike, output_dir: Pathlike):
    """Edinburgh International Accents of English Corpus data preparation."""
    from lhotse_tpu.recipes.edacc import prepare_edacc

    prepare_edacc(corpus_dir, output_dir=output_dir)


@download.command(name="edacc", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
def edacc_dl(target_dir: Pathlike):
    """EdAcc download."""
    from lhotse_tpu.recipes.edacc import download_edacc

    download_edacc(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--dataset-parts", type=str, default="auto",
    help="'auto', 'himia', or one of train/dev/test/cw_test.")
def himia(corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts: str):
    """HI-MIA (+CW) wake-word data preparation."""
    from lhotse_tpu.recipes.himia import prepare_himia

    prepare_himia(corpus_dir, dataset_parts=dataset_parts, output_dir=output_dir)


@download.command(name="himia", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("-p", "--dataset-parts", type=str, default="auto")
def himia_dl(target_dir: Pathlike, dataset_parts: str):
    """HI-MIA download."""
    from lhotse_tpu.recipes.himia import download_himia

    download_himia(target_dir, dataset_parts=dataset_parts)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--mic", type=click.Choice(["ihm", "sdm", "mdm"]), default="ihm")
@click.option("-j", "--num-jobs", type=int, default=1)
def icmcasr(corpus_dir: Pathlike, output_dir: Pathlike, mic: str, num_jobs: int):
    """ICMC-ASR in-car Mandarin data preparation."""
    from lhotse_tpu.recipes.icmcasr import prepare_icmcasr

    prepare_icmcasr(corpus_dir, output_dir=output_dir, mic=mic, num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-p", "--dataset-parts", type=str, multiple=True, default=["all"])
@click.option("-j", "--num-jobs", type=int, default=1)
@click.option("--normalize-text", type=click.Choice(["default", "none"]), default="default")
def ksponspeech(
    corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts, num_jobs: int,
    normalize_text: str):
    """KsponSpeech (Korean) data preparation."""
    from lhotse_tpu.recipes.ksponspeech import prepare_ksponspeech

    parts = list(dataset_parts)
    prepare_ksponspeech(
        corpus_dir, dataset_parts="all" if parts == ["all"] else parts,
        output_dir=output_dir, num_jobs=num_jobs, normalize_text=normalize_text)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--dataset-parts", type=str, multiple=True, default=("train",),
    help="Dataset parts to prepare.")
@click.option("--target-sr", type=int, default=16000)
def oto_speech(corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts, target_sr: int):
    """otoSpeech full-duplex conversations data preparation."""
    from lhotse_tpu.recipes.oto_speech import prepare_oto_speech

    prepare_oto_speech(corpus_dir, output_dir, parts=dataset_parts, target_sr=target_sr)


@download.command(name="oto-speech", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("--force-download", is_flag=True, default=False)
@click.option(
    "-p", "--dataset-parts", type=str, multiple=True, default=("train",),
    help="Dataset parts to download (the standard release only has 'train').")
@click.option(
    "--version", type=str, default="full-duplex-processed-141h",
    help="Dataset version suffix on HuggingFace.")
def oto_speech_dl(target_dir: Pathlike, force_download: bool, dataset_parts, version: str):
    """otoSpeech download (requires HF_TOKEN)."""
    from lhotse_tpu.recipes.oto_speech import download_oto_speech

    download_oto_speech(
        target_dir, parts=dataset_parts, version=version, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-d", "--min-seg-dur", "--min-segment-duration", "min_segment_duration",
    type=float, default=0.5, help="Minimum segment duration to keep.")
@click.option("-j", "--num-jobs", type=int, default=4)
def radio(
    corpus_dir: Pathlike, output_dir: Pathlike, min_segment_duration: float,
    num_jobs: int):
    """Geolocated web-radio data preparation."""
    from lhotse_tpu.recipes.radio import prepare_radio

    prepare_radio(
        corpus_dir, output_dir=output_dir, min_segment_duration=min_segment_duration,
        num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def reazonspeech(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs: int):
    """ReazonSpeech (Japanese) data preparation."""
    from lhotse_tpu.recipes.reazonspeech import prepare_reazonspeech

    prepare_reazonspeech(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@download.command(name="reazonspeech", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option(
    "-p", "--subset", "--dataset-parts", "subset", type=str, multiple=True,
    default=("auto",), help="Subsets to download ('auto' = the default tiny one).")
@click.option("-j", "--num-jobs", type=int, default=1)
def reazonspeech_dl(target_dir: Pathlike, subset, num_jobs: int):
    """ReazonSpeech download (via HF datasets)."""
    from lhotse_tpu.recipes.reazonspeech import download_reazonspeech

    parts = "auto" if "auto" in subset else list(subset)
    download_reazonspeech(target_dir, dataset_parts=parts, num_jobs=num_jobs)
