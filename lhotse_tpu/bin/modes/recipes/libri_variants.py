"""
CLI commands for LibriSpeech-derived and CMU children/TTS corpora.

Reference behavior: `/root/reference/lhotse/bin/modes/recipes/{librimix,
librimix_mini,librispeechmix,spatial_librispeech,cmu_indic,cslu_kids}.py`.
"""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = [
    "librimix", "librimix_mini", "librispeechmix", "spatial_librispeech", "cmu_indic",
    "cslu_kids"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("librispeech_root_path", type=click.Path(exists=True))
@click.argument("wham_recset_root_path", type=click.Path(exists=True))
@click.argument("librimix_metadata_path", type=click.Path(exists=True))
@click.argument("workdir", type=click.Path())
@click.argument("output_dir", type=click.Path())
@click.option(
    "-n", "--n_src", "--n-src", "n_src", type=int, default=2,
    help="Number of mixed sources (2 or 3).")
@click.option("-j", "--num-jobs", type=int, default=1)
def librimix(
    librispeech_root_path: Pathlike, wham_recset_root_path: Pathlike,
    librimix_metadata_path: Pathlike, workdir: Pathlike, output_dir: Pathlike,
    n_src: int, num_jobs: int):
    """LibriMix virtual-mixture data preparation."""
    from lhotse_tpu.recipes.librimix import prepare_librimix

    prepare_librimix(
        librispeech_root_path, wham_recset_root_path, librimix_metadata_path,
        workdir, output_dir=output_dir, n_src=n_src, num_jobs=num_jobs)


@download.command(name="librimix", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
def librimix_dl(target_dir: Pathlike):
    """LibriMix metadata download."""
    from lhotse_tpu.recipes.librimix import download_librimix

    download_librimix(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("librimix_csv", type=click.Path(exists=True, dir_okay=False))
@click.argument("output_dir", type=click.Path())
@click.option("--with-precomputed-mixtures/--no-precomputed-mixtures", default=False)
@click.option("--sampling-rate", type=int, default=16000)
@click.option("--min-segment-seconds", type=float, default=3.0)
def librimix_mini(
    librimix_csv: Pathlike, output_dir: Pathlike, with_precomputed_mixtures: bool,
    sampling_rate: int, min_segment_seconds: float):
    """MiniLibriMix data preparation (single metadata CSV)."""
    from lhotse_tpu.recipes.librimix_mini import prepare_librimix_mini

    prepare_librimix_mini(
        librimix_csv, output_dir=output_dir,
        with_precomputed_mixtures=with_precomputed_mixtures,
        sampling_rate=sampling_rate, min_segment_seconds=min_segment_seconds)


@download.command(name="librimix-mini", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
def librimix_mini_dl(target_dir: Pathlike):
    """MiniLibriMix download."""
    from lhotse_tpu.recipes.librimix_mini import download_librimix_mini

    download_librimix_mini(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("librispeech_root_path", type=click.Path(exists=True))
@click.argument("librispeechmix_metadata_path", type=click.Path(exists=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def librispeechmix(
    librispeech_root_path: Pathlike, librispeechmix_metadata_path: Pathlike,
    output_dir: Pathlike, num_jobs: int):
    """LibriSpeechMix virtual-mixture data preparation."""
    from lhotse_tpu.recipes.librispeechmix import prepare_librispeechmix

    prepare_librispeechmix(
        librispeech_root_path, librispeechmix_metadata_path, output_dir=output_dir,
        num_jobs=num_jobs)


@download.command(name="librispeechmix", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
def librispeechmix_dl(target_dir: Pathlike):
    """LibriSpeechMix metadata download."""
    from lhotse_tpu.recipes.librispeechmix import download_librispeechmix

    download_librispeechmix(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-p", "--dataset-parts", type=str, multiple=True, default=["train", "test"])
@click.option("--normalize-text", type=click.Choice(["none", "lower"]), default="none")
@click.option("-j", "--num-jobs", type=int, default=1)
def spatial_librispeech(
    corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts, normalize_text: str,
    num_jobs: int):
    """Spatial LibriSpeech data preparation."""
    from lhotse_tpu.recipes.spatial_librispeech import prepare_spatial_librispeech

    prepare_spatial_librispeech(
        corpus_dir, output_dir=output_dir, dataset_parts=list(dataset_parts),
        normalize_text=normalize_text, num_jobs=num_jobs)


@download.command(name="spatial-librispeech", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("-p", "--dataset-parts", type=str, multiple=True, default=["train", "test"])
@click.option("-j", "--num-jobs", type=int, default=1)
def spatial_librispeech_dl(target_dir: Pathlike, dataset_parts, num_jobs: int):
    """Spatial LibriSpeech download."""
    from lhotse_tpu.recipes.spatial_librispeech import download_spatial_librispeech

    download_spatial_librispeech(
        target_dir, dataset_parts=list(dataset_parts), num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def cmu_indic(corpus_dir: Pathlike, output_dir: Pathlike):
    """CMU Indic TTS databases data preparation."""
    from lhotse_tpu.recipes.cmu_indic import prepare_cmu_indic

    prepare_cmu_indic(corpus_dir, output_dir=output_dir)


@download.command(name="cmu-indic", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
def cmu_indic_dl(target_dir: Pathlike):
    """CMU Indic download."""
    from lhotse_tpu.recipes.cmu_indic import download_cmu_indic

    download_cmu_indic(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--absolute-paths", type=bool, default=True)
@click.option("--normalize-text/--no-normalize-text", default=True)
def cslu_kids(
    corpus_dir: Pathlike, output_dir: Pathlike, absolute_paths: bool,
    normalize_text: bool):
    """CSLU Kids (LDC2007S18) data preparation."""
    from lhotse_tpu.recipes.cslu_kids import prepare_cslu_kids

    prepare_cslu_kids(
        corpus_dir, output_dir=output_dir, absolute_paths=absolute_paths,
        normalize_text=normalize_text)
