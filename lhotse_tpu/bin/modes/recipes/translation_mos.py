"""
CLI commands for speech-translation, MOS, and large-crawl corpora.

Reference behavior: `/root/reference/lhotse/bin/modes/recipes/{mtedx,must_c,
gigast,iwslt22_ta,emilia,gigaspeech2,bvcc,notsofar1}.py`.
"""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = [
    "mtedx", "must_c", "gigast", "iwslt22_ta", "emilia", "gigaspeech2", "bvcc",
    "notsofar1"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-l", "--lang", type=str, multiple=True, default=["all"])
@click.option("-j", "--num-jobs", type=int, default=1)
def mtedx(corpus_dir: Pathlike, output_dir: Pathlike, lang, num_jobs: int):
    """Multilingual TEDx ASR data preparation."""
    from lhotse_tpu.recipes.mtedx import prepare_mtedx

    prepare_mtedx(corpus_dir, output_dir, languages=list(lang), num_jobs=num_jobs)


@download.command(name="mtedx", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("-l", "--lang", type=str, multiple=True, default=["all"])
def mtedx_dl(target_dir: Pathlike, lang):
    """Multilingual TEDx download."""
    from lhotse_tpu.recipes.mtedx import download_mtedx

    download_mtedx(target_dir, languages=list(lang))


@prepare.command(name="must-c", context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--tgt-lang", type=str, required=True, help="Target language, e.g. de, zh.")
@click.option("-j", "--num-jobs", type=int, default=1)
def must_c(corpus_dir: Pathlike, output_dir: Pathlike, tgt_lang: str, num_jobs: int):
    """MuST-C speech translation data preparation."""
    from lhotse_tpu.recipes.must_c import prepare_must_c

    prepare_must_c(corpus_dir, output_dir, tgt_lang=tgt_lang, num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("manifests_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-l", "--language", "--languages", "languages", type=str, multiple=True,
              default=["auto"])
@click.option("-p", "--subset", "--dataset-parts", "dataset_parts", type=str, multiple=True,
              default=["auto"])
def gigast(
    corpus_dir: Pathlike, manifests_dir: Pathlike, output_dir: Pathlike, languages,
    dataset_parts):
    """GigaST translated-supervisions data preparation."""
    from lhotse_tpu.recipes.gigast import prepare_gigast

    langs = list(languages)
    parts = list(dataset_parts)
    prepare_gigast(
        corpus_dir, manifests_dir, output_dir,
        languages="auto" if langs == ["auto"] else langs,
        dataset_parts="auto" if parts == ["auto"] else parts)


@download.command(name="gigast", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("-l", "--languages", type=str, multiple=True, default=["all"])
@click.option("--force-download", is_flag=True, default=False)
def gigast_dl(target_dir: Pathlike, languages, force_download: bool):
    """GigaST download."""
    from lhotse_tpu.recipes.gigast import download_gigast

    langs = list(languages)
    download_gigast(
        target_dir, languages="all" if langs == ["all"] else langs,
        force_download=force_download)


@prepare.command(name="iwslt22-ta", context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("splits", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--normalize-text", is_flag=True, default=False)
@click.option(
    "--langs", type=str, default="",
    help="Comma-separated language codes for the supervision languages "
    "(e.g. 'ta,eng').")
@click.option("-j", "--num-jobs", type=int, default=1)
def iwslt22_ta(
    corpus_dir: Pathlike, splits: Pathlike, output_dir: Pathlike,
    normalize_text: bool, langs: str, num_jobs: int):
    """IWSLT-2022 Tunisian data preparation."""
    from lhotse_tpu.recipes.iwslt22_ta import prepare_iwslt22_ta

    kwargs = {}
    if langs:
        kwargs["langs"] = langs.split(",")
    prepare_iwslt22_ta(
        corpus_dir, splits, output_dir=output_dir, normalize_text=normalize_text,
        num_jobs=num_jobs, **kwargs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--lang", type=str, required=True, help="One of de/en/fr/ja/ko/zh.")
@click.option("-j", "--num-jobs", type=int, default=1)
def emilia(corpus_dir: Pathlike, output_dir: Pathlike, lang: str, num_jobs: int):
    """Emilia in-the-wild speech data preparation."""
    from lhotse_tpu.recipes.emilia import prepare_emilia

    prepare_emilia(corpus_dir, lang=lang, num_jobs=num_jobs, output_dir=output_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-l", "--languages", type=str, multiple=True, default=["auto"])
@click.option("-j", "--num-jobs", type=int, default=1)
def gigaspeech2(corpus_dir: Pathlike, output_dir: Pathlike, languages, num_jobs: int):
    """GigaSpeech 2 data preparation."""
    from lhotse_tpu.recipes.gigaspeech2 import prepare_gigaspeech2

    langs = list(languages)
    prepare_gigaspeech2(
        corpus_dir, output_dir=output_dir,
        languages="auto" if langs == ["auto"] else langs, num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "-nj", "--num_jobs", "--num-jobs", "num_jobs", type=int, default=1)
def bvcc(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs: int):
    """BVCC / VoiceMOS data preparation."""
    from lhotse_tpu.recipes.bvcc import prepare_bvcc

    prepare_bvcc(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@download.command(name="bvcc", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
def bvcc_dl(target_dir: Pathlike):
    """BVCC download instructions."""
    from lhotse_tpu.recipes.bvcc import download_bvcc

    download_bvcc(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def notsofar1(corpus_dir: Pathlike, output_dir: Pathlike):
    """NOTSOFAR-1 meeting benchmark data preparation."""
    from lhotse_tpu.recipes.notsofar1 import prepare_notsofar1

    prepare_notsofar1(corpus_dir, output_dir=output_dir)


@download.command(name="notsofar1", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path(), default=".")
@click.option("--force-download", is_flag=True, default=False)
@click.option(
    "-p", "--dataset-parts", type=click.Choice(["train", "dev", "test"]), multiple=True,
    default=("train", "dev", "test"), help="Benchmark parts to fetch.")
@click.option("--mic", type=click.Choice(["sdm", "mdm", "ihm"]), default="sdm")
@click.option("--train-version", type=str, default="240825.1_train")
@click.option("--dev-version", type=str, default="240825.1_dev1")
@click.option("--test-version", type=str, default="240629.1_eval_small_with_GT")
def notsofar1_dl(
    target_dir: Pathlike, force_download: bool, dataset_parts, mic: str,
    train_version: str, dev_version: str, test_version: str):
    """NOTSOFAR-1 download (requires HF_TOKEN)."""
    from lhotse_tpu.recipes.notsofar1 import download_notsofar1

    download_notsofar1(
        target_dir, parts=tuple(dataset_parts), mic=mic, train_version=train_version,
        dev_version=dev_version, test_version=test_version, force_download=force_download)
