"""CLI for the read/conversational-speech corpus recipes added in tranche 2."""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = [
    "aishell2", "aishell3", "aishell3_dl", "tedlium2", "tedlium2_dl", "earnings21", "earnings21_dl",
    "voxpopuli", "voxpopuli_dl", "librilight", "fisher_english", "babel", "mdcc", "mdcc_dl",
    "heroico", "heroico_dl", "cmu_kids", "speechcommands", "speechcommands_dl", "audio_mnist",
    "audio_mnist_dl", "mobvoihotwords", "mobvoihotwords_dl"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def aishell2(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs: int):
    """AISHELL-2 data preparation."""
    from lhotse_tpu.recipes import prepare_aishell2

    prepare_aishell2(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def aishell3(corpus_dir: Pathlike, output_dir: Pathlike):
    """AISHELL-3 TTS data preparation."""
    from lhotse_tpu.recipes import prepare_aishell3

    prepare_aishell3(corpus_dir, output_dir=output_dir)


@download.command(name="aishell3", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def aishell3_dl(target_dir: Pathlike):
    """AISHELL-3 download."""
    from lhotse_tpu.recipes import download_aishell3

    download_aishell3(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("tedlium_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--parts", "--dataset-parts", "dataset_parts",
    type=click.Choice(["train", "dev", "test"]), multiple=True,
    default=["train", "dev", "test"])
@click.option("--normalize-text", type=click.Choice(["none", "upper", "kaldi"]), default="none")
@click.option("-j", "--num-jobs", type=int, default=1)
def tedlium2(tedlium_dir: Pathlike, output_dir: Pathlike, dataset_parts, normalize_text, num_jobs):
    """TED-LIUM v2 data preparation."""
    from lhotse_tpu.recipes import prepare_tedlium2

    prepare_tedlium2(
        tedlium_dir, output_dir=output_dir, dataset_parts=list(dataset_parts),
        normalize_text=normalize_text, num_jobs=num_jobs)


@download.command(name="tedlium2", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def tedlium2_dl(target_dir: Pathlike):
    """TED-LIUM v2 download."""
    from lhotse_tpu.recipes import download_tedlium2

    download_tedlium2(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--normalize-text/--no-normalize-text", default=False)
def earnings21(corpus_dir: Pathlike, output_dir: Pathlike, normalize_text):
    """Earnings-21 data preparation."""
    from lhotse_tpu.recipes import prepare_earnings21

    prepare_earnings21(corpus_dir, output_dir=output_dir, normalize_text=normalize_text)


@download.command(name="earnings21", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def earnings21_dl(target_dir: Pathlike):
    """Earnings-21 download."""
    from lhotse_tpu.recipes import download_earnings21

    download_earnings21(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "--task", type=click.Choice(["asr", "s2s", "lm"]), default="asr",
    help="Which VoxPopuli task to prepare manifests for.")
@click.option("--lang", default="en")
@click.option("--src-lang", default=None, help="[s2s] Source language code.")
@click.option("--tgt-lang", default=None, help="[s2s] Target language code.")
@click.option("-j", "--num-jobs", type=int, default=1)
def voxpopuli(corpus_dir: Pathlike, output_dir: Pathlike, task, lang, src_lang, tgt_lang,
              num_jobs):
    """VoxPopuli ASR data preparation."""
    from lhotse_tpu.recipes import prepare_voxpopuli

    prepare_voxpopuli(
        corpus_dir, output_dir=output_dir, task=task, lang=lang, source_lang=src_lang,
        target_lang=tgt_lang, num_jobs=num_jobs)


@download.command(name="voxpopuli", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--subset", default="asr")
def voxpopuli_dl(target_dir: Pathlike, subset):
    """VoxPopuli download."""
    from lhotse_tpu.recipes import download_voxpopuli

    download_voxpopuli(target_dir, subset=subset)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("-j", "--num-jobs", type=int, default=1)
def librilight(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs):
    """Libri-Light data preparation."""
    from lhotse_tpu.recipes import prepare_librilight

    prepare_librilight(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-a", "--audio-dirs", type=str, multiple=True, default=["LDC2004S13", "LDC2005S13"],
    help="Audio corpus directory names under CORPUS_DIR.")
@click.option(
    "-t", "--transcript-dirs", type=str, multiple=True, default=["LDC2004T19", "LDC2005T19"],
    help="Transcript corpus directory names under CORPUS_DIR.")
@click.option("--absolute-paths", type=bool, default=False)
@click.option("-j", "--num-jobs", type=int, default=1)
def fisher_english(
    corpus_dir: Pathlike, output_dir: Pathlike, audio_dirs, transcript_dirs,
    absolute_paths: bool, num_jobs):
    """Fisher English Parts 1+2 data preparation."""
    from lhotse_tpu.recipes import prepare_fisher_english

    prepare_fisher_english(
        corpus_dir, output_dir=output_dir, audio_dirs=list(audio_dirs),
        transcript_dirs=list(transcript_dirs), absolute_paths=absolute_paths,
        num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def babel(corpus_dir: Pathlike, output_dir: Pathlike):
    """IARPA BABEL data preparation (single language package)."""
    from lhotse_tpu.recipes import prepare_single_babel_language

    prepare_single_babel_language(corpus_dir, output_dir=output_dir)


@prepare.command(name="MDCC", context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--dataset-parts", type=str, multiple=True, default=["all"],
    help="Parts to prepare (pass multiple -p, e.g. `-p train -p valid`).")
def mdcc(corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts):
    """MDCC (Cantonese) data preparation."""
    from lhotse_tpu.recipes import prepare_mdcc

    parts = list(dataset_parts)
    prepare_mdcc(
        corpus_dir, dataset_parts="all" if parts == ["all"] else parts,
        output_dir=output_dir)


# The reference registers this recipe under the uppercase name "MDCC";
# keep the lowercase spelling as a convenience alias.
prepare.add_command(mdcc, name="mdcc")


@download.command(name="MDCC", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option(
    "--force-download", is_flag=True, default=False,
    help="Download the MDCC data even if it is already present.")
def mdcc_dl(target_dir: Pathlike, force_download: bool):
    """MDCC download."""
    from lhotse_tpu.recipes import download_mdcc

    download_mdcc(target_dir, force_download=force_download)


download.add_command(mdcc_dl, name="mdcc")


@prepare.command(context_settings=dict(show_default=True))
@click.argument("speech_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("transcript_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def heroico(speech_dir: Pathlike, transcript_dir: Pathlike, output_dir: Pathlike):
    """Heroico+USMA Spanish data preparation."""
    from lhotse_tpu.recipes import prepare_heroico

    prepare_heroico(speech_dir, transcript_dir, output_dir=output_dir)


@download.command(name="heroico", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def heroico_dl(target_dir: Pathlike):
    """Heroico download."""
    from lhotse_tpu.recipes import download_heroico

    download_heroico(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "--absolute-paths", type=bool, default=True,
    help="Use absolute audio paths in the manifests.")
def cmu_kids(corpus_dir: Pathlike, output_dir: Pathlike, absolute_paths: bool):
    """CMU Kids data preparation."""
    from lhotse_tpu.recipes import prepare_cmu_kids

    prepare_cmu_kids(corpus_dir, output_dir=output_dir, absolute_paths=absolute_paths)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("speechcommands_version", type=click.Choice(["1", "2"]))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def speechcommands(speechcommands_version, corpus_dir: Pathlike, output_dir: Pathlike):
    """Speech Commands v0.01 ('1') or v0.02 ('2') data preparation."""
    from lhotse_tpu.recipes import prepare_speechcommands

    prepare_speechcommands(speechcommands_version, corpus_dir, output_dir=output_dir)


@download.command(name="speechcommands", context_settings=dict(show_default=True))
@click.argument("speechcommands_version", type=click.Choice(["1", "2"]))
@click.argument("target_dir", type=click.Path())
@click.option("--force-download", is_flag=True, default=False)
def speechcommands_dl(speechcommands_version, target_dir: Pathlike, force_download: bool):
    """Speech Commands v0.01 ('1') or v0.02 ('2') download."""
    from lhotse_tpu.recipes import download_speechcommands

    download_speechcommands(
        speechcommands_version, target_dir, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def audio_mnist(corpus_dir: Pathlike, output_dir: Pathlike):
    """AudioMNIST data preparation."""
    from lhotse_tpu.recipes import prepare_audio_mnist

    prepare_audio_mnist(corpus_dir, output_dir=output_dir)


@download.command(name="audio-mnist", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--force-download", is_flag=True, default=False)
def audio_mnist_dl(target_dir: Pathlike, force_download: bool):
    """AudioMNIST download."""
    from lhotse_tpu.recipes import download_audio_mnist

    download_audio_mnist(target_dir, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def mobvoihotwords(corpus_dir: Pathlike, output_dir: Pathlike):
    """MobvoiHotwords data preparation."""
    from lhotse_tpu.recipes import prepare_mobvoihotwords

    prepare_mobvoihotwords(corpus_dir, output_dir=output_dir)


@download.command(name="mobvoihotwords", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def mobvoihotwords_dl(target_dir: Pathlike):
    """MobvoiHotwords download."""
    from lhotse_tpu.recipes import download_mobvoihotwords

    download_mobvoihotwords(target_dir)
