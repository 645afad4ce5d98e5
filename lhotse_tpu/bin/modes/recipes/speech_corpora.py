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
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--normalize-text", type=click.Choice(["none", "upper", "kaldi"]), default="none")
@click.option("-j", "--num-jobs", type=int, default=1)
def tedlium2(corpus_dir: Pathlike, output_dir: Pathlike, normalize_text, num_jobs):
    """TED-LIUM v2 data preparation."""
    from lhotse_tpu.recipes import prepare_tedlium2

    prepare_tedlium2(
        corpus_dir, output_dir=output_dir, normalize_text=normalize_text, num_jobs=num_jobs)


@download.command(name="tedlium2", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def tedlium2_dl(target_dir: Pathlike):
    """TED-LIUM v2 download."""
    from lhotse_tpu.recipes import download_tedlium2

    download_tedlium2(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--normalize-text", is_flag=True)
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
@click.option("--lang", default="en")
@click.option("-j", "--num-jobs", type=int, default=1)
def voxpopuli(corpus_dir: Pathlike, output_dir: Pathlike, lang, num_jobs):
    """VoxPopuli ASR data preparation."""
    from lhotse_tpu.recipes import prepare_voxpopuli

    prepare_voxpopuli(corpus_dir, output_dir=output_dir, lang=lang, num_jobs=num_jobs)


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
@click.option("-j", "--num-jobs", type=int, default=1)
def fisher_english(corpus_dir: Pathlike, output_dir: Pathlike, num_jobs):
    """Fisher English Parts 1+2 data preparation."""
    from lhotse_tpu.recipes import prepare_fisher_english

    prepare_fisher_english(corpus_dir, output_dir=output_dir, num_jobs=num_jobs)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def babel(corpus_dir: Pathlike, output_dir: Pathlike):
    """IARPA BABEL data preparation (single language package)."""
    from lhotse_tpu.recipes import prepare_single_babel_language

    prepare_single_babel_language(corpus_dir, output_dir=output_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def mdcc(corpus_dir: Pathlike, output_dir: Pathlike):
    """MDCC (Cantonese) data preparation."""
    from lhotse_tpu.recipes import prepare_mdcc

    prepare_mdcc(corpus_dir, output_dir=output_dir)


@download.command(name="mdcc", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def mdcc_dl(target_dir: Pathlike):
    """MDCC download."""
    from lhotse_tpu.recipes import download_mdcc

    download_mdcc(target_dir)


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
def cmu_kids(corpus_dir: Pathlike, output_dir: Pathlike):
    """CMU Kids data preparation."""
    from lhotse_tpu.recipes import prepare_cmu_kids

    prepare_cmu_kids(corpus_dir, output_dir=output_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--version", "speechcommands_version", type=click.Choice(["1", "2"]), default="2")
def speechcommands(corpus_dir: Pathlike, output_dir: Pathlike, speechcommands_version):
    """Speech Commands data preparation."""
    from lhotse_tpu.recipes import prepare_speechcommands

    prepare_speechcommands(speechcommands_version, corpus_dir, output_dir=output_dir)


@download.command(name="speechcommands", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--version", "speechcommands_version", type=click.Choice(["1", "2"]), default="2")
def speechcommands_dl(target_dir: Pathlike, speechcommands_version):
    """Speech Commands download."""
    from lhotse_tpu.recipes import download_speechcommands

    download_speechcommands(speechcommands_version, target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
def audio_mnist(corpus_dir: Pathlike, output_dir: Pathlike):
    """AudioMNIST data preparation."""
    from lhotse_tpu.recipes import prepare_audio_mnist

    prepare_audio_mnist(corpus_dir, output_dir=output_dir)


@download.command(name="audio-mnist", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def audio_mnist_dl(target_dir: Pathlike):
    """AudioMNIST download."""
    from lhotse_tpu.recipes import download_audio_mnist

    download_audio_mnist(target_dir)


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
