"""CLI for the meeting/diarization corpus recipes added in tranche 2."""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = [
    "chime6", "dipco", "dipco_dl", "ali_meeting", "ali_meeting_dl", "aishell4", "aishell4_dl",
    "libricss", "libricss_dl", "dihard3", "voxconverse", "voxconverse_dl"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--mic", type=click.Choice(["ihm", "mdm"]), default="mdm")
@click.option("--normalize-text", type=click.Choice(["none", "upper", "kaldi"]), default="upper")
@click.option("--use-chime7-split", is_flag=True)
def chime6(corpus_dir: Pathlike, output_dir: Pathlike, mic, normalize_text, use_chime7_split):
    """CHiME-6 dinner-party data preparation (array-synchronized corpus)."""
    from lhotse_tpu.recipes import prepare_chime6

    prepare_chime6(
        corpus_dir, output_dir=output_dir, mic=mic, normalize_text=normalize_text,
        use_chime7_split=use_chime7_split)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--mic", type=click.Choice(["ihm", "mdm"]), default="mdm")
@click.option("--normalize-text", type=click.Choice(["none", "upper", "kaldi"]), default="kaldi")
def dipco(corpus_dir: Pathlike, output_dir: Pathlike, mic, normalize_text):
    """DiPCo dinner-party data preparation."""
    from lhotse_tpu.recipes import prepare_dipco

    prepare_dipco(corpus_dir, output_dir=output_dir, mic=mic, normalize_text=normalize_text)


@download.command(name="dipco", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def dipco_dl(target_dir: Pathlike):
    """DiPCo download."""
    from lhotse_tpu.recipes import download_dipco

    download_dipco(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--mic", type=click.Choice(["near", "far", "ihm", "sdm", "mdm"]), default="far")
@click.option("--normalize-text", type=click.Choice(["none", "m2met"]), default="none")
def ali_meeting(corpus_dir: Pathlike, output_dir: Pathlike, mic, normalize_text):
    """AliMeeting data preparation."""
    from lhotse_tpu.recipes import prepare_ali_meeting

    prepare_ali_meeting(corpus_dir, output_dir=output_dir, mic=mic, normalize_text=normalize_text)


@download.command(name="ali-meeting", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def ali_meeting_dl(target_dir: Pathlike):
    """AliMeeting download."""
    from lhotse_tpu.recipes import download_ali_meeting

    download_ali_meeting(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--normalize-text", is_flag=True)
def aishell4(corpus_dir: Pathlike, output_dir: Pathlike, normalize_text):
    """AISHELL-4 meeting data preparation."""
    from lhotse_tpu.recipes import prepare_aishell4

    prepare_aishell4(corpus_dir, output_dir=output_dir, normalize_text=normalize_text)


@download.command(name="aishell4", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def aishell4_dl(target_dir: Pathlike):
    """AISHELL-4 download."""
    from lhotse_tpu.recipes import download_aishell4

    download_aishell4(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--type", "mic_type", type=click.Choice(["mdm", "sdm", "ihm-mix", "ihm"]), default="mdm")
def libricss(corpus_dir: Pathlike, output_dir: Pathlike, mic_type):
    """LibriCSS data preparation."""
    from lhotse_tpu.recipes import prepare_libricss

    prepare_libricss(corpus_dir, output_dir=output_dir, type=mic_type)


@download.command(name="libricss", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def libricss_dl(target_dir: Pathlike):
    """LibriCSS download."""
    from lhotse_tpu.recipes import download_libricss

    download_libricss(target_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("output_dir", type=click.Path())
@click.option("--dev-audio-dir", type=click.Path(exists=True), default=None)
@click.option("--eval-audio-dir", type=click.Path(exists=True), default=None)
def dihard3(output_dir: Pathlike, dev_audio_dir, eval_audio_dir):
    """DIHARD III data preparation."""
    from lhotse_tpu.recipes import prepare_dihard3

    prepare_dihard3(
        dev_audio_dir=dev_audio_dir, eval_audio_dir=eval_audio_dir, output_dir=output_dir)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--split-test", is_flag=True)
def voxconverse(corpus_dir: Pathlike, output_dir: Pathlike, split_test):
    """VoxConverse diarization data preparation."""
    from lhotse_tpu.recipes import prepare_voxconverse

    prepare_voxconverse(corpus_dir, output_dir=output_dir, split_test=split_test)


@download.command(name="voxconverse", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
def voxconverse_dl(target_dir: Pathlike):
    """VoxConverse download."""
    from lhotse_tpu.recipes import download_voxconverse

    download_voxconverse(target_dir)
