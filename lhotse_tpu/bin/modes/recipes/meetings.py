"""CLI for the meeting/diarization corpus recipes added in tranche 2."""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.utils import Pathlike

__all__ = [
    "chime6", "chime6_dl", "dipco", "dipco_dl", "ali_meeting", "ali_meeting_dl", "aishell4",
    "aishell4_dl", "libricss", "libricss_dl", "dihard3", "voxconverse", "voxconverse_dl"]


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-p", "--dataset-parts", type=str, default=["all"], multiple=True,
    help="Parts to prepare (pass multiple -p; default: all).")
@click.option("--mic", type=click.Choice(["ihm", "mdm"]), default="mdm")
@click.option(
    "--use-reference-array", is_flag=True,
    help="In mdm dev/eval, restrict each supervision's channels to its "
    "annotated reference array.")
@click.option(
    "--perform-array-sync", is_flag=True,
    help="Run array synchronization over a raw CHiME-5 corpus first "
    "(writes the synchronized corpus to OUTPUT_DIR/CHiME6).")
@click.option(
    "--verify-md5-checksums", is_flag=True,
    help="Verify audio MD5 checksums against the official post-sync list.")
@click.option("-j", "--num-jobs", type=int, default=1, help="Parallel array-sync jobs.")
@click.option(
    "-t", "--num-threads-per-job", type=int, default=1,
    help="Threads per job for clock-drift correction.")
@click.option(
    "--sox-path", type=click.Path(), default="/usr/bin/sox",
    help="Path to the sox v14.4.2 binary (bit-exact clock-drift warps).")
@click.option("--normalize-text", type=click.Choice(["none", "upper", "kaldi"]), default="kaldi")
@click.option("--use-chime7-split", is_flag=True)
def chime6(
    corpus_dir: Pathlike, output_dir: Pathlike, dataset_parts, mic, use_reference_array,
    perform_array_sync, verify_md5_checksums, num_jobs, num_threads_per_job, sox_path,
    normalize_text, use_chime7_split):
    """CHiME-6 dinner-party data preparation (array-synchronized corpus)."""
    from lhotse_tpu.recipes import prepare_chime6

    prepare_chime6(
        corpus_dir, output_dir=output_dir, dataset_parts=list(dataset_parts), mic=mic,
        use_reference_array=use_reference_array, perform_array_sync=perform_array_sync,
        verify_md5_checksums=verify_md5_checksums, num_jobs=num_jobs,
        num_threads_per_job=num_threads_per_job, sox_path=sox_path,
        normalize_text=normalize_text, use_chime7_split=use_chime7_split)


@download.command(name="chime6", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--force-download", is_flag=True, default=False)
def chime6_dl(target_dir: Pathlike, force_download: bool):
    """CHiME-6 download (openslr/150)."""
    from lhotse_tpu.recipes import download_chime6

    download_chime6(target_dir, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--mic", type=click.Choice(["ihm", "mdm"]), default="mdm")
@click.option("--normalize-text", type=click.Choice(["none", "upper", "kaldi"]), default="kaldi")
@click.option(
    "--use-chime7-offset", is_flag=True,
    help="Offset session IDs by the CHiME-7 convention (S23...).")
def dipco(corpus_dir: Pathlike, output_dir: Pathlike, mic, normalize_text, use_chime7_offset):
    """DiPCo dinner-party data preparation."""
    from lhotse_tpu.recipes import prepare_dipco

    prepare_dipco(
        corpus_dir, output_dir=output_dir, mic=mic, normalize_text=normalize_text,
        use_chime7_offset=use_chime7_offset)


@download.command(name="dipco", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--force-download", is_flag=True, default=False)
def dipco_dl(target_dir: Pathlike, force_download: bool):
    """DiPCo download."""
    from lhotse_tpu.recipes import download_dipco

    download_dipco(target_dir, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
@click.argument("output_dir", type=click.Path())
@click.option("--mic", type=click.Choice(["near", "far", "ihm", "sdm", "mdm"]), default="far")
@click.option("--normalize-text", type=click.Choice(["none", "m2met"]), default="none")
@click.option(
    "--save-mono", is_flag=True,
    help="For the sdm mic, extract and save the first channel as mono "
    "recordings under OUTPUT_DIR (speeds up downstream reads).")
def ali_meeting(corpus_dir: Pathlike, output_dir: Pathlike, mic, normalize_text, save_mono):
    """AliMeeting data preparation."""
    from lhotse_tpu.recipes import prepare_ali_meeting

    prepare_ali_meeting(
        corpus_dir, output_dir=output_dir, mic=mic, normalize_text=normalize_text,
        save_mono=save_mono)


@download.command(name="ali-meeting", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--force-download", is_flag=True, default=False)
def ali_meeting_dl(target_dir: Pathlike, force_download: bool):
    """AliMeeting download."""
    from lhotse_tpu.recipes import download_ali_meeting

    download_ali_meeting(target_dir, force_download=force_download)


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
@click.option(
    "--segmented/--no-segmented", default=False,
    help="Additionally emit 1-minute segmented cuts (as in the LibriCSS paper).")
def libricss(corpus_dir: Pathlike, output_dir: Pathlike, mic_type, segmented):
    """LibriCSS data preparation."""
    from lhotse_tpu.recipes import prepare_libricss

    prepare_libricss(corpus_dir, output_dir=output_dir, type=mic_type, segmented_cuts=segmented)


@download.command(name="libricss", context_settings=dict(show_default=True))
@click.argument("target_dir", type=click.Path())
@click.option("--force-download", is_flag=True, default=False)
def libricss_dl(target_dir: Pathlike, force_download: bool):
    """LibriCSS download."""
    from lhotse_tpu.recipes import download_libricss

    download_libricss(target_dir, force_download=force_download)


@prepare.command(context_settings=dict(show_default=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "--dev", "--dev-audio-dir", "dev_audio_dir", type=click.Path(exists=True), default=None)
@click.option(
    "--eval", "--eval-audio-dir", "eval_audio_dir", type=click.Path(exists=True), default=None)
@click.option(
    "--uem/--no-uem", default=True, help="Whether to create UEM supervisions.")
@click.option(
    "-j", "--num-jobs", type=int, default=1,
    help="Parallel jobs scanning the corpus directories for recordings.")
def dihard3(output_dir: Pathlike, dev_audio_dir, eval_audio_dir, uem, num_jobs):
    """DIHARD III data preparation."""
    from lhotse_tpu.recipes import prepare_dihard3

    prepare_dihard3(
        dev_audio_dir=dev_audio_dir, eval_audio_dir=eval_audio_dir, output_dir=output_dir,
        uem_manifest=uem, num_jobs=num_jobs)


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
@click.option("--force-download", is_flag=True, default=False)
def voxconverse_dl(target_dir: Pathlike, force_download: bool):
    """VoxConverse download."""
    from lhotse_tpu.recipes import download_voxconverse

    download_voxconverse(target_dir, force_download=force_download)
