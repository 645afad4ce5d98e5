"""
CLI for the simple Chinese OpenSLR corpora. Reference behavior:
`/root/reference/lhotse/bin/modes/recipes/{stcmds,thchs_30,magicdata,
primewords,aidatatang_200zh}.py`.
"""
import click

from lhotse_tpu.bin.modes.cli_base import download, prepare
from lhotse_tpu.recipes import (
    download_aidatatang_200zh, download_magicdata, download_primewords, download_stcmds,
    download_thchs_30, prepare_aidatatang_200zh, prepare_magicdata, prepare_primewords,
    prepare_stcmds, prepare_thchs_30)
from lhotse_tpu.utils import Pathlike

__all__ = []  # commands self-register on the click groups


def _register(name: str, prepare_fn, download_fn, help_name: str):
    @prepare.command(name=name, context_settings=dict(show_default=True))
    @click.argument("corpus_dir", type=click.Path(exists=True, dir_okay=True))
    @click.argument("output_dir", type=click.Path())
    def _prepare(corpus_dir: Pathlike, output_dir: Pathlike):
        prepare_fn(corpus_dir, output_dir=output_dir)

    _prepare.__doc__ = f"{help_name} ASR data preparation."

    @download.command(name=name, context_settings=dict(show_default=True))
    @click.argument("target_dir", type=click.Path())
    def _download(target_dir: Pathlike):
        download_fn(target_dir)

    _download.__doc__ = f"{help_name} download."


_register("stcmds", prepare_stcmds, download_stcmds, "ST-CMDS")
_register("thchs-30", prepare_thchs_30, download_thchs_30, "THCHS-30")
_register("magicdata", prepare_magicdata, download_magicdata, "MagicData")
_register("primewords", prepare_primewords, download_primewords, "Primewords")
_register(
    "aidatatang-200zh", prepare_aidatatang_200zh, download_aidatatang_200zh, "aidatatang_200zh")
