"""
Reference behavior: `/root/reference/lhotse/bin/modes/install_tools.py`.
"""
import click

from lhotse_tpu.bin.modes.cli_base import cli
from lhotse_tpu.tools.env import default_tools_cachedir
from lhotse_tpu.tools.sph2pipe import SPH2PIPE_URL


@cli.command(context_settings=dict(show_default=True))
@click.option(
    "--install-dir", type=click.Path(), default=default_tools_cachedir(),
    help="Directory where sph2pipe will be downloaded and installed.")
@click.option("--url", default=SPH2PIPE_URL, help="URL from which to download sph2pipe.")
def install_sph2pipe(install_dir: str, url: str):
    """
    Install sph2pipe for sphere (.sph) audio with "shorten" compression
    (needed for older LDC data): downloads, extracts, and compiles it.
    """
    from lhotse_tpu.tools.sph2pipe import install_sph2pipe

    install_sph2pipe(where=install_dir, download_from=url)
