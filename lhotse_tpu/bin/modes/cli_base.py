"""
CLI entry group.

Reference behavior: `/root/reference/lhotse/bin/modes/cli_base.py` (:1-31).
"""
import logging

import click


@click.group()
@click.version_option(package_name="lhotse-tpu", prog_name="lhotse-tpu")
@click.option("-s", "--seed", type=int, help="Random seed.")
def cli(seed):
    """
    The shell entry point to lhotse-tpu, a TPU-native tool and library for
    audio data manipulation.
    """
    logging.basicConfig(
        format="%(asctime)s %(levelname)s [%(filename)s:%(lineno)d] %(message)s",
        level=logging.INFO)
    if seed is not None:
        from lhotse_tpu.utils import fix_random_seed

        fix_random_seed(seed)


@cli.group()
def prepare():
    """Command group with data preparation recipes."""
    pass


@cli.group()
def download():
    """Command group for download and extract data."""
    pass
