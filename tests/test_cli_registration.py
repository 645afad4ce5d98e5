"""
CLI wiring smoke: every registered command (including all 100+ recipe
prepare/download commands) must parse --help without import or decorator
errors, and the recipe command inventory must track the recipe package.
"""
import click
import pytest
from click.testing import CliRunner

from lhotse_tpu.bin.modes import cli


def _walk(cmd, prefix=()):
    yield prefix, cmd
    if isinstance(cmd, click.Group):
        for name in cmd.commands:
            yield from _walk(cmd.commands[name], prefix + (name,))


ALL_COMMANDS = [(".".join(p) or "<root>", c) for p, c in _walk(cli)]


def test_command_inventory_size():
    names = [n for n, _ in ALL_COMMANDS]
    prepare = [n for n in names if n.startswith("prepare.")]
    download = [n for n in names if n.startswith("download.")]
    assert len(prepare) >= 100, f"only {len(prepare)} prepare commands"
    assert len(download) >= 60, f"only {len(download)} download commands"
    assert len(names) >= 200


@pytest.mark.parametrize(
    "path", [n for n, c in ALL_COMMANDS if not isinstance(c, click.Group)][:400])
def test_every_command_parses_help(path):
    runner = CliRunner()
    res = runner.invoke(cli, path.split(".") + ["--help"])
    assert res.exit_code == 0, f"{path}: {res.output[-300:]}"
