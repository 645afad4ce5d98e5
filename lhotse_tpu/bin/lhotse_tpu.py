"""
Console entry point (declared in pyproject as ``lhotse-tpu``).

Reference behavior: `/root/reference/lhotse/bin/lhotse.py`.
"""
from lhotse_tpu.bin.modes import cli

if __name__ == "__main__":
    cli()
