from lhotse_tpu.bin.modes import cli
