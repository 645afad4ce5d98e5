from lhotse_tpu.bin.modes.recipes.librispeech import *  # noqa: F401,F403
