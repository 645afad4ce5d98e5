from lhotse_tpu.bin.modes.recipes.aishell import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.recipes.librispeech import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.recipes.libritts import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.recipes.musan import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.recipes.tedlium import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.recipes.yesno import *  # noqa: F401,F403
