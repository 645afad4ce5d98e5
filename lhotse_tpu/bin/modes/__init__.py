from lhotse_tpu.bin.modes.cli_base import cli, download, prepare
from lhotse_tpu.bin.modes.cut import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.features import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.index import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.install_tools import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.kaldi import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.manipulation import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.recipes import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.shar import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.supervision import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.utils import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.validate import *  # noqa: F401,F403
from lhotse_tpu.bin.modes.workflows import *  # noqa: F401,F403
