from lhotse_tpu.tools.env import add_tools_to_path, default_tools_cachedir
