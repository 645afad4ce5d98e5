"""
sph2pipe installer (SPHERE/shorten decoding for older LDC corpora).

Reference behavior: `/root/reference/lhotse/tools/sph2pipe.py` (:13-58).
"""
import logging
import subprocess
import tarfile
from pathlib import Path
from typing import Optional

from lhotse_tpu.tools.env import default_tools_cachedir
from lhotse_tpu.utils import Pathlike, resumable_download, safe_extract

SPH2PIPE_URL = "https://github.com/burrmill/sph2pipe/archive/2.5.tar.gz"


def install_sph2pipe(
    where: Optional[Pathlike] = None, download_from: str = SPH2PIPE_URL, force: bool = False,
) -> None:
    """
    Download, extract, and compile sph2pipe (handles sphere .sph audio with
    "shorten" codec compression).
    """
    if where is None:
        where = default_tools_cachedir(force_mkdir=True)
    where = Path(where)
    download_and_untar_sph2pipe(where, url=download_from, force_download=force)
    subprocess.run(
        [ "make", "-C", str(where / "sph2pipe-2.5"), "CCFLAGS=-Wno-error=implicit-function-declaration", ],
        check=True)
    logging.info("Finished installing sph2pipe.")


def download_and_untar_sph2pipe(
    target_dir: Pathlike, url: str, force_download: bool = False) -> Path:
    target_dir = Path(target_dir)
    sph2pipe_dir = target_dir / "sph2pipe-2.5"
    if (sph2pipe_dir / "Makefile").is_file() and not force_download:
        return sph2pipe_dir
    target_dir.mkdir(parents=True, exist_ok=True)
    tar_name = "sph2pipe-2.5.tar.gz"
    tar_path = target_dir / tar_name
    resumable_download(url, filename=tar_path, force_download=force_download)
    with tarfile.open(tar_path) as tar:
        safe_extract(tar, path=target_dir)
    return sph2pipe_dir
