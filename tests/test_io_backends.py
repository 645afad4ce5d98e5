"""IO backend registry: tar-as-dir, composite chain, gating."""
import io
import tarfile

import pytest

from lhotse_tpu.serialization import (
    AIStoreIOBackend, MSCIOBackend, TarAsDirBackend, available_io_backends, get_default_io_backend)


@pytest.fixture
def tar_with_member(tmp_path):
    tar_path = tmp_path / "archive.tar"
    with tarfile.open(tar_path, "w") as tar:
        data = b"hello tar member"
        info = tarfile.TarInfo("sub/file.txt")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    return tar_path


def test_tar_as_dir_backend(tar_with_member):
    b = TarAsDirBackend()
    ident = f"{tar_with_member}/sub/file.txt"
    assert b.is_applicable(ident)
    assert not b.is_applicable("/tmp/plain.txt")
    assert b.open(ident).read() == b"hello tar member"
    with pytest.raises(FileNotFoundError):
        b.open(f"{tar_with_member}/no/such.txt")
    with pytest.raises(FileNotFoundError):
        b.open("/nonexistent.tar/member.txt")


def test_composite_chain_dispatches_tar_paths(tar_with_member):
    f = get_default_io_backend().open(f"{tar_with_member}/sub/file.txt", "rb")
    assert f.read() == b"hello tar member"


def test_gated_backends_listed_only_when_available():
    names = available_io_backends()
    assert "TarAsDirBackend" in names
    assert "BuiltinIOBackend" in names
    # These SDKs are not installed in this environment.
    assert AIStoreIOBackend.is_available() is False
    assert MSCIOBackend.is_available() is False


def test_msc_backend_applicability(monkeypatch):
    b = MSCIOBackend()
    assert b.is_applicable("msc://profile/bucket/key")
    assert not b.is_applicable("s3://bucket/key")
    monkeypatch.setenv("LHOTSE_MSC_BACKEND_FORCED", "true")
    assert b.is_applicable("s3://bucket/key")
