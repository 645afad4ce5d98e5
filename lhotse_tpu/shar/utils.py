"""
Shar placeholder conversions.

Reference behavior: `/root/reference/lhotse/shar/utils.py`
(to_shar_placeholder :12-50, fill_shar_placeholder :53-96,
fill_shar_placeholder_lazy :99-154).
"""
from pathlib import Path
from typing import Optional, TypeVar, Union

from lhotse_tpu.array import Array, TemporalArray
from lhotse_tpu.audio import AudioSource, Recording
from lhotse_tpu.cut import Cut
from lhotse_tpu.features import Features
from lhotse_tpu.utils import Pathlike, compute_num_samples, fastcopy

Manifest = TypeVar("Manifest", Recording, Features, Array, TemporalArray)


def to_shar_placeholder(manifest: Manifest, cut: Optional[Cut] = None) -> Manifest:
    """Strip storage details, leaving a placeholder to be filled at read time."""
    if isinstance(manifest, Recording):
        return fastcopy(
            manifest,
            # Collapse possibly-multiple sources into one 'shar' source.
            sources=[AudioSource(type="shar", channels=manifest.channel_ids, source="")],
            # Transforms were already executed when the audio was materialized.
            transforms=None,
            duration=cut.duration if cut is not None else manifest.duration,
            num_samples=compute_num_samples(cut.duration, manifest.sampling_rate)
            if cut is not None
            else manifest.num_samples,
        )
    elif isinstance(manifest, Array):
        return fastcopy(manifest, storage_type="shar", storage_path="", storage_key="")
    elif isinstance(manifest, Features):
        return fastcopy(
            manifest,
            start=0,
            duration=cut.duration if cut is not None else manifest.duration,
            storage_type="shar",
            storage_path="",
            storage_key="",
        )
    elif isinstance(manifest, TemporalArray):
        return fastcopy(
            manifest,
            start=0,
            array=fastcopy(
                manifest.array, storage_type="shar", storage_path="", storage_key=""
            ),
        )
    else:
        raise RuntimeError(f"Unexpected manifest type: {type(manifest)}")


def fill_shar_placeholder(
    manifest: Union[Cut, Recording, Features, Array, TemporalArray],
    data: bytes,
    tarpath: Pathlike,
    field: Optional[str] = None,
) -> None:
    """Attach in-memory ``data`` bytes to a shar placeholder manifest."""
    if isinstance(manifest, Cut):
        assert field is not None, (
            "'field' argument must be provided when filling a Shar placeholder in a Cut."
        )
        manifest = getattr(manifest, field)
        fill_shar_placeholder(manifest=manifest, field=field, data=data, tarpath=tarpath)
        return

    tarpath = Path(tarpath)

    if isinstance(manifest, Recording):
        assert len(manifest.sources) == 1, (
            "We expected a single (possibly multi-channel) AudioSource in Shar format."
        )
        manifest.sources[0].type = "memory"
        manifest.sources[0].source = data

    elif isinstance(manifest, (Features, Array)):
        manifest.storage_key = data
        if tarpath.suffix == ".llc":
            manifest.storage_type = "memory_lilcom"
        elif tarpath.suffix == ".npy":
            manifest.storage_type = "memory_npy"
        else:
            raise RuntimeError(f"Unknown array/tensor format: {tarpath}")

    elif isinstance(manifest, TemporalArray):
        manifest.array.storage_key = data
        if tarpath.suffix == ".llc":
            manifest.array.storage_type = "memory_lilcom"
        elif tarpath.suffix == ".npy":
            manifest.array.storage_type = "memory_npy"
        else:
            raise RuntimeError(f"Unknown array/tensor format: {tarpath}")

    else:
        raise RuntimeError(f"Unknown manifest type: {type(manifest).__name__}")


def fill_shar_placeholder_lazy(
    manifest: Union[Cut, Recording, Features, Array, TemporalArray],
    *,
    tar_path: Pathlike,
    offset: int,
    end_offset: int,
    field: Optional[str] = None,
) -> None:
    """
    Lazy variant: instead of inlining bytes, encode a Shar lazy pointer
    ``<tar_path>?o=<offset>&e=<end_offset>`` (a *payload* byte range from the
    .idx sidecar) so the data is fetched on demand. The payload format is
    sniffed from magic bytes at load time.
    """
    from lhotse_tpu.shar.lazy_pointer import encode_pointer

    if isinstance(manifest, Cut):
        assert field is not None, (
            "'field' argument must be provided when filling a Shar placeholder in a Cut."
        )
        inner = getattr(manifest, field)
        fill_shar_placeholder_lazy(
            manifest=inner,
            tar_path=tar_path,
            offset=offset,
            end_offset=end_offset,
            field=field,
        )
        return

    pointer = encode_pointer(str(tar_path), offset, end_offset)

    if isinstance(manifest, Recording):
        assert len(manifest.sources) == 1, (
            "We expected a single (possibly multi-channel) AudioSource in Shar format."
        )
        manifest.sources[0].type = "shar_ptr"
        manifest.sources[0].source = pointer

    elif isinstance(manifest, (Features, Array)):
        manifest.storage_type = "shar_ptr_array"
        manifest.storage_path = str(tar_path)
        manifest.storage_key = pointer

    elif isinstance(manifest, TemporalArray):
        manifest.array.storage_type = "shar_ptr_array"
        manifest.array.storage_path = str(tar_path)
        manifest.array.storage_key = pointer

    else:
        raise RuntimeError(f"Unknown manifest type: {type(manifest).__name__}")
