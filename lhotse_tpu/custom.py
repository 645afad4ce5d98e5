"""
CustomFieldMixin: attribute-style access to user-defined ``custom`` fields.

Reference behavior: `/root/reference/lhotse/custom.py:10-175` —
``__getattr__``/``__setattr__`` magic exposing ``custom`` dict entries as
attributes, with ``load_X()`` auto-dispatch for Array / TemporalArray /
Recording / Image values incl. cut-relative truncation.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import numpy as np

from lhotse_tpu.utils import asdict_nonull, fastcopy, ifnone


class CustomFieldMixin:
    """
    Mixin for classes (Cut, SupervisionSegment) that hold custom user-defined
    fields. Note: dataclasses inheriting from this mixin must re-declare the
    ``custom`` attribute (pre-3.10 dataclass semantics).
    """

    def __init__(self, custom: Optional[Dict[str, Any]]) -> None:
        self.custom: Optional[Dict[str, Any]] = custom

    def __setattr__(self, key: str, value: Any) -> None:
        if key in self.__dataclass_fields__:
            super().__setattr__(key, value)
        else:
            custom = ifnone(self.custom, {})
            if value is None:
                custom.pop(key, None)
            else:
                custom[key] = value
            if custom:
                self.custom = custom

    def __getattr__(self, name: str) -> Any:
        custom = self.custom
        if custom is None:
            raise AttributeError(f"No such attribute: {name}")
        if name in custom:
            return self.custom[name]
        elif name.startswith("load_"):
            return partial(self.load_custom, name[5:])
        raise AttributeError(f"No such attribute: {name}")

    def __delattr__(self, key: str) -> None:
        if key in self.__dataclass_fields__:
            super().__delattr__(key)
        if self.custom is None or key not in self.custom:
            raise AttributeError(f"No such member: '{key}'")
        del self.custom[key]

    def to_dict(self) -> Dict[str, Any]:
        return asdict_nonull(self)

    def with_custom(self, name: str, value: Any):
        """Return a copy of this object with an extra custom field assigned."""
        cpy = fastcopy(self, custom=self.custom.copy() if self.custom is not None else {})
        cpy.custom[name] = value
        return cpy

    def copy_with(self, **kwargs):
        """Copy with selected fields overwritten (fastcopy convenience)."""
        return fastcopy(self, **kwargs)

    def load_custom(self, name: str, **kwargs) -> np.ndarray:
        """
        Load custom data as a numpy array from an Array / TemporalArray /
        Recording / Image manifest stored in ``custom`` — TemporalArray and
        Recording values are sliced to this object's [start, start+duration).
        """
        from lhotse_tpu import Recording
        from lhotse_tpu.array import Array, TemporalArray
        from lhotse_tpu.image.image import Image

        value = self.custom.get(name)
        if isinstance(value, Array):
            return value.load(**kwargs)
        elif isinstance(value, TemporalArray):
            return value.load(start=self.start, duration=self.duration, **kwargs)
        elif isinstance(value, Recording):
            channels = self.custom.get(f"{name}_channel_selector")
            if channels is None and "channel" in kwargs:
                channels = kwargs.pop("channel")
            if self.custom.get(f"{name}_unaligned", False):
                return value.load_audio(channels=channels, **kwargs)
            if value.has_video:
                return value.load_video(
                    channels=channels, offset=self.start, duration=self.duration, **kwargs
                )
            return value.load_audio(
                channels=channels, offset=self.start, duration=self.duration, **kwargs
            )
        elif isinstance(value, Image):
            return value.load(**kwargs)
        else:
            raise ValueError(
                f"To load {name}, the object needs field {name} (or custom['{name}']) "
                f"holding a manifest of type Array, TemporalArray, Recording, or Image."
            )

    def has_custom(self, name: str) -> bool:
        if self.custom is None:
            return False
        return name in self.custom

    def drop_custom(self, name: str):
        if self.custom is None or name not in self.custom:
            return None
        del self.custom[name]
        return self
