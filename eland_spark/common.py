"""Small shared vocabulary (reference eland/common.py:80-104 SortOrder,
eland/ndframe.py:57 NDFrame).

``NDFrame`` is the reference's shared DataFrame/Series base; user code
does ``isinstance(obj, ed.NDFrame)`` checks. Here frame and series do
not share an implementation base (the Series is a thin Column view),
so NDFrame is an ABC with both registered as virtual subclasses — the
isinstance contract holds without contorting the class hierarchy.
"""

from __future__ import annotations

import abc
from enum import Enum

__all__ = ["SortOrder", "NDFrame"]


class SortOrder(Enum):
    ASC = 0
    DESC = 1

    @staticmethod
    def reverse(order: "SortOrder") -> "SortOrder":
        return SortOrder.DESC if order == SortOrder.ASC else SortOrder.ASC

    @staticmethod
    def to_string(order: "SortOrder") -> str:
        return "asc" if order == SortOrder.ASC else "desc"

    @staticmethod
    def from_string(order: str) -> "SortOrder":
        if order == "asc":
            return SortOrder.ASC
        if order == "desc":
            return SortOrder.DESC
        raise ValueError(
            f"Could not convert {order!r} to SortOrder (asc/desc)"
        )


class NDFrame(abc.ABC):
    """Common frame/series supertype for isinstance checks (the
    reference's shared base; virtual here — see module docstring)."""


def _register_ndframe_subclasses() -> None:
    from .frame import DataFrame
    from .series import Series

    NDFrame.register(DataFrame)
    NDFrame.register(Series)
