from . import extension, goldilocks
from .extension import GL2
from .goldilocks import GL, ORDER

__all__ = ["GL", "GL2", "ORDER", "goldilocks", "extension"]
