from . import era  # noqa: F401
