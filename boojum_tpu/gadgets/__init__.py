"""Gadget library (reference src/gadgets/)."""

from . import sha256, tables, uints  # noqa: F401
