"""Verifier (reference src/cs/implementations/verifier.rs)."""

from .verifier import verify  # noqa: F401
