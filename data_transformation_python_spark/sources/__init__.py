"""Source/sink connectors — see io.py."""

from .io import read_source, write_sink  # noqa: F401
