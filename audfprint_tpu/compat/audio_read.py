"""Reference audio_read.py surface (SURVEY §2.3.1)."""

from audfprint_tpu.utils.audio import (  # noqa: F401
    CommunicationError,
    DecodeError,
    NotInstalledError,
    audio_read,
    buf_to_float,
)
