"""Drop-in `audio_read` — the reference's decode module name
(SURVEY §2.3.1).  `from audio_read import audio_read` works unchanged."""

from audfprint_tpu.compat.audio_read import (  # noqa: F401
    CommunicationError,
    DecodeError,
    NotInstalledError,
    audio_read,
    buf_to_float,
)
