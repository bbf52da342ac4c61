"""Reference stft.py surface (SURVEY §2.3.2) — the NumPy oracle STFT."""

from audfprint_tpu.oracle.stft import frame, stft  # noqa: F401
