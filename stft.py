"""Drop-in `stft` — the reference's STFT module name (SURVEY §2.3.2).

`from stft import stft` works unchanged (NumPy oracle STFT: strided
framing, no centering, caller-supplied window)."""

from audfprint_tpu.compat.stft import frame, stft  # noqa: F401
