"""Drop-in `audfprint_match` — the reference's matcher module name
(SURVEY §2.3.5).  `from audfprint_match import Matcher` works unchanged."""

from audfprint_tpu.compat.audfprint_match import (  # noqa: F401
    Matcher,
    find_modes,
    locmax,
)
