"""Reference audfprint_match.py surface (SURVEY §2.3.5)."""

from audfprint_tpu.match.matcher import Matcher  # noqa: F401
from audfprint_tpu.oracle.analyze import locmax  # noqa: F401
from audfprint_tpu.oracle.match import find_modes  # noqa: F401
