"""Reference audfprint.py surface (SURVEY §2.3.6) — the CLI."""

from audfprint_tpu.cli import (  # noqa: F401
    filename_list_iterator,
    main,
    setup_analyzer,
    setup_matcher,
)
