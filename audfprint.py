#!/usr/bin/env python
"""Drop-in `audfprint.py` — the reference's CLI module name.

Upstream users invoke `python audfprint.py new|add|match ...` and import
`audfprint` for `main`/`setup_analyzer`/`setup_matcher` (SURVEY §2.3.6,
reference audfprint.py:~400-490).  This shim exposes the TPU-native CLI
under that exact name so existing scripts and shell pipelines switch
without edits.  Same surface as `audfprint_tpu.compat.audfprint`.
"""

from audfprint_tpu.cli import (  # noqa: F401
    filename_list_iterator,
    main,
    setup_analyzer,
    setup_matcher,
)

if __name__ == "__main__":
    import sys

    sys.exit(main())
