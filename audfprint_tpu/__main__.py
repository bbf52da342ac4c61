import sys

from audfprint_tpu.cli import main

sys.exit(main())
