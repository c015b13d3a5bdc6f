"""``python -m fpcr_tpu ...`` — delegates to the CLI (fpcr_tpu/cli.py)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
