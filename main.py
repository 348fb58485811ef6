#!/usr/bin/env python
"""Rot-MVGaze TPU — reference-compatible entry point.

Same CLI surface as /root/reference/main.py (see rot_mvgaze_tpu/cli/main.py).
"""

import sys

from rot_mvgaze_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
