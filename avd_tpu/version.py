"""Service version string.

The reference exposes VERSION from the environment with default "1.2.3"
(/root/reference/api.py:20) and echoes it from /, /healthz and /readyz.
"""

import os

VERSION = os.getenv("VERSION", "1.2.3")
