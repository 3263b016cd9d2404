"""Export a detector checkpoint to a self-contained AOT serving artifact.

Thin wrapper over ``avd_tpu.models.export.main`` (also installed as the
``avd-export`` console script); see that module for the artifact format.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avd_tpu.models.export import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
