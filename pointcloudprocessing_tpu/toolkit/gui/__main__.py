"""``python -m pointcloudprocessing_tpu.toolkit.gui`` — launch the toolkit
GUI (reference: point_cloud_toolkit/main.py:5-9)."""

import sys

from pointcloudprocessing_tpu.toolkit.gui import run_app

if __name__ == "__main__":
    sys.exit(run_app())
