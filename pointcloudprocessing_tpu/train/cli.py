"""CLI: ``python -m pointcloudprocessing_tpu.train.cli <name>_config.json``.

Mirrors the reference's ``pointnet_train.py`` __main__ (:445-453) without the
interactive no-GPU prompt (device info is logged instead — appropriate for
non-interactive TPU jobs).
"""

import sys

from pointcloudprocessing_tpu.train.profile import train_pointnet

if __name__ == "__main__":
    if train_pointnet(sys.argv[1:]):
        print("Model training completed successfully.")
    else:
        print("Model training failed.")
        sys.exit(1)
