"""Toolkit constants (API parity with point_cloud_toolkit/utils/globals.py:1-13)."""

from pointcloudprocessing_tpu.core.constants import TF_METRICS, MODEL_OUTPUTS, C

__all__ = ["TF_METRICS", "MODEL_OUTPUTS", "C"]
