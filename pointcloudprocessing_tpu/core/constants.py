"""Global constants.

Mirrors the reference's ``point_cloud_analysis/utils/global_constants.py:1-4``
(SE3 matrix constants used by the pose-log parser) and
``point_cloud_toolkit/utils/globals.py:1-13`` (metric/output names, speed of
light).
"""

# SE3 matrix constants (reference: utils/global_constants.py:1-4)
SE3_ROWS = 4
SE3_COLS = 4
SE3_SIZE = SE3_ROWS * SE3_COLS

# Model metric names (reference: point_cloud_toolkit/utils/globals.py:2-5)
TF_METRICS = [
    "sparse_categorical_accuracy",
    "root_mean_squared_error",
]

# Model output names (reference: point_cloud_toolkit/utils/globals.py:7-11)
MODEL_OUTPUTS = [
    "classification_output",
    "segmentation_output",
    "se3",
]

# Speed of light, m/s (reference: point_cloud_toolkit/utils/globals.py:13)
C = 299792458

# Keras numerical conventions the reference model inherits; kept here so the
# whole framework agrees on them (required for <=1e-4 logit parity).
KERAS_EPSILON = 1e-7          # probability clipping in crossentropy
KERAS_BN_EPSILON = 1e-3       # keras.layers.BatchNormalization default
KERAS_BN_MOMENTUM = 0.99      # reference ConvLayer/DenseLayer default
NORMALIZATION_EPSILON = 1e-7  # PointCloudNormalization scale floor (PointNet.py:701)
