from pointcloudprocessing_tpu.ops.pallas.chain import (
    fused_chain_max,
    fused_seg_head,
    fold_bn,
)
from pointcloudprocessing_tpu.ops.pallas.fps import fps_pallas

__all__ = ["fused_chain_max", "fused_seg_head", "fold_bn", "fps_pallas"]
