from pointcloudprocessing_tpu.ops.pallas.chain import (
    fused_chain_max,
    fused_seg_head,
    fold_bn,
)

__all__ = ["fused_chain_max", "fused_seg_head", "fold_bn"]
