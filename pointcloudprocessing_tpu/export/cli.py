"""Export CLI: trained stage checkpoint -> ONNX / StableHLO artifacts.

The reference only exports during training (``pointnet_train.py:237-248``);
this exports any saved stage after the fact:

    python -m pointcloudprocessing_tpu.export.cli \\
        <stage_dir> <config.json> out.onnx [out.stablehlo]

``stage_dir`` is a stage directory containing ``best/`` (the training
driver's BestCheckpoint layout) and ``config.json`` the run's config copy
(the driver writes one next to each trained model for provenance —
reference ``pointnet_train.py:251``; the stage dir's own copy works).
ONNX comes from the native opset-13 writer when the optional tf2onnx
toolchain is absent (export/onnx_native.py).
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 1
    stage_dir, config_path, onnx_path = argv[0], argv[1], argv[2]
    hlo_path = argv[3] if len(argv) > 3 else None

    from pointcloudprocessing_tpu.core.config import load_config
    from pointcloudprocessing_tpu.export.onnx_bridge import export_onnx
    from pointcloudprocessing_tpu.models.factory import model_from_config
    from pointcloudprocessing_tpu.train.callbacks import load_checkpoint

    cfg = load_config(config_path)
    # exports are multi-platform artifacts: never bake Pallas custom calls
    model = model_from_config(cfg, allow_pallas=False)
    payload = load_checkpoint(stage_dir)
    variables = {
        "params": payload["params"],
        "batch_stats": payload["batch_stats"],
    }
    if not export_onnx(model, variables, cfg.input_width, onnx_path):
        return 1
    print(f"wrote {onnx_path}")
    if hlo_path:
        from pointcloudprocessing_tpu.export.stablehlo import export_stablehlo

        export_stablehlo(model, variables, cfg.input_width, hlo_path)
        print(f"wrote {hlo_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
