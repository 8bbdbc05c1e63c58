"""GUI import gating: without PyQt6 the GUI raises a clear advisory and the
headless toolkit stays fully importable."""

import importlib

import pytest


def test_gui_requires_qt_message():
    gui = importlib.import_module("pointcloudprocessing_tpu.toolkit.gui")
    try:
        import PyQt6  # noqa: F401

        has_qt = True
    except ImportError:
        has_qt = False

    if has_qt:
        pytest.skip("PyQt6 installed; gating not exercised")
    with pytest.raises(ImportError, match="PyQt6"):
        gui.require_qt()
    with pytest.raises(ImportError, match="headless"):
        importlib.import_module("pointcloudprocessing_tpu.toolkit.gui.views")


def test_headless_toolkit_importable_without_qt():
    import pointcloudprocessing_tpu.toolkit as tk

    assert tk.solve_kabsch is not None
    assert tk.PointCloudPlot is not None
