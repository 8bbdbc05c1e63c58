"""Two-stage Ctrl-C interrupt handler (pointnet_train.py:42-61 semantics)."""

import signal

import pytest

from pointcloudprocessing_tpu.train.callbacks import CtrlCInterruptHandler


def test_first_sigint_requests_stop_second_exits():
    messages = []
    handler = CtrlCInterruptHandler(print_func=messages.append)
    handler.install()
    try:
        handler._on_signal(signal.SIGINT, None)
        assert handler.stop_requested
        assert any("INTERRUPT INITIATED" in m for m in messages)
        with pytest.raises(SystemExit):
            handler._on_signal(signal.SIGINT, None)
        assert any("FORCE QUIT" in m for m in messages)
    finally:
        handler.uninstall()


def test_install_uninstall_restores_handler():
    before = signal.getsignal(signal.SIGINT)
    handler = CtrlCInterruptHandler()
    handler.install()
    assert signal.getsignal(signal.SIGINT) == handler._on_signal
    handler.uninstall()
    assert signal.getsignal(signal.SIGINT) == before
