"""Minimal in-process Qt test double for smoke-testing the GUI glue.

PyQt6 is not installable in the CI image, so the toolkit GUI
(pointcloudprocessing_tpu/toolkit/gui/) would otherwise only ever be
import-gating-tested. This module fakes the narrow PyQt6 surface the GUI
actually uses — widgets hold state, signals are synchronous callback lists,
dialogs return test-injected values, message boxes record into
:data:`MESSAGE_LOG` — so the real view/controller code (layout assembly,
signal wiring, handler bodies) executes under pytest.

It is a test double, not a Qt emulator: no event loop, no painting, no
geometry. Install with :func:`install` (returns the module dict to register
in ``sys.modules``).
"""

from __future__ import annotations

import sys
import types

MESSAGE_LOG: list[str] = []
QUESTION_RESPONSES: list = []  # popped by QMessageBox.question; default Yes
_NEXT_OPEN_FILES: list[str] = []
_NEXT_DIRECTORIES: list[str] = []


def reset() -> None:
    MESSAGE_LOG.clear()
    QUESTION_RESPONSES.clear()
    _NEXT_OPEN_FILES.clear()
    _NEXT_DIRECTORIES.clear()


def queue_open_file(path: str) -> None:
    _NEXT_OPEN_FILES.append(str(path))


def queue_directory(path: str) -> None:
    _NEXT_DIRECTORIES.append(str(path))


class Signal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            fn(*args)


class QWidget:
    def __init__(self, parent=None):
        self._layout = None
        self._deleted = False
        self._visible = False

    def setLayout(self, layout):
        self._layout = layout

    def layout(self):
        return self._layout

    def deleteLater(self):
        self._deleted = True

    def show(self):
        self._visible = True

    def setParent(self, parent):
        pass


class _LayoutItem:
    def __init__(self, widget=None, layout=None):
        self._widget, self._layout = widget, layout

    def widget(self):
        return self._widget

    def layout(self):
        return self._layout


class _Layout:
    def __init__(self):
        self._items: list[_LayoutItem] = []

    def addWidget(self, widget, stretch=0):
        self._items.append(_LayoutItem(widget=widget))

    def addLayout(self, layout, stretch=0):
        self._items.append(_LayoutItem(layout=layout))

    def addStretch(self, stretch=0):
        pass

    def count(self):
        return len(self._items)

    def takeAt(self, index):
        return self._items.pop(index)

    def itemAt(self, index):
        return self._items[index]


class QVBoxLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QLabel(QWidget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text

    def setText(self, text):
        self._text = text

    def text(self):
        return self._text

    def setAlignment(self, flag):
        pass
    # deliberately NO setHtml: the GUI's _set_html gates on hasattr, and the
    # QLabel web-view fallback path must exercise that gate


class QPushButton(QWidget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self.clicked = Signal()

    def click(self):
        self.clicked.emit(False)

    def text(self):
        return self._text


class QRadioButton(QWidget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self._checked = False
        self.toggled = Signal()

    def setChecked(self, value: bool):
        if bool(value) != self._checked:
            self._checked = bool(value)
            self.toggled.emit(self._checked)

    def isChecked(self):
        return self._checked

    def text(self):
        return self._text


class QCheckBox(QWidget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self._checked = False
        self.stateChanged = Signal()

    def setChecked(self, value: bool):
        if bool(value) != self._checked:
            self._checked = bool(value)
            self.stateChanged.emit(2 if self._checked else 0)

    def isChecked(self):
        return self._checked

    def text(self):
        return self._text


class QSlider(QWidget):
    def __init__(self, orientation=None):
        super().__init__()
        self._value = 0
        self._range = (0, 99)
        self.sliderMoved = Signal()
        self.valueChanged = Signal()

    def setRange(self, lo, hi):
        self._range = (lo, hi)

    def setValue(self, value):
        self._value = value
        self.valueChanged.emit(value)

    def value(self):
        return self._value

    def move_to(self, value):
        """Test helper: simulate a user drag."""
        self._value = value
        self.sliderMoved.emit(value)


class QLineEdit(QWidget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text

    def text(self):
        return self._text

    def setText(self, text):
        self._text = text


class QProgressBar(QWidget):
    def __init__(self):
        super().__init__()
        self._value = 0

    def setValue(self, value):
        self._value = value

    def value(self):
        return self._value


class QScrollArea(QWidget):
    def __init__(self):
        super().__init__()
        self._widget = None

    def setWidget(self, widget):
        self._widget = widget

    def widget(self):
        return self._widget

    def setWidgetResizable(self, resizable):
        pass


class QButtonGroup:
    def __init__(self, parent=None):
        self._buttons = []

    def addButton(self, button):
        self._buttons.append(button)

    def buttons(self):
        return list(self._buttons)


class QStackedWidget(QWidget):
    def __init__(self):
        super().__init__()
        self._widgets = []
        self._index = 0

    def addWidget(self, widget):
        self._widgets.append(widget)

    def setCurrentIndex(self, index):
        self._index = index

    def currentIndex(self):
        return self._index


class QMainWindow(QWidget):
    def __init__(self):
        super().__init__()
        self._central = None
        self._title = ""

    def setWindowTitle(self, title):
        self._title = title

    def showMaximized(self):
        self._visible = True

    def setCentralWidget(self, widget):
        self._central = widget


class _StandardButton:
    Yes = 16384
    No = 65536

    def __init__(self, value):
        self.value = value


class QMessageBox(QWidget):
    StandardButton = _StandardButton

    def __init__(self, parent=None):
        super().__init__()
        self._title = ""
        self._text = ""

    def setWindowTitle(self, title):
        self._title = title

    def setText(self, text):
        self._text = text

    def exec(self):
        MESSAGE_LOG.append(self._text)
        return 0

    @staticmethod
    def question(parent, title, message, buttons=None):
        MESSAGE_LOG.append(message)
        if QUESTION_RESPONSES:
            return QUESTION_RESPONSES.pop(0)
        return _StandardButton.Yes


class QFileDialog:
    @staticmethod
    def getOpenFileName(parent=None, caption="", directory=""):
        return (_NEXT_OPEN_FILES.pop(0) if _NEXT_OPEN_FILES else "", "")

    @staticmethod
    def getExistingDirectory(parent=None, caption="", directory=""):
        return _NEXT_DIRECTORIES.pop(0) if _NEXT_DIRECTORIES else ""


class _Orientation:
    Horizontal = 1
    Vertical = 2


class _AlignmentFlag:
    AlignCenter = 0x84


class Qt:
    Orientation = _Orientation
    AlignmentFlag = _AlignmentFlag


def iter_widgets(layout):
    """All widgets reachable from a layout, depth-first (incl. nested
    container widgets' layouts)."""
    out = []
    stack = [layout]
    while stack:
        node = stack.pop()
        if node is None:
            continue
        for item in list(node._items):
            if item._widget is not None:
                out.append(item._widget)
                if getattr(item._widget, "_layout", None) is not None:
                    stack.append(item._widget._layout)
                if isinstance(item._widget, QScrollArea) and item._widget._widget:
                    out.append(item._widget._widget)
                    stack.append(item._widget._widget._layout)
            if item._layout is not None:
                stack.append(item._layout)
    return out


def find_button(layout, text):
    for w in iter_widgets(layout):
        if isinstance(w, QPushButton) and w.text() == text:
            return w
    raise LookupError(f"no QPushButton {text!r} in layout")


def install() -> dict[str, types.ModuleType]:
    """Build fake PyQt6 module objects; caller registers them in sys.modules
    (monkeypatch.setitem keeps the patch test-scoped). QtWebEngineWidgets is
    intentionally absent so the GUI's web-view fallback path executes."""
    pyqt6 = types.ModuleType("PyQt6")
    widgets = types.ModuleType("PyQt6.QtWidgets")
    core = types.ModuleType("PyQt6.QtCore")
    for name, obj in globals().items():
        if name.startswith("Q"):
            setattr(widgets, name, obj)
    core.Qt = Qt
    pyqt6.QtWidgets = widgets
    pyqt6.QtCore = core
    return {
        "PyQt6": pyqt6,
        "PyQt6.QtWidgets": widgets,
        "PyQt6.QtCore": core,
    }
