"""Independent wire-format verification of the native ONNX writer.

export/onnx_native.py hand-encodes protobuf and is otherwise verified by
its own bundled reader + interpreter (round-3 verdict: "a bug shared by
writer and interpreter is invisible"). This suite closes the wire half of
that gap: tests/onnx_spec.proto is the public onnx.proto schema subset
transcribed field-for-field from the specification, compiled here with the
in-image protoc, and the exported bytes are decoded with GOOGLE'S protobuf
parser — an implementation that shares nothing with the module's writer or
reader. A wrong field number, wire type, varint encoding, or length prefix
surfaces as a decode error, an unknown field, or a wrong value.

The interpreter-semantics half stays covered by test_onnx_native.py's
1e-4 comparison against ``model.apply`` (jax — independent of the numpy
interpreter); structural opset-13 conventions (ReduceSum axes as INPUT,
Unsqueeze axes as INPUT, ReduceMax/Mean axes as ATTRIBUTE — onnx.ai
operator changelog for opset 13) are asserted here against the spec
directly, so a convention bug shared by builder and interpreter is caught
even without onnxruntime in the image.
"""

import shutil
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessing_tpu.export.onnx_native import (
    export_onnx_native,
    export_onnx_native_dgcnn,
    export_onnx_native_pointnet2,
    parse_model,
)
from pointcloudprocessing_tpu.models import PointNet
from pointcloudprocessing_tpu.models.dgcnn import dgcnn_for_width
from pointcloudprocessing_tpu.models.pointnet2 import pointnet2_for_width

pytestmark = pytest.mark.skipif(
    shutil.which("protoc") is None, reason="protoc not in image"
)

_N = 32  # export width (tiny: this suite checks bytes, not numerics)

# opset-13 conventions: {op_type: (required input count, forbidden attr,
# required attr)} — from the public operator changelog
_OPSET13_SHAPE = {
    "ReduceSum": (2, "axes", None),   # axes moved to input in opset 13
    "Unsqueeze": (2, "axes", None),   # axes moved to input in opset 13
    "Reshape": (2, None, None),       # shape is an input since opset 5
    "ReduceMax": (1, None, "axes"),   # still an attribute at opset 13
    "ReduceMean": (1, None, "axes"),  # still an attribute at opset 13
}


@pytest.fixture(scope="module")
def onnx_pb2(tmp_path_factory):
    """Compile tests/onnx_spec.proto with the in-image protoc and import
    the generated module (Google's parser, nothing shared with the repo's
    hand-rolled writer/reader)."""
    import os

    proto = os.path.join(os.path.dirname(__file__), "onnx_spec.proto")
    out = tmp_path_factory.mktemp("onnx_spec_pb")
    subprocess.run(
        ["protoc", f"--proto_path={os.path.dirname(proto)}",
         f"--python_out={out}", os.path.basename(proto)],
        check=True, capture_output=True,
    )
    sys.path.insert(0, str(out))
    try:
        import onnx_spec_pb2  # noqa: F401  (generated)

        yield onnx_spec_pb2
    finally:
        sys.path.remove(str(out))
        sys.modules.pop("onnx_spec_pb2", None)


def _export_all(tmp_path, rng):
    """Export the three model families at tiny width; return name->bytes."""
    out = {}
    x0 = jnp.asarray(rng.normal(size=(1, _N, 3)).astype(np.float32))

    m = PointNet(num_classes=4, num_parts=3, vanilla=False)
    v = m.init(jax.random.key(0), x0, train=False)
    p = str(tmp_path / "pointnet.onnx")
    export_onnx_native(m, v, _N, p, print_func=lambda s: None)
    out["pointnet"] = open(p, "rb").read()

    m = pointnet2_for_width(4, 3, _N, exact_knn=True)
    v = m.init(jax.random.key(0), x0, train=False)
    p = str(tmp_path / "pointnet2.onnx")
    export_onnx_native_pointnet2(m, v, _N, p, print_func=lambda s: None)
    out["pointnet2"] = open(p, "rb").read()

    m = dgcnn_for_width(4, 3, _N, exact_knn=True)
    v = m.init(jax.random.key(0), x0, train=False)
    p = str(tmp_path / "dgcnn.onnx")
    export_onnx_native_dgcnn(m, v, _N, p, print_func=lambda s: None)
    out["dgcnn"] = open(p, "rb").read()
    return out


@pytest.fixture(scope="module")
def exports(tmp_path_factory):
    rng = np.random.default_rng(11)
    return _export_all(tmp_path_factory.mktemp("onnx_exports"), rng)


def _assert_no_unknown_fields(msg, path=""):
    """Recursively assert Google's parser consumed every byte into a KNOWN
    schema field — an unknown field means the writer emitted a field number
    the public spec does not define (or this transcription missed one)."""
    from google.protobuf.unknown_fields import UnknownFieldSet

    assert len(UnknownFieldSet(msg)) == 0, f"unknown fields at {path or '<root>'}"
    for fd, value in msg.ListFields():
        if fd.type != fd.TYPE_MESSAGE:
            continue
        # repeated containers have no DESCRIPTOR; messages do (version-proof
        # vs the deprecated fd.label API)
        sub = [value] if hasattr(value, "DESCRIPTOR") else value
        for i, item in enumerate(sub):
            _assert_no_unknown_fields(item, f"{path}.{fd.name}[{i}]")


@pytest.mark.parametrize("family", ["pointnet", "pointnet2", "dgcnn"])
def test_google_parser_accepts_wire_bytes(onnx_pb2, exports, family):
    model = onnx_pb2.ModelProto.FromString(exports[family])
    _assert_no_unknown_fields(model)
    assert model.ir_version == 8
    assert model.producer_name == "pointcloudprocessing_tpu"
    assert [(o.domain, o.version) for o in model.opset_import] == [("", 13)]
    g = model.graph
    assert [i.name for i in g.input] == ["points"]
    assert [o.name for o in g.output] == [
        "classification_output", "segmentation_output", "se3",
    ]
    # dynamic batch: first dim is a dim_param on every graph input/output
    for vi in list(g.input) + list(g.output):
        dims = vi.type.tensor_type.shape.dim
        assert dims[0].WhichOneof("value") == "dim_param", vi.name
        assert all(d.WhichOneof("value") == "dim_value" for d in dims[1:]), vi.name
        assert vi.type.tensor_type.elem_type == onnx_pb2.TensorProto.FLOAT
    # reference export signature: [-1, C], [-1, n, P], [-1, 3, 3]
    # (pointnet_train.py:237-248)
    shapes = [
        [d.dim_value for d in o.type.tensor_type.shape.dim[1:]] for o in g.output
    ]
    assert shapes == [[4], [_N, 3], [3, 3]]


@pytest.mark.parametrize("family", ["pointnet", "pointnet2", "dgcnn"])
def test_graph_matches_bundled_reader(onnx_pb2, exports, family):
    """The module's own reader and Google's parser must see the SAME graph:
    node op_types/inputs/outputs in order, and bit-identical initializers."""
    model = onnx_pb2.ModelProto.FromString(exports[family])
    ours = parse_model(exports[family])

    got_nodes = [(n.op_type, list(n.input), list(n.output)) for n in model.graph.node]
    want_nodes = [
        (n["op"], list(n["inputs"]), list(n["outputs"])) for n in ours["nodes"]
    ]
    assert got_nodes == want_nodes

    inits = {}
    for t in model.graph.initializer:
        dtype = {
            onnx_pb2.TensorProto.FLOAT: np.float32,
            onnx_pb2.TensorProto.INT64: np.int64,
        }[t.data_type]
        inits[t.name] = np.frombuffer(t.raw_data, dtype).reshape(list(t.dims))
    assert set(inits) == set(ours["initializers"])
    for name, arr in inits.items():
        np.testing.assert_array_equal(
            arr, ours["initializers"][name], err_msg=name
        )


@pytest.mark.parametrize("family", ["pointnet", "pointnet2", "dgcnn"])
def test_opset13_op_conventions(onnx_pb2, exports, family):
    """Spec-derived structural checks: a convention bug shared by the
    graph builder and the bundled interpreter (e.g. ReduceSum still taking
    an axes ATTRIBUTE) would pass test_onnx_native.py but fail here."""
    model = onnx_pb2.ModelProto.FromString(exports[family])
    seen = set()
    for n in model.graph.node:
        seen.add(n.op_type)
        spec = _OPSET13_SHAPE.get(n.op_type)
        if spec is None:
            continue
        n_in, forbidden, required = spec
        assert len(n.input) == n_in, f"{n.op_type} {n.name}: {list(n.input)}"
        attrs = {a.name for a in n.attribute}
        if forbidden:
            assert forbidden not in attrs, f"{n.op_type} {n.name}"
        if required:
            assert required in attrs, f"{n.op_type} {n.name}"
        # every attribute must carry its type tag (required by the spec;
        # onnxruntime rejects UNDEFINED-typed attributes)
        for a in n.attribute:
            assert a.type != onnx_pb2.AttributeProto.UNDEFINED, (
                f"{n.op_type} {n.name} attr {a.name}"
            )
    # the conventions under test actually occur in every family's graph
    # (PointNet++/DGCNN graphs legitimately contain no Reshape)
    assert "ReduceMax" in seen and seen & set(_OPSET13_SHAPE)
